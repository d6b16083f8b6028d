"""Structural inspection of sharded programs: count collectives in a jaxpr.

Performance claims about the parallel paths are structural facts — the DP
and TP train steps each issue exactly ONE fused gradient psum
(parallel/train.py, parallel/tp.py), EP decodes with ZERO collectives
(parallel/ep.py), and the slab-sharded frame pays ONE all_gather
(parallel/slab.py). `count_collectives` walks the traced jaxpr (through
pjit/shard_map/scan/while/cond sub-jaxprs) so the multichip dryrun can
ASSERT those counts: if a refactor adds a second collective to a hot
step, the dryrun fails instead of the regression shipping silently.
"""
from __future__ import annotations

from collections import Counter

import jax
import jax.extend as jex

# primitive names that hit the ICI (XLA collectives)
COLLECTIVE_PRIMS = frozenset({
    "psum", "psum2", "all_gather", "all_to_all", "ppermute", "pmax",
    "pmin", "reduce_scatter", "psum_scatter", "pgather",
})


def _subjaxprs(value):
    """Yield raw Jaxprs found in an eqn param value (Jaxpr, ClosedJaxpr,
    or containers of them) — robust across jax versions, where e.g.
    shard_map carries a ClosedJaxpr that jax.core.jaxprs_in_params skips."""
    if isinstance(value, jex.core.Jaxpr):
        yield value
    elif isinstance(value, jex.core.ClosedJaxpr):
        yield value.jaxpr
    elif isinstance(value, (list, tuple)):
        for v in value:
            yield from _subjaxprs(v)


def _walk(jaxpr, counts: Counter) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVE_PRIMS:
            counts[name] += 1
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                _walk(sub, counts)


def count_collectives(fn, *args, **kwargs) -> dict:
    """Trace fn(*args, **kwargs) and return {collective primitive: count}.

    Counts EQUATIONS, not devices: one fused pytree psum is one equation
    regardless of how many leaves or devices participate. Control-flow
    bodies (scan/while/cond) count once per equation — a psum inside a
    scanned body is still one fused collective per trip, which is the
    structural property the dryrun pins.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    counts: Counter = Counter()
    _walk(closed.jaxpr, counts)
    return dict(counts)


def assert_collectives(fn, expected: dict, *args, _what: str = "program",
                       **kwargs) -> dict:
    """Assert the program's collective profile matches `expected` exactly
    (missing keys mean zero). Returns the measured counts."""
    got = count_collectives(fn, *args, **kwargs)
    want = {k: v for k, v in expected.items() if v}
    if got != want:
        raise AssertionError(
            f"{_what}: collective profile changed — expected {want}, "
            f"traced {got}. A new collective on a hot step is a perf "
            "regression; update the expectation only if intentional.")
    return got
