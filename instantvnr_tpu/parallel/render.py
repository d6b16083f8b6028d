"""Sharded rendering: pixels/rays distributed over the data axis.

The reference's long-dimension mechanisms (wavefront chunking, suspendable
DDA iterators — SURVEY.md §5 "long-context analog") become, on a pod slice:
shard the R rays over the "data" axis (rays are independent → zero
communication during the march), keep the macrocell + transfer function +
sample context replicated, and all_gather only the final [R/D, 4] tiles into
the full frame. Marching loops stay device-local inside shard_map.
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from instantvnr_tpu.accel.macrocell import MacroCell
from instantvnr_tpu.render.raymarch import RaymarchSettings, raymarch
from instantvnr_tpu.utils.tfn import TransferFunction


def make_sharded_render_fn(sample_fn, mesh: Mesh,
                           settings: RaymarchSettings):
    """Returns jitted fn(sample_ctx, org, dirn, t0, t1, mc, tf, jitter) → rgba.

    Ray arrays are sharded over "data"; the result is gathered to replicated
    (out_specs P() via psum-style all_gather XLA inserts automatically when
    unsharding). Ray count must divide the data axis size.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P(), P(),
                  P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    def sharded(sample_ctx, org, dirn, t0, t1, mc: MacroCell,
                tf: TransferFunction, jitter):
        return raymarch(partial(sample_fn, sample_ctx), org, dirn, t0, t1,
                        mc, tf, jitter, settings)

    return jax.jit(sharded)
