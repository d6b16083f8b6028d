"""Measure whether 1-deep dispatch speculation hides the tunnel round-trip.

The compacted drivers serialize [dispatch chunk -> read live-count ->
dispatch next]. JAX dispatch is async, so enqueueing chunk k+1 BEFORE
reading count k should overlap the ~25-30 ms link round-trip with device
compute — IF the tunnel pipelines. This measures both schedules on a
superstep-shaped dummy program.

Run: timeout 600 python /root/repo/scratch/dispatch_pipeline.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@jax.jit
def chunk(x, k):
    # superstep-shaped: some gathers + arithmetic + a scalar reduction
    idx = ((jnp.arange(x.shape[0], dtype=jnp.uint32) * jnp.uint32(2654435761))
           % jnp.uint32(x.shape[0])).astype(jnp.int32)
    for _ in range(8):
        x = x * 0.999 + x[idx] * 0.001
    return x, jnp.sum(x[:, 0] > -1e9).astype(jnp.int32), k + 1


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    x = jnp.ones((65536, 8), jnp.float32)
    k = jnp.int32(0)
    # warm
    x, n, k = chunk(x, k)
    _ = int(n)

    n_iter = 30
    # serialized: read each count before the next dispatch
    t0 = time.time()
    for _ in range(n_iter):
        x, n, k = chunk(x, k)
        c = int(n)
    dt_serial = (time.time() - t0) / n_iter * 1e3
    log(f"serialized dispatch+readback: {dt_serial:.1f} ms/iter (count={c})")

    # pipelined: defer each count readback by one dispatch
    t0 = time.time()
    pending = None
    for _ in range(n_iter):
        x, n, k = chunk(x, k)
        if pending is not None:
            c = int(pending)
        pending = n
    c = int(pending)
    dt_pipe = (time.time() - t0) / n_iter * 1e3
    log(f"pipelined (1-deep):           {dt_pipe:.1f} ms/iter (count={c})")

    # pipelined + early async host copy: the transfer starts as soon as
    # the count is ready instead of when the host blocks on int()
    t0 = time.time()
    pending = None
    for _ in range(n_iter):
        x, n, k = chunk(x, k)
        n.copy_to_host_async()
        if pending is not None:
            c = int(pending)
        pending = n
    c = int(pending)
    dt_async = (time.time() - t0) / n_iter * 1e3
    log(f"pipelined + copy_to_host_async: {dt_async:.1f} ms/iter (count={c})")

    # deeper pipeline (2-deep) + async copy
    from collections import deque
    t0 = time.time()
    q = deque()
    for _ in range(n_iter):
        x, n, k = chunk(x, k)
        n.copy_to_host_async()
        q.append(n)
        if len(q) > 2:
            c = int(q.popleft())
    while q:
        c = int(q.popleft())
    dt_async2 = (time.time() - t0) / n_iter * 1e3
    log(f"2-deep + copy_to_host_async:    {dt_async2:.1f} ms/iter (count={c})")

    # no readback at all (pure dispatch stream, sync at end)
    t0 = time.time()
    for _ in range(n_iter):
        x, n, k = chunk(x, k)
    c = int(n)
    dt_free = (time.time() - t0) / n_iter * 1e3
    log(f"free-running (sync at end):   {dt_free:.1f} ms/iter")


if __name__ == "__main__":
    main()
