"""Shared steady-state measurement scaffold for bench*.py.

One methodology for every published throughput number so the benches stay
comparable:
  * alternate between ≥2 distinct on-device buffers — repeated identical
    dispatches can be memoized by the tunnel runtime, inflating naive
    timings by orders of magnitude;
  * several warmup calls, each synced (first post-compile dispatches run
    slow);
  * time a chain of dispatches and sync ONCE at the end via a scalar
    readback — `block_until_ready()` can be a no-op on the tunneled chip.
"""

from __future__ import annotations

import time


def time_chained_fps(fn, bufs, iters: int, units_per_call: float,
                     warmup: int = 4) -> float:
    """Units/sec of ``fn(*bufs[i % len(bufs)])`` over ``iters`` chained
    dispatches (compile + warmup excluded). ``bufs`` is a list of argument
    tuples over distinct device buffers."""
    import jax.numpy as jnp

    def sync(out):
        return float(jnp.asarray(out).mean())

    for i in range(max(warmup, 1)):
        sync(fn(*bufs[i % len(bufs)]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*bufs[i % len(bufs)])
    sync(out)
    return units_per_call * iters / (time.perf_counter() - t0)
