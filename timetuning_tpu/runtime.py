"""Process-level JAX runtime setup shared by CLIs, tests, and benchmarks."""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache.

    Compiles dominate cold-start wall-clock (the first ViT compile is tens of
    seconds); the on-disk cache makes repeat runs and test re-runs near-free.
    """
    import jax

    cache_dir = path or os.environ.get(
        "TIMETUNING_TPU_CACHE", os.path.expanduser("~/.cache/timetuning_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_debug_nans(flag: bool) -> None:
    """Numerical sanitizer behind a flag (the reference globally enabled
    ``np.seterr(all='raise')`` + autograd anomaly mode, time_tuning.py:523-524;
    here it is opt-in because it disables some XLA optimizations)."""
    import jax

    jax.config.update("jax_debug_nans", bool(flag))
