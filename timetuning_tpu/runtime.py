"""Process-level JAX runtime setup shared by CLIs, tests, and benchmarks."""

from __future__ import annotations

import os


def respect_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative even when a hosting image's
    device plugin re-forces its own platform list at import time (observed
    with the tunneled-TPU plugin): re-assert the env choice through
    ``jax.config``, which wins over the plugin. No-op when the env var is
    unset or a backend already initialized."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:  # backends already initialized — too late, leave it
        pass


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (+ make the
    ``JAX_PLATFORMS`` env choice stick — every CLI/bench entry calls this
    before touching a device).

    Compiles dominate cold-start wall-clock (the first ViT compile is tens of
    seconds); the on-disk cache makes repeat runs and test re-runs near-free.
    """
    import jax

    respect_platform_env()

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
