"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This validates the multi-chip sharding path (psum'd Sinkhorn, pjit train step)
without TPU hardware, per SURVEY.md §4's distributed-test seam.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The hosting image's TPU plugin re-forces its own platform list at import;
# override via config (env vars alone are not sufficient here).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from timetuning_tpu.runtime import setup_compilation_cache  # noqa: E402

# Tests compare against float64/torch oracles: run f32 matmuls at full
# precision (XLA:CPU's default matmul/conv path trades ~1e-3 accuracy for
# speed, which would swamp the parity tolerances).
jax.config.update("jax_default_matmul_precision", "highest")

# Compiles on this host are slow; persist them across test runs.
setup_compilation_cache()

import pytest  # noqa: E402

# The quick tier: core-semantics modules that prove the framework's math
# (Sinkhorn, propagation, metrics, the train step, transform oracles,
# schedules) without the compile-heavy parallelism / multi-process / CLI
# integration tests. `pytest -m quick` runs in minutes; the full suite is
# the pre-merge gate.
_QUICK_MODULES = frozenset({
    "test_sinkhorn",
    "test_propagation",
    "test_metrics",
    "test_train_step",
    "test_transforms",
    "test_schedules",
    "test_kmeans",
    "test_vos",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
