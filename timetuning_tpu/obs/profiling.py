"""Profiling hooks: first-class jax.profiler traces (SURVEY.md §5.1 — the
reference had none; this is a required upgrade for a TPU framework)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a TensorBoard-viewable device trace around a code block."""
    import jax

    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
