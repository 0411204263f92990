"""Training schedules, precomputed as arrays indexed by step.

Under jit everything is traced once; schedules therefore live as device
constants gathered by step index instead of host-side Python state (the
reference recomputed them per step in Python, my_utils.py:278-283,
time_tuning.py:121-122, 427-429).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
) -> np.ndarray:
    """Cosine schedule from ``base_value`` to ``final_value`` over
    ``epochs * niter_per_ep`` steps, optional linear warmup.

    Matches reference ``cosine_scheduler`` (my_utils.py:278-283) for
    warmup_epochs=0 (the only mode the reference uses: EMA momentum
    0.995→1.0 at time_tuning.py:614-616, weight decay 0.04→0.4 at
    time_tuning.py:383-386).
    """
    warmup_iters = warmup_epochs * niter_per_ep
    total = epochs * niter_per_ep
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    iters = np.arange(total - warmup_iters)
    cosine = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / max(len(iters), 1))
    )
    out = np.concatenate([warmup, cosine])
    assert len(out) == total
    return out


def cosine_annealing_lr(base_lr: float, total_steps: int, eta_min: float = 0.0) -> np.ndarray:
    """PyTorch ``CosineAnnealingLR(T_max=total_steps)`` values per step
    (reference optimizer scheduler, time_tuning.py:383-386)."""
    steps = np.arange(total_steps)
    return eta_min + (base_lr - eta_min) * (1 + np.cos(np.pi * steps / total_steps)) / 2


def schedule_at(schedule: np.ndarray, step: jnp.ndarray) -> jnp.ndarray:
    """Gather a schedule value at a (traced) step, clamped to the last entry."""
    sched = jnp.asarray(schedule)
    idx = jnp.minimum(step, sched.shape[0] - 1)
    return sched[idx]
