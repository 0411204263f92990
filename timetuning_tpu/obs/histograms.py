"""Prototype-assignment diagnostics.

Reference: time_tuning.py:433-457 + my_utils — ``get_similarity_histogram``
accumulates the argmax-prototype histogram over an eval loader;
``log_assignment_histogram`` writes the distribution + its entropy to
TensorBoard. The histogram accumulation runs on device here (one bincount
per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def assignment_histogram(scores: jax.Array, num_prototypes: int) -> jax.Array:
    """[..., K] prototype scores → [K] argmax counts (device)."""
    assign = jnp.argmax(scores.reshape(-1, scores.shape[-1]), axis=-1)
    return jnp.bincount(assign, length=num_prototypes)


def assignment_entropy(hist: np.ndarray) -> float:
    """Mean -p·log(p) of the assignment distribution
    (reference log_assignment_histogram, time_tuning.py:437-441)."""
    p = np.asarray(hist, np.float64)
    p = p / max(p.sum(), 1.0)
    return float(-(p * np.log(p + 1e-8)).mean())


def collect_assignment_histogram(
    feature_fn, similarity_fn, loader, num_prototypes: int
) -> np.ndarray:
    """Accumulate the histogram over a loader (reference
    ``get_similarity_histogram``). ``feature_fn(frames) -> [B, N, D]``,
    ``similarity_fn(feats) -> [B, N, K]``."""
    hist = np.zeros(num_prototypes, np.int64)
    for batch in loader:
        feats = feature_fn(batch[0])
        scores = similarity_fn(feats)
        hist += np.asarray(assignment_histogram(scores, num_prototypes))
    return hist


def log_assignment_histogram(writer, hist: np.ndarray, step: int) -> float:
    """Write distribution + entropy scalars (time_tuning.py:433-442).
    Returns the entropy."""
    ent = assignment_entropy(hist)
    writer.scalar("Scores/entropy", ent, step)
    writer.histogram("Assignment Histogram", hist, step)
    return ent
