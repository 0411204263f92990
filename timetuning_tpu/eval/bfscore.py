"""Per-class boundary F-score (BF) between predicted and GT segmentations.

Reference: bfscore.py — per-class contour extraction (cv2.findContours) and
boundary precision/recall within a pixel distance threshold
(:21-37, :40-167), plus ``evaluate_bf_score`` over batches of FG masks
(:297-320). Here boundaries and the distance tolerance are computed on
device (boundary map + disk dilation, ops/morphology) — mathematically the
same precision/recall-within-θ as the contour-point formulation, without the
host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.eval.vos import boundary_f_measure


def bfscore(
    gt: np.ndarray, pred: np.ndarray, threshold: int = 2, num_classes: int | None = None
):
    """Per-class boundary F for one frame.

    gt/pred: [H, W] integer class maps. Returns (scores dict class→F or
    None when the class is absent from both, mean over present classes).
    Class 0 (background) is skipped like the reference (bfscore.py:93-99).
    """
    classes = sorted(set(np.unique(gt)) | set(np.unique(pred)))
    scores: dict[int, float | None] = {}
    vals = []
    for c in classes:
        if c == 0:
            continue
        g = gt == c
        p = pred == c
        if not g.any() and not p.any():
            scores[int(c)] = None
            continue
        f = float(
            boundary_f_measure(jnp.asarray(p), jnp.asarray(g), bound_th=float(threshold))
        )
        scores[int(c)] = f
        vals.append(f)
    return scores, (float(np.mean(vals)) if vals else 0.0)


@functools.lru_cache(maxsize=8)
def _batched_f(threshold: float):
    # cached per threshold so repeat calls (CBFE per split, tests) reuse
    # the compiled program instead of re-tracing every invocation
    return jax.jit(jax.vmap(lambda p, g: boundary_f_measure(p, g, threshold)))


def evaluate_bf_score(
    gt_masks: np.ndarray, fg_masks: np.ndarray, threshold: int = 2
) -> float:
    """Mean binary-FG boundary F over a batch (reference bfscore.py:297-320).
    gt_masks/fg_masks: [N, H, W] binary."""
    fn = _batched_f(float(threshold))
    scores = np.asarray(
        fn(jnp.asarray(fg_masks, bool), jnp.asarray(gt_masks, bool))
    )
    return float(scores.mean())
