"""DAVIS video-object-segmentation metrics: region J, boundary F, J&F.

Reference: mask_propagation.py:501-715 (``db_eval_boundary`` /
``_seg2bmap`` / ``db_eval_iou`` / ``db_statistics`` /
``evaluate_semisupervised``). The per-frame boundary computation
(boundary map extraction + disk dilation + precision/recall) is vmapped JAX
on device; the tiny sequence statistics stay in numpy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.ops.morphology import dilate


def boundary_map(mask: jax.Array) -> jax.Array:
    """Binary boundary of a [H, W] mask — EXACT reference ``_seg2bmap``
    (mask_propagation.py:614-627, the equal-size case the eval path always
    uses): XOR against the east/south/southeast neighbors (zero-padded),
    then the last row/column are OVERRIDDEN to east-/south-diff only and
    the corner to 0 — a full-frame mask has (almost) no boundary pixels,
    not a frame-border ring."""
    m = mask.astype(bool)
    e = jnp.zeros_like(m).at[:, :-1].set(m[:, 1:])
    s = jnp.zeros_like(m).at[:-1, :].set(m[1:, :])
    se = jnp.zeros_like(m).at[:-1, :-1].set(m[1:, 1:])
    b = (m ^ e) | (m ^ s) | (m ^ se)
    b = b.at[-1, :].set(m[-1, :] ^ e[-1, :])
    b = b.at[:, -1].set(m[:, -1] ^ s[:, -1])
    b = b.at[-1, -1].set(False)
    return b


def boundary_f_measure(
    pred: jax.Array, gt: jax.Array, bound_th: float = 0.008
) -> jax.Array:
    """F-measure of boundary alignment within a pixel tolerance
    (reference ``db_eval_boundary``/``f_measure``, mask_propagation.py:501-557).
    pred/gt: binary [H, W]."""
    H, W = pred.shape
    bound_pix = (
        bound_th if bound_th >= 1 else math.ceil(bound_th * math.hypot(H, W))
    )
    fg = boundary_map(pred)
    gtb = boundary_map(gt)
    fg_dil = dilate(fg, int(bound_pix)).astype(bool)
    gt_dil = dilate(gtb, int(bound_pix)).astype(bool)

    n_fg = jnp.sum(fg)
    n_gt = jnp.sum(gtb)
    precision = jnp.where(n_fg > 0, jnp.sum(fg & gt_dil) / jnp.maximum(n_fg, 1),
                          jnp.where(n_gt > 0, 0.0, 1.0))
    recall = jnp.where(n_gt > 0, jnp.sum(gtb & fg_dil) / jnp.maximum(n_gt, 1),
                       jnp.where(n_fg > 0, 0.0, 1.0))
    denom = precision + recall
    return jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)


def region_iou(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """DAVIS J per frame: |A∩B|/|A∪B|, empty/empty → 1
    (reference ``db_eval_iou``, mask_propagation.py:670-700)."""
    p = pred.astype(bool)
    g = gt.astype(bool)
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))


_batched_f = jax.jit(jax.vmap(boundary_f_measure))
_batched_j = jax.jit(jax.vmap(region_iou))


def evaluate_sequence(pred_masks: np.ndarray, gt_masks: np.ndarray,
                      obj_ids=None):
    """Per-object J & F over a sequence.

    pred/gt: [T, H, W] integer object-id maps (0 = background). Returns
    dict {object_id: {"J": [T], "F": [T]}} (reference
    ``evaluate_semisupervised``, mask_propagation.py:702-715).

    ``obj_ids``: the sequence's object set. Pass it explicitly when the
    frames given here are a protocol SLICE of the sequence (DAVIS scores
    masks[1:-1]) — the official harness derives objects from the FULL
    ground truth, so an object visible only in an excluded frame is still
    scored (empty-vs-empty frames count J=F=1) rather than dropped.
    """
    if len(gt_masks) == 0:
        return {}  # a 2-frame clip has no scoreable middle frames
    if obj_ids is None:
        obj_ids = [int(i) for i in np.unique(gt_masks) if i != 0]
    out = {}
    for oid in obj_ids:
        p = jnp.asarray(pred_masks == oid)
        g = jnp.asarray(gt_masks == oid)
        out[oid] = {
            "J": np.asarray(_batched_j(p, g)),
            "F": np.asarray(_batched_f(p, g)),
        }
    return out


def db_statistics(per_frame: np.ndarray):
    """(M, O, D): mean, recall@0.5, decay over 4 bins
    (reference ``db_statistics``, mask_propagation.py:641-666)."""
    M = float(np.mean(per_frame))
    O = float(np.mean(per_frame > 0.5))
    N = len(per_frame)
    ids = np.round(np.linspace(1, N, 5) + 1e-10) - 1
    ids = ids.astype(int)
    bins = [per_frame[ids[i] : ids[i + 1] + 1] for i in range(4)]
    D = float(np.mean(bins[0]) - np.mean(bins[3])) if N >= 4 else 0.0
    return M, O, D


def j_and_f(per_sequence: list[dict]) -> dict:
    """Aggregate J&F over sequences of ``evaluate_sequence`` outputs."""
    js, fs = [], []
    for seq in per_sequence:
        for oid, d in seq.items():
            js.append(np.mean(d["J"]))
            fs.append(np.mean(d["F"]))
    J = float(np.mean(js)) if js else 0.0
    F = float(np.mean(fs)) if fs else 0.0
    return {"J": J, "F": F, "J&F": (J + F) / 2}
