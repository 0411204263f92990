"""Independent NumPy re-derivations of the reference algorithms' *semantics*
(from SURVEY.md's behavioral spec), used as test oracles for the JAX ops.

These are straight-line NumPy written from the mathematical definition — not
copies of the reference code — so agreement between the JAX implementation and
these oracles is a meaningful two-sided check.
"""

from __future__ import annotations

import numpy as np


def sinkhorn_np(Q: np.ndarray, n_iters: int) -> np.ndarray:
    """Non-log-space Sinkhorn (single device). Q: [K, B] → returns [B, K].

    Semantics: normalize total mass, then alternate row scaling to marginal
    1/K and column scaling to marginal 1/B; finally renormalize columns so
    each sample's assignment sums to 1 (reference: my_utils.py:246-274).
    """
    Q = Q.astype(np.float64).copy()
    Q /= Q.sum()
    K, B = Q.shape
    for _ in range(n_iters):
        Q *= ((1.0 / K) / Q.sum(axis=1))[:, None]
        Q *= ((1.0 / B) / Q.sum(axis=0))[None, :]
    Q /= Q.sum(axis=0, keepdims=True)
    return Q.T


def neighborhood_mask_np(h: int, w: int, radius: int) -> np.ndarray:
    """Local-attention mask by explicit loop (oracle for the vectorized op)."""
    mask = np.zeros((h, w, h, w), dtype=np.float32)
    for i in range(h):
        for j in range(w):
            for p in range(max(0, i - radius), min(h, i + radius + 1)):
                for q in range(max(0, j - radius), min(w, j + radius + 1)):
                    mask[i, j, p, q] = 1.0
    return mask.reshape(h * w, h * w)


def label_propagation_np(
    feat_tar: np.ndarray,        # [N, D]
    ctx_feats: list[np.ndarray],  # list of [N, D], already normalized
    ctx_segs: list[np.ndarray],   # list of [K, N]
    nbhd: np.ndarray,             # [N, N]
    topk: int,
    temperature: float = 0.1,
) -> np.ndarray:
    """One propagation step: exp-affinity, neighborhood mask, global top-k
    over all context keys per query, column-normalize, segs @ aff.
    (Semantics of reference mask_propagation.py:396-445.)"""
    N = feat_tar.shape[0]
    f = feat_tar / np.linalg.norm(feat_tar, axis=-1, keepdims=True)
    affs = []
    for cf in ctx_feats:
        a = np.exp(f @ cf.T / temperature) * nbhd  # [N_tar, N_src]
        affs.append(a)
    # keys-major: [C*N_src, N_tar]
    aff = np.concatenate([a.T for a in affs], axis=0)
    kth = np.sort(aff, axis=0)[-topk, :]
    aff[aff < kth[None, :]] = 0.0
    aff = aff / aff.sum(axis=0, keepdims=True)
    segs = np.concatenate(ctx_segs, axis=1)  # [K, C*N_src]
    return segs @ aff  # [K, N_tar]


def propagate_labels_np(
    features: np.ndarray,  # [T, N, D]
    first_seg: np.ndarray,  # [K, N]
    n_last: int,
    nbhd: np.ndarray,
    topk: int,
    temperature: float = 0.1,
) -> np.ndarray:
    """Clip propagation oracle: context = frame0 + up to n_last recent
    propagated frames (reference mask_propagation.py:448-496)."""
    T = features.shape[0]
    norm = features / np.linalg.norm(features, axis=-1, keepdims=True)
    recent: list[tuple[np.ndarray, np.ndarray]] = []
    out = []
    for t in range(1, T):
        ctx_f = [norm[0]] + [p[0] for p in recent]
        ctx_s = [first_seg.astype(np.float64)] + [p[1] for p in recent]
        seg = label_propagation_np(
            features[t], ctx_f, ctx_s, nbhd, topk, temperature
        )
        recent.append((norm[t], seg))
        if len(recent) > n_last:
            recent.pop(0)
        out.append(seg)
    return np.stack(out)
