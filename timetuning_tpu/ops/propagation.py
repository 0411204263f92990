"""k-NN label propagation over feature affinities — the temporal core of TimeT.

Re-designs the reference's per-sample Python loop (reference:
mask_propagation.py:396-496, driven serially per clip inside the loss at
time_tuning.py:277-301) as a fully batched, statically-shaped XLA program:

  * the FIFO of context frames (a Python ``queue.Queue`` in the reference)
    becomes a fixed-size rolling buffer updated with ``dynamic_update_slice``
    inside a ``lax.scan`` over frames;
  * the ``restrict_neighborhood`` local-attention mask (built by a 4-nested
    Python loop and cached in a module global, mask_propagation.py:377-391)
    is one broadcasted comparison, computed at trace time as a constant;
  * the whole thing vmaps over the batch, so the affinity products
    ([N, N] per context frame) run as large batched matmuls on the MXU
    instead of 128 serial GPU launches.

Semantics matched to the reference (mask_propagation.py:396-445):
  affinity = exp(<tar_norm, src_norm> / 0.1), per-context-frame neighborhood
  mask, *global* top-k over all context keys per query, column-normalize over
  keys, then seg_tar = segs @ aff. The first frame is always kept in context;
  the most recent ``n_last`` propagated frames fill the rest.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


@functools.lru_cache(maxsize=16)
def _cached_neighborhood(h: int, w: int, radius: int):
    import numpy as np

    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)
    keep = (np.abs(ii[:, None] - ii[None, :]) <= radius) & (
        np.abs(jj[:, None] - jj[None, :]) <= radius
    )
    return keep.astype(np.float32)


def context_slots(T: int, n_last: int) -> int:
    """Rolling-context capacity for a T-frame clip: up to ``n_last`` recent
    propagated frames, but a T-frame clip only ever *produces* T-2 rolling
    entries before its last step (frame 0 is pinned in its own slot), and at
    least 1 slot so the FIFO arithmetic stays well-formed for tiny clips.

    Single home of the slot policy — the XLA path (`propagate_labels`), the
    Pallas kernel, and its VMEM-availability estimate must all agree on the
    context membership, so none of them may restate this formula.
    """
    return max(min(n_last, T - 2), 1)


def neighborhood_mask(h: int, w: int, radius: int) -> jax.Array:
    """[h*w, h*w] mask: mask[q, s] = 1 iff source s is within a
    (2*radius+1)² spatial window of query q. radius <= 0 → all ones.

    Equivalent to reference ``restrict_neighborhood`` (mask_propagation.py:377-391)
    but computed as one vectorized comparison instead of an O(h·w·r²) loop.
    """
    if radius <= 0:
        return jnp.ones((h * w, h * w), dtype=jnp.float32)
    return jnp.asarray(_cached_neighborhood(h, w, radius))


def kth_largest_value(x: jax.Array, k: int) -> jax.Array:
    """Per-row k-th largest value (counting duplicates) along the last axis —
    equivalent to ``lax.top_k(x, k)[0][..., -1]`` but ~2× cheaper on TPU for
    small k: k unrolled masked-max passes instead of a sort. Only the
    threshold value is needed by the propagation (the reference thresholds
    by the top-k minimum, mask_propagation.py:434-436), never the indices.
    """
    neg = jnp.asarray(-jnp.inf, x.dtype)
    t = jnp.full(x.shape[:-1] + (1,), jnp.inf, x.dtype)   # exclusive bound
    need = jnp.full(x.shape[:-1] + (1,), k, jnp.int32)
    kth = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    done = jnp.zeros(x.shape[:-1] + (1,), bool)
    for _ in range(k):
        masked = jnp.where(x < t, x, neg)
        m = jnp.max(masked, axis=-1, keepdims=True)
        c = jnp.sum((x == m) & (x < t), axis=-1, keepdims=True).astype(jnp.int32)
        take = (~done) & (need <= c)
        kth = jnp.where(take, m, kth)
        done = done | take
        need = need - c
        t = m
    return kth[..., 0]


def label_propagation_step(
    feat_tar: jax.Array,       # [N, D]  target-frame features, L2-NORMALIZED
    ctx_feats: jax.Array,      # [C, N, D] context features (already L2-normalized)
    ctx_segs: jax.Array,       # [C, K, N] context label maps
    ctx_valid: jax.Array,      # [C] 1.0 for live context slots
    nbhd: jax.Array,           # [N, N] neighborhood mask (query-major)
    topk: int = 5,
    temperature: float = 0.1,
) -> jax.Array:
    """Propagate context label maps onto one target frame. Returns [K, N].

    Matches reference ``label_propagation`` (mask_propagation.py:396-445):
    invalid context slots contribute zero affinity (the static-shape stand-in
    for the reference's variable-length context list). The caller passes the
    already-normalized target row (propagate_labels computes feats_n once
    for all frames — normalizing again here would redo the work and keep a
    second copy of the [T, N, D] tensor live through the scan).
    """
    C, N, D = ctx_feats.shape
    acc_t = jnp.promote_types(feat_tar.dtype, jnp.float32)
    f_tar = feat_tar
    # [C, N_tar, N_src] — batched matmul on the MXU.
    aff = jnp.einsum(
        "nd,cmd->cnm", f_tar, ctx_feats, preferred_element_type=acc_t
    )
    aff = jnp.exp(aff / temperature)
    aff = aff * nbhd[None, :, :].astype(acc_t)
    aff = aff * ctx_valid[:, None, None].astype(acc_t)

    # Keys-major view: [N_tar, C*N_src]; global top-k over all context keys.
    aff_q = jnp.transpose(aff, (1, 0, 2)).reshape(N, C * N)
    kth = kth_largest_value(aff_q, topk)                       # [N_tar]
    aff_q = jnp.where(aff_q >= kth[:, None], aff_q, 0.0)
    aff_q = aff_q / (jnp.sum(aff_q, axis=1, keepdims=True) + _EPS)

    # segs: [C, K, N] → [K, C*N]; seg_tar = segs @ affᵀ : [K, N_tar].
    segs = jnp.transpose(ctx_segs, (1, 0, 2)).reshape(-1, C * N)
    return jnp.einsum(
        "kc,nc->kn", segs.astype(acc_t), aff_q, preferred_element_type=acc_t
    )


def propagate_labels(
    features: jax.Array,       # [T, N, D] per-frame dense features
    first_seg: jax.Array,      # [K, N] label map of frame 0 (soft or one-hot)
    n_last: int = 7,
    radius: int = 6,
    topk: int = 5,
    temperature: float = 0.1,
    spatial_size: tuple[int, int] | None = None,
) -> jax.Array:
    """Propagate ``first_seg`` through a clip. Returns [T-1, K, N] maps for
    frames 1..T-1.

    Context = frame 0 (always) + up to ``n_last`` most recent *propagated*
    frames, matching reference ``propagate_labels`` (mask_propagation.py:448-496).
    The context is a static circular buffer scanned over frames; batch it with
    ``jax.vmap`` (the reference looped serially per sample,
    time_tuning.py:277-301).
    """
    T, N, D = features.shape
    K = first_seg.shape[0]
    if spatial_size is None:
        h = w = int(round(N ** 0.5))
    else:
        h, w = spatial_size
    assert h * w == N, f"spatial size {h}x{w} != N={N}"
    nbhd = neighborhood_mask(h, w, radius)

    feats_n = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + _EPS)

    # Rolling slots hold only the *recent* frames; frame 0 is pinned separately.
    n_slots = context_slots(T, n_last)
    C = n_slots + 1

    seg_t = jnp.promote_types(first_seg.dtype, jnp.float32)
    ctx_feats0 = jnp.zeros((C, N, D), feats_n.dtype).at[0].set(feats_n[0])
    ctx_segs0 = jnp.zeros((C, K, N), seg_t).at[0].set(first_seg.astype(seg_t))
    ctx_valid0 = jnp.zeros((C,), jnp.float32).at[0].set(1.0)

    def step(carry, xs):
        ctx_feats, ctx_segs, ctx_valid = carry
        f_norm, t = xs
        seg = label_propagation_step(
            f_norm, ctx_feats, ctx_segs, ctx_valid, nbhd, topk, temperature
        )
        slot = 1 + jnp.mod(t - 1, n_slots)
        ctx_feats = jax.lax.dynamic_update_index_in_dim(ctx_feats, f_norm, slot, 0)
        ctx_segs = jax.lax.dynamic_update_index_in_dim(ctx_segs, seg, slot, 0)
        # `at[slot].set` with a traced index lowers to dynamic_update_slice
        ctx_valid = ctx_valid.at[slot].set(1.0)
        return (ctx_feats, ctx_segs, ctx_valid), seg

    ts = jnp.arange(1, T)
    (_, _, _), segs = jax.lax.scan(
        step, (ctx_feats0, ctx_segs0, ctx_valid0), (feats_n[1:], ts)
    )
    return segs


def propagate_labels_batch(
    features: jax.Array,       # [B, T, N, D]
    first_seg: jax.Array,      # [B, K, N]
    n_last: int = 7,
    radius: int = 6,
    topk: int = 5,
    temperature: float = 0.1,
    spatial_size: tuple[int, int] | None = None,
) -> jax.Array:
    """vmapped ``propagate_labels``: [B, T-1, K, N].

    On TPU, shapes that fit VMEM route to the fused kernel
    (ops/propagation_pallas): the whole scan — affinity, mask, top-k,
    renorm, seg matmul, context FIFO — runs on-chip with the context in
    scratch, one frame in / one label map out per step."""
    from timetuning_tpu.ops.propagation_pallas import (
        propagate_labels_batch_pallas,
        propagation_pallas_available,
    )

    B, T, N, D = features.shape
    if propagation_pallas_available(T, N, D, first_seg.shape[1], n_last):
        return propagate_labels_batch_pallas(
            features, first_seg, n_last=n_last, radius=radius, topk=topk,
            temperature=temperature, spatial_size=spatial_size,
        )
    fn = functools.partial(
        propagate_labels,
        n_last=n_last,
        radius=radius,
        topk=topk,
        temperature=temperature,
        spatial_size=spatial_size,
    )
    if T > 8:
        # Long (eval-length) clips: vmap-of-scan compiles pathologically
        # here (measured 238 s at B=8, T=25 — the batched scan body's
        # gathers/updates blow up XLA) at no runtime benefit over running
        # the well-fused single-clip scan per clip (0.46 vs 0.50 ms/clip).
        # Unroll small batches (2.5 s compile); lax.map keeps one trace
        # for large ones (63 s compile, same steady-state).
        if B <= 16:
            return jnp.stack(
                [fn(features[i], first_seg[i]) for i in range(B)]
            )
        return jax.lax.map(lambda ab: fn(ab[0], ab[1]),
                           (features, first_seg))
    return jax.vmap(fn)(features, first_seg)
