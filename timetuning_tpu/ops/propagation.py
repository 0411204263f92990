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


def _propagate_labels_batched_unrolled(
    features: jax.Array,       # [B, T, N, D]
    first_seg: jax.Array,      # [B, K, N]
    n_last: int,
    radius: int,
    topk: int,
    temperature: float,
    spatial_size: tuple[int, int] | None,
) -> jax.Array:
    """T−1 unrolled steps whose ops are BATCHED over clips — neither
    ``vmap(propagate_labels)`` nor a hand-batched ``lax.scan``.

    The alternatives measured badly at eval shapes (B=8, T=25, S/16):
    vmap-of-scan compiles pathologically (238 s), a hand-batched scan with
    a dynamic_update_slice FIFO both compiles pathologically (410 s) AND
    runs slower than per-clip unrolling (3.05 vs 2.2 ms — the query-major
    transposes in the carry loop), and per-clip unrolling runs the
    affinity products as B serial [N, C·N] matmuls per frame (~13 TF/s —
    matmul-granularity bound, not FLOPs). Unrolling over frames makes
    every slot index STATIC (the FIFO becomes plain indexed updates — no
    dynamic-slice carry for XLA's loop passes to choke on) while each
    step's einsums contract all clips at once; the layouts are chosen so
    the [B, N, C, M] affinity reshapes to keys-major [B, N, C·M] with no
    transpose, and the context label maps live as [B, K, C, N] so the
    final contraction consumes (c, m) jointly. Semantics identical to the
    per-clip scan (tests pin equality).

    Compile status at eval shapes: T ≤ 12 compiles in ~4 s, but T=25 did
    not finish within 850 s on the first attempt (possibly contaminated by
    a queued remote-compile request; under re-measurement). Dispatch keeps
    the per-clip unroll until this form's T=25 compile is proven sane."""
    B, T, N, D = features.shape
    K = first_seg.shape[1]
    if spatial_size is None:
        h = w = int(round(N ** 0.5))
    else:
        h, w = spatial_size
    assert h * w == N, f"spatial size {h}x{w} != N={N}"
    acc_t = jnp.promote_types(features.dtype, jnp.float32)
    seg_t = jnp.promote_types(first_seg.dtype, jnp.float32)
    nbhd = neighborhood_mask(h, w, radius).astype(acc_t)

    feats_n = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + _EPS)
    n_slots = context_slots(T, n_last)
    C = n_slots + 1

    ctx_f = jnp.zeros((B, C, N, D), feats_n.dtype).at[:, 0].set(feats_n[:, 0])
    ctx_s = jnp.zeros((B, K, C, N), seg_t).at[:, :, 0].set(
        first_seg.astype(seg_t))
    valid = [1.0] + [0.0] * n_slots                      # static per step

    outs = []
    for t in range(1, T):
        f = feats_n[:, t]                                # [B, N, D]
        aff = jnp.einsum("bnd,bcmd->bncm", f, ctx_f,
                         preferred_element_type=acc_t)   # [B, N, C, M]
        aff = jnp.exp(aff / temperature)
        aff = aff * nbhd[None, :, None, :]
        vmask = jnp.asarray(valid, acc_t)                # constant-folded
        aff = aff * vmask[None, None, :, None]

        aff_q = aff.reshape(B, N, C * N)                 # keys-major, free
        kth = kth_largest_value(aff_q, topk)             # [B, N]
        aff_q = jnp.where(aff_q >= kth[..., None], aff_q, 0.0)
        aff_q = aff_q / (jnp.sum(aff_q, axis=-1, keepdims=True) + _EPS)

        seg = jnp.einsum(
            "bkcm,bncm->bkn", ctx_s.astype(acc_t),
            aff_q.reshape(B, N, C, N), preferred_element_type=acc_t)
        outs.append(seg)

        if t < T - 1:
            slot = 1 + (t - 1) % n_slots                 # static
            ctx_f = ctx_f.at[:, slot].set(f)
            ctx_s = ctx_s.at[:, :, slot].set(seg.astype(seg_t))
            valid = list(valid)
            valid[slot] = 1.0
    return jnp.stack(outs, axis=1)                       # [B, T-1, K, N]


def propagate_labels_batch(
    features: jax.Array,       # [B, T, N, D]
    first_seg: jax.Array,      # [B, K, N]
    n_last: int = 7,
    radius: int = 6,
    topk: int = 5,
    temperature: float = 0.1,
    spatial_size: tuple[int, int] | None = None,
) -> jax.Array:
    """Batched ``propagate_labels``: [B, T-1, K, N].

    On TPU, shapes that fit VMEM route to the fused kernel
    (ops/propagation_pallas): the whole scan — affinity, mask, top-k,
    renorm, seg matmul, context FIFO — runs on-chip with the context in
    scratch, one frame in / one label map out per step. Long (eval-length)
    clips run unrolled batched steps (see `_propagate_labels_batched_unrolled`
    for the measured story vs vmap-of-scan, hand-batched scan and per-clip
    unrolling)."""
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
    if T > 8:
        # Hand-batched variants (scan AND unrolled) still compile
        # pathologically at eval lengths on the current toolchain — see
        # _propagate_labels_batched_unrolled's docstring for numbers. The
        # per-clip unroll (B <= 16) / lax.map keeps compiles sane at no
        # steady-state loss.
        fn_long = functools.partial(
            propagate_labels, n_last=n_last, radius=radius, topk=topk,
            temperature=temperature, spatial_size=spatial_size,
        )
        if B <= 16:
            return jnp.stack(
                [fn_long(features[i], first_seg[i]) for i in range(B)]
            )
        return jax.lax.map(lambda ab: fn_long(ab[0], ab[1]),
                           (features, first_seg))
    fn = functools.partial(
        propagate_labels,
        n_last=n_last,
        radius=radius,
        topk=topk,
        temperature=temperature,
        spatial_size=spatial_size,
    )
    return jax.vmap(fn)(features, first_seg)
