"""Fused label-propagation kernel: the whole per-clip scan on-chip.

The XLA path (ops/propagation.py) lowers each scan step to ~8 separate
kernels (affinity matmul, exp, mask, k masked-max passes, renorm, seg
matmul, two context-buffer updates), each round-tripping the [N, C·N]
affinity and the context buffers through HBM. This kernel exploits the TPU
grid's *sequential* execution: grid = (batch, T−1), the context FIFO
(features + propagated label maps + validity flags) lives in VMEM/SMEM
scratch and persists across the t-steps of one clip, so per step the only
HBM traffic is reading one frame and writing one label map.

Semantics identical to ops.propagation.label_propagation_step /
propagate_labels (reference mask_propagation.py:396-496): affinity
exp(⟨tar,src⟩/0.1), per-frame neighborhood mask, global top-k over all
context keys (threshold by k-th largest, duplicates included), column
renormalization, seg = segs·aff; context = pinned first frame + rolling
``n_slots`` most recent propagated frames.

Forward-only: the training loss consumes propagation through
``stop_gradient`` (labels are argmax'd — reference time_tuning.py:294-297),
and the eval CLIs never differentiate it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from timetuning_tpu.ops.util import pad_to_multiple
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_EPS = 1e-12


def _kth_largest(x, k: int):
    """Per-row k-th largest, keepdims — shares the masked-max algorithm with
    the XLA path (pure jnp, traceable inside the kernel)."""
    from timetuning_tpu.ops.propagation import kth_largest_value

    return kth_largest_value(x, k)[..., None]


def _kernel(f0_ref, seg0_ref, ft_ref, mask_ref, o_ref,
            ctx_f, ctx_s, valid,
            *, n_slots: int, topk: int, inv_temp: float):
    """Program (b, ti): propagate onto frame ti+1 of clip b.

    f0_ref   [1, Np, D]      normalized first-frame features of clip b
    seg0_ref [1, Kp, Np]     first-frame label map
    ft_ref   [1, 1, Np, D]   normalized target-frame features (frame ti+1)
    mask_ref [Np, C·Np]      neighborhood ∧ src-row-validity (constant)
    o_ref    [1, 1, Kp, Np]  propagated map out
    ctx_f    [C, Np, D]      VMEM scratch — context features
    ctx_s    [C, Kp, Np]     VMEM scratch — context label maps
    valid    [C]             SMEM scratch — live-slot flags
    """
    ti = pl.program_id(1)
    C = ctx_f.shape[0]
    Np, D = ctx_f.shape[1], ctx_f.shape[2]
    Kp = ctx_s.shape[1]

    @pl.when(ti == 0)
    def _():
        # scratch persists across grid steps AND starts uninitialized —
        # stale/garbage (possibly NaN) values would poison the matmuls even
        # against zeroed affinity columns (NaN·0 = NaN), so zero everything
        # at each clip start before pinning frame 0 into slot 0
        ctx_f[:] = jnp.zeros_like(ctx_f)
        ctx_s[:] = jnp.zeros_like(ctx_s)
        ctx_f[0] = f0_ref[0].astype(ctx_f.dtype)
        ctx_s[0] = seg0_ref[0].astype(ctx_s.dtype)
        for c in range(C):
            valid[c] = jnp.int32(1 if c == 0 else 0)

    f_tar = ft_ref[0, 0].astype(jnp.float32)                   # [Np, D]

    # [Np, C·Np] affinity against all context keys in one MXU call
    ctx_flat = ctx_f[:].astype(jnp.float32).reshape(C * Np, D)
    aff = jax.lax.dot_general(
        f_tar, ctx_flat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    aff = jnp.exp(aff * inv_temp) * mask_ref[:]
    # dead context slots contribute nothing (exp(0)=1 against the zeroed
    # scratch otherwise); slice+concat — Mosaic has no scatter lowering
    aff = jnp.concatenate(
        [
            jnp.where(valid[c] > 0, aff[:, c * Np:(c + 1) * Np], 0.0)
            for c in range(C)
        ],
        axis=1,
    )

    kth = _kth_largest(aff, topk)                              # [Np, 1]
    aff = jnp.where(aff >= kth, aff, 0.0)
    aff = aff / (jnp.sum(aff, axis=1, keepdims=True) + _EPS)

    segs_flat = ctx_s[:].astype(jnp.float32)                   # [C, Kp, Np]
    segs_flat = jnp.transpose(segs_flat, (1, 0, 2)).reshape(Kp, C * Np)
    seg = jax.lax.dot_general(
        segs_flat, aff, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [Kp, Np]
    o_ref[0, 0] = seg.astype(o_ref.dtype)

    slot = 1 + jax.lax.rem(ti, n_slots)
    ctx_f[pl.ds(slot, 1)] = f_tar[None].astype(ctx_f.dtype)
    ctx_s[pl.ds(slot, 1)] = seg[None].astype(ctx_s.dtype)
    valid[slot] = jnp.int32(1)


@functools.partial(
    jax.jit,
    static_argnames=("n_last", "radius", "topk", "temperature",
                     "spatial_size", "interpret"),
)
def propagate_labels_batch_pallas(
    features: jax.Array,       # [B, T, N, D]
    first_seg: jax.Array,      # [B, K, N]
    n_last: int = 7,
    radius: int = 6,
    topk: int = 5,
    temperature: float = 0.1,
    spatial_size: tuple[int, int] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Kernel-fused ``propagate_labels_batch``: [B, T-1, K, N]."""
    from timetuning_tpu.ops.propagation import context_slots, neighborhood_mask

    B, T, N, D = features.shape
    K = first_seg.shape[1]
    if spatial_size is None:
        h = w = int(round(N ** 0.5))
    else:
        h, w = spatial_size
    n_slots = context_slots(T, n_last)
    C = n_slots + 1
    Np = pad_to_multiple(N, 128)
    Kp = pad_to_multiple(K, 8)

    feats_n = features / (
        jnp.linalg.norm(features, axis=-1, keepdims=True) + _EPS
    )
    fp = jnp.pad(feats_n, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
    segp = jnp.pad(
        first_seg.astype(jnp.float32), ((0, 0), (0, Kp - K), (0, Np - N))
    )

    nbhd = neighborhood_mask(h, w, radius)                     # [N, N]
    mask = jnp.pad(nbhd, ((0, Np - N), (0, Np - N)))           # src-validity
    mask = jnp.tile(mask, (1, C))                              # [Np, C·Np]

    f0_spec = pl.BlockSpec((1, Np, D), lambda b, t: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    seg0_spec = pl.BlockSpec((1, Kp, Np), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    ft_spec = pl.BlockSpec((1, 1, Np, D), lambda b, t: (b, t + 1, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((Np, C * Np), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, Kp, Np), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_slots=n_slots, topk=topk,
                          inv_temp=1.0 / temperature),
        out_shape=jax.ShapeDtypeStruct((B, T - 1, Kp, Np), jnp.float32),
        grid=(B, T - 1),
        in_specs=[f0_spec, seg0_spec, ft_spec, mask_spec],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((C, Np, D), jnp.float32),
            pltpu.VMEM((C, Kp, Np), jnp.float32),
            pltpu.SMEM((C,), jnp.int32),
        ],
        interpret=interpret,
    )(fp[:, 0], segp, fp, mask)
    return out[:, :, :K, :N]


def propagation_pallas_available(
    T: int, N: int, D: int, K: int, n_last: int
) -> bool:
    """VMEM bound: context + affinity + mask for one program must fit —
    and the clip must be short: the kernel's frame scan unrolls in Mosaic,
    so compile time scales with T (measured 504 s at T=25, with *slower*
    steady-state than the XLA scan; at the T=4 train-loss shape it wins,
    1.35 → 1.23 ms at B=32). Eval-length clips route to the XLA paths."""
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    if T < 2 or T > 8:
        return False
    from timetuning_tpu.ops.propagation import context_slots

    n_slots = context_slots(T, n_last)
    C = n_slots + 1
    Np = pad_to_multiple(N, 128)
    Kp = pad_to_multiple(K, 8)
    ctx = C * Np * D * 4 + C * Kp * Np * 4
    aff = 2 * Np * C * Np * 4 + Np * C * Np * 4   # aff + temps + mask
    frame = Np * D * 4 * 2 + Kp * Np * 4 * 2
    return ctx + aff + frame <= 11 * 1024 * 1024
