"""Whole-transformer-block fusion: two Pallas kernels per ViT block.

  * ``attention_block_branch``:  x + proj(attention(qkv(LN1(x))))
  * ``mlp_block_branch``:        x + fc2(gelu(fc1(LN2(x))))

Each branch runs as ONE kernel with its weights VMEM-resident — LayerNorm,
projections, softmax, GELU and the residual add all happen on-chip, so per
block the only HBM activation traffic is reading x and writing x' (the
unfused XLA path round-trips ~6 intermediate tensors per block, including
the [B, H, S, S] probabilities and the [B, S, 4D] MLP hidden).

Backward: custom VJP recomputing through XLA reference compositions (cheap
at ViT-S scales, keeps the kernels forward-only).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from timetuning_tpu.ops.util import pad_to_multiple

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_LN_EPS = 1e-6


def _seq_pad(S: int, dtype) -> int:
    """Pad the token axis to the *sublane* granularity (16 for bf16, 8 for
    f32), not to 128: tokens are the second-to-last dim of every projection
    and MLP matmul, so lane alignment is unnecessary — padding 197 tokens to
    256 instead of 208 wastes 23% of the matmul FLOPs (measured +21% dense
    fps from this change alone). Mosaic pads the [Sp, Sp] attention-score
    lanes internally, which costs only in the (small) attention part."""
    m = 16 if dtype == jnp.bfloat16 else 8
    return pad_to_multiple(S, m)


# ------------------------------------------------------------------ #
# XLA reference compositions (also the VJP recompute paths)

def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias).astype(x.dtype)


def attention_block_xla(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj,
                        num_heads: int):
    from timetuning_tpu.ops.fused_attention import attention_branch_xla

    return x + attention_branch_xla(
        _ln(x, ln_s, ln_b), w_qkv, b_qkv, w_proj, b_proj, num_heads
    )


def mlp_block_xla(x, ln_s, ln_b, w1, b1, w2, b2):
    h = jnp.einsum("bsd,de->bse", _ln(x, ln_s, ln_b), w1,
                   preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    out = jnp.einsum("bse,ed->bsd", h, w2,
                     preferred_element_type=jnp.float32) + b2
    return x + out.astype(x.dtype)


# ------------------------------------------------------------------ #
# kernels

def _ln_rows(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _attn_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, o_ref, *, num_heads, seq_len, block_b):
    D = x_ref.shape[-1]
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)
    Sp = x_ref.shape[1]
    neg = jnp.float32(-1e30)
    key_valid = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1) < seq_len
    lns = lns_ref[:]
    lnb = lnb_ref[:]
    wqkv = wqkv_ref[:]
    bqkv = bqkv_ref[:]
    wproj = wproj_ref[:]
    bproj = bproj_ref[:]

    # Projections batched over the whole block (M = block_b·Sp keeps the
    # MXU pipeline full); only the per-head attention core loops.
    x_all = x_ref[:].reshape(block_b * Sp, D)
    xn = _ln_rows(x_all.astype(jnp.float32), lns, lnb).astype(x_all.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv
    qkv = qkv.astype(x_all.dtype).reshape(block_b, Sp, 3 * D)

    merged_all = []
    for g in range(block_b):
        outs = []
        for h in range(num_heads):
            q = qkv[g, :, h * Dh:(h + 1) * Dh]
            k = qkv[g, :, D + h * Dh: D + (h + 1) * Dh]
            v = qkv[g, :, 2 * D + h * Dh: 2 * D + (h + 1) * Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(key_valid, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x_all.dtype)
            outs.append(
                jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x_all.dtype)
            )
        merged_all.append(jnp.concatenate(outs, axis=-1))
    merged = jnp.concatenate(merged_all, axis=0)             # [Gb·Sp, D]
    out = jax.lax.dot_general(
        merged, wproj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj
    o_ref[:] = (x_all.astype(jnp.float32) + out).astype(o_ref.dtype).reshape(
        block_b, Sp, D
    )


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| ≤ 1.5e-7) — Mosaic has
    no erf/erfc lowering, and this is VPU-only arithmetic."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, block_b):
    lns = lns_ref[:]
    lnb = lnb_ref[:]
    w1 = w1_ref[:]
    b1 = b1_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    Gb, Sp, D = x_ref.shape
    x_all = x_ref[:].reshape(Gb * Sp, D)
    xn = _ln_rows(x_all.astype(jnp.float32), lns, lnb).astype(x_all.dtype)
    h = jax.lax.dot_general(
        xn, w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1
    h = _gelu_exact(h).astype(x_all.dtype)
    out = jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2
    o_ref[:] = (x_all.astype(jnp.float32) + out).astype(o_ref.dtype).reshape(
        Gb, Sp, D
    )


def _full_spec(*shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_b", "interpret"))
def _attn_pallas(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj,
                 num_heads: int, block_b: int | None = None,
                 interpret: bool = False):
    B, S, D = x.shape
    if block_b is None:
        # the flattened [Gb·Sp, 3D] f32 QKV accumulator and the per-item
        # [Sp, Sp] scores dominate VMEM; scale the block inversely with
        # sequence length AND width (ViT-S/16@224 → 4; ViT-B/16 → 2;
        # S/8 @224 → 1)
        sp = _seq_pad(S, x.dtype)
        base = 4 if x.dtype == jnp.bfloat16 else 2
        block_b = max(1, (base * 256 * 384) // (sp * D))
    Sp = _seq_pad(S, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
    Bp = pad_to_multiple(B, block_b)
    if Bp != B:
        xp = jnp.pad(xp, ((0, Bp - B), (0, 0), (0, 0)))
    x_spec = pl.BlockSpec((block_b, Sp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, seq_len=S,
                          block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp, D), x.dtype),
        grid=(Bp // block_b,),
        in_specs=[x_spec, _full_spec(1, D), _full_spec(1, D),
                  _full_spec(D, 3 * D), _full_spec(1, 3 * D),
                  _full_spec(D, D), _full_spec(1, D)],
        out_specs=x_spec,
        interpret=interpret,
    )(
        xp,
        ln_s.astype(jnp.float32).reshape(1, -1),
        ln_b.astype(jnp.float32).reshape(1, -1),
        w_qkv.astype(x.dtype),
        b_qkv.astype(jnp.float32).reshape(1, -1),
        w_proj.astype(x.dtype),
        b_proj.astype(jnp.float32).reshape(1, -1),
    )
    return out[:B, :S]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _mlp_pallas(x, ln_s, ln_b, w1, b1, w2, b2, block_b: int | None = None,
                interpret: bool = False):
    B, S, D = x.shape
    if block_b is None:
        # the [Gb·Sp, hidden] f32 hidden dominates VMEM; scale with both
        # sequence length and width
        sp = _seq_pad(S, x.dtype)
        base = 4 if x.dtype == jnp.bfloat16 else 2
        block_b = max(1, (base * 256 * 384) // (sp * D))
    Sp = _seq_pad(S, x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
    Bp = pad_to_multiple(B, block_b)
    if Bp != B:
        xp = jnp.pad(xp, ((0, Bp - B), (0, 0), (0, 0)))
    Dh = w1.shape[1]
    x_spec = pl.BlockSpec((block_b, Sp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp, D), x.dtype),
        grid=(Bp // block_b,),
        in_specs=[x_spec, _full_spec(1, D), _full_spec(1, D),
                  _full_spec(D, Dh), _full_spec(1, Dh),
                  _full_spec(Dh, D), _full_spec(1, D)],
        out_specs=x_spec,
        interpret=interpret,
    )(
        xp,
        ln_s.astype(jnp.float32).reshape(1, -1),
        ln_b.astype(jnp.float32).reshape(1, -1),
        w1.astype(x.dtype),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(x.dtype),
        b2.astype(jnp.float32).reshape(1, -1),
    )
    return out[:B, :S]


# ------------------------------------------------------------------ #
# Long-sequence (>1024 tokens) row-chunked kernels
#
# Above 1024 tokens the [Sp, Sp] attention-score tile no longer fits VMEM,
# so the attention CORE routes through ops/flash_attention. But LayerNorm,
# the QKV/output projections and the whole MLP have no cross-token
# dependency at all — they are embarrassingly row-parallel — and the XLA
# fallback is HBM-bound on its f32 intermediates (measured 36 TF/s for the
# MLP at S=3152 vs 110 TF/s for the fused kernel at S=208: the [B·S, 4D]
# f32 hidden alone is ~155 MB per layer of round-trip traffic). These
# kernels tile the flattened [B·S, D] token rows so VMEM use is constant in
# S: LN + matmul (+ GELU + second matmul + residual) never leave VMEM.

def _mlp_rows_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     o_ref):
    x = x_ref[:]                                               # [R, D]
    xn = _ln_rows(x.astype(jnp.float32), lns_ref[:], lnb_ref[:]).astype(x.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    h = _gelu_exact(h).astype(x.dtype)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    o_ref[:] = (x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _ln_dense_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref):
    x = x_ref[:]
    xn = _ln_rows(x.astype(jnp.float32), lns_ref[:], lnb_ref[:]).astype(x.dtype)
    o = jax.lax.dot_general(
        xn, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]
    o_ref[:] = o.astype(o_ref.dtype)


def _dense_residual_kernel(y_ref, x_ref, w_ref, b_ref, o_ref):
    out = jax.lax.dot_general(
        y_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]
    o_ref[:] = (x_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def _rows_call(kernel, args, row_args, D_out, block_rows, interpret):
    """Run a row-chunked kernel over the flattened token rows.

    ``row_args``: list of [B, S, D_i] tensors tiled along rows (first one
    defines the output row count); ``args``: whole-array (weight) operands.
    """
    B, S, _ = row_args[0].shape
    R = B * S
    Rp = pad_to_multiple(R, block_rows)
    flat = []
    for a in row_args:
        a2 = a.reshape(R, a.shape[-1])
        if Rp != R:
            a2 = jnp.pad(a2, ((0, Rp - R), (0, 0)))
        flat.append(a2)
    row_specs = [
        pl.BlockSpec((block_rows, a.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for a in flat
    ]
    out_spec = pl.BlockSpec((block_rows, D_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, D_out), row_args[0].dtype),
        grid=(Rp // block_rows,),
        in_specs=row_specs + [_full_spec(*a.shape) for a in args],
        out_specs=out_spec,
        interpret=interpret,
    )(*flat, *args)
    return out[:R].reshape(B, S, D_out)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _mlp_rows_pallas(x, ln_s, ln_b, w1, b1, w2, b2, block_rows: int = 512,
                     interpret: bool = False):
    D = x.shape[-1]
    return _rows_call(
        _mlp_rows_kernel,
        [ln_s.astype(jnp.float32).reshape(1, -1),
         ln_b.astype(jnp.float32).reshape(1, -1),
         w1.astype(x.dtype), b1.astype(jnp.float32).reshape(1, -1),
         w2.astype(x.dtype), b2.astype(jnp.float32).reshape(1, -1)],
        [x], D, block_rows, interpret,
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _ln_dense_pallas(x, ln_s, ln_b, w, b, block_rows: int = 512,
                     interpret: bool = False):
    return _rows_call(
        _ln_dense_kernel,
        [ln_s.astype(jnp.float32).reshape(1, -1),
         ln_b.astype(jnp.float32).reshape(1, -1),
         w.astype(x.dtype), b.astype(jnp.float32).reshape(1, -1)],
        [x], w.shape[1], block_rows, interpret,
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _dense_residual_pallas(y, x, w, b, block_rows: int = 512,
                           interpret: bool = False):
    return _rows_call(
        _dense_residual_kernel,
        [w.astype(y.dtype), b.astype(jnp.float32).reshape(1, -1)],
        [y, x], w.shape[1], block_rows, interpret,
    )


def ln_dense_xla(x, ln_s, ln_b, w, b):
    o = jnp.einsum("bsd,de->bse", _ln(x, ln_s, ln_b), w,
                   preferred_element_type=jnp.float32) + b
    return o.astype(x.dtype)


def dense_residual_xla(y, x, w, b):
    o = jnp.einsum("bsd,de->bse", y, w,
                   preferred_element_type=jnp.float32) + b
    return (x.astype(jnp.float32) + o).astype(x.dtype)


@jax.custom_vjp
def ln_dense_rows(x, ln_s, ln_b, w, b):
    """LN + dense in one row-chunked kernel (constant VMEM in S)."""
    return _ln_dense_pallas(x, ln_s, ln_b, w, b)


def _ld_fwd(x, ln_s, ln_b, w, b):
    return _ln_dense_pallas(x, ln_s, ln_b, w, b), (x, ln_s, ln_b, w, b)


def _ld_bwd(res, g):
    _, vjp = jax.vjp(ln_dense_xla, *res)
    return vjp(g.astype(res[0].dtype))


ln_dense_rows.defvjp(_ld_fwd, _ld_bwd)


@jax.custom_vjp
def dense_residual_rows(y, x, w, b):
    """x + dense(y) in one row-chunked kernel (constant VMEM in S)."""
    return _dense_residual_pallas(y, x, w, b)


def _dr_fwd(y, x, w, b):
    return _dense_residual_pallas(y, x, w, b), (y, x, w, b)


def _dr_bwd(res, g):
    _, vjp = jax.vjp(dense_residual_xla, *res)
    return vjp(g.astype(res[0].dtype))


dense_residual_rows.defvjp(_dr_fwd, _dr_bwd)


def attention_block_branch_flash(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj,
                                 num_heads: int):
    """The >1024-token attention block branch: fused LN+QKV rows kernel →
    flash attention core (ops/flash_attention, VMEM linear in S) → fused
    proj+residual rows kernel. Same math as ``attention_block_xla``; each
    stage is differentiable (rows kernels recompute through XLA in their
    VJPs, the flash core streams its analytic gradient)."""
    from timetuning_tpu.ops.flash_attention import flash_attention

    B, S, D = x.shape
    Dh = D // num_heads
    qkv = ln_dense_rows(x, ln_s, ln_b, w_qkv, b_qkv)           # [B, S, 3D]
    qkv = qkv.reshape(B, S, 3, num_heads, Dh)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    o = flash_attention(q, k, v)                                # [B, H, S, Dh]
    merged = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, S, D)
    return dense_residual_rows(merged, x, w_proj, b_proj)


# ------------------------------------------------------------------ #
# differentiable wrappers

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def attention_block_branch(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj,
                           num_heads: int):
    return _attn_pallas(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, num_heads)


def _attn_fwd(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, num_heads):
    out = _attn_pallas(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, num_heads)
    return out, (x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj)


def _attn_bwd(num_heads, res, g):
    _, vjp = jax.vjp(
        lambda *a: attention_block_xla(*a, num_heads=num_heads), *res
    )
    return vjp(g.astype(res[0].dtype))


attention_block_branch.defvjp(_attn_fwd, _attn_bwd)


def _mlp_dispatch(x, ln_s, ln_b, w1, b1, w2, b2):
    # ≤1024 tokens: whole-[Gb·Sp] block kernel; longer: row-chunked kernel
    # with VMEM constant in S (the f32 hidden is tiled, never in HBM)
    if x.shape[1] <= 1024:
        return _mlp_pallas(x, ln_s, ln_b, w1, b1, w2, b2)
    return _mlp_rows_pallas(x, ln_s, ln_b, w1, b1, w2, b2)


@jax.custom_vjp
def mlp_block_branch(x, ln_s, ln_b, w1, b1, w2, b2):
    return _mlp_dispatch(x, ln_s, ln_b, w1, b1, w2, b2)


def _mlp_fwd(x, ln_s, ln_b, w1, b1, w2, b2):
    return _mlp_dispatch(x, ln_s, ln_b, w1, b1, w2, b2), (x, ln_s, ln_b, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    _, vjp = jax.vjp(mlp_block_xla, *res)
    return vjp(g.astype(res[0].dtype))


mlp_block_branch.defvjp(_mlp_fwd, _mlp_bwd)


def fused_block_available(seq_len: int | None = None) -> bool:
    """Whole-block kernels apply on TPU for sequences whose [Sp, Sp] score
    tile fits VMEM; beyond that the caller should use the flash-style
    per-head path (ops/attention) or XLA."""
    ok = pltpu is not None and jax.default_backend() == "tpu"
    if seq_len is not None:
        ok = ok and seq_len <= 1024
    return ok
