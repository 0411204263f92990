"""Fully-fused ViT attention branch as one Pallas TPU kernel.

Computes ``proj(attention(qkv(x_ln)))`` — the whole attention residual
branch after LayerNorm — in a single kernel: the QKV projection, per-head
softmax attention, and output projection all happen in VMEM, so the
[S, 3D] QKV tensor, the [H, S, S] probability tensor and the pre-projection
output never touch HBM. At ViT-S/224 shapes (S=197→256, D=384, H=6) that
removes ~4 HBM round-trips of activation traffic per block versus the
unfused path.

Weights (qkv [D,3D] + proj [D,D] ≈ 1.3 MB bf16) are broadcast to every grid
program; batch items are processed in blocks sized to fit VMEM.

Differentiable via custom VJP: backward recomputes through an XLA reference
composition (`attention_branch_xla`) — memory-cheap at these sizes and
keeps the forward kernel simple (same pattern as ops/attention.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def attention_branch_xla(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads: int):
    """Reference composition (also the VJP recompute path).
    x_ln: [B, S, D] (post-LayerNorm). Returns [B, S, D]."""
    B, S, D = x_ln.shape
    Dh = D // num_heads
    qkv = jnp.einsum("bsd,de->bse", x_ln, w_qkv,
                     preferred_element_type=jnp.float32) + b_qkv
    qkv = qkv.astype(x_ln.dtype).reshape(B, S, 3, num_heads, Dh)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    scale = 1.0 / math.sqrt(Dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x_ln.dtype)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, S, D)
    out = jnp.einsum("bsd,de->bse", o, w_proj,
                     preferred_element_type=jnp.float32) + b_proj
    return out.astype(x_ln.dtype)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
            *, num_heads: int, seq_len: int, block_b: int):
    D = x_ref.shape[-1]
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)
    Sp = x_ref.shape[1]
    neg = jnp.float32(-1e30)
    key_valid = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1) < seq_len
    wqkv = wqkv_ref[:]
    bqkv = bqkv_ref[:]
    wproj = wproj_ref[:]
    bproj = bproj_ref[:]
    for g in range(block_b):
        xg = x_ref[g]                                        # [Sp, D]
        qkv = jax.lax.dot_general(
            xg, wqkv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv                                             # [Sp, 3D] f32
        qkv = qkv.astype(xg.dtype)
        attn_out = []
        for h in range(num_heads):
            q = qkv[:, h * Dh:(h + 1) * Dh]
            k = qkv[:, D + h * Dh: D + (h + 1) * Dh]
            v = qkv[:, 2 * D + h * Dh: 2 * D + (h + 1) * Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(key_valid, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xg.dtype)
            attn_out.append(
                jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(xg.dtype)
            )
        merged = jnp.concatenate(attn_out, axis=-1)          # [Sp, D]
        out = jax.lax.dot_general(
            merged, wproj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj
        o_ref[g] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_b", "interpret"))
def _branch_pallas(x_ln, w_qkv, b_qkv, w_proj, b_proj,
                   num_heads: int, block_b: int = 8, interpret: bool = False):
    B, S, D = x_ln.shape
    from timetuning_tpu.ops.fused_block import _seq_pad

    Sp = _seq_pad(S, x_ln.dtype)
    xp = jnp.pad(x_ln, ((0, 0), (0, Sp - S), (0, 0)))
    Bp = ((B + block_b - 1) // block_b) * block_b
    if Bp != B:
        xp = jnp.pad(xp, ((0, Bp - B), (0, 0), (0, 0)))
    wq = w_qkv.astype(x_ln.dtype)
    wp = w_proj.astype(x_ln.dtype)
    bq = b_qkv.astype(jnp.float32).reshape(1, -1)
    bp = b_proj.astype(jnp.float32).reshape(1, -1)

    x_spec = pl.BlockSpec((block_b, Sp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda i: tuple(0 for _ in s),  # noqa: E731
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, seq_len=S,
                          block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp, D), x_ln.dtype),
        grid=(Bp // block_b,),
        in_specs=[x_spec, full(D, 3 * D), full(1, 3 * D),
                  full(D, D), full(1, D)],
        out_specs=x_spec,
        interpret=interpret,
    )(xp, wq, bq, wp, bp)
    return out[:B, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def attention_branch(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads: int):
    return _branch_pallas(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads)


def _fwd(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads):
    out = _branch_pallas(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads)
    return out, (x_ln, w_qkv, b_qkv, w_proj, b_proj)


def _bwd(num_heads, res, g):
    x_ln, w_qkv, b_qkv, w_proj, b_proj = res
    _, vjp = jax.vjp(
        lambda *a: attention_branch_xla(*a, num_heads=num_heads),
        x_ln, w_qkv, b_qkv, w_proj, b_proj,
    )
    return vjp(g.astype(x_ln.dtype))


attention_branch.defvjp(_fwd, _bwd)


def fused_available(seq_len: int | None = None) -> bool:
    """Whole-branch fusion holds the [Sp, Sp] score tile in VMEM — valid up
    to 1024 tokens; longer sequences route to the flash kernel via the
    ops.attention dispatcher."""
    ok = pltpu is not None and jax.default_backend() == "tpu"
    if seq_len is not None:
        ok = ok and seq_len <= 1024
    return ok
