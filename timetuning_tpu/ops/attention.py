"""Fused multi-head self-attention for ViT backbones.

Two interchangeable paths:

  * ``attention_xla`` — plain einsum attention; XLA fuses it well, and it can
    return the full attention probabilities (needed for the last layer's
    CLS-attention foreground masks, reference models.py:93-131).
  * ``attention_pallas`` — a Pallas TPU kernel that keeps the whole
    [S, S] score tile in VMEM (ViT sequences here are 197–785 tokens, far
    below the flash-attention regime) and fuses QKᵀ → mask → softmax → ·V in
    one pass, gridded over blocks of (batch × heads). This avoids three HBM
    round-trips of the [B, H, S, S] score tensor — the usual HBM-bandwidth
    win on short sequences.

Sequence length is padded to a multiple of 128 (lane width); padded keys are
masked to -inf before the softmax, padded queries produce garbage rows that
the caller slices off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from timetuning_tpu.ops.util import pad_to_multiple
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def attention_xla(
    q: jax.Array, k: jax.Array, v: jax.Array, return_probs: bool = False
):
    """q, k, v: [B, H, S, Dh]. Returns ([B, H, S, Dh], probs or None)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out, (probs if return_probs else None)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """One grid step: a block of G (batch·head) pairs, full sequence in VMEM."""
    G = q_ref.shape[0]
    S = q_ref.shape[1]
    neg = jnp.float32(-1e30)
    key_valid = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) < seq_len
    for g in range(G):  # static unroll over the block's batch-head pairs
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(key_valid, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[g] = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_g",))
def attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                     block_g: int | None = None):
    """Fused attention. q, k, v: [B, H, S, Dh] → [B, H, S, Dh].

    Forward-only fused kernel (the backbone's frozen/low-lr blocks dominate;
    autodiff falls back to XLA attention — see ``attention`` dispatcher).
    """
    B, H, S, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    Sp = pad_to_multiple(S)
    Dp = pad_to_multiple(Dh)
    G = B * H
    if block_g is None:
        # Scale the batch-head block with the sequence so VMEM stays
        # bounded: 4 operand/output blocks of block_g*Sp*Dp (double-
        # buffered) plus the per-item [Sp, Sp] f32 score tile must fit the
        # ~16 MB budget. A fixed block_g=16 overflowed for 512 < S <= 1024
        # when this path is forced (attn_impl="pallas").
        per_g = 4 * Sp * Dp * q.dtype.itemsize * 2
        block_g = max(1, min(16, (8 * 1024 * 1024) // max(per_g, 1)))

    def prep(x):
        x = x.reshape(G, S, Dh)
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, Dp - Dh)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    # Pad the grid axis so it divides evenly.
    Gp = pad_to_multiple(G, block_g)
    if Gp != G:
        pad = ((0, Gp - G), (0, 0), (0, 0))
        qp, kp, vp = jnp.pad(qp, pad), jnp.pad(kp, pad), jnp.pad(vp, pad)

    spec = pl.BlockSpec(
        (block_g, Sp, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, seq_len=S),
        out_shape=jax.ShapeDtypeStruct((Gp, Sp, Dp), q.dtype),
        grid=(Gp // block_g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(qp, kp, vp)
    return out[:G, :S, :Dh].reshape(B, H, S, Dh)


@jax.custom_vjp
def _attention_fused(q, k, v):
    return attention_pallas(q, k, v)


def _attention_fused_fwd(q, k, v):
    return attention_pallas(q, k, v), (q, k, v)


def _attention_fused_bwd(res, g):
    # Analytic softmax-attention backward, recomputing probabilities with XLA
    # (memory-cheap at these sequence lengths; keeps the fwd kernel simple).
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g32, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    return_probs: bool = False,
    impl: str = "auto",
):
    """Dispatch: pallas fused kernel on TPU (differentiable via custom VJP)
    unless probabilities are requested; XLA otherwise. Sequences longer than
    1024 tokens route to the tiled-online-softmax flash kernel
    (ops/flash_attention) whose VMEM footprint is linear in S.
    ``impl``: auto | xla | pallas."""
    if impl == "fused":
        # callers forcing the fused path (e.g. Block with attn_impl='fused'
        # above the whole-block 1024-token bound) mean "use the kernels"
        impl = "pallas"
    if impl == "pallas" and pltpu is None:
        raise RuntimeError(
            "attention impl forced to a Pallas kernel but the pallas TPU "
            "backend is unavailable on this build — use impl='xla' or 'auto'"
        )
    if impl == "pallas" and return_probs:
        raise RuntimeError(
            "attention probabilities are only available through the XLA "
            "path (the fused/flash kernels never materialize them); with a "
            "forced kernel impl, request probs via impl='xla'/'auto' — e.g. "
            "mask_features needs the last block's probs, so combine "
            "attn_impl='fused'/'pallas' with grad_attn_impl/want_attention "
            "paths that run XLA"
        )
    if impl == "auto":
        on_tpu = pltpu is not None and jax.default_backend() == "tpu"
        # dtype contract: bf16 → fused kernels; f32 stays on the
        # bit-faithful XLA path EXCEPT above 1024 tokens, where flash is
        # the only VMEM-feasible kernel (exact online softmax, ~6e-4 f32
        # reordering drift vs 1e-2 for the whole-block fusion)
        wants_kernel = q.dtype == jnp.bfloat16 or q.shape[2] > 1024
        impl = "pallas" if (on_tpu and not return_probs and wants_kernel) else "xla"
    if impl == "pallas":
        if q.shape[2] > 1024:
            from timetuning_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v), None
        return _attention_fused(q, k, v), None
    return attention_xla(q, k, v, return_probs=return_probs)
