"""XLA reference composition of the ViT attention residual branch.

``attention_branch_xla`` computes ``proj(attention(qkv(x_ln)))`` — the
whole attention branch after LayerNorm — as plain XLA ops. It is the VJP
recompute path and numerical reference for the whole-block fused kernel
(ops/fused_block.attention_block_branch).

History: this module once also carried a standalone whole-branch Pallas
kernel. It was superseded by the whole-BLOCK kernels in ops/fused_block
(which additionally keep LayerNorm and the residual add in VMEM and fire
under a strict superset of its dispatch conditions), leaving the kernel
unreachable from the model code; it was removed rather than maintained
dead. See ops/fused_block.py for the live kernels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def attention_branch_xla(x_ln, w_qkv, b_qkv, w_proj, b_proj, num_heads: int):
    """Reference composition (also the fused-block VJP recompute path).
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
