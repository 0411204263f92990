"""Generic transformer encoder/decoder + Gumbel sampling utilities.

Reference: transformer.py (312 LoC, imported by nothing — SURVEY.md §2.1
item 18 flags it as an orphan). Provided for inventory parity as a compact
Flax equivalent: gumbel max/softmax sampling, MultiHeadAttention with
optional masking, learned positional encoding, encoder and
causally-masked decoder stacks.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def sample_gumbel(key, shape, eps=1e-20):
    u = jax.random.uniform(key, shape)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax(key, logits, temperature=1.0, hard=False):
    y = jax.nn.softmax((logits + sample_gumbel(key, logits.shape)) / temperature, -1)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, -1), logits.shape[-1])
        y = jax.lax.stop_gradient(y_hard - y) + y
    return y


def gumbel_max(key, logits):
    return jnp.argmax(logits + sample_gumbel(key, logits.shape), axis=-1)


class LearnedPositionalEncoding(nn.Module):
    max_len: int = 512

    @nn.compact
    def __call__(self, x):
        pos = self.param(
            "embedding", nn.initializers.normal(0.02), (self.max_len, x.shape[-1])
        )
        return x + pos[: x.shape[1]][None]


class MultiHeadAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        D = q.shape[-1]
        H = self.num_heads
        Dh = D // H

        def split(x, name):
            return nn.Dense(D, dtype=self.dtype, name=name)(x).reshape(
                x.shape[0], x.shape[1], H, Dh
            ).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, "wq"), split(k, "wk"), split(v, "wv")
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(Dh).astype(qh.dtype)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], D)
        return nn.Dense(D, dtype=self.dtype, name="wo")(out), attn


class EncoderLayer(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        y, _ = MultiHeadAttention(self.num_heads, self.dtype, name="attn")(x, x, x, mask)
        x = nn.LayerNorm(name="norm1")(x + y)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(nn.relu(y))
        return nn.LayerNorm(name="norm2")(x + y)


class TransformerEncoder(nn.Module):
    depth: int = 6
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        x = LearnedPositionalEncoding(name="pos")(x)
        for i in range(self.depth):
            x = EncoderLayer(self.num_heads, self.mlp_dim, self.dtype,
                             name=f"layer{i}")(x, mask)
        return x


class DecoderLayer(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_mask=None, cross_mask=None):
        y, _ = MultiHeadAttention(self.num_heads, self.dtype, name="self_attn")(
            x, x, x, self_mask
        )
        x = nn.LayerNorm(name="norm1")(x + y)
        y, _ = MultiHeadAttention(self.num_heads, self.dtype, name="cross_attn")(
            x, memory, memory, cross_mask
        )
        x = nn.LayerNorm(name="norm2")(x + y)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(nn.relu(y))
        return nn.LayerNorm(name="norm3")(x + y)


class TransformerDecoder(nn.Module):
    depth: int = 6
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        S = x.shape[1]
        causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
        x = LearnedPositionalEncoding(name="pos")(x)
        for i in range(self.depth):
            x = DecoderLayer(self.num_heads, self.mlp_dim, self.dtype,
                             name=f"layer{i}")(x, memory, causal)
        return x
