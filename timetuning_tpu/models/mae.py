"""Masked-Autoencoder ViT (encoder + decoder) in Flax.

Reference: models.py:1378-1600 (``MaskedAutoencoderViT`` + mae_vit_base/
large/huge). The backbone-zoo path only uses the *encoder* with mask_ratio=0
(``forward_encoder(input, 0)``, models.py:989-993) as a frozen dense-feature
extractor; the decoder + random masking are provided for pre-training parity.

TPU notes: random masking keeps static shapes (gather of a fixed
``len_keep`` prefix of a shuffled index permutation); sin-cos positional
embeddings are trace-time constants.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from timetuning_tpu.models.embeds import get_2d_sincos_pos_embed
from timetuning_tpu.models.vit import Block


class MAEViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    def setup(self):
        p = self.patch_size
        self.grid = self.img_size // p
        self.patch_embed = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        self.blocks = [
            Block(self.num_heads, self.mlp_ratio, True, self.dtype, "xla",
                  name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        # decoder
        self.decoder_embed = nn.Dense(self.decoder_embed_dim, dtype=self.dtype,
                                      name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_embed_dim)
        )
        self.decoder_blocks = [
            Block(self.decoder_num_heads, self.mlp_ratio, True, self.dtype, "xla",
                  name=f"decoder_blocks_{i}")
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        self.decoder_pred = nn.Dense(p * p * 3, dtype=self.dtype, name="decoder_pred")

    def _pos(self, dim, cls, grid=None):
        """Sin-cos table for a (possibly input-dependent) patch grid — the
        embedding is a pure function of position, so regenerating at the
        runtime grid is the exact analogue of learned-pos-embed
        interpolation and lets the encoder run at any resolution (the
        eval/CBFE 448 configurations); trace-time constant either way."""
        grid = self.grid if grid is None else grid
        return jnp.asarray(get_2d_sincos_pos_embed(dim, grid, cls_token=cls))[None]

    def random_masking(self, x, mask_ratio: float, rng):
        B, N, D = x.shape
        len_keep = int(N * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (B, N))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        mask = jnp.ones((B, N)).at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    def forward_encoder(self, x, mask_ratio: float = 0.0, rng=None):
        B, H, _, _ = x.shape
        grid = H // self.patch_size
        x = self.patch_embed(x)
        x = x.reshape(B, -1, self.embed_dim)
        pos = self._pos(self.embed_dim, True, grid)
        x = x + pos[:, 1:].astype(x.dtype)
        if mask_ratio > 0:
            if rng is None:
                raise ValueError(
                    "mask_ratio > 0 requires an rng key for random_masking"
                )
            x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        else:
            mask, ids_restore = None, None
        cls = self.cls_token + pos[:, :1]
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        for blk in self.blocks:
            x, _ = blk(x)
        return self.norm(x), mask, ids_restore

    def forward_decoder(self, x, ids_restore):
        B = x.shape[0]
        x = self.decoder_embed(x)
        N = ids_restore.shape[1]
        n_masked = N + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (B, n_masked, self.decoder_embed_dim)
        ).astype(x.dtype)
        x_ = jnp.concatenate([x[:, 1:], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        g = int(round(N ** 0.5))
        x = x + self._pos(self.decoder_embed_dim, True, g).astype(x.dtype)
        for blk in self.decoder_blocks:
            x, _ = blk(x)
        return self.decoder_pred(self.decoder_norm(x))[:, 1:]

    def patchify(self, imgs):
        p = self.patch_size
        B, H, W, C = imgs.shape
        h, w = H // p, W // p
        x = imgs.reshape(B, h, p, w, p, C)
        return jnp.einsum("bhpwqc->bhwpqc", x).reshape(B, h * w, p * p * C)

    def reconstruction_loss(self, imgs, pred, mask, norm_pix_loss: bool = True):
        target = self.patchify(imgs)
        if norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        loss = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def pretrain(self, x, mask_ratio: float = 0.75, rng=None, norm_pix_loss: bool = True):
        """Full MAE objective: mask → encode → decode → pixel loss
        (reference ``forward``, models.py:1560-1570)."""
        tokens, mask, ids_restore = self.forward_encoder(x, mask_ratio, rng)
        pred = self.forward_decoder(tokens, ids_restore)
        loss = self.reconstruction_loss(x, pred, mask, norm_pix_loss)
        return loss, pred, mask

    def __call__(self, x, want_attention: bool = False, mask_ratio: float = 0.0, rng=None):
        """Backbone-zoo contract: dict with normed tokens (CLS first)."""
        del want_attention
        tokens, _, _ = self.forward_encoder(x, mask_ratio, rng)
        g = x.shape[1] // self.patch_size
        return {"tokens": tokens, "attention": None, "intermediates": [tokens],
                "grid": (g, g)}


def mae_vit_base(**kw):
    return MAEViT(embed_dim=768, depth=12, num_heads=12, **kw)


def mae_vit_large(**kw):
    return MAEViT(embed_dim=1024, depth=24, num_heads=16, **kw)


def mae_vit_huge(**kw):
    return MAEViT(embed_dim=1280, depth=32, num_heads=16, patch_size=14, **kw)
