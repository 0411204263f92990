"""DINO-style Vision Transformer in Flax, TPU-first.

Capability parity with the reference's DINO ViT (reference:
dino_vision_transformer.py:108-294) — dense patch tokens, last-layer
self-attention exposure, bicubic positional-embedding interpolation for
arbitrary input resolutions — but built for XLA:

  * the whole forward is one traced program; intermediate-layer outputs are
    collected functionally instead of via forward hooks;
  * attention runs through the fused Pallas kernel on TPU
    (timetuning_tpu.ops.attention) with an XLA path when probabilities are
    needed;
  * compute dtype is configurable (bf16 on the MXU by default in training),
    parameters stay f32.

Checkpoint import from the released PyTorch weights (DINO / timm /
``TimeT.pth``) lives in timetuning_tpu.models.import_torch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from timetuning_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    img_size: int = 224
    dtype: Any = jnp.float32  # compute dtype; params are always f32
    attn_impl: str = "auto"   # auto | xla | pallas
    remat: bool = False       # rematerialize blocks (memory ↔ FLOPs trade)
    # Mixture-of-Experts (beyond reference; parallel/ep.py): every k-th
    # block's MLP becomes a Switch top-1 MoE with n_experts expert FFNs
    # (blocks k-1, 2k-1, ... — the standard "every k-th layer" placement).
    # 0/0 = dense everywhere (the reference architecture).
    moe_every_k: int = 0
    n_experts: int = 0
    moe_capacity_factor: float = 1.25


def is_moe_block(cfg: "ViTConfig", i: int) -> bool:
    return (
        cfg.moe_every_k > 0
        and cfg.n_experts > 1
        and i % cfg.moe_every_k == cfg.moe_every_k - 1
    )


def interpolate_pos_embed(
    pos_embed: jax.Array, h_patches: int, w_patches: int, patch_size: int
) -> jax.Array:
    """Bicubic-resample the (non-CLS) positional grid to a new resolution.

    Matches reference ``interpolate_pos_encoding``
    (dino_vision_transformer.py:214-234) EXACTLY: torch's bicubic kernel
    (A=-0.75, half-pixel centers, border-clamped taps — ``jax.image.resize``
    'cubic' is the A=-0.5 Keys kernel) AND DINO's ``+0.1`` scale-factor
    fudge (:226-231; torch uses the passed scale factor directly in the
    coordinate mapping, so the fudged step differs from size-based mapping
    by up to ~0.2 on small grids); the CLS position passes through
    unchanged.
    """
    from timetuning_tpu.ops.resize import resize_bicubic_torch

    n = pos_embed.shape[1] - 1
    dim = pos_embed.shape[-1]
    n0 = int(round(n ** 0.5))
    if n0 * n0 == n and (h_patches, w_patches) == (n0, n0):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    grid = pos_embed[:, 1:].reshape(1, n0, n0, dim)
    grid = resize_bicubic_torch(
        grid, (h_patches, w_patches),
        scales=((h_patches + 0.1) / n0, (w_patches + 0.1) / n0),
    )
    grid = grid.reshape(1, h_patches * w_patches, dim)
    return jnp.concatenate([cls_pos, grid], axis=1)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return x


class _DenseParams(nn.Module):
    """Declares Dense-compatible {kernel, bias} params without applying them
    (the fused kernel consumes raw weights; tree layout matches nn.Dense)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_dim, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, return_probs: bool = False):
        # NOTE: no whole-branch Pallas dispatch here — Block's fused-block
        # gate fires under a strict superset of the conditions where one
        # could apply (bf16/forced + TPU; >1024 tokens routed to flash), so
        # a duplicate dispatch at this level is dead on TPU and can only
        # crash on CPU. The ops.attention dispatcher below still honors
        # attn_impl (with clear errors for unavailable/probs-incompatible
        # forced kernels).
        B, S, D = x.shape
        Dh = D // self.num_heads
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, S, 3, self.num_heads, Dh)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )  # each [B, H, S, Dh]
        out, probs = attention(
            q, k, v, return_probs=return_probs, impl=self.attn_impl
        )
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, D)
        out = nn.Dense(D, dtype=self.dtype, name="proj")(out)
        return out, probs


class _LNParams(nn.Module):
    """LayerNorm-compatible {scale, bias} params for fused kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _AttnParams(nn.Module):
    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(3 * self.dim, self.qkv_bias, name="qkv")(self.dim)
        wp, bp = _DenseParams(self.dim, True, name="proj")(self.dim)
        return wq, bq, wp, bp


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, True, name="fc1")(self.dim)
        w2, b2 = _DenseParams(self.dim, True, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # static module field (not a call arg) so the block stays remat-friendly
    want_probs: bool = False
    # Switch MoE MLP instead of the dense MLP (ViTConfig.moe_every_k):
    # the attention branch is unchanged (fused kernels still apply); the
    # MLP branch becomes parallel/ep.MoEMlp, whose expert-stacked weights
    # shard P('expert') under expert parallelism. GSPMD partitions the
    # dispatch/combine einsums, so the MoE branch runs the XLA path.
    moe: bool = False
    n_experts: int = 0
    moe_capacity: float = 1.25

    def _mlp_branch(self, x):
        """LN2 + (dense | MoE) MLP + residual — the XLA-path MLP branch."""
        D = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.moe:
            from timetuning_tpu.parallel.ep import MoEMlp

            y = MoEMlp(
                n_experts=self.n_experts,
                hidden_dim=int(D * self.mlp_ratio),
                capacity_factor=self.moe_capacity,
                dtype=self.dtype,
                # per-sample routing groups: dispatch stays linear in batch
                # (one global group is quadratic in tokens — see MoEMlp)
                group_size=-1,
                name="moe",
            )(y)
        else:
            y = Mlp(int(D * self.mlp_ratio), D, self.dtype, name="mlp")(y)
        return x + y

    @nn.compact
    def __call__(self, x, return_probs: bool | None = None):
        rp = self.want_probs if return_probs is None else return_probs
        D = x.shape[-1]

        if self.attn_impl in ("auto", "fused") and not rp:
            from timetuning_tpu.ops.fused_block import (
                attention_block_branch,
                attention_block_branch_flash,
                fused_block_available,
                mlp_block_branch,
            )

            S = x.shape[1]
            # same dtype contract as Attention: bf16 → fused, f32 → XLA.
            # ≤1024 tokens: two whole-block kernels; above, the [S, S] score
            # tile no longer fits VMEM, so the attention branch becomes
            # fused-LN+QKV rows → flash core → fused-proj+residual rows, and
            # the MLP branch a row-chunked kernel (VMEM constant in S)
            bf16 = self.dtype == jnp.bfloat16
            force = self.attn_impl == "fused"
            if (bf16 or force) and fused_block_available():
                s1, bl1 = _LNParams(D, name="norm1")()
                wq, bq, wp, bp = _AttnParams(D, self.qkv_bias, name="attn")()
                bq = jnp.zeros((3 * D,), jnp.float32) if bq is None else bq
                branch = (
                    attention_block_branch if S <= 1024
                    else attention_block_branch_flash
                )
                x = branch(
                    x.astype(self.dtype), s1, bl1, wq.astype(self.dtype), bq,
                    wp.astype(self.dtype), bp, self.num_heads,
                )
                if self.moe:
                    return self._mlp_branch(x), None
                s2, bl2 = _LNParams(D, name="norm2")()
                w1, b1, w2, b2 = _MlpParams(
                    D, int(D * self.mlp_ratio), name="mlp"
                )()
                x = mlp_block_branch(
                    x, s2, bl2, w1.astype(self.dtype), b1,
                    w2.astype(self.dtype), b2,
                )
                return x, None

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y, probs = Attention(
            self.num_heads, self.qkv_bias, self.dtype, self.attn_impl, name="attn"
        )(y, return_probs=rp)
        x = x + y
        return self._mlp_branch(x), probs


class VisionTransformer(nn.Module):
    """DINO ViT.

    ``__call__(x)`` with x: [B, H, W, 3] (NHWC — TPU conv layout) returns a
    dict with:
      ``tokens``      [B, 1+N, D]  final-norm tokens (CLS first),
      ``attention``   [B, heads, 1+N, 1+N] last-block attention probabilities
                      (only when ``want_attention=True``),
      ``intermediates`` list of [B, 1+N, D] normed outputs of the last
                      ``n_intermediates`` blocks.
    """

    config: ViTConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        want_attention: bool = False,
        n_intermediates: int = 1,
        start_block: int = 0,
        stop_block: int | None = None,
    ):
        """``start_block``/``stop_block`` run a sub-range of the blocks:

          * ``stop_block=k`` — embed + blocks [0, k); returns
            ``{"hidden": [B, 1+N, D], "grid": (hp, wp)}`` (pre-norm).
          * ``start_block=k`` — ``x`` is a hidden-token tensor [B, 1+N, D];
            runs blocks [k, depth) + final norm.

        This lets callers compute a frozen trunk once and fan several
        differently-parameterized tails out of it (core/timet.py shares
        blocks [0, split) across the student / teacher / no-grad passes when
        only a suffix of the backbone is trainable).
        """
        cfg = self.config
        hp = wp = None
        if start_block == 0:
            B, H, W, _ = x.shape
            p = cfg.patch_size
            x = nn.Conv(
                cfg.embed_dim,
                kernel_size=(p, p),
                strides=(p, p),
                dtype=cfg.dtype,
                name="patch_embed",
            )(x)
            hp, wp = x.shape[1], x.shape[2]
            x = x.reshape(B, hp * wp, cfg.embed_dim)

            cls_token = self.param(
                "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, cfg.embed_dim)
            )
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, 1 + (cfg.img_size // p) ** 2, cfg.embed_dim),
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(x.dtype), x],
                axis=1,
            )
            x = x + interpolate_pos_embed(pos_embed, hp, wp, p).astype(x.dtype)

        stop = cfg.depth if stop_block is None else stop_block
        interm = []
        probs = None
        norm = nn.LayerNorm(dtype=cfg.dtype, name="norm")
        block_cls = nn.remat(Block) if cfg.remat else Block
        for i in range(start_block, stop):
            is_last = i == cfg.depth - 1
            x, p_i = block_cls(
                cfg.num_heads,
                cfg.mlp_ratio,
                cfg.qkv_bias,
                cfg.dtype,
                cfg.attn_impl,
                want_probs=want_attention and is_last,
                moe=is_moe_block(cfg, i),
                n_experts=cfg.n_experts,
                moe_capacity=cfg.moe_capacity_factor,
                name=f"blocks_{i}",
            )(x)
            if p_i is not None:
                probs = p_i
            if i >= cfg.depth - n_intermediates:
                interm.append(norm(x))

        if stop < cfg.depth:
            return {"hidden": x, "grid": (hp, wp)}
        return {
            "tokens": interm[-1],
            "attention": probs,
            "intermediates": interm,
            "grid": (hp, wp),
        }


def vit_tiny(patch_size: int = 16, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(patch_size: int = 16, **kw) -> ViTConfig:
    """DINO ViT-S — the reference's primary backbone (time_tuning.py:675)."""
    return ViTConfig(patch_size=patch_size, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(patch_size: int = 16, **kw) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, embed_dim=768, depth=12, num_heads=12, **kw)
