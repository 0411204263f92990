"""Slot attention + the motion-grouping autoencoder baseline.

Reference: models.py:1219-1289 (``SlotAttention``) and
motion_grouping_model.py:18-250 (``SoftPositionEmbed``,
``SlotAttentionAutoEncoder`` with CNN encoder / spatial-broadcast decoder),
loaded via ``get_backbone("motion_grouping")`` (models.py:876-884).

The slot iteration is a ``lax.scan``; GRU update is flax's GRUCell.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SlotAttention(nn.Module):
    num_slots: int = 5
    dim: int = 64
    iters: int = 3
    hidden_dim: int = 128
    eps: float = 1e-8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, rng=None, num_slots: int | None = None):
        B, N, D = inputs.shape
        K = num_slots or self.num_slots
        scale = self.dim ** -0.5
        mu = self.param("slots_mu", nn.initializers.xavier_uniform(), (1, 1, self.dim))
        log_sigma = self.param(
            "slots_logsigma", nn.initializers.xavier_uniform(), (1, 1, self.dim)
        )
        if rng is None:
            rng = self.make_rng("slots") if self.has_rng("slots") else jax.random.PRNGKey(0)
        slots = mu + jnp.exp(log_sigma) * jax.random.normal(rng, (B, K, self.dim))

        inputs = nn.LayerNorm(name="norm_input")(inputs)
        k = nn.Dense(self.dim, use_bias=False, name="to_k")(inputs)
        v = nn.Dense(self.dim, use_bias=False, name="to_v")(inputs)
        to_q = nn.Dense(self.dim, use_bias=False, name="to_q")
        norm_slots = nn.LayerNorm(name="norm_slots")
        norm_pre_ff = nn.LayerNorm(name="norm_pre_ff")
        gru = nn.GRUCell(self.dim, name="gru")
        mlp1 = nn.Dense(self.hidden_dim, name="mlp1")
        mlp2 = nn.Dense(self.dim, name="mlp2")

        # static unroll: linen submodules cannot be applied inside a raw
        # lax.scan body, and `iters` is tiny (default 3)
        attn = None
        for _ in range(self.iters):
            prev = slots
            q = to_q(norm_slots(slots))
            attn = jax.nn.softmax(
                jnp.einsum("bkd,bnd->bkn", q, k) * scale, axis=1
            ) + self.eps
            attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
            updates = jnp.einsum("bkn,bnd->bkd", attn, v)
            new, _ = gru(prev.reshape(-1, self.dim), updates.reshape(-1, self.dim))
            slots = new.reshape(B, K, self.dim)
            slots = slots + mlp2(nn.relu(mlp1(norm_pre_ff(slots))))
        return slots, attn


class SoftPositionEmbed(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[-3:-1]
        ys = jnp.linspace(0.0, 1.0, H)
        xs = jnp.linspace(0.0, 1.0, W)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        grid = jnp.stack([gy, gx, 1 - gy, 1 - gx], axis=-1)       # [H, W, 4]
        pos = nn.Dense(self.hidden_size, name="proj")(grid)
        return x + pos[None]


class _EncoderCNN(nn.Module):
    """The reference encoder CNN, checkpoint-faithful (reference
    motion_grouping_model.py:160-218 ``make_encoder`` with
    ``encoder_arch=[64, 'MP', 128, 'MP', 256]``): per stage a PAIR of 5×5
    convs each followed by affine InstanceNorm + ReLU, with a ceil-mode 2×2
    max-pool between stages — output stride 4, 256 channels
    (``encoder_dims``). A standalone submodule so both the autoencoder and
    the backbone-zoo adapter can own an instance (flax allows one @compact
    method per module)."""

    arch: tuple = (64, "MP", 128, "MP", 256)

    @nn.compact
    def __call__(self, x):
        i = 0
        for v in self.arch:
            if v == "MP":
                # SAME-padded max_pool == torch ceil_mode=True (the -inf
                # pad never wins the max)
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                continue
            for _ in range(2):
                x = nn.Conv(v, (5, 5), padding="SAME", name=f"conv{i}")(x)
                # InstanceNorm(affine) == GroupNorm with one group per
                # channel (torch InstanceNorm2d eps)
                x = nn.GroupNorm(num_groups=v, epsilon=1e-5,
                                 name=f"in{i}")(x)
                x = nn.relu(x)
                i += 1
        return x

    @property
    def out_dim(self) -> int:
        return int(self.arch[-1])


def motion_grouping_encoder_from_torch(sd) -> dict:
    """Map a motion-grouping checkpoint's ``encoder_cnn.*`` Sequential keys
    (reference models.py:876-884 loads ``checkpoint['model_state_dict']``)
    onto the :class:`_EncoderCNN` params tree. Conv/InstanceNorm entries sit
    at fixed Sequential indices for ``[64, 'MP', 128, 'MP', 256]``."""
    import numpy as np

    conv_idx = (0, 3, 7, 10, 14, 17)
    in_idx = (1, 4, 8, 11, 15, 18)
    params: dict = {}
    for j, (ci, ni) in enumerate(zip(conv_idx, in_idx)):
        params[f"conv{j}"] = {
            "kernel": np.transpose(
                np.asarray(sd[f"encoder_cnn.{ci}.weight"]), (2, 3, 1, 0)
            ),
            "bias": np.asarray(sd[f"encoder_cnn.{ci}.bias"]),
        }
        params[f"in{j}"] = {
            "scale": np.asarray(sd[f"encoder_cnn.{ni}.weight"]),
            "bias": np.asarray(sd[f"encoder_cnn.{ni}.bias"]),
        }
    return params


class SlotAttentionAutoEncoder(nn.Module):
    """Object-discovery autoencoder (reference motion_grouping_model.py:144-250)."""

    resolution: tuple[int, int] = (128, 128)
    num_slots: int = 5
    iters: int = 3
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, x, rng=None):
        B = x.shape[0]
        enc = _EncoderCNN(name="encoder")
        h = enc(x)
        h = SoftPositionEmbed(enc.out_dim, name="enc_pos")(h)
        H, W = h.shape[1:3]
        tokens = h.reshape(B, H * W, enc.out_dim)
        tokens = nn.LayerNorm(name="enc_norm")(tokens)
        tokens = nn.Dense(self.hidden_dim, name="enc_fc1")(tokens)
        tokens = nn.relu(tokens)
        tokens = nn.Dense(self.hidden_dim, name="enc_fc2")(tokens)

        slots, attn = SlotAttention(
            self.num_slots, self.hidden_dim, self.iters, name="slot_attention"
        )(tokens, rng=rng)

        # spatial broadcast decode at 1/16 res, upsample by conv-transpose
        dec_res = (self.resolution[0] // 16, self.resolution[1] // 16)
        d = jnp.broadcast_to(
            slots.reshape(B * self.num_slots, 1, 1, self.hidden_dim),
            (B * self.num_slots, dec_res[0], dec_res[1], self.hidden_dim),
        )
        d = SoftPositionEmbed(self.hidden_dim, name="dec_pos")(d)
        for i in range(4):
            d = nn.ConvTranspose(
                self.hidden_dim, (5, 5), strides=(2, 2), name=f"dec{i}"
            )(d)
            d = nn.relu(d)
        d = nn.Conv(4, (3, 3), padding="SAME", name="dec_out")(d)
        d = d.reshape(B, self.num_slots, *d.shape[1:])
        recon, masks = d[..., :3], jax.nn.softmax(d[..., 3:], axis=1)
        combined = jnp.sum(recon * masks, axis=1)
        return combined, recon, masks, slots


class MotionGroupingBackbone(nn.Module):
    """Backbone-zoo adapter (reference models.py:1055-1061): the slot
    autoencoder's encoder CNN, bilinearly interpolated to the reference's
    fixed 56×56 grid and flattened to tokens. Satisfies the generic
    ``Backbone.apply`` contract (want_attention kwarg + dict output) that
    the raw autoencoder (a 4-tuple reconstruction model) does not."""

    autoencoder: SlotAttentionAutoEncoder
    grid: int = 56

    @nn.compact
    def __call__(self, x, want_attention: bool = False):
        del want_attention
        # same submodule type + name as inside the autoencoder, so a trained
        # autoencoder's {encoder: ...} subtree transfers verbatim
        h = _EncoderCNN(name="encoder")(x)
        B, _, _, C = h.shape
        h = jax.image.resize(h, (B, self.grid, self.grid, C), method="bilinear")
        return {
            "tokens": h.reshape(B, self.grid * self.grid, C),
            "attention": None,
            "grid": (self.grid, self.grid),
        }
