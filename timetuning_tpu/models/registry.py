"""Backbone zoo: ``get_backbone`` dispatch over the 13 reference
architectures + per-arch weight import + feature-extraction recipes.

Reference: models.py:773-900 (``get_backbone``), models.py:76
(``spatial_resolutions``), models.py:937-1068 (per-arch ``get_features``
recipes), leopart.py:151-230 (released-weight URL/prefix table).

Zero-egress note: torch.hub downloads are unavailable here; every entry
accepts a local ``model_path`` checkpoint (the reference also supports this
for most entries). URLs are recorded for provenance.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from timetuning_tpu.models import mae as mae_mod
from timetuning_tpu.models import moco as moco_mod
from timetuning_tpu.models import resnet as resnet_mod
from timetuning_tpu.models.import_torch import (
    load_torch_state_dict,
    strip_prefixes,
    vit_params_from_torch,
)
from timetuning_tpu.models.resnet import resnet_params_from_torch
from timetuning_tpu.models.slot_attention import SlotAttentionAutoEncoder
from timetuning_tpu.models.vit import VisionTransformer, vit_base, vit_small

# Reference table (models.py:76) — NOTE the resnet values describe the
# 448-input CBFE configuration; actual resolution is computed from the
# architecture at runtime (see `spatial_resolution`).
REFERENCE_SPATIAL_RESOLUTIONS = {
    "resnet18": 14, "resnet50": 14, "dino": 14, "stego": 28, "leopart": 14,
    "vit": 14,
}

# Released-weight provenance (leopart.py:151-216; not downloadable here).
PRETRAINED_URLS = {
    "dino-s16": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "dino-s8": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth",
    "dino-b16": "https://dl.fbaipublicfiles.com/dino/dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "mocov3-s16": "https://dl.fbaipublicfiles.com/moco-v3/vit-s-300ep/vit-s-300ep.pth.tar",
    "mocov3-b16": "https://dl.fbaipublicfiles.com/moco-v3/vit-b-300ep/vit-b-300ep.pth.tar",
    "mae": "https://dl.fbaipublicfiles.com/mae/pretrain/mae_pretrain_vit_base.pth",
    "msn-s16": "https://dl.fbaipublicfiles.com/msn/vits16_800ep.pth.tar",
    "swav": "https://dl.fbaipublicfiles.com/deepcluster/swav_800ep_pretrain.pth.tar",
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
}


@dataclasses.dataclass
class Backbone:
    """A ready-to-apply backbone: module + variables + metadata."""

    module: Any
    variables: dict
    patch_size: int | None
    feature_dim: int
    drop_cls: bool
    name: str
    # Architectures whose token grid is pinned by the reference recipe
    # regardless of input size (motion_grouping → 56, dul → 28;
    # models.py:1055-1068 interpolates to those fixed grids).
    fixed_resolution: int | None = None

    def spatial_resolution(self, input_size: int = 224) -> int:
        if self.fixed_resolution is not None:
            return self.fixed_resolution
        if self.patch_size is not None:
            return input_size // self.patch_size
        return input_size // 32  # standard resnet output stride

    def apply(self, frames, want_attention: bool = False):
        out = self.module.apply(self.variables, frames, want_attention=want_attention)
        feats = out["tokens"]
        if self.drop_cls:
            feats = feats[:, 1:]
        return feats, out.get("attention")


def _init_variables(module, img=224, rng=None):
    rng = rng or jax.random.PRNGKey(0)
    return module.init(rng, jnp.zeros((1, img, img, 3)))


def _vit_backbone(cfg, model_path, name):
    """dtype/attn_impl are carried by ``cfg`` (the callers bake them in).
    Replacing (not merging) the variables on import is valid because the
    ViT has params only — a BN-bearing backbone must merge to keep its
    batch_stats collection (see the resnet path)."""
    module = VisionTransformer(cfg)
    if model_path:
        # skip the (discarded) real init forward — the imported tree fully
        # replaces it, and a ViT-B init costs seconds of startup
        sd = load_torch_state_dict(model_path)
        variables = {"params": vit_params_from_torch(sd)}
    else:
        variables = _init_variables(module)
    return Backbone(module, variables, cfg.patch_size, cfg.embed_dim, True, name)


def get_backbone(name: str, model_path: str | None = None, dtype=jnp.float32) -> Backbone:
    """The 13-architecture dispatch (reference models.py:773-900).

    resnet18 / resnet50 / swav (resnet50 weights) / dino-s8 / dino-s16 /
    dino-b16 / msn-s16 / mae / ibot-s16 / mocov3-s16 / mocov3-b16 / vit
    (timm supervised) / leopart / stego / motion_grouping / dul.

    Spatial resolutions derive from patch size and input resolution (a
    /16 ViT at 224 → 14), rather than the reference's hardcoded table —
    whose "msn-s16": 28 entry contradicts its own /16 patch embedding
    (models.py:76 vs :983-987; 196 tokens cannot form a 28² grid).
    """
    name = name.lower()
    if name in ("resnet18", "resnet50", "swav"):
        module = resnet_mod.resnet18(dtype) if name == "resnet18" else resnet_mod.resnet50(dtype)
        if model_path:
            variables = resnet_params_from_torch(load_torch_state_dict(model_path))
        else:
            variables = _init_variables(module)
        dim = 512 if name == "resnet18" else 2048
        return Backbone(module, variables, None, dim, False, name)

    if name == "vit-tiny-test":
        # minimal ViT for integration tests / dry runs
        from timetuning_tpu.models.vit import ViTConfig

        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32, dtype=dtype, attn_impl="xla")
        return _vit_backbone(cfg, model_path, name)

    if name == "vit-tiny-test-p4":
        # dense-grid test ViT (patch 4): the dino-s8 token-count geometry at
        # test scale — 16x16 patch grid at 64 input, exercising the
        # propagation/eval paths on the denser grid (BASELINE.json s8 row)
        from timetuning_tpu.models.vit import ViTConfig

        cfg = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=2,
                        img_size=32, dtype=dtype, attn_impl="xla")
        return _vit_backbone(cfg, model_path, name)

    if name in ("dino-s16", "msn-s16", "ibot-s16", "leopart"):
        return _vit_backbone(vit_small(16, dtype=dtype), model_path, name)
    if name == "dino-s8":
        return _vit_backbone(vit_small(8, dtype=dtype), model_path, name)
    if name in ("dino-b16", "vit"):
        return _vit_backbone(vit_base(16, dtype=dtype), model_path, name)
    if name == "mocov3-s16":
        return _vit_backbone(moco_mod.moco_vit_small(dtype=dtype), model_path, name)
    if name == "mocov3-b16":
        return _vit_backbone(moco_mod.moco_vit_base(dtype=dtype), model_path, name)

    if name == "mae":
        module = mae_mod.mae_vit_base(dtype=dtype)
        variables = _init_variables(module)
        if model_path:
            sd = strip_prefixes(load_torch_state_dict(model_path))
            # encoder keys share the timm layout; reuse the ViT mapping for
            # the encoder subset
            enc = {k: v for k, v in sd.items() if not k.startswith("decoder") and k != "mask_token"}
            params = vit_params_from_torch(enc)
            merged = dict(variables["params"])
            # adopt only leaves the module actually has: the ViT mapping
            # also emits a pos_embed leaf, but MAE pos embeds are fixed
            # sin-cos buffers, not params — a dead array in the tree would
            # confuse checkpoint diffs/re-saves
            merged.update({k: v for k, v in params.items() if k in merged})
            variables = {"params": merged}
        return Backbone(module, variables, 16, 768, True, name)

    if name == "motion_grouping":
        from timetuning_tpu.models.slot_attention import (
            MotionGroupingBackbone,
            motion_grouping_encoder_from_torch,
        )

        module = MotionGroupingBackbone(autoencoder=SlotAttentionAutoEncoder())
        variables = _init_variables(module, img=128)
        if model_path:
            # reference models.py:876-884: checkpoint['model_state_dict']
            # into the autoencoder; the feature path consumes encoder_cnn
            sd = load_torch_state_dict(model_path)
            variables = {
                "params": dict(variables["params"])
                | {"encoder": motion_grouping_encoder_from_torch(sd)}
            }
        return Backbone(module, variables, None, 256, False, name,
                        fixed_resolution=56)

    if name == "dul":
        from timetuning_tpu.models.dul import DulBackbone, dul_params_from_torch

        module = DulBackbone(dtype)
        if model_path:
            # reference models.py:885-894: torch.load(path)['model'],
            # module.-stripped, into Framework; features = fast_net.backbone
            variables = dul_params_from_torch(load_torch_state_dict(model_path))
        else:
            variables = _init_variables(module)
        return Backbone(module, variables, None, 512, False, name,
                        fixed_resolution=28)

    if name == "stego":
        # Native STEGO featurizer (DINO ViT-S/8 + cluster projection); the
        # reference wrapped the external release's LitUnsupervisedSegmenter
        # (models.py:872-875, import commented out at models.py:65).
        from timetuning_tpu.models.stego import (
            StegoFeaturizer,
            stego_params_from_torch,
        )

        dim = 70
        params = None
        if model_path:
            params = stego_params_from_torch(load_torch_state_dict(model_path))
            dim = params["cluster1"]["kernel"].shape[-1]
        module = StegoFeaturizer(
            backbone=VisionTransformer(vit_small(8, dtype=dtype)), dim=dim
        )
        if model_path:
            variables = {"params": params}
        else:
            variables = _init_variables(module)
        # patch 8 → spatial resolution 28 @224 (reference models.py:76);
        # tokens come out CLS-free already
        return Backbone(module, variables, 8, dim, False, name)

    raise ValueError(f"unknown backbone {name!r}")


def get_backbone_weights(arch: str) -> str:
    """Released-weight lookup (reference leopart.py:151-216). Returns the
    canonical URL; download out-of-band and pass the local path to
    ``get_backbone``."""
    if arch not in PRETRAINED_URLS:
        raise KeyError(f"no released weights recorded for {arch!r}")
    return PRETRAINED_URLS[arch]
