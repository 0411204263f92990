"""Full TimeT.pth checkpoint-contract test.

Builds a torch-layout TimeT state dict (``feature_extractor.backbone.<timm
key>`` + Sequential head + prototypes — the README.md:66-76 contract),
imports it, grafts it into the Flax TimeT, and checks numerical parity of
head features and prototype scores against the torch oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.torch_vit_oracle import OracleViT  # noqa: E402

from timetuning_tpu.core.timet import TimeT, TimeTConfig, init_state  # noqa: E402
from timetuning_tpu.models.extractor import FeatureExtractor  # noqa: E402
from timetuning_tpu.models.import_torch import timet_params_from_torch  # noqa: E402
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer  # noqa: E402


def _torch_head(dims, in_dim):
    import torch.nn as tnn

    layers = []
    prev = in_dim
    for i, d in enumerate(dims):
        layers.append(tnn.Linear(prev, d))
        if i != len(dims) - 1:
            layers.append(tnn.GELU())
        prev = d
    return tnn.Sequential(*layers)


def test_timet_pth_roundtrip():
    torch.manual_seed(0)
    dims = (48, 24)
    oracle = OracleViT(img_size=32, patch_size=8, dim=64, depth=2, heads=2).eval()
    head = _torch_head(dims, 64).eval()
    protos = torch.nn.functional.normalize(torch.randn(8, dims[-1]), dim=-1)

    sd = {}
    for k, v in oracle.state_dict().items():
        sd[f"feature_extractor.backbone.{k}"] = v.numpy()
    for k, v in head.state_dict().items():
        sd[f"feature_extractor.head.{k}"] = v.numpy()
    sd["prototypes"] = protos.numpy()

    imported = timet_params_from_torch(sd)

    vcfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2,
                     img_size=32, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=dims)
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 32, 32, 3)))["params"]

    # graft via the training-state path (validates key alignment end to end)
    import optax

    from timetuning_tpu.core.timet import _graft

    params = _graft(params, imported)

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tok, _ = oracle(torch.from_numpy(x))
        want_feats = head(tok[:, 1:]).numpy()
        want_scores = (
            torch.nn.functional.normalize(torch.from_numpy(want_feats), dim=-1)
            @ protos.t()
        ).numpy()

    feats, _ = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), use_head=True
    )
    np.testing.assert_allclose(np.asarray(feats), want_feats, rtol=1e-3, atol=2e-4)

    scores = model.apply({"params": params}, feats, method=TimeT.similarity)
    np.testing.assert_allclose(np.asarray(scores), want_scores, rtol=1e-3, atol=2e-4)


def test_timet_pth_export_roundtrip(tmp_path):
    """Export (JAX → .pth) is the exact inverse of import: the reference (or
    any timm consumer) can load checkpoints trained here. Verified by
    torch-loading the written file, re-importing it, and comparing against
    the original param tree leaf by leaf — plus oracle forward parity."""
    import flax.traverse_util as tu

    from timetuning_tpu.models.export_torch import (
        exportable,
        save_timet_pth,
        timet_state_dict,
    )

    dims = (48, 24)
    vcfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2,
                     img_size=32, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=dims)
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))["params"]
    assert exportable(params)

    # key layout matches the published contract (README.md:66-76)
    sd = timet_state_dict(params)
    assert "feature_extractor.backbone.cls_token" in sd
    assert "feature_extractor.backbone.blocks.1.attn.qkv.weight" in sd
    assert "feature_extractor.head.0.weight" in sd
    assert "feature_extractor.head.2.weight" in sd
    assert "prototypes" in sd

    path = str(tmp_path / "exported.pth")
    save_timet_pth(params, path)
    loaded = {k: v.numpy() for k, v in torch.load(path, weights_only=True).items()}
    reimported = timet_params_from_torch(loaded)

    flat_orig = tu.flatten_dict(params)
    flat_back = tu.flatten_dict(reimported)
    assert set(flat_back) == set(flat_orig)
    for k in flat_orig:
        np.testing.assert_allclose(
            flat_back[k], np.asarray(flat_orig[k], dtype=np.float32),
            rtol=1e-6, atol=0, err_msg="/".join(k),
        )

    # the exported state dict drives the torch oracle to the same features
    oracle = OracleViT(img_size=32, patch_size=8, dim=64, depth=2, heads=2).eval()
    bb_sd = {
        k[len("feature_extractor.backbone."):]: torch.from_numpy(np.asarray(v))
        for k, v in loaded.items()
        if k.startswith("feature_extractor.backbone.")
    }
    oracle.load_state_dict(bb_sd)
    x = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tok, _ = oracle(torch.from_numpy(x))
    feats, _ = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), use_head=False
    )
    np.testing.assert_allclose(
        np.asarray(feats), tok[:, 1:].numpy(), rtol=1e-3, atol=2e-4
    )


def test_export_best_writes_reference_pth(tmp_path):
    """The training driver's best-model export emits a reference-loadable
    .pth next to the Orbax tree for ViT-backed TimeT models."""
    from timetuning_tpu.core.checkpoint import export_best

    vcfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2,
                     img_size=32, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    export_best(params, str(tmp_path), 0.5, 3)
    pth = tmp_path / "0.5000_3.pth"
    assert pth.exists()
    sd = torch.load(str(pth), weights_only=True)
    assert "feature_extractor.backbone.pos_embed" in sd


def test_graft_rejects_shape_mismatch():
    from timetuning_tpu.core.timet import _graft

    params = {"a": jnp.zeros((2, 3))}
    with pytest.raises(ValueError):
        _graft(params, {"a": np.zeros((3, 2))})
    with pytest.raises(KeyError):
        _graft(params, {"b": np.zeros((2, 3))})
