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


def test_graft_rejects_shape_mismatch():
    from timetuning_tpu.core.timet import _graft

    params = {"a": jnp.zeros((2, 3))}
    with pytest.raises(ValueError):
        _graft(params, {"a": np.zeros((3, 2))})
    with pytest.raises(KeyError):
        _graft(params, {"b": np.zeros((2, 3))})
