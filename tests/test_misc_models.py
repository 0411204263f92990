"""Coverage for the remaining zoo pieces: MultiCropWrapper, ConvStem,
FCN head, DUL space-time loss, profiling hooks, debug-nans toggle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.models.dino_head import DINOHead, MultiCropWrapper
from timetuning_tpu.models.dul import space_time_cluster_loss
from timetuning_tpu.models.fcn import FCNHead
from timetuning_tpu.models.moco import ConvStem, MoCoPredictor
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer


def test_multicrop_wrapper_groups_resolutions():
    vcfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                     img_size=32, attn_impl="xla")
    wrapper = MultiCropWrapper(
        backbone=VisionTransformer(vcfg),
        head=DINOHead(out_dim=16, hidden_dim=8, bottleneck_dim=4),
    )
    crops = [
        jnp.zeros((2, 32, 32, 3)),   # two global crops (same res → batched)
        jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((3, 16, 16, 3)),   # local crops at another res
    ]
    v = wrapper.init(jax.random.PRNGKey(0), crops)
    out = wrapper.apply(v, crops)
    assert out.shape == (7, 16)


def test_conv_stem():
    stem = ConvStem(embed_dim=64)
    v = stem.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = stem.apply(v, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 2, 2, 64)  # 4 stride-2 convs: 32 → 2


def test_moco_predictor():
    p = MoCoPredictor(hidden_dim=32, out_dim=8)
    v = p.init(jax.random.PRNGKey(0), jnp.zeros((4, 16)))
    assert p.apply(v, jnp.zeros((4, 16))).shape == (4, 8)
    # final affine-free BN standardizes features: running stats exist for bn2
    assert set(v["batch_stats"]) == {"bn1", "bn2"}


def test_moco_predictor_matches_torch_oracle():
    """Predictor output == torch _build_mlp(2, in, hidden, out, last_bn=True)
    in eval mode, from the same state dict (reference models.py:1749-1763)."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn
    in_dim, hidden, out = 16, 32, 8
    torch.manual_seed(0)
    mlp = tnn.Sequential(
        tnn.Linear(in_dim, hidden, bias=False),
        tnn.BatchNorm1d(hidden),
        tnn.ReLU(inplace=True),
        tnn.Linear(hidden, out, bias=False),
        tnn.BatchNorm1d(out, affine=False),
    )
    # non-trivial running stats
    mlp.train()
    with torch.no_grad():
        for _ in range(3):
            mlp(torch.randn(64, in_dim))
    mlp.eval()

    from timetuning_tpu.models.moco import import_moco_predictor

    sd = {f"predictor.{k}": v.numpy() for k, v in mlp.state_dict().items()}
    variables = import_moco_predictor(sd)
    x = np.random.default_rng(1).normal(size=(8, in_dim)).astype(np.float32)
    with torch.no_grad():
        ref = mlp(torch.from_numpy(x)).numpy()
    got = np.asarray(MoCoPredictor(hidden_dim=hidden, out_dim=out).apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fcn_head():
    h = FCNHead(num_classes=5, channels=16, num_convs=2)
    v = h.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 32)))
    out = h.apply(v, jnp.zeros((2, 8, 8, 32)))
    assert out.shape == (2, 8, 8, 5)


def test_dul_space_time_loss():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 3, 16, 8)).astype(np.float32))
    loss = space_time_cluster_loss(feats, n_clusters=4, rng=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # features identical across time → near-perfectly propagated pseudo-labels
    same = jnp.broadcast_to(feats[:, :1], feats.shape)
    loss_same = space_time_cluster_loss(same, n_clusters=4, rng=jax.random.PRNGKey(0))
    assert float(loss_same) <= float(loss) + 1e-3


def test_profiling_hooks(tmp_path):
    from timetuning_tpu.obs.profiling import annotate, trace

    with trace(str(tmp_path / "prof"), enabled=True):
        with annotate("unit-test-region"):
            jnp.ones((4, 4)).sum().block_until_ready()
    # a trace directory with at least one artifact was produced
    produced = list(os.walk(str(tmp_path / "prof")))
    assert any(files for _, _, files in produced)

    with trace(str(tmp_path / "off"), enabled=False):
        pass
    assert not os.path.exists(str(tmp_path / "off"))


def test_debug_nans_toggle():
    import jax as j

    from timetuning_tpu.runtime import enable_debug_nans

    enable_debug_nans(True)
    assert j.config.jax_debug_nans
    enable_debug_nans(False)
    assert not j.config.jax_debug_nans


def test_moco_predictor_train_mode_bn():
    """train=True runs batch-statistics BN and updates the running stats
    (previously hardcoded to inference mode — the contrastive trainer could
    never exercise the reference's train-mode BN dynamics)."""
    from timetuning_tpu.models.moco import MoCoPredictor

    m = MoCoPredictor(hidden_dim=8, out_dim=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 6)),
                    jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    y_eval = m.apply(var, x)
    y_train, mutated = m.apply(var, x, train=True, mutable=["batch_stats"])
    # train-mode output is batch-standardized by the affine-free bn2
    np.testing.assert_allclose(np.asarray(y_train.mean(0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_train.std(0)), 1.0, atol=2e-2)
    # running stats moved off their init
    assert not np.allclose(
        np.asarray(mutated["batch_stats"]["bn1"]["mean"]),
        np.asarray(var["batch_stats"]["bn1"]["mean"]),
    )
    # eval mode differs (init running stats are identity-ish)
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
