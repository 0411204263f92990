"""Gif-artifact logging in evaluate_localizations + ViT remat option."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.eval.evaluator import evaluate_localizations
from timetuning_tpu.eval.metrics import PredsmIoU
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer


def test_gif_logging(tmp_path):
    imageio = pytest.importorskip("imageio")
    rng = np.random.default_rng(0)
    gts = rng.integers(0, 3, size=(2, 2, 8, 8))
    preds = gts.copy()
    m = PredsmIoU(8, 8, involve_bg=True)
    for proto in ["frame-wise", "sample-wise"]:
        s = evaluate_localizations(
            m, gts, preds, proto, logging_directory=str(tmp_path)
        )
        assert s == pytest.approx(1.0)
        sub = tmp_path / proto
        gifs = sorted(os.listdir(sub))
        assert any("reordered" in g for g in gifs)
        assert any("inorder" in g for g in gifs)


def test_remat_forward_and_grad_match():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
    )
    outs = {}
    params = None
    for remat in [False, True]:
        cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                        img_size=32, attn_impl="xla", remat=remat)
        m = VisionTransformer(cfg)
        if params is None:
            params = m.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, m=m):
            return jnp.sum(m.apply({"params": p}, x)["tokens"] ** 2)

        outs[remat] = (float(loss(params)), jax.grad(loss)(params))
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-5)
    ga = jax.tree.leaves(outs[False][1])
    gb = jax.tree.leaves(outs[True][1])
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
