"""Golden parity: Flax ViT + torch-checkpoint importer vs a PyTorch oracle.

This is the parity anchor of SURVEY.md §7.2 step 1 — the same mechanism that
imports the released DINO / TimeT.pth weights (README.md:66-76 contract),
exercised with random weights through the timm-layout state_dict.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from timetuning_tpu.models.vit import ViTConfig, VisionTransformer
from timetuning_tpu.models.import_torch import vit_params_from_torch

torch = pytest.importorskip("torch")

from tests.torch_vit_oracle import OracleViT  # noqa: E402


@pytest.fixture(scope="module")
def oracle_and_flax():
    torch.manual_seed(0)
    oracle = OracleViT(img_size=32, patch_size=8, dim=64, depth=3, heads=2).eval()
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = vit_params_from_torch(sd)
    cfg = ViTConfig(
        patch_size=8, embed_dim=64, depth=3, num_heads=2, img_size=32, attn_impl="xla"
    )
    model = VisionTransformer(cfg)
    return oracle, model, {"params": params}


def test_tokens_match(oracle_and_flax):
    oracle, model, variables = oracle_and_flax
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want, _ = oracle(torch.from_numpy(x))
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got["tokens"]), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_attention_match(oracle_and_flax):
    oracle, model, variables = oracle_and_flax
    x = np.random.default_rng(1).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        _, want_probs = oracle(torch.from_numpy(x), return_probs=True)
    got = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), want_attention=True
    )
    np.testing.assert_allclose(
        np.asarray(got["attention"]), want_probs.numpy(), rtol=1e-4, atol=1e-5
    )


def test_pos_embed_interpolation(oracle_and_flax):
    """Different input resolution → bicubic pos-embed resampling on both sides
    (reference dino_vision_transformer.py:214-234)."""
    oracle, model, variables = oracle_and_flax
    x = np.random.default_rng(2).normal(size=(1, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        want, _ = oracle(torch.from_numpy(x))
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got["tokens"].shape == want.shape
    # resize_bicubic_torch reproduces torch's A=-0.75 bicubic kernel exactly,
    # so interpolated-resolution forwards match to normal float tolerance
    # (the old jax.image 'cubic' A=-0.5 kernel only matched to ~2e-2)
    np.testing.assert_allclose(
        np.asarray(got["tokens"]), want.numpy(), rtol=1e-4, atol=1e-4
    )


def test_bicubic_matches_torch_exactly():
    """resize_bicubic_torch vs F.interpolate(mode='bicubic'): same kernel
    (A=-0.75), same half-pixel mapping, same border clamping — up and down,
    square and ragged."""
    import torch.nn.functional as F

    from timetuning_tpu.ops.resize import resize_bicubic_torch

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 7, 7, 5)).astype(np.float32)
    for size in [(14, 14), (28, 28), (5, 9), (3, 3)]:
        got = resize_bicubic_torch(jnp.asarray(x), size)
        want = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=size,
            mode="bicubic", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5, err_msg=str(size))


def test_intermediates_are_normed(oracle_and_flax):
    _, model, variables = oracle_and_flax
    x = jnp.zeros((1, 32, 32, 3))
    out = model.apply(variables, x, n_intermediates=2)
    assert len(out["intermediates"]) == 2
    assert out["intermediates"][-1].shape == out["tokens"].shape


def test_bicubic_fudged_scale_matches_torch():
    """The DINO +0.1 scale-factor form: torch maps coordinates with the
    PASSED scale factor, not the size-derived one (differs by up to ~0.2 on
    small grids) — resize_bicubic_torch(scales=...) must reproduce it."""
    import torch.nn.functional as F

    from timetuning_tpu.ops.resize import resize_bicubic_torch

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    for hp in (6, 9, 14):
        sf = (hp + 0.1) / 4
        got = resize_bicubic_torch(jnp.asarray(x), (hp, hp), scales=(sf, sf))
        want = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            scale_factor=(sf, sf), mode="bicubic",
        ).numpy().transpose(0, 2, 3, 1)
        assert want.shape[1] == hp
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-5, err_msg=str(hp))
