"""Backbone-zoo forward/shape tests + torch-layout resnet import round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.models.registry import (
    PRETRAINED_URLS,
    get_backbone,
    get_backbone_weights,
)

IMG = 64


def test_resnet18_forward():
    bb = get_backbone("resnet18")
    feats, attn = bb.apply(jnp.zeros((2, IMG, IMG, 3)))
    assert feats.shape == (2, (IMG // 32) ** 2, 512)
    assert attn is None
    assert bb.spatial_resolution(224) == 7


def test_resnet50_forward():
    bb = get_backbone("resnet50")
    feats, _ = bb.apply(jnp.zeros((1, IMG, IMG, 3)))
    assert feats.shape == (1, 4, 2048)


def test_dul_forward():
    bb = get_backbone("dul")
    feats, _ = bb.apply(jnp.zeros((1, IMG, IMG, 3)))
    # the generic Backbone contract: tokens on the reference's fixed 28²
    # grid (models.py:1063-1068 interpolates the stride-8 features to 28×28)
    assert feats.shape == (1, 28 * 28, 512)
    assert bb.spatial_resolution(IMG) == 28
    assert bb.spatial_resolution(448) == 28


def test_motion_grouping_forward():
    bb = get_backbone("motion_grouping")
    # generic Backbone contract (reference models.py:1055-1061: encoder CNN
    # interpolated to a fixed 56² grid)
    feats, attn = bb.apply(jnp.zeros((1, 128, 128, 3)))
    assert feats.shape == (1, 56 * 56, 256)
    assert attn is None
    assert bb.spatial_resolution(128) == 56

    # the underlying autoencoder still runs as the object-discovery model
    from timetuning_tpu.models.slot_attention import SlotAttentionAutoEncoder

    ae = SlotAttentionAutoEncoder()
    var = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    combined, recon, masks, slots = ae.apply(
        var, jnp.zeros((1, 128, 128, 3)), rng=jax.random.PRNGKey(0)
    )
    assert combined.shape == (1, 128, 128, 3)
    assert masks.shape[1] == 5
    np.testing.assert_allclose(np.asarray(masks.sum(axis=1)), 1.0, atol=1e-5)


def test_vit_variants_dispatch():
    for name, dim, patch in [("dino-s16", 384, 16), ("mocov3-s16", 384, 16)]:
        bb = get_backbone(name)
        feats, _ = bb.apply(jnp.zeros((1, 32, 32, 3)))
        assert feats.shape == (1, (32 // patch) ** 2, dim)


def test_mae_encoder_and_masking():
    from timetuning_tpu.models.mae import MAEViT

    m = MAEViT(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
               decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2)
    rng = jax.random.PRNGKey(0)
    v = m.init(rng, jnp.zeros((1, 32, 32, 3)), mask_ratio=0.75,
               rng=jax.random.PRNGKey(1), method=MAEViT.pretrain)
    out = m.apply(v, jnp.zeros((2, 32, 32, 3)))
    assert out["tokens"].shape == (2, 17, 64)  # CLS + 16 patches

    x = jax.random.normal(rng, (2, 32, 32, 3))
    loss, pred, mask = m.apply(
        v, x, 0.75, jax.random.PRNGKey(1), method=MAEViT.pretrain
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), 12.0)  # 75% of 16

    # non-native resolution: the sincos table regenerates at the runtime
    # grid (48/8 = 6x6 patches), so the encoder runs at any square size
    out48 = m.apply(v, jnp.zeros((1, 48, 48, 3)))
    assert out48["tokens"].shape == (1, 37, 64)  # CLS + 36 patches
    assert out48["grid"] == (6, 6)

    # masking without an rng must fail loudly, not crash inside jax.random
    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires an rng"):
        m.apply(v, x, 0.75, None, method=MAEViT.pretrain)



def test_moco_contrastive_loss_identity():
    from timetuning_tpu.models.moco import contrastive_loss

    q = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    # identical pairs → low loss; mismatched → higher
    l_same = float(contrastive_loss(q, q))
    l_diff = float(contrastive_loss(q, jnp.roll(q, 1, axis=0)))
    assert l_same < l_diff


def test_dino_head_and_weight_norm():
    from timetuning_tpu.models.dino_head import DINOHead

    h = DINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8)
    v = h.init(jax.random.PRNGKey(0), jnp.zeros((2, 12)))
    out = h.apply(v, jax.random.normal(jax.random.PRNGKey(1), (2, 12)))
    assert out.shape == (2, 32)


def test_generic_transformer():
    from timetuning_tpu.models.generic_transformer import (
        TransformerDecoder,
        TransformerEncoder,
        gumbel_softmax,
    )

    enc = TransformerEncoder(depth=1, num_heads=2, mlp_dim=32)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 16)))
    mem = enc.apply(v, jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16)))
    assert mem.shape == (1, 5, 16)
    dec = TransformerDecoder(depth=1, num_heads=2, mlp_dim=32)
    vd = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16)), mem)
    out = dec.apply(vd, jnp.zeros((1, 3, 16)), mem)
    assert out.shape == (1, 3, 16)
    g = gumbel_softmax(jax.random.PRNGKey(0), jnp.zeros((4, 7)), hard=True)
    np.testing.assert_allclose(np.asarray(g.sum(-1)), 1.0, atol=1e-5)


def test_resnet_torch_import_roundtrip():
    """Build a torch-layout state dict for a tiny resnet and verify the
    importer produces numerically identical features to a manual forward."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    # torch reference: conv1+bn1+relu+maxpool then one basic block (tap its
    # conv2 pre-bn output) — mirrors the flax ResNet stem + block structure.
    class TinyTorch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def forward(self, x):
            return self.maxpool(torch.relu(self.bn1(self.conv1(x))))

    torch.manual_seed(0)
    t = TinyTorch().eval()
    with torch.no_grad():
        t.bn1.running_mean.normal_()
        t.bn1.running_var.uniform_(0.5, 2.0)
        t.bn1.weight.normal_()
        t.bn1.bias.normal_()

    from timetuning_tpu.models.resnet import resnet_params_from_torch

    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    vars_ = resnet_params_from_torch(sd)

    import flax.linen as nn

    class TinyFlax(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv1")(x)
            from timetuning_tpu.models.resnet import _BN

            x = nn.relu(_BN(name="bn1")(x))
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.from_numpy(x)).numpy()
    got = TinyFlax().apply(vars_, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4
    )


def test_weight_urls():
    assert get_backbone_weights("dino-s16").startswith("https://")
    with pytest.raises(KeyError):
        get_backbone_weights("nope")
    assert "resnet50" in PRETRAINED_URLS


def test_stego_forward_and_resolution():
    bb = get_backbone("stego")
    feats, attn = bb.apply(jnp.zeros((1, IMG, IMG, 3)))
    # patch 8, projected dim 70, no CLS (reference models.py:76,1045-1049)
    assert feats.shape == (1, (IMG // 8) ** 2, 70)
    assert bb.spatial_resolution(224) == 28


def test_stego_torch_import_roundtrip():
    """Random-weight checkpoint with the released STEGO .ckpt key layout
    (net.model.<timm key> + net.cluster1/cluster2) imports and matches a
    torch oracle of the DinoFeaturizer projection."""
    torch = pytest.importorskip("torch")
    from tests.torch_vit_oracle import OracleViT

    from timetuning_tpu.models.stego import (
        StegoFeaturizer,
        stego_params_from_torch,
    )
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

    torch.manual_seed(0)
    dim_feat, dim_code = 32, 12
    oracle = OracleViT(img_size=32, patch_size=8, dim=dim_feat, depth=2,
                       heads=2).eval()
    c1 = torch.nn.Conv2d(dim_feat, dim_code, 1)
    c2 = torch.nn.Sequential(
        torch.nn.Conv2d(dim_feat, dim_feat, 1),
        torch.nn.ReLU(),
        torch.nn.Conv2d(dim_feat, dim_code, 1),
    )
    sd = {f"net.model.{k}": v.detach().numpy()
          for k, v in oracle.state_dict().items()}
    sd |= {f"net.cluster1.{k}": v.detach().numpy()
           for k, v in c1.state_dict().items()}
    sd |= {f"net.cluster2.{k}": v.detach().numpy()
           for k, v in c2.state_dict().items()}

    params = stego_params_from_torch(sd)
    vcfg = ViTConfig(patch_size=8, embed_dim=dim_feat, depth=2, num_heads=2,
                     img_size=32, attn_impl="xla")
    model = StegoFeaturizer(backbone=VisionTransformer(vcfg), dim=dim_code)

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        tok, _ = oracle(torch.from_numpy(x))
        f = tok[:, 1:]                                   # [B, N, D]
        grid = f.transpose(1, 2).reshape(2, dim_feat, 4, 4)
        want = (c1(grid) + c2(grid)).flatten(2).transpose(1, 2).numpy()

    out = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["tokens"]), want,
                               rtol=1e-3, atol=2e-4)


def test_motion_grouping_checkpoint_import(tmp_path):
    """get_backbone('motion_grouping', ckpt) loads the reference
    checkpoint's encoder_cnn (models.py:876-884 + feature path :1055-1061):
    features match a torch replica of the reference encoder (conv5x5 pairs
    + affine InstanceNorm + ceil-mode maxpool, [64,'MP',128,'MP',256])
    forward + bilinear interp to 56^2."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    layers = []
    in_ch = 3
    for v in (64, "MP", 128, "MP", 256):
        if v == "MP":
            layers += [tnn.MaxPool2d(2, stride=2, ceil_mode=True)]
            continue
        layers += [
            tnn.Conv2d(in_ch, v, 5, padding=2), tnn.InstanceNorm2d(v, affine=True),
            tnn.ReLU(),
            tnn.Conv2d(v, v, 5, padding=2), tnn.InstanceNorm2d(v, affine=True),
            tnn.ReLU(),
        ]
        in_ch = v
    torch.manual_seed(3)
    enc = tnn.Sequential(*layers).eval()
    # affine InstanceNorm init is scale=1/bias=0 — randomize to make the
    # parity check load-bearing
    with torch.no_grad():
        for m in enc.modules():
            if isinstance(m, tnn.InstanceNorm2d):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
    sd = {f"encoder_cnn.{k}": v for k, v in enc.state_dict().items()}
    path = str(tmp_path / "mg.pth")
    torch.save({"model_state_dict": sd}, path)

    bb = get_backbone("motion_grouping", path)
    assert bb.feature_dim == 256
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    feats, _ = bb.apply(jnp.asarray(x))
    assert feats.shape == (1, 56 * 56, 256)

    with torch.no_grad():
        h = enc(torch.from_numpy(x).permute(0, 3, 1, 2))
        h = tF.interpolate(h, size=(56, 56), mode="bilinear",
                           align_corners=False)
        want = h.flatten(2, 3).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-4, atol=1e-4)


def test_dul_checkpoint_import(tmp_path):
    """get_backbone('dul', ckpt) loads the Framework checkpoint's
    fast_net.backbone (reference models.py:885-894, torch.load(path)
    ['model'] with module. prefixes): features match a torch replica of the
    reference's stride-1-layer3/4 ResNet18 (dul_model.py:14-66) + bilinear
    interp to 28^2."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn
    import torch.nn.functional as tF

    class TBlock(tnn.Module):
        def __init__(self, cin, cout, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            return torch.relu(self.bn2(self.conv2(out)) + idn)

    class TDulResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            plan = [(64, 64, 1, False), (64, 128, 2, True),
                    (128, 256, 1, True), (256, 512, 1, True)]
            for li, (cin, cout, s, ds) in enumerate(plan):
                setattr(self, f"layer{li + 1}", tnn.Sequential(
                    TBlock(cin, cout, s, ds), TBlock(cout, cout, 1, False),
                ))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for li in range(4):
                x = getattr(self, f"layer{li + 1}")(x)
            return x

    torch.manual_seed(7)
    net = TDulResNet18().eval()
    with torch.no_grad():  # randomize BN stats so eval-mode parity is real
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    sd = {f"module.fast_net.backbone.{k}": v for k, v in net.state_dict().items()}
    path = str(tmp_path / "dul.pth")
    torch.save({"model": sd}, path)

    bb = get_backbone("dul", path)
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    feats, _ = bb.apply(jnp.asarray(x))
    assert feats.shape == (1, 28 * 28, 512)

    with torch.no_grad():
        h = net(torch.from_numpy(x).permute(0, 3, 1, 2))
        h = tF.interpolate(h, size=(28, 28), mode="bilinear",
                           align_corners=False)
        want = h.flatten(2, 3).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-3, atol=1e-3)
