"""Same-weights numeric parity for the three pretrained-net ports.

SURVEY.md hard parts (d)/(e): FID-InceptionV3, LPIPS-VGG16 and the
DINOv2/MAE ViT-L forward are re-implemented in flax with torch→JAX weight
converters. These tests instantiate the ACTUAL reference torch modules
(tools/calculate_fid.py:64-210, models/lpips.py:47-176,
vavae/ldm/models/foundation_models.py:39-64) with random weights —
torchvision/timm are stubbed with faithful architecture definitions
(tests/torchvision_stub.py) since neither is installed — convert the
state dicts with the production converters, and assert feature/score
parity. Randomized BatchNorm running stats catch converters that scramble
or drop buffers (VERDICT r1 weak #6).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/LightningDiT"


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize_torch(model, seed):
    """In-place randomization of every param AND buffer (BN stats included)
    so that any dropped/scrambled tensor in the conversion shows up."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
        for name, b in model.named_buffers():
            # only BN running stats: other buffers (LPIPS scaling_layer
            # shift/scale) are architecture constants, not weights
            if "running_var" in name:
                b.copy_(torch.empty_like(b).uniform_(0.5, 1.5, generator=g))
            elif "running_mean" in name:
                b.copy_(torch.empty_like(b).normal_(0.0, 0.1, generator=g))


# make the stub importable whether tests run as a package or flat
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import torchvision_stub  # noqa: E402


@pytest.mark.parametrize(
    "n_in,n_out,kernel,antialias",
    [
        (256, 224, "bilinear", False),  # foundation_models.py:56 VF resize
        (64, 299, "bilinear", False),   # calculate_fid.py:196 FID resize
        (37, 16, "bicubic", True),      # timm pos-embed resample (dinov2)
        (14, 16, "bicubic", True),      # pos-embed upsample direction
        (299, 150, "bilinear", True),   # antialiased downsample
        (7, 5, "bicubic", False),       # edge-clamp path
    ],
)
def test_torch_resize_weights_match_interpolate(n_in, n_out, kernel, antialias):
    """utils/interp.py must reproduce torch F.interpolate exactly — the VF
    loss and FID features are sensitive to the resize kernel."""
    import torch
    import torch.nn.functional as TF

    from vavae_tpu.utils.interp import torch_resize_weights

    x = np.random.default_rng(0).normal(size=(1, 3, n_in, n_in)).astype(np.float64)
    want = TF.interpolate(
        torch.from_numpy(x), size=(n_out, n_out), mode=kernel,
        align_corners=False, antialias=antialias,
    ).numpy()
    W = torch_resize_weights(n_in, n_out, kernel, antialias).astype(np.float64)
    got = np.einsum("oi,bcij->bcoj", W, x)
    got = np.einsum("oj,bcij->bcio", W, got)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fid_inception_feature_parity():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torchvision_stub.install()
    import torch

    ref = _load_file("ref_calculate_fid", f"{REF}/tools/calculate_fid.py")

    # fid_inception_v3 minus the weight download (calculate_fid.py:232-266)
    def random_fid_inception():
        inception = ref._inception_v3(num_classes=1008, aux_logits=False,
                                      weights=None)
        inception.Mixed_5b = ref.FIDInceptionA(192, pool_features=32)
        inception.Mixed_5c = ref.FIDInceptionA(256, pool_features=64)
        inception.Mixed_5d = ref.FIDInceptionA(288, pool_features=64)
        inception.Mixed_6b = ref.FIDInceptionC(768, channels_7x7=128)
        inception.Mixed_6c = ref.FIDInceptionC(768, channels_7x7=160)
        inception.Mixed_6d = ref.FIDInceptionC(768, channels_7x7=160)
        inception.Mixed_6e = ref.FIDInceptionC(768, channels_7x7=192)
        inception.Mixed_7a = ref.FIDInceptionD(768) if hasattr(ref, "FIDInceptionD") \
            else inception.Mixed_7a
        inception.Mixed_7b = ref.FIDInceptionE_1(1280)
        inception.Mixed_7c = ref.FIDInceptionE_2(2048)
        _randomize_torch(inception, seed=0)
        return inception

    # InceptionV3 repacks blocks into Sequentials, losing the flat
    # pt_inception naming the converter consumes — grab the state dict from
    # a separately-built instance (deterministic: _randomize_torch overwrites
    # every tensor from a fixed-seed generator, so both builds are identical)
    inner_sd = {
        k: v.numpy() for k, v in random_fid_inception().state_dict().items()
    }
    ref.fid_inception_v3 = random_fid_inception
    ref_model = ref.InceptionV3(output_blocks=[3]).eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        feats_ref = ref_model(torch.from_numpy(x))[0].squeeze(-1).squeeze(-1).numpy()

    import jax
    import jax.numpy as jnp

    from vavae_tpu.eval.inception import InceptionV3FID, inception_params_from_torch

    variables = jax.tree_util.tree_map(
        jnp.asarray, inception_params_from_torch(inner_sd)
    )
    model = InceptionV3FID()
    feats = np.asarray(
        model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    assert feats.shape == feats_ref.shape == (2, 2048)
    np.testing.assert_allclose(feats, feats_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_lpips_vgg16_parity():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torchvision_stub.install()
    import torch

    ref = _load_file("ref_lpips", f"{REF}/models/lpips.py")
    ref.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    torch.manual_seed(0)
    ref_lpips = ref.LPIPS(use_dropout=True).eval()
    _randomize_torch(ref_lpips, seed=1)

    rng = np.random.default_rng(1)
    a = rng.uniform(-1.0, 1.0, size=(2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        d_ref = ref_lpips(torch.from_numpy(a), torch.from_numpy(b))
    d_ref = d_ref.reshape(-1).numpy()

    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.lpips import LPIPS, lpips_params_from_torch

    sd = {k: v.numpy() for k, v in ref_lpips.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, lpips_params_from_torch(sd))
    d = np.asarray(
        LPIPS().apply(
            {"params": params},
            jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(b, (0, 2, 3, 1))),
        )
    )
    assert d.shape == d_ref.shape == (2,)
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-6)


def test_lpips_genuine_split_artifacts_parity():
    """The GENUINE taming vgg.pth contains only scaling_layer + lin heads
    (the reference builds VGG16 from torchvision and loads vgg.pth
    strict=False, lpips.py:53,65-68). The converter must accept that pair —
    lin-only vgg.pth + torchvision-layout vgg16 state dict — and match the
    reference forward."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    torchvision_stub.install()
    import torch

    ref = _load_file("ref_lpips_split", f"{REF}/models/lpips.py")
    ref.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    torch.manual_seed(0)
    ref_lpips = ref.LPIPS(use_dropout=True).eval()
    _randomize_torch(ref_lpips, seed=7)

    full = {k: v.numpy() for k, v in ref_lpips.state_dict().items()}
    # the two artifacts a real user downloads:
    lin_sd = {k: v for k, v in full.items()
              if k.startswith("lin") or k.startswith("scaling_layer")}
    assert not any(k.startswith("net.") for k in lin_sd)
    # net.slice{S}.{N}.* keeps the ORIGINAL torchvision features index as N
    vgg_sd = {}
    for k, v in full.items():
        if k.startswith("net.slice"):
            _, _, idx, kind = k.split(".")
            vgg_sd[f"features.{idx}.{kind}"] = v

    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.lpips import LPIPS, lpips_params_from_torch

    # lin-only alone must fail loudly with guidance, not mis-convert
    with pytest.raises(KeyError, match="VAVAE_VGG16_WEIGHTS"):
        lpips_params_from_torch(lin_sd)

    params = jax.tree_util.tree_map(
        jnp.asarray, lpips_params_from_torch(lin_sd, vgg_sd)
    )
    rng = np.random.default_rng(3)
    a = rng.uniform(-1.0, 1.0, size=(2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1.0, 1.0, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        d_ref = ref_lpips(torch.from_numpy(a), torch.from_numpy(b))
    d = np.asarray(
        LPIPS().apply(
            {"params": params},
            jnp.asarray(np.transpose(a, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(b, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(d, d_ref.reshape(-1).numpy(), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# timm-faithful torch ViT (timm is not installed): mirrors the pieces of
# timm.models.vision_transformer that vit_large_patch14_dinov2/.mae use —
# conv patch embed, cls token, resample_abs_pos_embed (bicubic antialias),
# pre-norm blocks with optional LayerScale, exact GELU, final norm. State
# dict names match timm so the production converter consumes it unchanged.
# ---------------------------------------------------------------------------


def _build_torch_vit(torch, patch, dim, depth, heads, grid0, layerscale):
    import torch.nn as tnn
    import torch.nn.functional as TF

    class Attention(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, dim * 3, bias=True)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, C // heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
            x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class LayerScale(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = tnn.Parameter(1e-5 * torch.ones(dim))

        def forward(self, x):
            return x * self.gamma

    class Mlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(dim, dim * 4)
            self.fc2 = tnn.Linear(dim * 4, dim)

        def forward(self, x):
            return self.fc2(TF.gelu(self.fc1(x)))

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = Attention()
            self.ls1 = LayerScale() if layerscale else tnn.Identity()
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp()
            self.ls2 = LayerScale() if layerscale else tnn.Identity()

        def forward(self, x):
            x = x + self.ls1(self.attn(self.norm1(x)))
            return x + self.ls2(self.mlp(self.norm2(x)))

    class PatchEmbed(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    class ViT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
            self.pos_embed = tnn.Parameter(
                0.02 * torch.randn(1, grid0 * grid0 + 1, dim)
            )
            self.blocks = tnn.ModuleList([Block() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward_features(self, x):
            B = x.shape[0]
            x = self.patch_embed.proj(x)
            gh, gw = x.shape[-2:]
            x = x.flatten(2).transpose(1, 2)
            pre, grid = self.pos_embed[:, :1], self.pos_embed[:, 1:]
            if (gh, gw) != (grid0, grid0):
                # timm resample_abs_pos_embed
                g = grid.reshape(1, grid0, grid0, dim).permute(0, 3, 1, 2)
                g = TF.interpolate(g, size=(gh, gw), mode="bicubic",
                                   antialias=True)
                grid = g.permute(0, 2, 3, 1).reshape(1, gh * gw, dim)
            pos = torch.cat([pre, grid], dim=1)
            x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1) + pos
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)

    return ViT()


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["dinov2", "mae"])
def test_foundation_vit_feature_parity(kind):
    """Runs the ACTUAL reference aux_foundation_model forward (incl. the
    bilinear-224 resize for dinov2 and the h//16 token reshape) against
    FoundationModel.feature_fn_p with converted weights."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import torch

    if kind == "dinov2":
        patch, grid0, layerscale = 14, 37, True  # 518/14 pretrain grid
    else:
        patch, grid0, layerscale = 16, 14, False  # 224/16

    torch.manual_seed(2)
    tvit = _build_torch_vit(torch, patch=patch, dim=64, depth=2, heads=4,
                            grid0=grid0, layerscale=layerscale).eval()
    _randomize_torch(tvit, seed=3)

    # stub timm so the reference module loads; create_model returns our
    # faithful torch ViT regardless of the hub name
    timm = types.ModuleType("timm")
    timm.create_model = lambda name, pretrained=True, dynamic_img_size=True: tvit
    sys.modules["timm"] = timm
    try:
        ref = _load_file(
            "ref_foundation_models",
            f"{REF}/vavae/ldm/models/foundation_models.py",
        )
        aux = ref.aux_foundation_model(kind).eval()

        rng = np.random.default_rng(2)
        size = 256 if kind == "dinov2" else 224
        x = rng.uniform(-1.0, 1.0, size=(2, 3, size, size)).astype(np.float32)
        with torch.no_grad():
            feats_ref = aux(torch.from_numpy(x)).numpy()  # (B, C, h, w)
    finally:
        del sys.modules["timm"]

    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.vit import FoundationModel, TimmViT, vit_params_from_timm

    fm = FoundationModel(kind=kind)
    fm.model = TimmViT(patch_size=patch, embed_dim=64, depth=2, num_heads=4,
                       use_layerscale=layerscale, pretrain_grid=grid0)
    sd = {k: v.numpy() for k, v in tvit.state_dict().items()}
    fm.params = jax.tree_util.tree_map(jnp.asarray, vit_params_from_timm(sd))
    out = np.asarray(
        fm.feature_fn_p()(fm.params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    out = np.transpose(out, (0, 3, 1, 2))
    assert out.shape == feats_ref.shape
    np.testing.assert_allclose(out, feats_ref, rtol=2e-4, atol=2e-5)
