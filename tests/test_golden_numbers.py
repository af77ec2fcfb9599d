"""golden_numbers.py --check: artifact validation + converter loadability
(docs/GOLDEN_NUMBERS.md — the no-egress-ready reproduction path)."""
import importlib.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import torchvision_stub  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_golden():
    spec = importlib.util.spec_from_file_location(
        "golden_numbers", os.path.join(REPO, "scripts", "golden_numbers.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_check_fails_on_missing(monkeypatch):
    gn = _load_golden()
    for var in gn.REQUIRED:
        monkeypatch.delenv(var, raising=False)
    assert gn.check() is False


def test_check_passes_with_synthetic_artifacts(tmp_path, monkeypatch):
    """Synthetic checkpoints in the REAL key layouts must pass the converter
    loadability probe (stub torchvision provides the architecture)."""
    import torch

    torchvision_stub.install()
    gn = _load_golden()

    # FID inception: pt_inception layout == Inception3 state dict (1008-way)
    inc = torchvision_stub.inception_v3(num_classes=1008, aux_logits=False)
    fid_path = tmp_path / "pt_inception.pth"
    torch.save(inc.state_dict(), fid_path)

    # LPIPS: taming vgg.pth layout (net.sliceN.M + linK.model.1)
    spec = importlib.util.spec_from_file_location(
        "ref_lpips_gn", "/root/reference/LightningDiT/models/lpips.py"
    )
    if not os.path.exists("/root/reference/LightningDiT/models/lpips.py"):
        pytest.skip("reference tree not mounted")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    ref.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    lp = ref.LPIPS()
    lpips_path = tmp_path / "vgg.pth"
    torch.save(lp.state_dict(), lpips_path)

    val_dir = tmp_path / "val"
    val_dir.mkdir()
    npz = tmp_path / "ref.npz"
    np.savez(npz, arr_0=np.zeros((1, 4), np.float32))
    dummy = tmp_path / "ckpt.pt"
    torch.save({}, dummy)

    monkeypatch.setenv("VAVAE_GN_VAE_CKPT", str(dummy))
    monkeypatch.setenv("VAVAE_GN_DIT_CKPT", str(dummy))
    monkeypatch.setenv("VAVAE_GN_IMAGENET_VAL", str(val_dir))
    monkeypatch.setenv("VAVAE_GN_FID_NPZ", str(npz))
    monkeypatch.setenv("VAVAE_FID_WEIGHTS", str(fid_path))
    monkeypatch.setenv("VAVAE_LPIPS_WEIGHTS", str(lpips_path))
    assert gn.check() is True


@pytest.mark.slow
def test_rfid_leg_end_to_end_cpu(tmp_path, monkeypatch):
    """The rFID leg of the runbook, executed for real at rehearsal scale:
    a reference-format torch VAE checkpoint (actual reference module, tiny
    arch) + stub-Inception FID weights + genuine-layout LPIPS weights +
    a tiny ImageNet-val tree, driven through golden_numbers.main() with the
    rehearsal knobs. Proves the runbook is executable the day real weights
    land: the tokenizer leg must dump ref/dec PNGs and produce FINITE
    psnr/ssim/lpips/rfid in tokenizer_metrics.json (round-2 verdict: the
    orchestration never passed --output_path, so rFID — the headline
    tokenizer number, LightningDiT/evaluate_tokenizer.py:38-167 — was
    silently never computed)."""
    if not os.path.isdir("/root/reference/LightningDiT"):
        pytest.skip("reference tree not mounted")
    import torch

    torchvision_stub.install()
    gn = _load_golden()

    # tiny reference-format VAE ckpt (2-level, no attn at these resolutions)
    spec = importlib.util.spec_from_file_location(
        "ref_ae_gn", "/root/reference/LightningDiT/tokenizer/autoencoder.py"
    )
    ref_ae = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ae)
    torch.manual_seed(0)
    ref_vae = ref_ae.AutoencoderKL(embed_dim=4, ch_mult=(1, 2)).eval()
    vae_path = tmp_path / "vavae_tiny.pt"
    torch.save({"state_dict": ref_vae.state_dict()}, vae_path)

    # tokenizer yaml mirroring that build (reference Encoder/Decoder
    # defaults: ch 128, num_res_blocks 2; attn lists resolve to NO blocks
    # at a 2-level mult, so [] keeps our module tree identical)
    import yaml

    cfg = {"model": {"params": {"embed_dim": 4, "ddconfig": {
        "z_channels": 4, "resolution": 32, "ch": 128, "ch_mult": [1, 2],
        "num_res_blocks": 2, "attn_resolutions": []}}}}
    cfg_path = tmp_path / "vavae_tiny.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    # FID + LPIPS weights in the real artifact layouts
    inc = torchvision_stub.inception_v3(num_classes=1008, aux_logits=False)
    fid_path = tmp_path / "pt_inception.pth"
    torch.save(inc.state_dict(), fid_path)
    lp_spec = importlib.util.spec_from_file_location(
        "ref_lpips_e2e", "/root/reference/LightningDiT/models/lpips.py"
    )
    ref_lp = importlib.util.module_from_spec(lp_spec)
    lp_spec.loader.exec_module(ref_lp)
    ref_lp.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    torch.manual_seed(1)
    lpips_path = tmp_path / "vgg.pth"
    torch.save(ref_lp.LPIPS().state_dict(), lpips_path)

    # tiny ImageNet-val tree (2 synsets x 3 images)
    from PIL import Image

    rng = np.random.default_rng(0)
    val_dir = tmp_path / "val"
    for synset in ("n01440764", "n01443537"):
        d = val_dir / synset
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            ).save(d / f"img{i}.png")

    npz = tmp_path / "ref.npz"
    np.savez(npz, arr_0=np.zeros((1, 4), np.float32))
    dit = tmp_path / "dit.pt"
    torch.save({"ema": {}}, dit)

    monkeypatch.setenv("VAVAE_GN_VAE_CKPT", str(vae_path))
    monkeypatch.setenv("VAVAE_GN_DIT_CKPT", str(dit))
    monkeypatch.setenv("VAVAE_GN_IMAGENET_VAL", str(val_dir))
    monkeypatch.setenv("VAVAE_GN_FID_NPZ", str(npz))
    monkeypatch.setenv("VAVAE_FID_WEIGHTS", str(fid_path))
    monkeypatch.setenv("VAVAE_LPIPS_WEIGHTS", str(lpips_path))
    monkeypatch.delenv("VAVAE_VGG16_WEIGHTS", raising=False)
    monkeypatch.setenv("VAVAE_PLATFORM", "cpu")  # subprocess legs force CPU

    workdir = tmp_path / "golden"
    monkeypatch.setattr(sys, "argv", [
        "golden_numbers.py", "--workdir", str(workdir),
        "--tokenizer_config", str(cfg_path),
        "--image_size", "32", "--max_images", "6",
        "--skip_extraction", "--skip_sampling",
    ])
    gn.main()

    import json

    metrics = json.load(open(workdir / "tokenizer_metrics.json"))
    assert metrics["num_images"] == 6
    for key in ("psnr", "ssim", "lpips", "rfid"):
        assert key in metrics and np.isfinite(metrics[key]), (key, metrics)
    import glob as _glob

    assert len(_glob.glob(str(workdir / "tokenizer" / "ref" / "*.png"))) == 6
    assert len(_glob.glob(str(workdir / "tokenizer" / "dec" / "*.png"))) == 6
