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
