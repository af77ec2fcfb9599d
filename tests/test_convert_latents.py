"""Legacy .pt latent-dump → official safetensors shard converter
(reference prepare_safetensors_dataset.py)."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vavae_tpu.apps.convert_latents import convert_split, load_legacy_latents


def _lat(n, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(n, 4, 2, 2, generator=g)


def test_load_all_legacy_layouts(tmp_path):
    lat = _lat(5)

    # dict layout with user_ids
    torch.save({"latents": lat, "user_ids": [3, 1, 4, 1, 5]}, tmp_path / "a.pt")
    out, uids = load_legacy_latents(str(tmp_path / "a.pt"))
    assert out.shape == (5, 4, 2, 2) and list(uids) == [3, 1, 4, 1, 5]

    # list-of-dicts with mixed keys + a skipped non-tensor entry
    items = [
        {"latent": lat[0], "user_id": 2},
        {"tensor": lat[1], "user_id": 0},
        {"latents": lat[2]},
        {"weird_key": lat[3], "user_id": 7},
        {"note": "no tensor here"},
    ]
    torch.save(items, tmp_path / "b.pt")
    out, uids = load_legacy_latents(str(tmp_path / "b.pt"))
    assert out.shape == (4, 4, 2, 2)
    np.testing.assert_allclose(out[3], lat[3].numpy(), rtol=1e-6)
    assert list(uids) == [2, 0, 0, 7]

    # bare list / stacked tensor / single CHW sample
    torch.save([lat[0], lat[1]], tmp_path / "c.pt")
    assert load_legacy_latents(str(tmp_path / "c.pt"))[0].shape == (2, 4, 2, 2)
    torch.save(lat, tmp_path / "d.pt")
    assert load_legacy_latents(str(tmp_path / "d.pt"))[0].shape == (5, 4, 2, 2)
    torch.save(lat[0], tmp_path / "e.pt")
    assert load_legacy_latents(str(tmp_path / "e.pt"))[0].shape == (1, 4, 2, 2)


def test_convert_split_roundtrip(tmp_path):
    from vavae_tpu.data.latent_dataset import ImgLatentDataset

    lat = _lat(7, seed=1)
    torch.save({"latents": lat, "user_ids": list(range(7))},
               tmp_path / "train_latents.pt")
    out = tmp_path / "shards"
    n_shards = convert_split(str(tmp_path), str(out), "train", shard_size=3,
                             use_labels=True)
    assert n_shards == 3
    assert sorted(os.listdir(out)) == [
        "latents_rank00_shard000.safetensors",
        "latents_rank00_shard001.safetensors",
        "latents_rank00_shard002.safetensors",
        "latents_stats.pt",
        "latents_stats.safetensors",
    ]

    # stats caches: torch layout [C,1,1], ddof=1 (torch.std default)
    st = torch.load(out / "latents_stats.pt", weights_only=False)
    assert st["mean"].shape == (4, 1, 1)
    np.testing.assert_allclose(
        st["std"].numpy().ravel(),
        lat.std(dim=[0, 2, 3]).numpy(), rtol=1e-5)

    # consumable by our dataset, stats cache honored, labels preserved
    ds = ImgLatentDataset(str(out), latent_norm=True)
    assert len(ds) == 7
    labels = sorted(int(ds[i][1]) for i in range(7))
    assert labels == list(range(7))

    # default mode writes the reference's unconditional zeros
    out2 = tmp_path / "shards0"
    convert_split(str(tmp_path), str(out2), "train", shard_size=10)
    ds0 = ImgLatentDataset(str(out2), latent_norm=False)
    assert {int(ds0[i][1]) for i in range(7)} == {0}


def test_cli(tmp_path, monkeypatch, capsys):
    from vavae_tpu.apps.convert_latents import main

    torch.save({"latents": _lat(4)}, tmp_path / "train_latents.pt")
    torch.save({"latents": _lat(2, seed=2)}, tmp_path / "val_latents.pt")
    monkeypatch.setattr(sys, "argv", [
        "convert_latents", "--input_dir", str(tmp_path),
        "--output_dir", str(tmp_path / "out"),
    ])
    main()
    assert "done" in capsys.readouterr().out
    for split, n in (("train", 4), ("val", 2)):
        files = os.listdir(tmp_path / "out" / split)
        assert "latents_rank00_shard000.safetensors" in files

    # missing split fails loudly
    monkeypatch.setattr(sys, "argv", [
        "convert_latents", "--input_dir", str(tmp_path / "nope"),
        "--output_dir", str(tmp_path / "out2"),
    ])
    with pytest.raises(FileNotFoundError):
        main()
