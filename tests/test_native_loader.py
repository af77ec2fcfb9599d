"""Native C++ shard reader vs the pure-Python path."""
import numpy as np
import pytest
from safetensors.numpy import save_file

from vavae_tpu.data.latent_dataset import ImgLatentDataset


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_shards")
    rng = np.random.default_rng(0)
    for shard in range(2):
        n = 12
        save_file(
            {
                "latents": rng.normal(size=(n, 4, 8, 8)).astype(np.float32),
                "latents_flip": rng.normal(size=(n, 4, 8, 8)).astype(np.float32),
                "labels": rng.integers(0, 5, size=(n,)).astype(np.int64),
            },
            str(d / f"latents_rank00_shard{shard:03d}.safetensors"),
        )
    return str(d)


def test_native_reader_matches_python(shard_dir):
    from vavae_tpu.data.native_loader import NativeShardReader, available

    if not available():
        pytest.skip("native reader build unavailable")
    reader = NativeShardReader(
        sorted(
            str(p)
            for p in __import__("glob").glob(shard_dir + "/*.safetensors")
        )
    )
    assert len(reader) == 24
    assert (reader.C, reader.H, reader.W) == (4, 8, 8)

    ds = ImgLatentDataset(shard_dir, latent_norm=True)
    mean, std = ds.latent_stats
    idx = np.array([0, 5, 13, 23], np.int64)
    flips = np.array([0, 1, 0, 1], np.uint8)
    lats, labels = reader.batch(idx, flips, mean, std, multiplier=1.0)
    assert lats.shape == (4, 8, 8, 4)

    # python reference for the same items
    for b, (i, fl) in enumerate(zip(idx, flips)):
        raw = ds._read("latents_flip" if fl else "latents", int(i)).astype(np.float32)
        expect = (raw - mean[0]) / std[0]
        np.testing.assert_allclose(
            lats[b], np.transpose(expect, (1, 2, 0)), rtol=1e-6, atol=1e-6
        )
        assert labels[b] == int(ds._read("labels", int(i)))


def test_dataset_uses_native_when_available(shard_dir):
    from vavae_tpu.data.native_loader import available

    ds = ImgLatentDataset(shard_dir, latent_norm=True)
    if available():
        assert ds._native is not None
    batch, labels = next(ds.batches(8, seed=0))
    assert batch.shape == (8, 8, 8, 4)
    assert labels.dtype in (np.int32, np.int64)


def test_native_png_writer_roundtrip(tmp_path):
    """Native PNGs must decode (via PIL) to exactly the input pixels, and the
    batch API must beat/equal PIL on a moderate batch."""
    import time

    import numpy as np
    from PIL import Image

    from vavae_tpu.utils.png_native import available, write_pngs, write_pngs_native

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(16, 64, 64, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i:03d}.png") for i in range(len(imgs))]
    write_pngs(imgs, paths)
    for im, p in zip(imgs, paths):
        back = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(back, im)

    if available():
        # timing sanity (not a strict benchmark): native should not be
        # dramatically slower than PIL
        big = rng.integers(0, 256, size=(32, 128, 128, 3), dtype=np.uint8)
        np_paths = [str(tmp_path / f"n{i:03d}.png") for i in range(len(big))]
        t0 = time.perf_counter()
        write_pngs_native(big, np_paths)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        for im, p in zip(big, [str(tmp_path / f"p{i:03d}.png") for i in range(len(big))]):
            Image.fromarray(im).save(p)
        t_pil = time.perf_counter() - t0
        print(f"native {t_native*1e3:.1f}ms vs PIL {t_pil*1e3:.1f}ms")
        assert t_native < t_pil * 2
