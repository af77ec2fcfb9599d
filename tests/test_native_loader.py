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


def test_native_reader_rejects_malformed_dirs(tmp_path):
    """Mixed-shape shards and unsupported label dtypes must fail LOUDLY at
    open time: gathering with shard-0 strides would read garbage/OOB, and
    unknown label dtypes used to silently decode as class 0."""
    from vavae_tpu.data.native_loader import NativeShardReader, available

    if not available():
        pytest.skip("native reader build unavailable")
    rng = np.random.default_rng(0)

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    for shard, hw in enumerate((8, 16)):  # two extraction runs in one dir
        save_file(
            {
                "latents": rng.normal(size=(4, 4, hw, hw)).astype(np.float32),
                "labels": np.zeros((4,), np.int64),
            },
            str(mixed / f"latents_rank00_shard{shard:03d}.safetensors"),
        )
    with pytest.raises(RuntimeError, match="failed to open"):
        NativeShardReader(sorted(str(p) for p in mixed.glob("*.safetensors")))

    badlabels = tmp_path / "badlabels"
    badlabels.mkdir()
    save_file(
        {
            "latents": rng.normal(size=(4, 4, 8, 8)).astype(np.float32),
            "labels": np.zeros((4,), np.uint8),  # not I64/I32/F32
        },
        str(badlabels / "latents_rank00_shard000.safetensors"),
    )
    with pytest.raises(RuntimeError, match="failed to open"):
        NativeShardReader([str(badlabels / "latents_rank00_shard000.safetensors")])

    shortlabels = tmp_path / "shortlabels"
    shortlabels.mkdir()
    save_file(
        {
            # labels indexed by LATENTS rows: 2 labels for 4 rows would read
            # adjacent mmap bytes as classes
            "latents": rng.normal(size=(4, 4, 8, 8)).astype(np.float32),
            "labels": np.zeros((2,), np.int64),
        },
        str(shortlabels / "latents_rank00_shard000.safetensors"),
    )
    with pytest.raises(RuntimeError, match="failed to open"):
        NativeShardReader([str(shortlabels / "latents_rank00_shard000.safetensors")])


def test_native_reader_abi_version_gate():
    """The loaded library must report the ABI the binding was written
    against — a prebuilt .so from an older checkout (no toolchain to rebuild)
    must be refused rather than silently lacking the open-time rejections."""
    import ctypes

    from vavae_tpu.data import native_loader

    lib = native_loader._load()
    if lib is None:
        pytest.skip("native reader build unavailable")
    lib.shard_reader_abi_version.restype = ctypes.c_int
    assert int(lib.shard_reader_abi_version()) >= native_loader._ABI_VERSION


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


def _make_shards(d, n, seed=0):
    rng = np.random.default_rng(seed)
    save_file(
        {
            "latents": rng.normal(size=(n, 4, 8, 8)).astype(np.float32),
            "latents_flip": rng.normal(size=(n, 4, 8, 8)).astype(np.float32),
            "labels": rng.integers(0, 5, size=(n,)).astype(np.int64),
        },
        str(d / "latents_rank00_shard000.safetensors"),
    )
    return str(d)


def test_batches_equal_counts_across_processes(tmp_path):
    """Per-process batch counts MUST match: striping before truncation gave
    process 0 one more batch on odd splits, and the extra data-parallel
    step's collective would wait forever (multihost deadlock)."""
    d = _make_shards(tmp_path, 23)
    ds = ImgLatentDataset(d, latent_norm=False)
    counts, seen = [], []
    for p in (0, 1):
        bs = list(ds.batches(2, seed=3, process_index=p, process_count=2, epochs=1))
        counts.append(len(bs))
        seen.extend(lab for _, labs in bs for lab in labs)
    assert counts[0] == counts[1] == 5  # trunc 23→22, 11 each, drop_last → 5
    # and the two processes saw disjoint items (no overlap from striping)
    assert len(seen) == 20


def test_batches_zero_batches_raises(tmp_path):
    """A zero-batch epoch raises under epochs=None (would spin forever) and
    warns under finite epochs (e.g. a too-small validation set → nan val,
    not an aborted training run)."""
    d = _make_shards(tmp_path, 6)
    ds = ImgLatentDataset(d, latent_norm=False)
    with pytest.raises(ValueError, match="smaller than batch_size"):
        next(ds.batches(8, seed=0, epochs=None))
    with pytest.raises(ValueError, match="striping 4 ways"):
        next(ds.batches(2, seed=0, process_index=0, process_count=4, epochs=None))
    with pytest.warns(UserWarning, match="zero batches"):
        assert list(ds.batches(8, seed=0, epochs=1)) == []


def test_fallback_batches_match_native_stream(shard_dir, monkeypatch):
    """The pure-Python fallback must replay the native loader's exact
    (seed, epoch)-keyed shuffle AND flip streams — resuming a run on a box
    without the native reader keeps the data order identical."""
    from vavae_tpu.data.native_loader import available

    if not available():
        pytest.skip("native reader build unavailable")
    ds_nat = ImgLatentDataset(shard_dir, latent_norm=True)
    assert ds_nat._native is not None
    monkeypatch.setenv("VAVAE_NATIVE_LOADER", "0")
    ds_py = ImgLatentDataset(shard_dir, latent_norm=True)
    assert ds_py._native is None
    for (la, laba), (lb, labb) in zip(
        ds_nat.batches(6, seed=7, epochs=2), ds_py.batches(6, seed=7, epochs=2)
    ):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(laba), np.asarray(labb))
