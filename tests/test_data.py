"""Host input pipeline: prefetch iterator + threaded image-folder batches."""
import numpy as np
import pytest

from vavae_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_completes():
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))


def test_prefetch_reraises_producer_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("corrupt image")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="corrupt image"):
        next(it)


def test_prefetch_abandonment_closes_source():
    """Abandoning the prefetch iterator (break / exception in the consumer)
    must unblock the producer and close the source generator so its
    ``finally`` (thread-pool shutdown in batches()) runs."""
    import time

    closed = []

    def gen():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.append(True)

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # what GC does when a for-loop body raises
    for _ in range(50):  # producer unblocks within its 0.2 s put timeout
        if closed:
            break
        time.sleep(0.1)
    assert closed, "source generator finally never ran after abandonment"


@pytest.fixture()
def image_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in ("a", "b"):
        d = tmp_path / c
        d.mkdir()
        for i in range(6):
            arr = (rng.random((40, 48, 3)) * 255).astype("uint8")
            Image.fromarray(arr).save(d / f"{i}.png")
    return tmp_path


def test_image_folder_batches_worker_invariant(image_tree):
    """Threaded decode must not change batch contents or order: the shuffle
    stream and item ordering are identical for any worker count."""
    from vavae_tpu.data.image_folder import ImageFolderDataset

    ds = ImageFolderDataset(str(image_tree), image_size=32)
    assert len(ds) == 12
    a = list(ds.batches(4, seed=7, epochs=2, workers=1))
    b = list(ds.batches(4, seed=7, epochs=2, workers=8))
    assert len(a) == len(b) == 6
    for (xa, la), (xb, lb) in zip(a, b):
        assert xa.shape == (4, 32, 32, 3)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(xa, xb)
    # pixel range is [-1, 1]
    assert a[0][0].min() >= -1.0 and a[0][0].max() <= 1.0


def test_image_folder_batches_equal_counts_across_processes(image_tree):
    """Striping must equalize BEFORE splitting: with 12-1=11 items visible to
    2 processes, naive order[p::2] gives 6 vs 5 items — the extra batch's
    data-parallel collective would deadlock multihost training (same fix as
    ImgLatentDataset.batches). Also: a zero-batch epochs=None loop must raise
    instead of spinning forever."""
    import os

    from vavae_tpu.data.image_folder import ImageFolderDataset

    # drop one file -> odd count after equalize check
    victims = sorted((image_tree / "a").glob("*.png"))
    os.remove(victims[0])
    ds = ImageFolderDataset(str(image_tree), image_size=32)
    assert len(ds) == 11
    n0 = len(list(ds.batches(5, seed=3, epochs=1, process_index=0, process_count=2,
                             drop_last=False, workers=1)))
    n1 = len(list(ds.batches(5, seed=3, epochs=1, process_index=1, process_count=2,
                             drop_last=False, workers=1)))
    assert n0 == n1 == 1

    with pytest.raises(ValueError, match="spin forever"):
        next(ds.batches(64, epochs=None, workers=1))


def test_split_file_flat_layout_skips_missing(tmp_path, image_tree):
    """A flat-layout entry pointing at a deleted file is skipped at
    construction (like the dict layout), not raised mid-epoch in the decode
    pool."""
    import json as _json

    from vavae_tpu.data.image_folder import SplitFileDataset

    p = sorted((image_tree / "a").glob("*.png"))[0]
    flat = {"train": [{"path": str(p), "user_id": 0},
                      {"path": str(image_tree / "a" / "gone.png"), "user_id": 1}]}
    sf = tmp_path / "flat_missing.json"
    sf.write_text(_json.dumps(flat))
    ds = SplitFileDataset(str(sf), "train", image_size=32)
    assert [uid for _, uid in ds.items] == [0]


def test_parse_user_id_conventions():
    """ID_k is 1-based, User_k/user_k 0-based, bare number as-is
    (domain_classifier_training.py:373-389)."""
    from vavae_tpu.data.image_folder import parse_user_id

    assert parse_user_id("ID_1") == 0
    assert parse_user_id("ID_31") == 30
    assert parse_user_id("User_5") == 5
    assert parse_user_id("user_0") == 0
    assert parse_user_id("7") == 7
    assert parse_user_id("ID_x") is None
    assert parse_user_id("misc") is None


@pytest.fixture()
def mixed_tree(tmp_path):
    """Real root with ID_* user dirs (10 imgs each) + one generated root."""
    from PIL import Image

    rng = np.random.default_rng(1)

    def fill(root, n):
        for uid in (1, 2):
            d = root / f"ID_{uid}"
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((32, 32, 3)) * 255).astype("uint8")
                Image.fromarray(arr).save(d / f"{i}.png")

    real, gen = tmp_path / "real", tmp_path / "gen"
    fill(real, 10)
    fill(gen, 4)
    return real, gen


def test_mixed_domain_split_and_merge(mixed_tree):
    """Per-user 80/20 split is deterministic and disjoint; generated data
    merges into train only (domain_classifier_training.py:279-541)."""
    from vavae_tpu.data.image_folder import MixedDomainDataset

    real, gen = mixed_tree
    mk = lambda split, use_gen: MixedDomainDataset(
        real_dir=str(real), generated_dirs=[str(gen)], split=split,
        image_size=32, use_generated=use_gen, verbose=False)

    tr, va = mk("train", False), mk("val", False)
    assert len(tr) == 16 and len(va) == 4  # 2 users x (8 train / 2 val)
    assert set(p for p, _ in tr.items).isdisjoint(p for p, _ in va.items)
    # deterministic across instantiations
    assert mk("train", False).items == tr.items

    tr_aug = mk("train", True)
    assert len(tr_aug) == 16 + 8
    s = tr_aug.summary()
    assert s == {"real": 16, "generated": 8, "users": 2,
                 "per_source": {"real": 16, "generated_1": 8}}
    # val never sees generated data, labels are 0-based from ID_k
    va_aug = mk("val", True)
    assert len(va_aug) == 4
    assert {uid for _, uid in tr_aug.items} == {0, 1}


def test_mixed_domain_presplit_reference_layout(tmp_path, mixed_tree):
    """Reference presplit JSON layout {split: {user_folder: [paths]}} loads
    with ID_k -> k-1 labels and skips missing files."""
    import json as _json

    from vavae_tpu.data.image_folder import MixedDomainDataset

    real, _ = mixed_tree
    imgs = sorted(str(p) for p in (real / "ID_1").glob("*.png"))
    split = {"train": {"ID_1": imgs[:3] + ["/nonexistent.png"]},
             "val": {"ID_1": imgs[3:5]}}
    sf = tmp_path / "split.json"
    sf.write_text(_json.dumps(split))
    tr = MixedDomainDataset(real_dir=str(real), split="train", image_size=32,
                            split_file=str(sf), verbose=False)
    assert len(tr) == 3 and all(uid == 0 for _, uid in tr.items)
    va = MixedDomainDataset(real_dir=str(real), split="val", image_size=32,
                            split_file=str(sf), verbose=False)
    assert len(va) == 2


def test_split_file_dataset_all_reference_layouts(tmp_path, mixed_tree):
    """SplitFileDataset reads every split-JSON layout the reference reads or
    writes (microdoppler_dataset_diffusion.py:38-85): our flat list of
    {path, user_id} dicts, the reference's per-user dict of relative paths
    (missing files skipped), and the legacy list of dir names / file paths."""
    import json as _json

    from vavae_tpu.data.image_folder import SplitFileDataset

    real, _ = mixed_tree
    rel = lambda p: str(p.relative_to(real))
    u1 = sorted((real / "ID_1").glob("*.png"))
    u2 = sorted((real / "ID_2").glob("*.png"))

    # 1) flat list (ours)
    flat = {"train": [{"path": str(u1[0]), "user_id": 0},
                      {"path": str(u2[0]), "user_id": 1}]}
    sf = tmp_path / "flat.json"
    sf.write_text(_json.dumps(flat))
    ds = SplitFileDataset(str(sf), "train", image_size=32)
    assert [uid for _, uid in ds.items] == [0, 1]
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and -1.0 <= x.min() and x.max() <= 1.0

    # 2) reference per-user dict, relative paths + dataset root; ID_k is
    #    1-based -> k-1; a missing file is skipped, not fatal
    refd = {"train": {"ID_1": [rel(p) for p in u1[:3]] + ["missing.png"],
                      "ID_2": [rel(p) for p in u2[:2]]},
            "val": {"ID_1": [rel(p) for p in u1[3:5]]}}
    sf2 = tmp_path / "ref.json"
    sf2.write_text(_json.dumps(refd))
    tr = SplitFileDataset(str(sf2), "train", image_size=32, root=str(real))
    assert sorted(uid for _, uid in tr.items) == [0, 0, 0, 1, 1]
    va = SplitFileDataset(str(sf2), "val", image_size=32, root=str(real))
    assert len(va) == 2
    # per-user filter still applies
    only2 = SplitFileDataset(str(sf2), "train", image_size=32,
                             root=str(real), user_id=1)
    assert len(only2) == 2

    # 3) legacy list of strings: a dir name (scanned) + a bare file path;
    #    a stale entry is SKIPPED like the reference's is_file() gate
    #    (microdoppler_dataset_diffusion.py:76), and an ABSOLUTE file path
    #    still gets its uid from the first parseable path component
    legacy = {"train": ["ID_1", rel(u2[0]), "ID_2/deleted.png",
                        str(u2[1])]}
    sf3 = tmp_path / "legacy.json"
    sf3.write_text(_json.dumps(legacy))
    ds3 = SplitFileDataset(str(sf3), "train", image_size=32, root=str(real))
    assert sorted(uid for _, uid in ds3.items) == [0] * len(u1) + [1, 1]
    assert not any(p.endswith("deleted.png") for p, _ in ds3.items)

    with pytest.raises(ValueError, match="not found"):
        SplitFileDataset(str(sf3), "test", image_size=32)
