"""LSUN + ImageNet dataset classes on synthetic folder trees
(VERDICT r1 missing #5; parity targets ldm/data/lsun.py and
ldm/data/imagenet.py:134-270)."""
import os
import random

import numpy as np
import pytest
from PIL import Image

from vavae_tpu.data.ldm_datasets import (
    ImageNetTrain,
    ImageNetValidation,
    LSUNBase,
    LSUNChurchesValidation,
)


def _write_img(path, w, h, value):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((h, w, 3), value, np.uint8)
    arr[:, : w // 2, 0] = 255  # asymmetric so flips are detectable
    Image.fromarray(arr).save(path)


@pytest.fixture()
def lsun_tree(tmp_path):
    root = tmp_path / "churches"
    rels = []
    for i, (w, h) in enumerate([(96, 64), (64, 96), (80, 80)]):
        rel = f"img_{i}.png"
        _write_img(str(root / rel), w, h, 60 + i)
        rels.append(rel)
    txt = tmp_path / "church_outdoor_val.txt"
    txt.write_text("\n".join(rels) + "\n")
    return str(txt), str(root)


def test_lsun_base_crop_resize_range(lsun_tree):
    txt, root = lsun_tree
    ds = LSUNBase(txt_file=txt, data_root=root, size=32, flip_p=0.0)
    assert len(ds) == 3
    for i in range(3):
        img, label = ds[i]
        assert img.shape == (32, 32, 3) and label == 0
        assert -1.0 <= img.min() and img.max() <= 1.0
    ex = ds.example(0)
    assert ex["relative_file_path_"] == "img_0.png"
    assert ex["file_path_"] == os.path.join(root, "img_0.png")
    assert ex["image"].shape == (32, 32, 3)
    # score-sde order: crop FIRST then resize — a 96x64 image center-crops
    # to 64², so the red left half of the ORIGINAL is fully cropped-in
    img0, _ = ds[0]
    assert img0[:, :8, 0].mean() > 0.9  # red stripe present after crop


def test_lsun_flip_probability(lsun_tree):
    txt, root = lsun_tree
    ds = LSUNBase(txt_file=txt, data_root=root, size=32, flip_p=1.0)
    ds0 = LSUNBase(txt_file=txt, data_root=root, size=32, flip_p=0.0)
    a, _ = ds[2]
    b, _ = ds0[2]
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)


def test_lsun_subclass_and_batches(lsun_tree):
    txt, root = lsun_tree
    ds = LSUNChurchesValidation(txt_file=txt, data_root=root, size=32)
    assert ds.flip_p == 0.0  # validation default (lsun.py:66-69)
    batch, labels = next(ds.batches(2, seed=0, epochs=1))
    assert batch.shape == (2, 32, 32, 3) and labels.shape == (2,)


@pytest.fixture()
def imagenet_tree(tmp_path):
    root = tmp_path / "ILSVRC2012_validation"
    synsets = ["n01440764", "n01443537", "n02102040"]
    for si, s in enumerate(synsets):
        for j in range(2):
            _write_img(str(root / "data" / s / f"{s}_{j}.JPEG"), 80, 60, 40 + si)
    # the known-bad file must be filtered out
    _write_img(str(root / "data" / synsets[0] / "n06596364_9591.JPEG"), 80, 60, 0)
    return str(root)


def test_imagenet_filelist_labels_and_filter(imagenet_tree):
    ds = ImageNetValidation(data_root=imagenet_tree, size=32)
    # filelist.txt built and cached
    assert os.path.exists(os.path.join(imagenet_tree, "filelist.txt"))
    assert len(ds) == 6  # bad file filtered (imagenet.py:49-52)
    labels = sorted({label for _, label in ds.items})
    assert labels == [0, 1, 2]  # sorted-synset indices
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    assert -1.0 <= img.min() and img.max() <= 1.0
    # validation is center-crop: deterministic across reads
    img2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)


def test_imagenet_train_random_crop(imagenet_tree):
    ds = ImageNetTrain(data_root=imagenet_tree, size=24)
    assert ds.random_crop
    random.seed(0)
    imgs = {ds[0][0].tobytes() for _ in range(8)}
    assert len(imgs) > 1  # crops actually vary


def test_imagenet_orig_class_labels(imagenet_tree):
    import yaml

    mapping = {0: "n01440764", 7: "n01443537", 501: "n02102040"}
    with open(os.path.join(imagenet_tree, "index_synset.yaml"), "w") as f:
        yaml.safe_dump(mapping, f)
    ds = ImageNetValidation(data_root=imagenet_tree, size=32,
                            keep_orig_class_label=True)
    labels = sorted({label for _, label in ds.items})
    assert labels == [0, 7, 501]


def test_imagenet_missing_tree_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="zero-egress"):
        ImageNetValidation(data_root=str(tmp_path / "nope"))
