"""Contiguity-safe safetensors writes (utils/safetensors_io).

Upstream ``safetensors.numpy.save_file`` serializes (data_ptr, nbytes)
spans and ignores numpy strides, silently writing transposed/scrambled
data for any non-contiguous input. Two real corruptions rode on that:
latent shards (the writer transposes NHWC→NCHW via a VIEW,
pipelines/extract_features.py) and axon-backend checkpoints (device
fetches of conv_out kernels come back as correct-content strided views).
These tests pin the wrapper against every stride shape we've been bitten
by — and document the upstream behavior so the wrapper's necessity is
re-checked if safetensors is ever upgraded.
"""
import numpy as np
import pytest
from safetensors.numpy import load_file
from safetensors.numpy import save_file as raw_save_file

from vavae_tpu.utils.safetensors_io import save_file


def _cases():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(2, 5, 4, 3)).astype(np.float32)
    return {
        "transposed_view": np.transpose(base, (0, 3, 1, 2)),
        "negative_stride": base[:, ::-1],
        "inner_slice": base[:, 1:4, :, 1:],
        "fortran_order": np.asfortranarray(base),
        "scalar_0d": np.float32(3.25),
        "contiguous": base,
    }


def test_wrapper_roundtrips_every_stride_shape(tmp_path):
    p = str(tmp_path / "w.safetensors")
    cases = _cases()
    save_file(cases, p)
    back = load_file(p)
    for k, v in cases.items():
        got = back[k]
        assert got.shape == np.asarray(v).shape, k
        np.testing.assert_array_equal(got, v, err_msg=k)


def test_raw_safetensors_still_needs_the_wrapper(tmp_path):
    """If this starts failing, upstream fixed the strides bug and the
    wrapper can be retired (keep it until then)."""
    p = str(tmp_path / "raw.safetensors")
    t = np.transpose(np.arange(24, dtype=np.float32).reshape(2, 3, 4), (0, 2, 1))
    raw_save_file({"x": t}, p)
    assert not np.array_equal(load_file(p)["x"], t)


def test_shard_write_path_is_chw_byte_compatible(tmp_path):
    """The extract_features flush: NHWC accumulators are stored CHW for
    byte-compat with the reference shard format. The write-side transpose
    is a view — exactly the shape that corrupted under raw save_file."""
    rng = np.random.default_rng(1)
    nhwc = rng.normal(size=(6, 8, 8, 4)).astype(np.float32)
    p = str(tmp_path / "latents_rank00_shard000.safetensors")
    save_file(
        {
            "latents": np.transpose(nhwc, (0, 3, 1, 2)),
            "latents_flip": np.transpose(nhwc[:, :, ::-1, :], (0, 3, 1, 2)),
            "labels": np.arange(6, dtype=np.int64),
        },
        p,
    )
    back = load_file(p)
    # logical content round-trips
    np.testing.assert_array_equal(
        np.transpose(back["latents"], (0, 2, 3, 1)), nhwc
    )
    np.testing.assert_array_equal(
        np.transpose(back["latents_flip"], (0, 2, 3, 1)), nhwc[:, :, ::-1, :]
    )
    # and the bytes on disk really are CHW order (reference byte-compat):
    # element [n, c, h, w] lives at flat index ((n*C + c)*H + h)*W + w
    flat = back["latents"].reshape(-1)
    n, c, h, w = 3, 2, 5, 1
    assert flat[((n * 4 + c) * 8 + h) * 8 + w] == nhwc[n, h, w, c]


def test_extract_roundtrip_matches_direct_encode(tmp_path):
    """End-to-end: extract_features shards, read back through
    ImgLatentDataset, must reproduce the direct posterior-sample encode of
    the same images bit-close (the guard that was missing when the
    scrambled-shard bug shipped). Replicates extract()'s rng schedule
    (PRNGKey(seed + rank), per-batch 3-way split) so the comparison is
    exact, not statistical."""
    import jax
    import yaml
    from PIL import Image

    from vavae_tpu.data.latent_dataset import ImgLatentDataset
    from vavae_tpu.pipelines.extract_features import extract, list_image_folder
    from vavae_tpu.tokenizer import VA_VAE, preprocess_images

    data = tmp_path / "imgs"
    rng = np.random.default_rng(2)
    for ci in range(2):
        d = data / f"class{ci}"
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    cfg = {
        "ckpt_path": None,  # fresh random params (explicit, not a typo'd path)
        "model": {
            "params": {
                "embed_dim": 4,
                "ddconfig": {
                    "z_channels": 4,
                    "resolution": 32,
                    "ch": 32,
                    "ch_mult": [1, 1],
                    "num_res_blocks": 1,
                    "attn_resolutions": [],
                },
            }
        },
    }
    cfg_path = str(tmp_path / "vae.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    vae = VA_VAE(cfg_path, img_size=32)

    out = tmp_path / "latents"
    extract(str(data), str(out), vae, batch_size=3, image_size=32, seed=0)

    ds = ImgLatentDataset(str(out), latent_norm=False)
    items = list_image_folder(str(data))
    assert len(ds) == len(items) == 6
    # _item(idx, flip=False): deterministic, no random hflip
    got = np.stack([ds._item(i, False)[0] for i in range(len(ds))])  # (N,H,W,C)

    pil = [Image.open(p) for p, _ in items]
    x = preprocess_images(pil, 32, hflip=False)
    for im in pil:
        im.close()
    key = jax.random.PRNGKey(0)  # seed 0 + process_index 0
    want = []
    for s in range(0, len(items), 3):
        key, r1, _r2 = jax.random.split(key, 3)
        want.append(np.asarray(vae.encode_images(x[s : s + 3], rng=r1)))
    want = np.concatenate(want)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
