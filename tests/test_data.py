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
