"""Contiguity-safe safetensors writes.

``safetensors.numpy.save_file`` serializes each array as a raw
(data_ptr, nbytes) span — it IGNORES numpy strides. Handing it a
non-contiguous array (a ``np.transpose`` view, or a device fetch from the
tunneled TPU backend, whose ``np.asarray`` returns correct-content but
*strided* views for tilings that transpose small trailing dims, e.g. conv
kernels with out-channels 3) silently writes the underlying buffer in its
memory order under the logical shape: the file round-trips to a
transposed/scrambled tensor with no error anywhere.

This measured bite twice: latent shards written by ``extract_features``
stored NHWC bytes under an NCHW header (the write-side transpose is a
view), and VAE ``conv_out`` kernels checkpointed on the axon backend came
back permuted (the round-2 TPU-only 100%-mismatch test failure).

Every save_file call in this package must go through this wrapper. The
train-state writer (``train/checkpoint.py``) applies the same fix inline
because it also rewrites dtypes.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Union

import numpy as np
from safetensors.numpy import save_file as _raw_save_file


def _contiguous(a: np.ndarray) -> np.ndarray:
    # ascontiguousarray promotes 0-d to (1,); reshape restores scalar shape
    arr = np.asarray(a)
    return np.ascontiguousarray(arr).reshape(arr.shape)


def save_file(
    tensors: Dict[str, np.ndarray],
    filename: Union[str, os.PathLike],
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Exactly ``safetensors.numpy.save_file`` but safe for non-contiguous
    (strided/transposed/device-fetched) arrays."""
    _raw_save_file(
        {k: _contiguous(v) for k, v in tensors.items()}, filename, metadata=metadata
    )
