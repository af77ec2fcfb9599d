"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP/Accelerate/Lightning runtime stack.

The reference reaches NCCL three ways (SURVEY.md §2.6: raw torch.distributed,
HF Accelerate, Lightning DDP). Here the entire distributed runtime is a
``jax.sharding.Mesh`` with named axes plus ``NamedSharding`` annotations;
XLA lowers the implicit gradient reductions to ICI/DCN collectives.

Mesh axes:
  - "data":  batch (data-parallel) axis — always present.
  - "fsdp":  optional parameter-sharding axis (ZeRO-style) for the 1B+ DiT
             variants; folded into "data" for gradient reduction.
  - "tensor": optional tensor-parallel axis for very large models.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"


def multihost_init() -> None:
    """Initialize the multi-host JAX runtime if launched under a cluster.

    Replaces torch.dist init_process_group("nccl") (reference
    extract_features.py:23). No-ops when single-host (the common case for
    tests and single-slice runs, where jax discovers all local devices).
    Rendezvous via env vars — the same MASTER_ADDR/RANK-style contract as
    the reference's run_train.sh:4-9: JAX_COORDINATOR_ADDRESS (host:port),
    JAX_NUM_PROCESSES, JAX_PROCESS_ID. On TPU pods with auto-detection the
    latter two may be omitted.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kw = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)


def make_mesh(
    data: int | None = None,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh over the available devices.

    ``data=None`` uses all remaining devices after fsdp/tensor are carved out.
    Axis order puts ``tensor`` innermost so tensor-parallel collectives ride
    the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over data+fsdp; replicate the rest."""
    spec = P((DATA_AXIS, FSDP_AXIS), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays onto the mesh, batch-sharded.

    Single-process: ``batch`` is the global batch, scattered across local
    devices with a plain device_put. Multi-process: ``batch`` is THIS
    process's shard (the per-rank loader output, like the reference's
    DistributedSampler batches) and the global array is assembled via
    ``jax.make_array_from_process_local_data`` — device_put cannot target
    non-addressable devices.
    """
    multi = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x))
        if multi:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


@functools.cache
def donation_supported() -> bool:
    """Probe whether buffer donation works on the default backend.

    Donation (in-place state update) is the right design on real TPUs —
    it halves peak memory for the optimizer step — but some experimental
    runtimes (the tunneled 'axon' backend) fail donated executions at run
    time with an opaque InvalidArgument. Probe once with a tiny aliased
    computation and cache the verdict. Override with VAVAE_DONATE=0/1."""
    env = os.environ.get("VAVAE_DONATE")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        import numpy as _np

        f = jax.jit(lambda x: x * 2.0 + 1.0, donate_argnums=(0,))
        out = f(jax.numpy.zeros((8, 128), jax.numpy.float32))
        _np.asarray(out)  # force execution + fetch (async backends)
        return True
    except Exception:
        return False


def donate_state_argnums() -> tuple:
    """(0,) when donation works here, else () — for trainer jit wrappers."""
    return (0,) if donation_supported() else ()


def local_mesh_if_divisible(batch_size: int) -> Mesh | None:
    """make_mesh() over all local devices when ``batch_size`` splits evenly,
    else None (caller runs single-device). For facades with transparent
    remainder padding (VA_VAE._pad_batch) just call make_mesh() directly."""
    n = len(jax.local_devices())
    return make_mesh() if n > 0 and batch_size % n == 0 else None


@functools.cache
def cpu_mesh(n: int = 8) -> Mesh:
    """A CPU-device test mesh; requires XLA_FLAGS=--xla_force_host_platform_device_count=n.

    Works even when another platform (TPU) is the default backend — the CPU
    host platform always exists alongside it.
    """
    devs = jax.devices("cpu")[:n]
    return Mesh(np.asarray(devs).reshape(len(devs), 1, 1), (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def process_fname(prefix: str, suffix: str, shard: int) -> str:
    """Per-process shard filename, replacing the reference's rank-interleaved
    naming (extract_features.py:115: latents_rank{rank}_shard{k})."""
    return f"{prefix}_rank{jax.process_index():02d}_shard{shard:03d}{suffix}"
