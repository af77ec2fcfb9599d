import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vavae_tpu.parallel.mesh import DATA_AXIS, data_sharding, make_mesh, shard_batch


def test_mesh_has_8_devices(mesh8):
    assert np.prod(list(mesh8.shape.values())) == 8
    assert mesh8.shape[DATA_AXIS] == 8


def test_shard_batch_and_mean(mesh8):
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh8, x)
    assert xs.sharding.spec == P((DATA_AXIS, "fsdp"), None)

    # a jitted global mean over a sharded batch == numpy mean (XLA inserts
    # the cross-device reduction; this is the DDP-allreduce equivalent)
    f = jax.jit(lambda v: jnp.mean(v), out_shardings=NamedSharding(mesh8, P()))
    assert np.allclose(f(xs), x.mean())


def test_sharded_grad_matches_single_device(mesh8):
    """Data-parallel gradients must equal single-device gradients."""
    w = jnp.ones((4, 4))
    x = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    cpu0 = jax.devices("cpu")[0]
    g_single = jax.grad(loss)(
        jax.device_put(w, cpu0), jax.device_put(jnp.asarray(x), cpu0)
    )
    xs = shard_batch(mesh8, x)
    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    assert np.allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-5)
