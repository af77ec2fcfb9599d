"""Test harness: force an 8-device CPU platform so mesh/sharding tests run
without TPU hardware (SURVEY.md §4: the reference cannot test distributed
code below a real cluster; JAX host-device virtualization fixes that)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import vavae_tpu.utils.jax_cache  # noqa: E402,F401  (persistent compile cache)

import jax  # noqa: E402

# NOTE on platforms: the TPU plugin environment pins JAX_PLATFORMS=axon in
# the env, so the setdefault above is a no-op there and the suite runs with
# the TPU as default backend (TPU-gated tests then RUN rather than skip;
# mesh tests always use the virtual CPU devices via the mesh8 fixture).
# Set VAVAE_TEST_PLATFORM=cpu for a fast pure-CPU pass (TPU tests skip).
_plat = os.environ.get("VAVAE_TEST_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# parity tests compare against fp32 references; don't let the TPU backend
# silently drop matmuls to bf16
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def mesh8():
    from vavae_tpu.parallel.mesh import make_mesh

    # select the CPU host platform explicitly: in some environments a TPU
    # plugin forces itself as default backend regardless of JAX_PLATFORMS
    return make_mesh(devices=jax.devices("cpu"))


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
