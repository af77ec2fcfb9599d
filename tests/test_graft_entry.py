"""The driver's multichip dryrun must be immune to the TPU plugin.

Round-1 postmortem: the env pins JAX_PLATFORMS=axon (re-set by
sitecustomize), so env-var platform forcing is silently ignored and the
dryrun's first eager op initialized a broken TPU backend and died.
dryrun_multichip now pins the CPU platform via jax.config before any
backend init; this test runs it in a subprocess with the TPU backend
deliberately UNAVAILABLE (platform name pinned, plugin not registered) —
the dryrun must still pass.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_survives_broken_tpu_backend():
    env = dict(os.environ)
    # pin a backend name that cannot resolve: the axon plugin only
    # registers when PALLAS_AXON_POOL_IPS is set, so with it cleared any
    # default-backend op raises "Backend 'axon' is not a known backend"
    env["JAX_PLATFORMS"] = "axon"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("VAVAE_PLATFORM", None)  # dryrun must set this itself
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"dryrun failed:\n{proc.stdout}\n{proc.stderr}"
    assert "DiT 3 train steps ok" in proc.stdout
    assert "sharded ckpt save/restore resumes bit-equal" in proc.stdout
    assert "VAE 2-opt GAN 3 steps ok" in proc.stdout
    assert "sharded CFG sampling ok" in proc.stdout
    assert "sharded tokenizer-eval ok" in proc.stdout
