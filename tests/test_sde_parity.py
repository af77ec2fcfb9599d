"""SDE sampler trajectory parity vs the ACTUAL reference implementation.

Loads the reference transport package (/root/reference/LightningDiT/transport,
with torchdiffeq stubbed — only the adaptive-ODE path touches it), feeds its
Euler–Maruyama / Heun integrators and ours IDENTICAL Wiener increments (the
`noise` argument of transport/sde.py; torch.randn monkeypatched to the same
sequence), and asserts the final samples match after the full trajectory
INCLUDING the last-step correction (Mean/Tweedie/Euler —
transport.py:304-396). The coupling-path formulas are parity-tested in
test_transport_parity.py; this pins the integrator loop + interval + last
step end to end.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_PKG = "/root/reference/LightningDiT/transport"


def _load_ref_transport():
    if "torchdiffeq" not in sys.modules:
        stub = types.ModuleType("torchdiffeq")
        stub.odeint = None
        sys.modules["torchdiffeq"] = stub
    if "ref_transport" in sys.modules:
        return sys.modules["ref_transport"]
    spec = importlib.util.spec_from_file_location(
        "ref_transport",
        os.path.join(REF_PKG, "__init__.py"),
        submodule_search_locations=[REF_PKG],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_transport"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize(
    "method,diffusion_form,last_step",
    [
        ("Euler", "SBDM", "Mean"),
        ("Euler", "sigma", "Tweedie"),
        ("Heun", "linear", "Euler"),
    ],
)
def test_sde_trajectory_parity(method, diffusion_form, last_step, monkeypatch):
    if not os.path.exists(REF_PKG):
        pytest.skip("reference tree not mounted")
    try:
        import torch

        ref = _load_ref_transport()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot load reference transport package: {e}")

    import jax
    import jax.numpy as jnp

    from vavae_tpu.transport import Sampler, create_transport

    B, H, W, C = 2, 4, 4, 3
    num_steps = 8
    rng = np.random.default_rng(42)
    x0 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    # enough increments for either integrator (one randn per step)
    ws = rng.normal(size=(num_steps - 1, B, H, W, C)).astype(np.float32)

    # analytic velocity field, identical in both frameworks
    a, b = -0.7, 0.3

    def model_torch(x, t, **kw):
        return a * x + b * torch.cos(4.0 * t).view(-1, 1, 1, 1)

    def model_jax(x, t, **kw):
        return a * x + b * jnp.cos(4.0 * t).reshape(-1, 1, 1, 1)

    # SBDM diffusion is 1/t-singular at t=0 for the Linear path (inf in the
    # reference too — verified), so SDE+SBDM needs eps > 0. The reference's
    # create_transport force-zeroes eps for velocity+Linear even when passed
    # (transport/__init__.py:56-57 — a genuine bug; our factory honors an
    # explicit eps, see transport.py create_transport), so set the reference
    # attributes directly to what a fixed factory would produce.
    eps = dict(train_eps=1e-3, sample_eps=1e-3) if diffusion_form == "SBDM" else {}

    # --- reference: NCHW tensors, torch.randn fed from the shared sequence
    seq = iter(np.transpose(ws, (0, 1, 4, 2, 3)).copy())
    monkeypatch.setattr(torch, "randn", lambda *s, **k: torch.from_numpy(next(seq)))
    ref_transport = ref.create_transport("Linear", "velocity")
    for k, v in eps.items():
        setattr(ref_transport, k, v)
    ref_fn = ref.Sampler(ref_transport).sample_sde(
        sampling_method=method,
        diffusion_form=diffusion_form,
        last_step=last_step,
        last_step_size=0.04,
        num_steps=num_steps,
    )
    with torch.no_grad():
        xs = ref_fn(torch.from_numpy(np.transpose(x0, (0, 3, 1, 2)).copy()), model_torch)
    ref_out = np.transpose(xs[-1].numpy(), (0, 2, 3, 1))

    # --- ours: same increments via the noise argument (NHWC natively)
    our_fn = Sampler(create_transport("Linear", "velocity", **eps)).sample_sde(
        sampling_method=method,
        diffusion_form=diffusion_form,
        last_step=last_step,
        last_step_size=0.04,
        num_steps=num_steps,
    )
    our_out = np.asarray(
        our_fn(None, jnp.asarray(x0), model_jax, noise=jnp.asarray(ws))
    )

    assert np.isfinite(ref_out).all() and np.isfinite(our_out).all()
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=2e-5)
