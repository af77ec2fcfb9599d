"""Transport-path parity vs the reference's torch path.py (self-contained).

Checks plan (xt, ut), drift/diffusion, and the velocity↔score↔noise
conversions for all three coupling plans at fixed inputs — gate #4 of the
build plan (SURVEY.md §7).
"""
import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/LightningDiT/transport/path.py"


def _load_ref_path():
    spec = importlib.util.spec_from_file_location("ref_path", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("plan_name", ["Linear", "VP", "GVP"])
def test_path_parity(plan_name):
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    try:
        import torch

        ref_mod = _load_ref_path()
    except Exception as e:
        pytest.skip(f"cannot load reference path.py: {e}")

    import jax.numpy as jnp

    from vavae_tpu.transport import paths as jp

    ref_plan = {
        "Linear": ref_mod.ICPlan,
        "VP": ref_mod.VPCPlan,
        "GVP": ref_mod.GVPCPlan,
    }[plan_name]()
    our_plan = {
        "Linear": jp.LinearPath,
        "VP": jp.VPPath,
        "GVP": jp.GVPPath,
    }[plan_name]()

    rng = np.random.default_rng(0)
    B = 4
    x0 = rng.normal(size=(B, 2, 2, 3)).astype(np.float32)  # noise
    x1 = rng.normal(size=(B, 2, 2, 3)).astype(np.float32)  # data
    t = np.asarray([0.1, 0.35, 0.6, 0.9], np.float32)

    tt = torch.from_numpy(t)
    t0 = torch.from_numpy(x0)
    t1 = torch.from_numpy(x1)
    _, xt_ref, ut_ref = ref_plan.plan(tt, t0, t1)

    _, xt_j, ut_j = jp.plan(our_plan, jnp.asarray(t), jnp.asarray(x0), jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(xt_j), xt_ref.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ut_j), ut_ref.numpy(), rtol=1e-4, atol=1e-5)

    # velocity -> score -> velocity round trip matches the reference's maps
    vel = rng.normal(size=x0.shape).astype(np.float32)
    xt_np = xt_ref.numpy()
    score_ref = ref_plan.get_score_from_velocity(
        torch.from_numpy(vel), torch.from_numpy(xt_np), tt
    ).numpy()
    score_j = jp.score_from_velocity(
        our_plan, jnp.asarray(vel), jnp.asarray(xt_np), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(score_j), score_ref, rtol=1e-4, atol=1e-4)

    noise_ref = ref_plan.get_noise_from_velocity(
        torch.from_numpy(vel), torch.from_numpy(xt_np), tt
    ).numpy()
    noise_j = jp.noise_from_velocity(
        our_plan, jnp.asarray(vel), jnp.asarray(xt_np), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(noise_j), noise_ref, rtol=1e-4, atol=1e-4)

    # drift + diffusion forms (SDE path)
    drift_ref = ref_plan.compute_drift(torch.from_numpy(xt_np), tt)[0].numpy()
    drift_j = our_plan.drift(jnp.asarray(xt_np), jnp.asarray(t))[0]
    np.testing.assert_allclose(np.asarray(drift_j), drift_ref, rtol=1e-4, atol=1e-5)

    for form in ("constant", "SBDM", "sigma", "linear"):
        diff_ref = ref_plan.compute_diffusion(torch.from_numpy(xt_np), tt, form=form)
        diff_ref = diff_ref.numpy() if hasattr(diff_ref, "numpy") else np.asarray(diff_ref)
        diff_j = np.asarray(
            jp.diffusion_coeff(our_plan, jnp.asarray(xt_np), jnp.asarray(t), form=form)
        )
        a, b = np.broadcast_arrays(diff_j, diff_ref)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
