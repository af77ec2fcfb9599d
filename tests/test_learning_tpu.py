"""On-hardware end-to-end generative check (TPU only, ~8 min).

Trains DiT-S on structured synthetic latents (per-class patterns), then
CFG-samples and verifies the generated latents are conditioned correctly —
closest to their own class mean. Exercises the full stack numerically:
model (Pallas attention fwd+bwd under remat/scan), transport loss, trainer
(donation, EMA), and the split-CFG sampler.
"""
import jax
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="on-hardware learning check"
    ),
]


def test_train_then_conditional_sample_learns():
    import jax.numpy as jnp

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import Sampler, create_transport

    n_classes, B = 4, 64
    rng_np = np.random.default_rng(0)
    class_means = 2.0 * rng_np.normal(size=(n_classes, 16, 16, 32)).astype(np.float32)

    def batch():
        y = rng_np.integers(0, n_classes, size=(B,)).astype(np.int32)
        x = class_means[y] + 0.05 * rng_np.normal(size=(B, 16, 16, 32)).astype(np.float32)
        return x, y

    model = LightningDiT(
        input_size=16, patch_size=2, in_channels=32, hidden_size=384,
        depth=12, num_heads=6, num_classes=n_classes,
        use_swiglu=True, use_rope=True, use_rmsnorm=True, dtype=jnp.bfloat16,
        class_dropout_prob=0.1,
    )
    transport = create_transport("Linear", "velocity", use_cosine_loss=True,
                                 use_lognorm=True)
    mesh = make_mesh()
    # short run: fast EMA so the averaged weights actually track
    trainer = DiTTrainer(model, transport, mesh, lr=3e-4, beta2=0.95, ema_decay=0.99)
    rng = jax.random.PRNGKey(0)
    state = trainer.replicate(trainer.init_state(rng, (B, 16, 16, 32)))

    first = None
    for step in range(1200):
        state, m = trainer.train_step(state, rng, trainer.shard_batch(batch()))
        if step == 0:
            first = float(jax.device_get(m["loss"]))
    last = float(jax.device_get(m["loss"]))
    assert last < 0.5 * first, (first, last)

    # CFG sampling with the EMA weights: 4 samples per class
    sampler = Sampler(transport)
    sample_fn = sampler.sample_ode_cfg(
        num_steps=50, timestep_shift=0.3, cfg_interval_start=0.11
    )
    n_per, cfg_scale = 4, 2.0
    labels = jnp.asarray(np.repeat(np.arange(n_classes), n_per), jnp.int32)
    Bs = len(labels)
    y_cfg = jnp.concatenate([labels, jnp.full((Bs,), n_classes, jnp.int32)])
    ema = state.ema_params

    @jax.jit
    def generate(p, rng):
        def cond(x, t):
            return model.apply({"params": p}, x, t, labels)

        def cfgf(x, t):
            return model.forward_with_cfg(p, x, t, y_cfg, cfg_scale)

        z = jax.random.normal(rng, (Bs, 16, 16, 32), jnp.float32)
        return sample_fn(z, cond, cfgf)

    samples = np.asarray(generate(ema, jax.random.PRNGKey(7)), np.float32)
    assert np.isfinite(samples).all()

    # each sample must be nearest (L2) to ITS class mean
    flat = samples.reshape(Bs, -1)
    means = class_means.reshape(n_classes, -1)
    d = np.linalg.norm(flat[:, None] - means[None], axis=-1)
    pred = d.argmin(axis=-1)
    acc = (pred == np.asarray(labels)).mean()
    assert acc >= 0.75, f"conditional generation accuracy {acc}"
