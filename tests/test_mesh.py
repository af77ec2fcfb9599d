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


def test_fsdp_state_sharding_matches_replicated():
    """With fsdp > 1 the train state must actually shard over the fsdp axis,
    and one step must produce the same loss as the pure-DP mesh (GSPMD
    inserts the all-gathers/reduce-scatters; math unchanged)."""
    import jax
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import FSDP_AXIS, make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    devs = jax.devices("cpu")[:8]
    B = 8
    x = np.random.default_rng(0).normal(size=(B, 8, 8, 4)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 8, size=(B,)).astype(np.int32)

    losses = {}
    shardings = {}
    for fsdp in (1, 4):
        mesh = make_mesh(data=8 // fsdp, fsdp=fsdp, devices=devs)
        model = LightningDiT(
            input_size=8, patch_size=2, in_channels=4, hidden_size=64,
            depth=2, num_heads=4, num_classes=8, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        transport = create_transport("Linear", "velocity")
        trainer = DiTTrainer(model, transport, mesh, lr=1e-4)
        state = trainer.replicate(trainer.init_state(jax.random.PRNGKey(0), (B, 8, 8, 4)))
        qkv = state.params["blocks"]["block"]["attn"]["qkv"]["kernel"]
        shardings[fsdp] = qkv.sharding
        state, m = trainer.train_step(
            state, jax.random.PRNGKey(1), trainer.shard_batch((x, y))
        )
        losses[fsdp] = float(jax.device_get(m["loss"]))

    assert shardings[1].is_fully_replicated
    assert not shardings[4].is_fully_replicated
    assert FSDP_AXIS in str(shardings[4].spec)
    np.testing.assert_allclose(losses[1], losses[4], rtol=2e-4)


def test_tensor_parallel_matches_dp():
    """tensor=2: qkv columns sharded over the tensor axis, same loss as DP."""
    import jax
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import TENSOR_AXIS, make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    devs = jax.devices("cpu")[:8]
    B = 8
    x = np.random.default_rng(0).normal(size=(B, 8, 8, 4)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 8, size=(B,)).astype(np.int32)

    losses, qkv_shardings, proj_shardings = {}, {}, {}
    for tensor in (1, 2):
        mesh = make_mesh(data=8 // tensor, tensor=tensor, devices=devs)
        model = LightningDiT(
            input_size=8, patch_size=2, in_channels=4, hidden_size=64,
            depth=2, num_heads=4, num_classes=8, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        trainer = DiTTrainer(model, create_transport("Linear", "velocity"), mesh, lr=1e-4)
        state = trainer.replicate(trainer.init_state(jax.random.PRNGKey(0), (B, 8, 8, 4)))
        blk = state.params["blocks"]["block"]
        qkv_shardings[tensor] = blk["attn"]["qkv"]["kernel"].sharding
        proj_shardings[tensor] = blk["attn"]["proj"]["kernel"].sharding
        state, m = trainer.train_step(
            state, jax.random.PRNGKey(1), trainer.shard_batch((x, y))
        )
        losses[tensor] = float(jax.device_get(m["loss"]))

    assert qkv_shardings[1].is_fully_replicated
    # column-parallel qkv: last dim; row-parallel proj: second-to-last
    assert str(qkv_shardings[2].spec).count(TENSOR_AXIS) == 1
    assert qkv_shardings[2].spec[-1] == TENSOR_AXIS
    assert proj_shardings[2].spec[-2] == TENSOR_AXIS
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)


def test_grad_accum_matches_full_batch():
    """grad_accum=2 must EXACTLY equal one optimizer step on the mean of the
    two microbatch gradients (optax.MultiSteps semantics), with the per-step
    rng pinned: the oracle recomputes the two microbatch gradients with the
    SAME step-folded rngs the trainer used (fold_in(rng, 0) and
    fold_in(rng, 1)), averages them, and applies the inner AdamW once.
    ≤1e-6 on every param — no tolerance for rng confounds (VERDICT r1 #7)."""
    import jax
    import numpy as np
    import optax

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    devs = jax.devices("cpu")[:1]
    mesh = make_mesh(devices=devs)
    B = 8
    x = np.random.default_rng(0).normal(size=(B, 8, 8, 4)).astype(np.float32)
    y = np.random.default_rng(1).integers(0, 8, size=(B,)).astype(np.int32)
    rng = jax.random.PRNGKey(1)
    xa, ya, xb, yb = x[:4], y[:4], x[4:], y[4:]

    model = LightningDiT(
        input_size=8, patch_size=2, in_channels=4, hidden_size=64,
        depth=2, num_heads=4, num_classes=8, use_swiglu=True,
        use_rope=True, use_rmsnorm=True, class_dropout_prob=0.0,
    )
    tr = DiTTrainer(model, create_transport("Linear", "velocity"), mesh,
                    lr=1e-3, grad_accum=2)
    st0 = tr.replicate(tr.init_state(jax.random.PRNGKey(0), (4, 8, 8, 4)))
    params0 = jax.device_get(st0.params)

    # microbatch path: two train steps; the first must apply a ZERO update
    st1, _ = tr.train_step(st0, rng, tr.shard_batch((xa, ya)))
    mid = jax.device_get(st1.params)
    for a, b in zip(jax.tree_util.tree_leaves(mid),
                    jax.tree_util.tree_leaves(params0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # fetch before step 2: the state (incl. EMA buffers) is donated into it
    ema_mid = jax.device_get(st1.ema_params)
    st2, _ = tr.train_step(st1, rng, tr.shard_batch((xb, yb)))

    # oracle: same per-microbatch step rngs, mean gradient, one inner AdamW
    g0 = jax.grad(lambda p: tr._loss_fn(p, jax.random.fold_in(rng, 0), xa, ya)[0])(params0)
    g1 = jax.grad(lambda p: tr._loss_fn(p, jax.random.fold_in(rng, 1), xb, yb)[0])(params0)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    inner = optax.adamw(1e-3, b1=0.9, b2=tr.beta2, weight_decay=0.0)
    upd, _ = inner.update(gm, inner.init(params0), params0)
    want = optax.apply_updates(params0, upd)

    got = jax.device_get(st2.params)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # and the params actually moved
    moved = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(params0))
    )
    assert moved > 1e-4

    # EMA ticks once per OPTIMIZER step: bit-unchanged through the
    # zero-update accumulation micro-step, then ONE decay blend toward the
    # applied params — decaying per micro-step would shorten the configured
    # time constant by the accumulation factor
    for a, b in zip(jax.tree_util.tree_leaves(ema_mid),
                    jax.tree_util.tree_leaves(params0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d = tr.ema_decay
    for e, p0, p2 in zip(
        jax.tree_util.tree_leaves(jax.device_get(st2.ema_params)),
        jax.tree_util.tree_leaves(params0),
        jax.tree_util.tree_leaves(got),
    ):
        np.testing.assert_allclose(
            np.asarray(e), d * np.asarray(p0) + (1 - d) * np.asarray(p2),
            rtol=1e-6, atol=1e-7,
        )


def test_ema_every_amortized_matches_decay_power():
    """train.ema_every=k applies decay^k on every k-th step and passes the
    (donated) EMA through untouched in between — same geometric time constant
    as per-step EMA at k-fold less fp32 traffic. Exactness: the k=4 EMA must
    equal the hand-computed two-update blend of the k=1 run's param snapshots
    (param trajectories are identical; EMA never feeds back into training)."""
    import jax
    import numpy as np

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    devs = jax.devices("cpu")[:8]
    B = 8
    rngd = np.random.default_rng(0)
    batches = [
        (
            rngd.normal(size=(B, 8, 8, 4)).astype(np.float32),
            rngd.integers(0, 8, size=(B,)).astype(np.int32),
        )
        for _ in range(8)
    ]

    decay = 0.99
    states, snapshots = {}, {}
    for k in (1, 4):
        mesh = make_mesh(data=8, devices=devs)
        model = LightningDiT(
            input_size=8, patch_size=2, in_channels=4, hidden_size=64,
            depth=2, num_heads=4, num_classes=8, use_swiglu=True,
            use_rope=True, use_rmsnorm=True,
        )
        tr = DiTTrainer(model, create_transport("Linear", "velocity"), mesh,
                        lr=1e-3, ema_decay=decay, ema_every=k)
        state = tr.replicate(tr.init_state(jax.random.PRNGKey(0), (B, 8, 8, 4)))
        snaps = {0: jax.device_get(state.params)}
        for i, b in enumerate(batches):
            prev_ema = jax.device_get(state.ema_params) if k == 4 else None
            state, _ = tr.train_step(state, jax.random.PRNGKey(1), tr.shard_batch(b))
            snaps[i + 1] = jax.device_get(state.params)
            if k == 4 and (i + 1) % 4 != 0:
                # off-cadence step: EMA leaves must be bit-identical
                ema_now = jax.device_get(state.ema_params)
                for a, bb in zip(jax.tree_util.tree_leaves(prev_ema),
                                 jax.tree_util.tree_leaves(ema_now)):
                    np.testing.assert_array_equal(a, bb)
        states[k] = state
        snapshots[k] = snaps

    # identical param trajectories (EMA cadence cannot affect training)
    for a, b in zip(jax.tree_util.tree_leaves(snapshots[1][8]),
                    jax.tree_util.tree_leaves(snapshots[4][8])):
        np.testing.assert_array_equal(a, b)

    # expected k=4 EMA: two decay^4 blends at steps 4 and 8, seeded from init
    d4 = decay ** 4
    expect = snapshots[4][0]
    for s in (4, 8):
        expect = jax.tree_util.tree_map(
            lambda e, p: d4 * e + (1 - d4) * p, expect, snapshots[4][s]
        )
    got = jax.device_get(states[4].ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(expect), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    # and it approximates the per-step EMA (same time constant)
    ema1 = jax.device_get(states[1].ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(ema1), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(a, b, rtol=0.05, atol=5e-4)
