"""Shared harness for the sampling-quality benchmarks
(bench_velocity_cache.py, bench_multistep.py).

Both benches need the same testbed: a DiT-S trained on-chip on per-class
synthetic latent patterns (the tests/test_learning_tpu.py protocol — no
released weights in this zero-egress image), the same nearest-class-mean
classifier (the micro-Doppler filter-gate analogue), and XL/1 throughput
points. Keeping the protocol in ONE place keeps the two benches' quality
columns comparable.

Throughput points are measured by spawning ``bench.py`` in a FRESH process
per configuration (CLAUDE.md benchmarking rule: never time in a process
that already built big jits — executable churn skewed earlier measurements
up to 7x) — and it guarantees the recorded numbers are exactly what the
headline tool reports.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_CLASSES = 4
LATENT_SHAPE = (16, 16, 32)


def psnr(a, b, data_range):
    import numpy as np

    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10(data_range**2 / mse))


def make_class_means(seed: int = 0):
    """Per-class latent patterns + the generator both benches draw from."""
    import numpy as np

    rng_np = np.random.default_rng(seed)
    means = 2.0 * rng_np.normal(size=(N_CLASSES,) + LATENT_SHAPE).astype(np.float32)
    return means, rng_np


def train_synthetic_dit(train_steps: int, on_tpu: bool, class_means, rng_np,
                        big: bool | None = None, seed: int = 0):
    """Train DiT-S on noisy per-class patterns; returns
    (model, transport, ema_params, final_loss). ``big`` forces the full
    DiT-S testbed (depth 12 / hidden 384, batch 64) regardless of backend —
    default: big on TPU, tiny on CPU. ``seed`` varies the init/training
    randomness (the testbed matrix needs independent trained fields)."""
    import jax
    import jax.numpy as jnp

    from vavae_tpu.models.dit import LightningDiT
    from vavae_tpu.parallel.mesh import make_mesh
    from vavae_tpu.train.dit_trainer import DiTTrainer
    from vavae_tpu.transport import create_transport

    if big is None:
        big = on_tpu
    B = 64 if big else 8
    depth, hidden, heads = (12, 384, 6) if big else (2, 64, 4)

    def batch():
        y = rng_np.integers(0, N_CLASSES, size=(B,)).astype("int32")
        x = class_means[y] + 0.05 * rng_np.normal(
            size=(B,) + LATENT_SHAPE
        ).astype("float32")
        return x, y

    model = LightningDiT(
        input_size=16, patch_size=2, in_channels=32, hidden_size=hidden,
        depth=depth, num_heads=heads, num_classes=N_CLASSES,
        use_swiglu=True, use_rope=True, use_rmsnorm=True, dtype=jnp.bfloat16,
        class_dropout_prob=0.1,
    )
    transport = create_transport("Linear", "velocity", use_cosine_loss=True,
                                 use_lognorm=True)
    trainer = DiTTrainer(model, transport, make_mesh(), lr=3e-4, beta2=0.95,
                         ema_decay=0.99)
    rng = jax.random.PRNGKey(seed)
    state = trainer.replicate(trainer.init_state(rng, (B,) + LATENT_SHAPE))
    t0 = time.time()
    for _ in range(train_steps):
        state, m = trainer.train_step(state, rng, trainer.shard_batch(batch()))
    loss = float(jax.device_get(m["loss"]))
    print(f"trained DiT-S {train_steps} steps in {time.time()-t0:.0f}s, "
          f"loss {loss:.3f}", flush=True)
    return model, transport, state.ema_params, loss


def eval_labels(on_tpu: bool):
    import jax.numpy as jnp
    import numpy as np

    n_per = 8 if on_tpu else 2
    return jnp.asarray(np.repeat(np.arange(N_CLASSES), n_per), jnp.int32)


def classify(samples, class_means, labels):
    """Nearest-class-mean accuracy + spread-scaled softmax confidence."""
    import numpy as np

    flat = samples.reshape(len(samples), -1)
    means = class_means.reshape(N_CLASSES, -1)
    d = np.linalg.norm(flat[:, None] - means[None], axis=-1)
    pred = d.argmin(axis=-1)
    acc = float((pred == np.asarray(labels)).mean())
    t = np.median(d)
    p = np.exp(-d / (0.05 * t))
    p = p / p.sum(axis=-1, keepdims=True)
    return acc, float(p.max(axis=-1).mean())


def xl_throughput(batch: int, cache_interval: int = 1,
                  multistep_order: int = 1, num_steps: int = 250) -> float:
    """One XL/1 sampling-throughput point via a fresh `bench.py` process."""
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), str(batch),
           str(cache_interval), str(multistep_order), str(num_steps)]
    env = dict(os.environ)
    # the sweep records its own euler-250 point — bench.py's euler-250
    # baseline rider would re-measure that identical number once per
    # accelerated point (~5 min each on-chip, enough to blow the battery's
    # step timeout)
    env["VAVAE_BENCH_NO_RIDER"] = "1"
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    if out.returncode != 0:
        raise RuntimeError(f"bench.py failed: {out.stderr[-2000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    return float(rec["value"])


# cost accounting moved into the package (round-5: the autotune CLI needs it
# product-side); re-exported here so every existing bench keeps its import.
# jax_cache FIRST: importing vavae_tpu.transport at module scope without it
# initializes the axon backend on the wrong platform / hangs on a dead
# tunnel (CLAUDE.md) — the deleted in-file versions dodged this by lazy
# in-function imports
import vavae_tpu.utils.jax_cache  # noqa: E402,F401
from vavae_tpu.transport.cost import (  # noqa: E402,F401
    adaptive_cache_cost, dopri5_cost, fixed_grid_cost, split_idx,
)
