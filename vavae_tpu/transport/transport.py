"""Transport: training-time t/x0 sampling and flow-matching losses.

Parity target: LightningDiT/transport/transport.py:40-267 and the factory
LightningDiT/transport/__init__.py:3-73. Key behavioral fixes vs the
reference (SURVEY.md §3 quirks):

  - logit-normal t-sampling runs ON DEVICE with jax.random (the reference
    calls scipy.stats.norm.rvs on CPU in the train hot loop,
    transport.py:113-123);
  - partial-range sampling is a single vectorized inverse-CDF draw rather
    than a rejection loop (same distribution: logit-normal truncated to
    [range_min, range_max]).
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from vavae_tpu.transport import paths
from vavae_tpu.transport.paths import GVPPath, LinearPath, VPPath, expand_t


class ModelType(enum.Enum):
    NOISE = "noise"
    SCORE = "score"
    VELOCITY = "velocity"


class PathType(enum.Enum):
    LINEAR = "Linear"
    GVP = "GVP"
    VP = "VP"


class WeightType(enum.Enum):
    NONE = "none"
    VELOCITY = "velocity"
    LIKELIHOOD = "likelihood"


_PATHS = {
    PathType.LINEAR: LinearPath(),
    PathType.GVP: GVPPath(),
    PathType.VP: VPPath(),
}


def _ndtri(u: jax.Array) -> jax.Array:
    """Inverse standard-normal CDF (for truncated logit-normal sampling)."""
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * u - 1.0)


@dataclasses.dataclass(frozen=True)
class Transport:
    model_type: ModelType = ModelType.VELOCITY
    path_type: PathType = PathType.LINEAR
    loss_type: WeightType = WeightType.NONE
    train_eps: float = 0.0
    sample_eps: float = 0.0
    use_cosine_loss: bool = False
    use_lognorm: bool = False
    partial_train: Optional[Tuple[float, float]] = None
    partial_ratio: float = 1.0
    shift_lg: bool = False

    @property
    def path(self):
        return _PATHS[self.path_type]

    # -- time interval (reference transport.py:84-111) ----------------------

    def check_interval(
        self,
        *,
        eval: bool = False,
        sde: bool = False,
        reverse: bool = False,
        diffusion_form: str = "SBDM",
        last_step_size: float = 0.0,
    ) -> Tuple[float, float]:
        t0, t1 = 0.0, 1.0
        eps = self.sample_eps if eval else self.train_eps
        if self.path_type == PathType.VP:
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        elif self.model_type != ModelType.VELOCITY or sde:
            t0 = (
                eps
                if (diffusion_form == "SBDM" and sde) or self.model_type != ModelType.VELOCITY
                else 0.0
            )
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        if reverse:
            t0, t1 = 1.0 - t0, 1.0 - t1
        return t0, t1

    # -- t sampling (on-device; reference transport.py:113-166) -------------

    def sample_t(
        self,
        rng: jax.Array,
        batch: int,
        sp_timesteps: Optional[Tuple[float, float]] = None,
        shifted_mu: float = 0.0,
    ) -> jax.Array:
        t0, t1 = self.check_interval()
        if sp_timesteps is not None:
            lo, hi = sp_timesteps
            return jax.random.uniform(rng, (batch,), minval=lo, maxval=hi)

        if not self.use_lognorm:
            if self.partial_train is not None:
                rng, gate_rng = jax.random.split(rng)
                lo, hi = self.partial_train
                partial_t = jax.random.uniform(rng, (batch,), minval=lo, maxval=hi)
                uniform_t = jax.random.uniform(rng, (batch,)) * (t1 - t0) + t0
                use_partial = jax.random.uniform(gate_rng, ()) < self.partial_ratio
                return jnp.where(use_partial, partial_t, uniform_t)
            return jax.random.uniform(rng, (batch,)) * (t1 - t0) + t0

        if self.shift_lg and self.partial_train is not None:
            # reference transport.py sample(): "Shifted lognormal distribution
            # is not compatible with partial training" — fail fast instead of
            # silently training with full-range t
            raise ValueError(
                "shift_lg is not compatible with partial_train — the "
                "reference asserts this combination is invalid"
            )
        mu = shifted_mu if self.shift_lg else 0.0
        if self.partial_train is not None and not self.shift_lg:
            # truncated logit-normal on [lo, hi] via inverse-CDF (exact,
            # replaces the reference's host-side rejection loop)
            rng, gate_rng, u_rng = jax.random.split(rng, 3)
            lo, hi = self.partial_train
            cdf = lambda x: jax.scipy.stats.norm.cdf(jnp.log(x / (1.0 - x)))
            u = jax.random.uniform(u_rng, (batch,), minval=cdf(jnp.float32(lo)), maxval=cdf(jnp.float32(hi)))
            partial_t = jax.nn.sigmoid(_ndtri(u))
            logn_t = jax.nn.sigmoid(jax.random.normal(rng, (batch,))) * (t1 - t0) + t0
            use_partial = jax.random.uniform(gate_rng, ()) < self.partial_ratio
            return jnp.where(use_partial, partial_t, logn_t)
        return jax.nn.sigmoid(mu + jax.random.normal(rng, (batch,))) * (t1 - t0) + t0

    # -- training losses (reference transport.py:169-215) -------------------

    def training_losses(
        self,
        rng: jax.Array,
        model_fn: Callable[..., jax.Array],
        x1: jax.Array,
        sp_timesteps: Optional[Tuple[float, float]] = None,
        shifted_mu: float = 0.0,
        **model_kwargs: Any,
    ) -> dict:
        """model_fn(xt, t, **model_kwargs) -> prediction. x1: NHWC data."""
        t_rng, x0_rng = jax.random.split(rng)
        t = self.sample_t(t_rng, x1.shape[0], sp_timesteps, shifted_mu)
        x0 = jax.random.normal(x0_rng, x1.shape, jnp.float32).astype(x1.dtype)
        t, xt, ut = paths.plan(self.path, t, x0, x1)
        pred = model_fn(xt, t, **model_kwargs)

        terms: dict = {"pred": pred, "t": t}
        reduce_axes = tuple(range(1, x1.ndim))
        if self.model_type == ModelType.VELOCITY:
            terms["loss"] = jnp.mean(
                jnp.square(pred.astype(jnp.float32) - ut.astype(jnp.float32)),
                axis=reduce_axes,
            )
            if self.use_cosine_loss:
                # cosine over the channel axis at each spatial site
                # (reference: cosine_similarity(..., dim=1) on NCHW -> axis=-1 NHWC).
                # smooth safe-norms: at init the DiT output is exactly 0
                # (zero-init final layer) and a plain norm has a NaN gradient
                # at 0, which would poison the first backward pass.
                p = pred.astype(jnp.float32)
                u = ut.astype(jnp.float32)
                dot = jnp.sum(p * u, axis=-1)
                pn = jnp.sqrt(jnp.sum(p * p, axis=-1) + 1e-16)
                un = jnp.sqrt(jnp.sum(u * u, axis=-1) + 1e-16)
                cos = dot / (pn * un)
                terms["cos_loss"] = jnp.mean(1.0 - cos, axis=tuple(range(1, cos.ndim)))
        else:
            _, drift_var = self.path.drift(xt, t)
            sigma_t, _ = self.path.sigma(expand_t(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t**2)
            else:
                weight = 1.0
            if self.model_type == ModelType.NOISE:
                terms["loss"] = jnp.mean(
                    weight * jnp.square(pred - x0), axis=reduce_axes
                )
            else:
                terms["loss"] = jnp.mean(
                    weight * jnp.square(pred * sigma_t + x0), axis=reduce_axes
                )
        return terms

    # -- drift/score adapters (reference transport.py:218-267) --------------

    def drift_fn(self) -> Callable:
        """Probability-flow ODE drift as a function of the model output."""

        def velocity_ode(x, t, model_fn, **kw):
            return model_fn(x, t, **kw)

        def score_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = self.path.drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t, **kw)

        def noise_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = self.path.drift(x, t)
            sigma_t, _ = self.path.sigma(expand_t(t, x))
            score = model_fn(x, t, **kw) / -sigma_t
            return -drift_mean + drift_var * score

        return {
            ModelType.VELOCITY: velocity_ode,
            ModelType.SCORE: score_ode,
            ModelType.NOISE: noise_ode,
        }[self.model_type]

    def score_fn(self) -> Callable:
        def from_noise(x, t, model_fn, **kw):
            sigma_t, _ = self.path.sigma(expand_t(t, x))
            return model_fn(x, t, **kw) / -sigma_t

        def from_score(x, t, model_fn, **kw):
            return model_fn(x, t, **kw)

        def from_velocity(x, t, model_fn, **kw):
            return paths.score_from_velocity(self.path, model_fn(x, t, **kw), x, t)

        return {
            ModelType.NOISE: from_noise,
            ModelType.SCORE: from_score,
            ModelType.VELOCITY: from_velocity,
        }[self.model_type]

    def prior_logp(self, z: jax.Array) -> jax.Array:
        n = z[0].size
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(
            jnp.square(z.reshape(z.shape[0], -1)), axis=-1
        ) / 2.0


def create_transport(
    path_type: str = "Linear",
    prediction: str = "velocity",
    loss_weight: Optional[str] = None,
    train_eps: Optional[float] = None,
    sample_eps: Optional[float] = None,
    use_cosine_loss: bool = False,
    use_lognorm: bool = False,
    partial_train: Optional[Tuple[float, float]] = None,
    partial_ratio: float = 1.0,
    shift_lg: bool = False,
) -> Transport:
    """Factory with the reference's eps defaults (transport/__init__.py:49-57)."""
    model_type = {
        "noise": ModelType.NOISE,
        "score": ModelType.SCORE,
    }.get(prediction, ModelType.VELOCITY)
    loss_type = {
        "velocity": WeightType.VELOCITY,
        "likelihood": WeightType.LIKELIHOOD,
    }.get(loss_weight, WeightType.NONE)
    ptype = PathType(path_type)

    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:  # velocity on Linear/GVP is stable everywhere (for the ODE)
        # NOTE: the reference zeroes user-passed eps here
        # (transport/__init__.py:56-57), which makes its SDE sampler hit the
        # 1/t singularity of the SBDM diffusion at t0=0. We honor an
        # explicitly-passed eps so SDE sampling is usable.
        train_eps = 0.0 if train_eps is None else train_eps
        sample_eps = 0.0 if sample_eps is None else sample_eps

    return Transport(
        model_type=model_type,
        path_type=ptype,
        loss_type=loss_type,
        train_eps=float(train_eps),
        sample_eps=float(sample_eps),
        use_cosine_loss=bool(use_cosine_loss),
        use_lognorm=bool(use_lognorm),
        partial_train=tuple(partial_train) if partial_train else None,
        partial_ratio=float(partial_ratio),
        shift_lg=bool(shift_lg),
    )
