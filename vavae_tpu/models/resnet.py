"""ResNet-18 classifier in flax (NHWC), with the micro-Doppler variants.

Parity targets:
  - train_user_classifier.py:240 (baseline ResNet18, 31-way user id head)
  - improved_classifier_training.py:480-557 — ``ImprovedClassifier``:
    torchvision ResNet18 backbone, freeze tiers, 256-d bottleneck head and a
    64-d L2-normalized projection head for contrastive training
  - domain_adaptation_experiment/lccs_adapter.py — needs named access to
    every BatchNorm's running stats (exposed here via flax's batch_stats
    collection, which LCCS manipulates directly).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = norm(name="down_bn")(residual)
        return nn.relu(residual + y)


class ResNet18(nn.Module):
    """Backbone + optional classification/projection heads.

    __call__ returns logits; ``features=True`` returns the 512-d pooled
    embedding instead (used by filtering metrics and prototypes).
    """

    num_classes: int = 31
    head_dim: int = 0        # 0 = direct fc; 256 = ImprovedClassifier bottleneck
    proj_dim: int = 0        # 64 = contrastive projection head
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False,
                 return_all: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        filters = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = BasicBlock(filters, stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train=train)
            filters *= 2
        feat = jnp.mean(x, axis=(1, 2))  # global average pool → 512-d
        if features and not return_all:
            return feat

        if self.head_dim:
            h = nn.Dense(self.head_dim, dtype=self.dtype, name="head_fc")(feat)
            h = nn.relu(h)
            logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(h)
        else:
            logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feat)

        if self.proj_dim and (return_all or train):
            p = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj")(feat)
            p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
            if return_all:
                return logits, feat, p
        if return_all:
            return logits, feat, None
        return logits


class DomainAdaptiveClassifier(nn.Module):
    """ResNet18 backbone + BN-regularized projector/classifier heads.

    Parity: train_calibrated_classifier.py:78-143 ``DomainAdaptiveClassifier``
    — feature_projector Linear(512→feature_dim)+BN1d+ReLU+Dropout, classifier
    Linear(feature_dim→256)+BN1d+ReLU+Dropout+Linear(256→num_classes).
    The torch version freezes all but the last ~20 backbone tensors (≈ stages
    1-3); callers get that via ClassifierTrainer(freeze_stages=3). The EMA
    feature bank (its ``feature_bank``/``compute_feature_similarity``) is
    explicit state here — see update_feature_bank / feature_similarity.

    __call__ returns (logits, features); ``features=True`` returns the
    projected features only (the filter/prototype embedding space).
    """

    num_classes: int = 31
    feature_dim: int = 512
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False,
                 return_all: bool = False):
        feat512 = ResNet18(
            num_classes=1, dtype=self.dtype, name="backbone"
        )(x, train=train, features=True)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        h = nn.Dense(self.feature_dim, dtype=self.dtype, name="proj_fc")(feat512)
        h = norm(name="proj_bn")(h)
        h = nn.relu(h)
        feat = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        if features and not return_all:
            return feat
        c = nn.Dense(256, dtype=self.dtype, name="cls_fc1")(feat)
        c = norm(name="cls_bn")(c)
        c = nn.relu(c)
        c = nn.Dropout(self.dropout_rate, deterministic=not train)(c)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_fc2")(c)
        if return_all:
            return logits, feat, feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
            )
        return logits, feat


def update_feature_bank(bank: jax.Array, features: jax.Array,
                        labels: jax.Array, momentum: float = 0.95) -> jax.Array:
    """EMA class prototypes (train_calibrated_classifier.py:120-125:
    bank[l] = 0.95·bank[l] + 0.05·feat). Batch duplicates of a class fold
    in sequentially, matching the reference's per-sample loop."""
    def body(b, inp):
        feat, label = inp
        return b.at[label].set(b[label] * momentum + feat * (1.0 - momentum)), None

    bank, _ = jax.lax.scan(body, bank, (jax.lax.stop_gradient(features), labels))
    return bank


def feature_similarity(bank: jax.Array, features: jax.Array) -> jax.Array:
    """Cosine similarity of features vs class prototypes
    (train_calibrated_classifier.py:135-143)."""
    f = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    p = bank / jnp.maximum(jnp.linalg.norm(bank, axis=-1, keepdims=True), 1e-12)
    return f @ p.T


def resnet18_params_from_torch(sd) -> dict:
    """Convert torchvision resnet18 state dict to our tree (fc optional)."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items()}

    def conv(p):
        return {"kernel": np.transpose(sd[f"{p}.weight"], (2, 3, 1, 0))}

    def bn(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    def bn_stats(p):
        return {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]}

    params = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    stats = {"bn1": bn_stats("bn1")}
    for stage in range(1, 5):
        for b in range(2):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            blk = {
                "conv1": conv(f"{src}.conv1"),
                "bn1": bn(f"{src}.bn1"),
                "conv2": conv(f"{src}.conv2"),
                "bn2": bn(f"{src}.bn2"),
            }
            blk_stats = {
                "bn1": bn_stats(f"{src}.bn1"),
                "bn2": bn_stats(f"{src}.bn2"),
            }
            if f"{src}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{src}.downsample.0")
                blk["down_bn"] = bn(f"{src}.downsample.1")
                blk_stats["down_bn"] = bn_stats(f"{src}.downsample.1")
            params[dst] = blk
            stats[dst] = blk_stats
    if "fc.weight" in sd:
        import numpy as np

        params["fc"] = {
            "kernel": np.transpose(sd["fc.weight"], (1, 0)),
            "bias": sd["fc.bias"],
        }
    return {"params": params, "batch_stats": stats}


def domain_adaptive_params_from_torch(sd) -> dict:
    """Convert a reference DomainAdaptiveClassifier state dict
    (train_calibrated_classifier.py:78: ``backbone.*`` torchvision resnet18,
    ``feature_projector.{0,1}``, ``classifier.{0,1,4}``) to our tree.
    The ``feature_bank``/``feature_count`` buffers map to the explicit
    prototype bank (ClassifierState.extras), returned separately."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items()}
    backbone_sd = {
        k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")
    }
    conv = resnet18_params_from_torch(backbone_sd)

    def dense(p):
        return {"kernel": np.transpose(sd[f"{p}.weight"], (1, 0)),
                "bias": sd[f"{p}.bias"]}

    def bn(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    def bn_stats(p):
        return {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]}

    params = {
        "backbone": conv["params"],
        "proj_fc": dense("feature_projector.0"),
        "proj_bn": bn("feature_projector.1"),
        "cls_fc1": dense("classifier.0"),
        "cls_bn": bn("classifier.1"),
        "cls_fc2": dense("classifier.4"),
    }
    stats = {
        "backbone": conv["batch_stats"],
        "proj_bn": bn_stats("feature_projector.1"),
        "cls_bn": bn_stats("classifier.1"),
    }
    bank = sd.get("feature_bank")
    return {"params": params, "batch_stats": stats, "feature_bank": bank}
