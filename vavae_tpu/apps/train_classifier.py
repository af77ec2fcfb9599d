"""User-ID classifier training (baseline / improved-contrastive / calibrated).

Parity targets:
  - train_user_classifier.py (baseline ResNet18, 31 classes)
  - improved_classifier_training.py:480-557+ (256-d head, 64-d projection,
    SupCon auxiliary loss, freeze tiers, DDP → mesh DP here)
  - train_calibrated_classifier.py (label smoothing / focal / mixup, ECE)
"""
from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

import vavae_tpu.utils.jax_cache  # noqa: F401
from vavae_tpu.data.prefetch import prefetch
from vavae_tpu.apps.regularization import (
    expected_calibration_error,
    focal_loss,
    global_negative_contrastive,
    init_memory_bank,
    interuser_contrastive_loss,
    label_smoothing_loss,
    mixup,
    supcon_loss,
    update_memory_bank,
)
from vavae_tpu.models.resnet import (
    DomainAdaptiveClassifier,
    ResNet18,
    update_feature_bank,
)
from vavae_tpu.parallel.mesh import (
    data_sharding,
    donate_state_argnums,
    make_mesh,
    replicated,
    shard_batch,
)


class ClassifierState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # mode-dependent auxiliary state: the global-negative contrastive memory
    # bank ({"bank", "ptr"}, improved+global) or the EMA prototype feature
    # bank (domain_adaptive); None otherwise
    extras: Any = None


@dataclasses.dataclass
class ClassifierTrainer:
    num_classes: int = 31
    mode: str = "baseline"  # baseline | improved | calibrated | domain_adaptive
    lr: float = 1e-3
    weight_decay: float = 1e-4
    supcon_weight: float = 0.5
    # contrastive criterion for the improved mode
    # (improved_classifier_training.py --contrastive_type):
    # supcon | interuser | global (global adds the class memory bank)
    contrastive_type: str = "supcon"
    contrastive_temperature: float = 0.07
    contrastive_margin: float = 0.5
    memory_size: int = 200
    smoothing: float = 0.1
    focal_gamma: float = 2.0
    use_mixup: bool = False
    mixup_alpha: float = 0.2
    dropout_rate: float = 0.3
    # freeze tiers (improved_classifier_training.py freeze strategy):
    # 0 = train everything; k freezes the stem + the first k ResNet stages.
    # None = mode default (domain_adaptive freezes stages 1-3, matching the
    # reference's "all but the last ~20 tensors", others train everything)
    freeze_stages: Optional[int] = None
    mesh: Any = None

    def __post_init__(self):
        if self.mode == "domain_adaptive" and self.contrastive_type == "global":
            raise ValueError(
                "contrastive_type='global' (memory bank) is an improved-mode "
                "option; domain_adaptive uses supcon/interuser + its EMA "
                "prototype bank (train_calibrated_classifier.py:78)"
            )
        if self.freeze_stages is None:
            self.freeze_stages = 3 if self.mode == "domain_adaptive" else 0
        if self.mode == "domain_adaptive":
            self.model = DomainAdaptiveClassifier(
                num_classes=self.num_classes, dropout_rate=self.dropout_rate
            )
        else:
            head = 256 if self.mode == "improved" else 0
            proj = 64 if self.mode == "improved" else 0
            self.model = ResNet18(
                num_classes=self.num_classes, head_dim=head, proj_dim=proj
            )
        tx = optax.adamw(self.lr, weight_decay=self.weight_decay)
        if self.freeze_stages > 0:
            # match TOP-LEVEL modules only: blocks name their own first
            # conv/bn "conv1"/"bn1" too, so a substring match would freeze
            # half of every supposedly-trainable stage
            stem = "backbone/" if self.mode == "domain_adaptive" else ""
            frozen_prefixes = [f"{stem}conv1/", f"{stem}bn1/"] + [
                f"{stem}layer{s}_" for s in range(1, self.freeze_stages + 1)
            ]

            def trainable(params):
                import flax

                flat = flax.traverse_util.flatten_dict(params, sep="/")
                mask = {
                    k: not any(k.startswith(p) for p in frozen_prefixes)
                    for k in flat
                }
                return flax.traverse_util.unflatten_dict(mask, sep="/")

            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()},
                lambda params: jax.tree_util.tree_map(
                    lambda t: "train" if t else "freeze", trainable(params)
                ),
            )
        self.tx = tx
        if self.mesh is None:
            self.mesh = make_mesh()
        self._jit_train = None
        self._jit_eval = None

    def init_state(self, rng: jax.Array, image_size: int = 224) -> ClassifierState:
        x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        # return_all=True materializes the projection head params even with
        # train=False (no dropout rng needed at init)
        variables = self.model.init({"params": rng}, x, train=False,
                                    return_all=True)
        extras = None
        if self.mode == "improved" and self.contrastive_type == "global":
            extras = init_memory_bank(
                jax.random.fold_in(rng, 1), self.num_classes, dim=64,
                memory_size=self.memory_size,
            )
        elif self.mode == "domain_adaptive":
            # EMA prototype bank (train_calibrated_classifier.py:115 zeros)
            extras = jnp.zeros(
                (self.num_classes, self.model.feature_dim), jnp.float32
            )
        return ClassifierState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            extras=extras,
        )

    def _contrastive(self, proj, y, extras):
        """Selected contrastive criterion; returns (loss, new_extras)."""
        if self.contrastive_type == "global":
            # reference forward updates the bank first, then computes
            # against the updated bank (improved_classifier_training.py:95-98)
            extras = update_memory_bank(extras, proj, y)
            loss = global_negative_contrastive(
                proj, y, extras, self.contrastive_temperature,
                self.contrastive_margin,
            )
        elif self.contrastive_type == "interuser":
            loss = interuser_contrastive_loss(proj, y, self.contrastive_temperature)
        else:
            loss = supcon_loss(proj, y, self.contrastive_temperature)
        return loss, extras

    def _loss(self, params, batch_stats, extras, rng, x, y):
        mix_rng, drop_rng = jax.random.split(rng)
        y_soft = None
        if self.use_mixup:
            x, y_soft = mixup(mix_rng, x, y, self.num_classes, self.mixup_alpha)

        variables = {"params": params, "batch_stats": batch_stats}
        out, updates = self.model.apply(
            variables, x, train=True, return_all=True, mutable=["batch_stats"],
            rngs={"dropout": drop_rng},
        )
        logits, feat, proj = out

        if self.mode in ("calibrated", "domain_adaptive"):
            if y_soft is not None:
                loss = -jnp.mean(jnp.sum(y_soft * jax.nn.log_softmax(logits), axis=-1))
            else:
                loss = 0.5 * label_smoothing_loss(logits, y, self.smoothing)
                loss = loss + 0.5 * focal_loss(logits, y, self.focal_gamma)
        elif y_soft is not None:
            loss = -jnp.mean(jnp.sum(y_soft * jax.nn.log_softmax(logits), axis=-1))
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        if self.mode == "improved" and proj is not None:
            c_loss, extras = self._contrastive(proj, y, extras)
            loss = loss + self.supcon_weight * c_loss
        elif self.mode == "domain_adaptive":
            c_loss, _ = self._contrastive(proj, y, None)
            loss = loss + self.supcon_weight * c_loss
            extras = update_feature_bank(extras, feat, y)

        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return loss, (updates["batch_stats"], extras, {"loss": loss, "acc": acc})

    def _train_step(self, state: ClassifierState, rng: jax.Array, x, y):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        (loss, (bn, extras, metrics)), grads = grad_fn(
            state.params, state.batch_stats, state.extras, rng, x, y
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            ClassifierState(state.step + 1, params, bn, opt_state, extras),
            metrics,
        )

    def train_step(self, state, rng, batch):
        if self._jit_train is None:
            rep = replicated(self.mesh)
            ds = lambda n: data_sharding(self.mesh, n)
            self._jit_train = jax.jit(
                self._train_step,
                in_shardings=(rep, rep, ds(4), ds(1)),
                out_shardings=(rep, rep),
                donate_argnums=donate_state_argnums(),
            )
        x, y = batch
        return self._jit_train(state, rng, x, y)

    def _eval_step(self, state: ClassifierState, x, y):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = self.model.apply(variables, x, train=False)
        if isinstance(logits, tuple):  # domain_adaptive returns (logits, feat)
            logits = logits[0]
        probs = jax.nn.softmax(logits)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        ece = expected_calibration_error(probs, y)
        return {"acc": acc, "ece": ece}

    def eval_step(self, state, batch):
        if self._jit_eval is None:
            rep = replicated(self.mesh)
            ds = lambda n: data_sharding(self.mesh, n)
            self._jit_eval = jax.jit(
                self._eval_step, in_shardings=(rep, ds(4), ds(1)), out_shardings=rep
            )
        x, y = batch
        return self._jit_eval(state, x, y)

    def predict_fn(self, state):
        """Jitted (images NHWC [-1,1]) -> softmax probs — the filter gate.
        Variables ride as jit arguments (not closure constants)."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        model = self.model

        @jax.jit
        def predict(v, x):
            out = model.apply(v, x, train=False)
            if isinstance(out, tuple):  # domain_adaptive: (logits, feat)
                out = out[0]
            return jax.nn.softmax(out)

        return lambda x: predict(variables, x)

    def feature_fn(self, state):
        """Jitted (images) -> 512-d backbone features (filter metrics)."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        model = self.model

        @jax.jit
        def features(v, x):
            return model.apply(v, x, train=False, features=True)

        return lambda x: features(variables, x)


def train_classifier(
    dataset,
    val_dataset=None,
    *,
    mode: str = "baseline",
    contrastive_type: str = "supcon",
    num_classes: int = 31,
    epochs: int = 30,
    batch_size: int = 64,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
    image_size: int = 224,
    patience: Optional[int] = None,
) -> tuple:
    trainer = ClassifierTrainer(
        num_classes=num_classes, mode=mode, lr=lr,
        contrastive_type=contrastive_type,
    )
    rng = jax.random.PRNGKey(seed)
    state = jax.device_put(trainer.init_state(rng, image_size), replicated(trainer.mesh))
    best_acc, epochs_since_best, best_state = 0.0, 0, None

    # validation counts EVERY sample: tail batches are padded to the
    # compiled size and sliced back (drop_last would silently exclude up to
    # batch_size−1 samples, and a val split smaller than batch_size would
    # yield ZERO batches — constant 0.0 acc, best-state never snapshots,
    # patience early-stops onto the unselected final state)
    model = trainer.model

    @jax.jit
    def _val_probs(params, batch_stats, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        if isinstance(out, tuple):  # domain_adaptive: (logits, feat)
            out = out[0]
        return jax.nn.softmax(out)
    for epoch in range(epochs):
        t0, steps = time.time(), 0
        for batch in prefetch(dataset.batches(batch_size, seed=seed + epoch, epochs=1)):
            state, metrics = trainer.train_step(state, rng, shard_batch(trainer.mesh, batch))
            steps += 1
            if steps % log_every == 0:
                print(
                    f"epoch {epoch} step {steps}: loss {float(metrics['loss']):.4f} "
                    f"acc {float(metrics['acc']):.3f} ({steps / (time.time() - t0):.1f} it/s)"
                )
        if val_dataset is not None:
            correct, total = 0, 0
            for x, y in val_dataset.batches(
                batch_size, shuffle=False, drop_last=False, epochs=1
            ):
                n = len(y)
                if n < batch_size:  # pad to the compiled shape, slice back
                    x = np.concatenate([x, np.repeat(x[-1:], batch_size - n, 0)])
                probs = np.asarray(_val_probs(state.params, state.batch_stats, x))[:n]
                correct += int((probs.argmax(axis=-1) == np.asarray(y)).sum())
                total += n
            if total == 0:
                import warnings

                warnings.warn("validation split is empty — early stopping inert")
            acc = correct / total if total else 0.0
            if acc > best_acc:
                best_acc, epochs_since_best = acc, 0
                # snapshot the best-val state: the saved classifier must be
                # the one early stopping selected, not the last (the
                # reference checkpoints best_model on each improvement)
                best_state = jax.device_get(state)
            else:
                epochs_since_best += 1
            print(f"epoch {epoch}: val acc {acc:.4f} (best {best_acc:.4f})")
            # early stopping on val acc (domain_classifier_training.py
            # --patience, default 5 there; opt-in here)
            if patience is not None and epochs_since_best >= patience:
                print(f"early stop: no val improvement for {patience} epochs")
                break
    return trainer, state if best_state is None else best_state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--split_file", default=None,
                    help="presplit JSON (required unless --real_dir is given)")
    # mixed real+generated training — the cross-domain-generalization
    # experiment of domain_classifier_training.py:919-1005
    ap.add_argument("--real_dir", default=None,
                    help="real data root with ID_*/User_* user dirs; "
                         "deterministic per-user 80/20 split when no "
                         "--split_file is given")
    ap.add_argument("--generated_dir", action="append", default=None,
                    help="generated data dir (repeatable); merged into the "
                         "train split with --use_generated")
    ap.add_argument("--use_generated", action="store_true",
                    help="augment the train split with --generated_dir data")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--patience", type=int, default=None,
                    help="early-stop after N epochs without val-acc improvement")
    ap.add_argument("--mode", default="baseline", choices=["baseline", "improved", "calibrated", "domain_adaptive"])
    ap.add_argument("--contrastive_type", default="supcon",
                    choices=["supcon", "interuser", "global"],
                    help="improved-mode contrastive criterion "
                         "(improved_classifier_training.py --contrastive_type)")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--out", default="classifier.safetensors")
    args = ap.parse_args()

    from vavae_tpu.data.image_folder import MixedDomainDataset, SplitFileDataset
    from vavae_tpu.train.checkpoint import save_state_file

    if args.real_dir or args.generated_dir:
        if not args.real_dir:
            # the reference requires real_data_dir: validation is real-only
            raise SystemExit("--generated_dir requires --real_dir")
        mk = lambda split: MixedDomainDataset(
            real_dir=args.real_dir, generated_dirs=args.generated_dir,
            split=split, image_size=args.image_size,
            use_generated=args.use_generated, split_file=args.split_file,
        )
        train_ds, val_ds = mk("train"), mk("val")
    elif args.split_file:
        train_ds = SplitFileDataset(args.split_file, "train", image_size=args.image_size)
        val_ds = SplitFileDataset(args.split_file, "val", image_size=args.image_size)
    else:
        raise SystemExit("one of --split_file or --real_dir is required")
    trainer, state = train_classifier(
        train_ds, val_ds, mode=args.mode, contrastive_type=args.contrastive_type,
        num_classes=args.num_classes, lr=args.lr, patience=args.patience,
        epochs=args.epochs, batch_size=args.batch_size, image_size=args.image_size,
    )
    out = args.out if args.out.endswith(".safetensors") else args.out + ".safetensors"
    # strip training-only rolling buffers (memory/feature banks): the saved
    # artifact is an inference classifier, and consumers (classifier_eval,
    # analyze_metrics, generation_evaluator) restore into extras=None states
    save_state_file(out, state.replace(extras=None))
    print(f"saved classifier state to {out}")


if __name__ == "__main__":
    main()
