"""Training loop.

Parity surface (SURVEY.md §2.5/§3.4-3.5):
- kecam ``train()`` driver (imagenet/train_func.py:204-255): per-batch cosine
  LR, checkpoint latest + best-by-monitor (MyCheckpoint callbacks.py:199-241),
  per-epoch JSON history with regularization-loss split (MyHistory :156-197),
  TerminateOnNaN.
- tfimm SingleGPUTrainer (train/trainer.py:72-317): epochs/validation cadence,
  ckpt-manager resume with optimizer+step state, validation_before_training.

TPU-native: one jitted train_step with batch sharded over the mesh 'data'
axis, parameters replicated, gradients all-reduced by XLA from the sharding
annotations (no hand-written collectives). Resumable state (params +
optimizer + step) is serialized as a msgpack pytree via utils/checkpoint.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import batch_sharding, get_mesh, replicated
from .losses import binary_cross_entropy_timm, categorical_cross_entropy
from .mixup import mixup_cutmix
from .optimizers import create_optimizer
from .sam import sam_gradient
from .schedules import CosineLrScheduler, exp_scheduler, multistep_schedule


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 10
    steps_per_epoch: int = 100
    lr_base: float = 1e-3
    # cosine (per-step, with restarts) | constant (fixed lr_base) |
    # multistep (decay_rate at each boundary in lr_decay_steps) |
    # exp (decay_rate every lr_decay_steps[0] epochs) — the four the
    # reference offers (kecam train_func.py:44-59)
    lr_schedule: str = "cosine"
    lr_decay_steps: Tuple[int, ...] = (30, 60, 90)
    lr_decay_rate: float = 0.1
    first_restart_step: float = 10
    warmup_epochs: float = 1
    cooldown_epochs: float = 0
    lr_min: float = 1e-6
    t_mul: float = 2.0
    m_mul: float = 0.5
    optimizer: str = "adamw"
    weight_decay: float = 0.02
    momentum: float = 0.9
    grad_clip_norm: Optional[float] = None
    loss: str = "bce_timm"  # bce_timm | categorical
    label_smoothing: float = 0.0
    target_threshold: float = 0.0  # bce_timm binarization point
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    use_sam: bool = False
    sam_rho: float = 0.05
    monitor: str = "val_loss"  # best-checkpoint criterion
    monitor_mode: str = "min"
    ckpt_dir: str = "checkpoints"
    basic_save_name: str = "model"
    # > 0: also keep per-epoch snapshots, pruned to the newest N (the
    # tf.train.CheckpointManager max_to_keep role); 0: latest + best only
    keep_n_checkpoints: int = 0
    # > 0: a snapshot about to be pruned is PRESERVED permanently instead
    # when >= this many hours passed since the last preserved one — the
    # tf.train.CheckpointManager keep_checkpoint_every_n_hours semantics the
    # reference hardcodes to 12 (tfimm train/trainer.py:254-259); 0: off
    keep_checkpoint_every_n_hours: float = 0.0
    # host-sync the loss for the TerminateOnNaN check only every N steps —
    # a per-step float(loss) serializes dispatch and bounds TPU throughput
    nan_check_every: int = 50
    # when set, per-epoch metrics stream to <log_dir>/<basic_save_name>.jsonl
    # via MetricLogger (kecam MyHistory / tfimm W&B hook role)
    log_dir: Optional[str] = None
    seed: int = 42


class Trainer:
    """Functional trainer over a Flax module + variables.

    data iterators yield ``(images_u8_or_f32, labels)`` numpy batches; labels
    are one/multi-hot float arrays (or int class ids for categorical loss).
    """

    def __init__(self, module, variables, cfg: TrainConfig, mesh=None):
        self.module = module
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else get_mesh()
        # own copies: the jitted step donates these buffers, which must not
        # invalidate the caller's variables
        self.params = jax.tree_util.tree_map(jnp.array, variables["params"])
        self.batch_stats = jax.tree_util.tree_map(
            jnp.array, variables.get("batch_stats", {})
        )

        if cfg.lr_schedule == "cosine":
            self.lr_fn = CosineLrScheduler(
                cfg.lr_base,
                cfg.first_restart_step,
                steps_per_epoch=cfg.steps_per_epoch,
                m_mul=cfg.m_mul,
                t_mul=cfg.t_mul,
                lr_min=cfg.lr_min,
                warmup_steps=cfg.warmup_epochs,
                cooldown_steps=cfg.cooldown_epochs,
            )
            self._lr_for = lambda step, epoch: self.lr_fn(step)
        elif cfg.lr_schedule == "constant":
            self._lr_for = lambda step, epoch: cfg.lr_base
        elif cfg.lr_schedule == "multistep":
            self._lr_for = lambda step, epoch: multistep_schedule(
                epoch, cfg.lr_base, cfg.lr_decay_steps, cfg.lr_decay_rate,
                warmup_epochs=int(cfg.warmup_epochs),
            )
        elif cfg.lr_schedule == "exp":
            decay_step = cfg.lr_decay_steps[0] if cfg.lr_decay_steps else 1
            self._lr_for = lambda step, epoch: exp_scheduler(
                epoch, cfg.lr_base, decay_step, cfg.lr_decay_rate,
                lr_min=cfg.lr_min, warmup_steps=int(cfg.warmup_epochs),
            )
        else:
            raise ValueError(
                f"lr_schedule must be cosine|constant|multistep|exp, "
                f"got {cfg.lr_schedule!r}"
            )
        # the optimizer is built at unit LR; the jitted step multiplies the
        # produced updates by the lr scalar passed in each call, keeping the
        # compiled program schedule-agnostic (optax scales decoupled weight
        # decay by lr the same way)
        self.tx = create_optimizer(
            cfg.optimizer,
            learning_rate=1.0,
            weight_decay=cfg.weight_decay,
            momentum=cfg.momentum,
            grad_clip_norm=cfg.grad_clip_norm,
        )
        self.opt_state = self.tx.init(self.params)
        self.global_step = 0
        self.initial_epoch = 0
        # knowledge distillation (tfimm DistillationProblem / kecam
        # DistillKLDivergenceLoss): set via set_teacher()
        self._teacher = None
        self.history: Dict[str, list] = {"lr": [], "loss": [], "val_loss": [], "val_acc": []}
        self._best = math.inf if cfg.monitor_mode == "min" else -math.inf
        self._best_path = None
        self._epoch_ckpts: list = []
        self._preserved_ckpts: list = []  # spared by keep_checkpoint_every_n_hours
        self._clock = time.time  # injectable for retention tests
        self._last_preserved_ts = self._clock()
        self._step_fn = None
        self._eval_fn = None

    def set_teacher(self, module, variables, temperature: float = 10.0, weight: float = 1.0):
        """Enable distillation: total loss = task loss + weight * KL(teacher||student)
        with temperature-softened distributions (losses.py:37-59 parity)."""
        self._teacher = (module, variables, temperature, weight)
        self._step_fn = None  # rebuild

    # ------------------------------------------------------------------
    def _loss(self, labels, outputs):
        cfg = self.cfg
        if labels.ndim == outputs.ndim - 1 and jnp.issubdtype(labels.dtype, jnp.integer):
            labels = jax.nn.one_hot(labels, outputs.shape[-1], dtype=outputs.dtype)
        if cfg.loss == "bce_timm":
            return jnp.mean(
                binary_cross_entropy_timm(
                    labels, outputs, target_threshold=cfg.target_threshold,
                    label_smoothing=cfg.label_smoothing,
                )
            )
        return jnp.mean(categorical_cross_entropy(labels, outputs, cfg.label_smoothing))

    def _build_step(self):
        cfg = self.cfg
        module = self.module
        tx = self.tx

        def train_step(params, batch_stats, opt_state, lr, images, labels, rng):
            rng_mix, rng_drop = jax.random.split(rng)
            # uint8 loader batches (data/train_pipeline.py) -> [0,1] floats;
            # already-float batches pass through untouched
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            if cfg.mixup_alpha or cfg.cutmix_alpha:
                x, labels = mixup_cutmix(rng_mix, x, labels, cfg.mixup_alpha, cfg.cutmix_alpha)

            teacher = self._teacher

            def loss_fn(p):
                out, mut = module.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x,
                    training=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng_drop},
                )
                out = out.astype(jnp.float32)
                loss = self._loss(labels, out)
                if teacher is not None:
                    t_module, t_vars, temp, w = teacher
                    t_out = t_module.apply(t_vars, x).astype(jnp.float32)
                    from .losses import distill_kl_divergence

                    loss = loss + w * jnp.mean(distill_kl_divergence(t_out, out, temp))
                return loss, mut.get("batch_stats", batch_stats)

            if cfg.use_sam:
                (loss, new_stats), grads = sam_gradient(loss_fn, params, cfg.sam_rho, has_aux=True)
            else:
                (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr.astype(u.dtype), updates)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt, loss

        data_shard = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(rep, rep, rep, rep, data_shard, data_shard, rep),
            out_shardings=(rep, rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )

    def _build_eval(self):
        module = self.module

        def eval_step(params, batch_stats, images, labels):
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            out = module.apply({"params": params, "batch_stats": batch_stats}, x)
            out = out.astype(jnp.float32)
            loss = self._loss(labels, out)
            if labels.ndim == out.ndim and out.shape[-1] == labels.shape[-1] == 1:
                # single-logit binary head: threshold, don't argmax a size-1 axis
                acc = jnp.mean(((out > 0.5) == (labels > 0.5)).astype(jnp.float32))
            elif labels.ndim == out.ndim and out.shape[-1] == labels.shape[-1]:
                acc = jnp.mean(
                    (jnp.argmax(out, -1) == jnp.argmax(labels, -1)).astype(jnp.float32)
                )
            elif labels.ndim == out.ndim - 1 and jnp.issubdtype(labels.dtype, jnp.integer):
                # integer class ids: compare against argmax directly
                acc = jnp.mean((jnp.argmax(out, -1) == labels).astype(jnp.float32))
            else:
                # no defined accuracy for this label layout: NaN, not a
                # silently-recorded 0.0
                acc = jnp.full((), jnp.nan)
            return loss, acc

        return jax.jit(eval_step, in_shardings=(replicated(self.mesh), replicated(self.mesh), batch_sharding(self.mesh), batch_sharding(self.mesh)))

    # ------------------------------------------------------------------
    # checkpointing (MyCheckpoint parity: *_latest + best-by-monitor pruning)
    # ------------------------------------------------------------------
    def _save(self, tag: str) -> str:
        from ..utils.checkpoint import save_variables

        path = os.path.join(self.cfg.ckpt_dir, f"{self.cfg.basic_save_name}_{tag}.msgpack")
        save_variables(
            path,
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
                "meta": {
                    "global_step": np.asarray(self.global_step),
                    "epoch": np.asarray(self.initial_epoch),
                },
            },
        )
        return path

    def save_latest(self):
        return self._save("latest")

    def _save_epoch_snapshot(self, epoch: int):
        """Per-epoch snapshot, pruned to the newest ``keep_n_checkpoints``
        (the reference's tf.train.CheckpointManager max_to_keep semantics,
        tfimm trainer.py:247-259). With ``keep_checkpoint_every_n_hours`` > 0
        a snapshot due for pruning is instead preserved permanently when at
        least that many hours separate it from the last preserved one — the
        long-run safety net tf.train.CheckpointManager provides (the
        reference hardcodes 12 h, tfimm trainer.py:258)."""
        path = self._save(f"epoch{epoch:03d}")
        self._epoch_ckpts.append((path, self._clock()))
        n_h = self.cfg.keep_checkpoint_every_n_hours
        while len(self._epoch_ckpts) > self.cfg.keep_n_checkpoints:
            old, ts = self._epoch_ckpts.pop(0)
            if old == path:
                continue
            if n_h > 0 and ts - self._last_preserved_ts >= n_h * 3600.0:
                self._last_preserved_ts = ts
                self._preserved_ckpts.append(old)  # spared from deletion
                continue
            self._remove_ckpt(old)
        return path

    @staticmethod
    def _remove_ckpt(path: str):
        """Delete a checkpoint AND its .md5 sidecar (save_variables writes
        both; pruning only the payload would strand orphan sidecars)."""
        for p in (path, path + ".md5"):
            if os.path.exists(p):
                os.remove(p)

    def maybe_save_best(self, monitor_value: float, epoch: int):
        better = (
            monitor_value < self._best
            if self.cfg.monitor_mode == "min"
            else monitor_value > self._best
        )
        if not better:
            return None
        self._best = monitor_value
        path = self._save(f"epoch{epoch}_{self.cfg.monitor}{monitor_value:.4f}")
        if self._best_path:
            self._remove_ckpt(self._best_path)  # prune previous best (callbacks.py:199-241)
        self._best_path = path
        return path

    def restore_latest(self) -> bool:
        from ..utils.checkpoint import load_variables

        path = os.path.join(self.cfg.ckpt_dir, f"{self.cfg.basic_save_name}_latest.msgpack")
        if not os.path.isfile(path):
            return False
        state = load_variables(path)
        # restore by structure (msgpack gives plain dicts)
        self.params = state["params"]
        self.batch_stats = state.get("batch_stats", {})
        import flax.serialization

        self.opt_state = flax.serialization.from_state_dict(self.opt_state, state["opt_state"])
        self.global_step = int(state["meta"]["global_step"])
        self.initial_epoch = int(state["meta"]["epoch"])
        return True

    def _dump_history(self):
        os.makedirs(self.cfg.ckpt_dir, exist_ok=True)
        path = os.path.join(self.cfg.ckpt_dir, f"{self.cfg.basic_save_name}_hist.json")
        with open(path, "w") as fh:
            json.dump(self.history, fh)

    # ------------------------------------------------------------------
    def fit(
        self,
        train_iter_fn: Callable[[], Iterable[Tuple[np.ndarray, np.ndarray]]],
        val_iter_fn: Optional[Callable[[], Iterable[Tuple[np.ndarray, np.ndarray]]]] = None,
        verbose: int = 1,
    ):
        cfg = self.cfg
        # accept re-iterable loaders directly (auto-wrap into factories)
        if train_iter_fn is not None and not callable(train_iter_fn):
            loader = train_iter_fn
            train_iter_fn = lambda: iter(loader)  # noqa: E731
        if val_iter_fn is not None and not callable(val_iter_fn):
            vloader = val_iter_fn
            val_iter_fn = lambda: iter(vloader)  # noqa: E731
        if self._step_fn is None:
            self._step_fn = self._build_step()
        if self._eval_fn is None and val_iter_fn is not None:
            self._eval_fn = self._build_eval()
        logger = None
        if cfg.log_dir:
            from .logging import MetricLogger

            logger = MetricLogger(
                cfg.log_dir, name=cfg.basic_save_name,
                config=dataclasses.asdict(cfg),
            )
        rng = jax.random.PRNGKey(cfg.seed)

        for epoch in range(self.initial_epoch, cfg.epochs):
            t0 = time.time()
            losses = []  # device scalars: fetched once at epoch end
            lr = cfg.lr_base
            nan_seen = False
            for step, (images, labels) in enumerate(train_iter_fn()):
                if step >= cfg.steps_per_epoch:
                    break
                lr = self._lr_for(self.global_step, epoch)
                rng, sub = jax.random.split(rng)
                self.params, self.batch_stats, self.opt_state, loss = self._step_fn(
                    self.params,
                    self.batch_stats,
                    self.opt_state,
                    jnp.asarray(lr, jnp.float32),
                    images,
                    labels,
                    sub,
                )
                self.global_step += 1
                losses.append(loss)
                # TerminateOnNaN, amortized: a per-step float(loss) would
                # host-sync every dispatch and bound TPU throughput, so only
                # the newest loss is fetched every nan_check_every steps
                if cfg.nan_check_every and (step + 1) % cfg.nan_check_every == 0:
                    val = float(loss)
                    if math.isnan(val) or math.isinf(val):
                        nan_seen = True
                        break

            host_losses = np.asarray(jax.device_get(jnp.stack(losses))) if losses else np.array([])
            if nan_seen or (host_losses.size and not np.isfinite(host_losses[-1])):
                print(f"NaN/Inf loss at step {self.global_step}; terminating.")
                self._dump_history()
                if logger is not None:
                    logger.finish()
                return self.history

            epoch_loss = float(np.mean(host_losses)) if host_losses.size else float("nan")
            self.history["lr"].append(float(lr))
            self.history["loss"].append(epoch_loss)

            val_loss, val_acc = float("nan"), float("nan")
            if val_iter_fn is not None:
                vl, va, n = 0.0, 0.0, 0
                for images, labels in val_iter_fn():
                    loss, acc = self._eval_fn(self.params, self.batch_stats, images, labels)
                    vl += float(loss)
                    va += float(acc)
                    n += 1
                if n:
                    val_loss, val_acc = vl / n, va / n
            self.history["val_loss"].append(val_loss)
            self.history["val_acc"].append(val_acc)

            self.initial_epoch = epoch + 1
            self.save_latest()
            if cfg.keep_n_checkpoints > 0:
                self._save_epoch_snapshot(epoch + 1)
            monitor = {
                "val_loss": val_loss, "loss": epoch_loss, "val_acc": val_acc
            }.get(cfg.monitor, val_loss)
            if not math.isnan(monitor):
                self.maybe_save_best(monitor, epoch)
            self._dump_history()
            if logger is not None:
                logger.log(
                    {"loss": epoch_loss, "val_loss": val_loss,
                     "val_acc": val_acc, "lr": float(lr),
                     "epoch_time_s": time.time() - t0, "epoch": epoch + 1},
                    step=self.global_step,
                )
            if verbose:
                print(
                    f"epoch {epoch + 1}/{cfg.epochs} loss={epoch_loss:.4f} "
                    f"val_loss={val_loss:.4f} val_acc={val_acc:.4f} lr={lr:.3e} "
                    f"({time.time() - t0:.1f}s)"
                )
        if logger is not None:
            logger.finish()
        return self.history
