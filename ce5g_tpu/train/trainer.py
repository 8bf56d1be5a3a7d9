"""Training loop: optax optimizers/schedules, nnx train step, early
stopping, checkpointing, metric logging.

Parity surface: reference src/train.py:97-294 and
run_phase4_training.py:115-266 / run_phase6_advanced_training.py:125-288:
  * optimizers adam | adamw | sgd(momentum 0.9) with weight decay;
  * schedulers (per-EPOCH semantics like torch): cosine (T_max=epochs),
    step (size 30, γ=0.1), plateau (patience 10, factor 0.1),
    warm_restarts (T_0=10, T_mult=2);
  * gradient clipping by global norm; early stopping (patience/min_delta);
  * best + periodic checkpoints; per-epoch history (JSON) and scalar
    logging (JSONL; TensorBoard-compatible via scripts).

TPU-first: one jit-compiled train step (donated state), batches sharded
over the mesh's 'data' axis when provided; bf16 compute when
cfg.training.mixed_precision.
"""
from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ..config import ExperimentConfig
from ..models.factory import count_parameters, get_model
from ..models.inputs import apply_output_residual
from ..models.loss import channel_estimation_loss
from .checkpoint import load_checkpoint, save_checkpoint
from .datasets import ChannelDataset, DeviceDataset


def lr_schedule_per_epoch(cfg, epoch: int, lr_scale: float = 1.0) -> float:
    """torch-parity per-epoch LR value (plateau handled via lr_scale)."""
    base = cfg.training.learning_rate
    sched = cfg.training.lr_scheduler
    if sched == "cosine":
        t = min(epoch, cfg.training.epochs) / max(cfg.training.epochs, 1)
        lr = base * 0.5 * (1 + math.cos(math.pi * t))
    elif sched == "step":
        lr = base * (0.1 ** (epoch // 30))
    elif sched == "warm_restarts":
        t0, t_mult = 10, 2
        e, period = epoch, t0
        while e >= period:
            e -= period
            period *= t_mult
        lr = base * 0.5 * (1 + math.cos(math.pi * e / period))
    else:  # plateau or none: constant base
        lr = base
    return lr * lr_scale


def make_optimizer(cfg: ExperimentConfig):
    """optax chain mirroring the reference's optimizer zoo. The LR is
    injected per epoch (torch-style) via inject_hyperparams."""
    tr = cfg.training

    def build(learning_rate):
        if tr.optimizer == "adam":
            core = optax.adamw(learning_rate, weight_decay=tr.weight_decay)
            # torch Adam's weight_decay is L2-into-grad; adamw is decoupled.
            # Reference default weight_decay=1e-5 makes the difference
            # negligible; we standardize on decoupled decay.
        elif tr.optimizer == "adamw":
            core = optax.adamw(learning_rate, weight_decay=tr.weight_decay)
        elif tr.optimizer == "sgd":
            core = optax.sgd(learning_rate, momentum=0.9)
        else:
            raise ValueError(f"Unknown optimizer: {tr.optimizer!r}")
        parts = []
        if tr.gradient_clip > 0:
            parts.append(optax.clip_by_global_norm(tr.gradient_clip))
        parts.append(core)
        return optax.chain(*parts)

    return optax.inject_hyperparams(build)(learning_rate=tr.learning_rate)


class Trainer:
    """Epoch-driven trainer over a jit step (reference Trainer parity)."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        model: Optional[nnx.Module] = None,
        model_type: Optional[str] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        log=print,
        tensorboard: bool = False,
        device_data: Optional[bool] = None,
        name: Optional[str] = None,
    ):
        """``device_data``: train from HBM-resident tensors with one jit
        scan per epoch (zero host↔device traffic per step) — the TPU-first
        default. None = auto (on unless a mesh is given; the mesh path
        stages per-batch so GSPMD keeps the batch axis sharded). False
        forces the per-batch host-staging loop."""
        self.cfg = cfg
        self.model_type = model_type or cfg.model.type
        # checkpoint/history file prefix; distinct from model_type for
        # variant runs (e.g. 'cnn_wiener' = cnn arch + wiener features)
        self.name = name or self.model_type
        dtype = jnp.bfloat16 if cfg.training.mixed_precision else jnp.float32
        self.model = model or get_model(
            self.model_type, cfg.model, dtype=dtype, seed=cfg.seed
        )
        self.optimizer = nnx.Optimizer(self.model, make_optimizer(cfg), wrt=nnx.Param)
        self.mesh = mesh
        self.log = log
        self.history: Dict[str, List[float]] = {
            "train_loss": [],
            "val_loss": [],
            "lr": [],
            "epoch_time": [],
        }
        self.best_val_loss = float("inf")
        self.epochs_without_improvement = 0
        self._lr_scale = 1.0
        self._plateau_wait = 0
        self._start_epoch = 0
        self._is_lstm = self.model_type == "lstm"
        # recurrent families carry nnx.RNN scans whose RngCount mutations
        # cannot nest inside the outer device-resident epoch lax.scan
        # (flax TraceContextError) — they train via the host-staging path
        self._has_rnn = self.model_type in ("lstm", "hybrid", "cnn_lstm")
        self.device_data = device_data
        self._dev_state = None  # (graphdef, state) once device mode starts
        self._step = self._build_step()
        self._eval_step = self._build_eval_step()
        self._scalar_log: List[Dict] = []
        # Optional TensorBoard sink (reference src/train.py:124-125 uses
        # torch SummaryWriter; gated import so the core has no torch dep).
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(Path(cfg.log_dir) / "tensorboard"))
            except ImportError:
                self.log("tensorboard unavailable; falling back to JSONL only")

    def _log_scalar(self, tag: str, step: int, value: float):
        self._scalar_log.append({"tag": tag, "step": step, "value": value})
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    # ---------------------------------------------------------------- steps
    def _build_step(self):
        tr = self.cfg.training
        is_lstm = self._is_lstm

        @nnx.jit(donate_argnames=("model", "optimizer"))
        def step(model, optimizer, inputs, targets, mask, lr):
            optimizer.opt_state.hyperparams["learning_rate"][...] = lr

            def loss_fn(m):
                pred = apply_output_residual(m(inputs, train=True), inputs)
                pm = None if is_lstm else mask
                return channel_estimation_loss(
                    pred,
                    targets,
                    pm,
                    tr.loss,
                    tr.channel_weight,
                    tr.pilot_weight,
                )

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            return loss

        return step

    def _build_eval_step(self):
        tr = self.cfg.training
        is_lstm = self._is_lstm

        @nnx.jit
        def eval_step(model, inputs, targets, mask):
            pred = apply_output_residual(model(inputs, train=False), inputs)
            pm = None if is_lstm else mask
            return channel_estimation_loss(
                pred, targets, pm, tr.loss, tr.channel_weight, tr.pilot_weight
            )

        return eval_step

    def _device_batch(self, batch):
        if self._is_lstm:
            from ..models.inputs import lstm_inputs

            x, y = lstm_inputs(batch)
            arrs = (x, y, batch.pilot_mask)
        else:
            arrs = (batch.inputs, batch.targets, batch.pilot_mask)
        if self.mesh is not None:
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
            arrs = tuple(jax.device_put(jnp.asarray(a), sharding) for a in arrs)
        else:
            arrs = tuple(jnp.asarray(a) for a in arrs)
        return arrs

    # ---------------------------------------------------------------- loop
    def train_epoch(self, dataset: ChannelDataset, epoch: int) -> float:
        """One epoch. Losses stay ON DEVICE until the epoch ends: fetching
        `float(loss)` per step forces a device→host sync every batch
        (a full tunnel round-trip on the dev setup), serializing host batch
        prep against device compute. With async dispatch the host stages
        batch k+1 while the device trains on batch k; only the periodic
        batch-loss log and the epoch mean fetch."""
        lr = lr_schedule_per_epoch(self.cfg, epoch, self._lr_scale)
        losses, count = [], 0
        for batch in dataset.batches(
            self.cfg.training.batch_size, shuffle=True, seed=self.cfg.seed + epoch
        ):
            x, y, m = self._device_batch(batch)
            loss = self._step(self.model, self.optimizer, x, y, m, lr)
            losses.append(loss)
            count += 1
            if count % 10 == 0:
                self._log_scalar("train/batch_loss", epoch * 10000 + count, float(loss))
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.stack(losses)))

    def validate(self, dataset: ChannelDataset) -> float:
        losses = []
        for batch in dataset.batches(self.cfg.training.batch_size, shuffle=False):
            x, y, m = self._device_batch(batch)
            losses.append(self._eval_step(self.model, x, y, m))
        if not losses:
            return 0.0
        return float(jnp.mean(jnp.stack(losses)))

    # ----------------------------------------------- device-resident epochs
    def _build_device_fns(self):
        """jit epoch/val scans over HBM-resident tensors. One host
        round-trip per epoch: the per-step losses fetch as one array."""
        import functools

        tr = self.cfg.training
        is_lstm = self._is_lstm
        graphdef, state = nnx.split((self.model, self.optimizer))
        self._dev_graphdef = graphdef
        self._dev_state = state

        def _xy(inputs, targets, idx):
            x, y = inputs[idx], targets[idx]
            m = x[..., 4]
            if is_lstm:
                b, s, k, _ = x.shape
                x = x[..., :4].reshape(b, s * k, 4)
                y = y.reshape(b, s * k, 2)
            return x, y, (None if is_lstm else m)

        def _loss(model, x, y, m, train):
            pred = apply_output_residual(model(x, train=train), x)
            return channel_estimation_loss(
                pred, y, m, tr.loss, tr.channel_weight, tr.pilot_weight
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state, inputs, targets, idx2d, lr):
            def body(st, idx):
                model, optimizer = nnx.merge(graphdef, st)
                optimizer.opt_state.hyperparams["learning_rate"][...] = lr
                x, y, m = _xy(inputs, targets, idx)
                loss, grads = nnx.value_and_grad(
                    lambda m_: _loss(m_, x, y, m, True)
                )(model)
                optimizer.update(model, grads)
                return nnx.state((model, optimizer)), loss

            return jax.lax.scan(body, state, idx2d)

        @jax.jit
        def val_fn(state, inputs, targets, idx2d):
            model, _ = nnx.merge(graphdef, state)

            def body(c, idx):
                x, y, m = _xy(inputs, targets, idx)
                return c + _loss(model, x, y, m, False), None

            tot, _ = jax.lax.scan(body, jnp.float32(0.0), idx2d)
            return tot / idx2d.shape[0]

        self._epoch_jit = epoch_fn
        self._val_jit = val_fn

    # ------------------------------------------ device-resident, per-step
    def _build_device_step_fns(self):
        """jit per-STEP functions over HBM-resident tensors, batch gathered
        on device by index. For the recurrent families (lstm/hybrid):
        their nnx.RNN RngCount mutations cannot nest inside the epoch
        lax.scan, but a plain per-step nnx.jit handles them fine — and
        with async dispatch the python loop costs only the dispatch
        latency (no per-step host↔device data, no per-step fetch), vs
        ~260 s/epoch for per-batch host staging through the dev tunnel."""
        tr = self.cfg.training
        is_lstm = self._is_lstm

        def _xy(inputs, targets, idx):
            x, y = inputs[idx], targets[idx]
            m = x[..., 4]
            if is_lstm:
                b, s, k, _ = x.shape
                x = x[..., :4].reshape(b, s * k, 4)
                y = y.reshape(b, s * k, 2)
            return x, y, (None if is_lstm else m)

        @nnx.jit(donate_argnames=("model", "optimizer"))
        def step(model, optimizer, inputs, targets, idx, lr):
            optimizer.opt_state.hyperparams["learning_rate"][...] = lr
            x, y, m = _xy(inputs, targets, idx)

            def loss_fn(mod):
                pred = apply_output_residual(mod(x, train=True), x)
                return channel_estimation_loss(
                    pred, y, m, tr.loss, tr.channel_weight, tr.pilot_weight
                )

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            return loss

        @nnx.jit
        def eval_step(model, inputs, targets, idx):
            x, y, m = _xy(inputs, targets, idx)
            pred = apply_output_residual(model(x, train=False), x)
            return channel_estimation_loss(
                pred, y, m, tr.loss, tr.channel_weight, tr.pilot_weight
            )

        self._dev_step = step
        self._dev_eval_step = eval_step

    def _device_step_epoch(self, dd: DeviceDataset, epoch: int) -> float:
        if getattr(self, "_dev_step", None) is None:
            self._build_device_step_fns()
        bsz = self.cfg.training.batch_size
        steps = len(dd) // bsz
        if steps == 0:
            return 0.0
        lr = jnp.float32(lr_schedule_per_epoch(self.cfg, epoch, self._lr_scale))
        perm = np.random.default_rng(self.cfg.seed + epoch).permutation(len(dd))
        idx2d = jnp.asarray(
            perm[: steps * bsz].reshape(steps, bsz), jnp.int32
        )
        losses = []
        for i in range(steps):
            loss = self._dev_step(
                self.model, self.optimizer, dd.inputs, dd.targets, idx2d[i], lr
            )
            losses.append(loss)  # stays on device — no per-step fetch
        losses = np.asarray(jnp.stack(losses))
        for i in range(9, len(losses), 10):
            self._log_scalar(
                "train/batch_loss", epoch * 10000 + i + 1, float(losses[i])
            )
        return float(losses.mean())

    def _device_step_validate(self, dd: DeviceDataset) -> float:
        if getattr(self, "_dev_step", None) is None:
            self._build_device_step_fns()
        bsz = self.cfg.training.batch_size
        steps = len(dd) // bsz
        if steps == 0:
            return 0.0
        idx2d = jnp.asarray(np.arange(steps * bsz).reshape(steps, bsz), jnp.int32)
        losses = [
            self._dev_eval_step(self.model, dd.inputs, dd.targets, idx2d[i])
            for i in range(steps)
        ]
        return float(np.mean(np.asarray(jnp.stack(losses))))

    def _device_train_epoch(self, dd: DeviceDataset, epoch: int) -> float:
        if self._dev_state is None:
            self._build_device_fns()
        bsz = self.cfg.training.batch_size
        steps = len(dd) // bsz
        if steps == 0:
            return 0.0
        lr = lr_schedule_per_epoch(self.cfg, epoch, self._lr_scale)
        # same host-RNG shuffle semantics as the staged path
        perm = np.random.default_rng(self.cfg.seed + epoch).permutation(len(dd))
        idx2d = jnp.asarray(perm[: steps * bsz].reshape(steps, bsz), jnp.int32)
        self._dev_state, losses = self._epoch_jit(
            self._dev_state, dd.inputs, dd.targets, idx2d, jnp.float32(lr)
        )
        losses = np.asarray(losses)
        for i in range(9, len(losses), 10):
            self._log_scalar("train/batch_loss", epoch * 10000 + i + 1, float(losses[i]))
        # write the updated params back into the live modules so
        # checkpointing/evaluation see the post-epoch state
        nnx.update((self.model, self.optimizer), self._dev_state)
        return float(losses.mean())

    def _device_validate(self, dd: DeviceDataset) -> float:
        if self._dev_state is None:
            self._build_device_fns()
        bsz = self.cfg.training.batch_size
        steps = len(dd) // bsz
        if steps == 0:
            return 0.0
        idx2d = jnp.asarray(
            np.arange(steps * bsz).reshape(steps, bsz), jnp.int32
        )
        return float(self._val_jit(self._dev_state, dd.inputs, dd.targets, idx2d))

    def _plateau_update(self, val_loss: float):
        """torch ReduceLROnPlateau(mode=min, patience=10, factor=0.1)."""
        if self.cfg.training.lr_scheduler != "plateau":
            return
        if val_loss < self.best_val_loss - 1e-12:
            self._plateau_wait = 0
        else:
            self._plateau_wait += 1
            if self._plateau_wait > 10:
                self._lr_scale *= 0.1
                self._plateau_wait = 0

    def _trainer_meta(self, epoch: int, val_loss: float) -> Dict:
        """Everything needed to continue the loop exactly where it stopped
        (reference utils.py:190-198 saves epoch + loss; we also carry the
        scheduler/early-stop counters so the trajectory is bit-identical)."""
        return {
            "epoch": epoch,
            "val_loss": val_loss,
            "best_val_loss": self.best_val_loss,
            "epochs_without_improvement": self.epochs_without_improvement,
            "lr_scale": self._lr_scale,
            "plateau_wait": self._plateau_wait,
            "history": self.history,
        }

    def resume(self, path) -> int:
        """Restore model + optimizer + loop counters from a resumable
        checkpoint; returns the epoch to continue from. Parity:
        run_phase4_training.py:241-259 / utils.py:201-208 (torch
        load_state_dict of model AND optimizer, epoch counter restored)."""
        meta = load_checkpoint(path, self.model, self.optimizer)
        if "epoch" not in meta:
            raise ValueError(f"checkpoint {path} has no epoch metadata")
        self._start_epoch = int(meta["epoch"]) + 1
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        self.epochs_without_improvement = int(
            meta.get("epochs_without_improvement", 0)
        )
        self._lr_scale = float(meta.get("lr_scale", 1.0))
        self._plateau_wait = int(meta.get("plateau_wait", 0))
        hist = meta.get("history")
        if hist:
            self.history = {k: list(v) for k, v in hist.items()}
        self.log(f"resumed from {path}: continuing at epoch {self._start_epoch + 1}")
        return self._start_epoch

    def train(
        self,
        train_ds: ChannelDataset,
        val_ds: ChannelDataset,
        epochs: Optional[int] = None,
        model_dir: Optional[str] = None,
    ) -> Dict:
        cfg = self.cfg
        epochs = cfg.training.epochs if epochs is None else epochs
        model_dir = Path(model_dir or cfg.model_dir)
        model_dir.mkdir(parents=True, exist_ok=True)
        self.log(
            f"Training {self.model_type}: {count_parameters(self.model):,} params, "
            f"{epochs} epochs, batch {cfg.training.batch_size}"
        )

        # auto mode: on unless a mesh shards batches per step, or the model
        # contains nnx.RNN scans (lstm/hybrid — their RngCount mutations
        # cannot nest inside the outer epoch lax.scan trace). Explicit
        # device_data=True routes RNN models through the device-resident
        # PER-STEP path (HBM-resident data, python loop of per-step jit
        # dispatches): on normal hardware that removes all per-step host
        # traffic; on the tunneled dev chip each dispatch of the big state
        # pytree costs ~0.6 s, so host staging is the better default there
        # (measured 382 s vs 260 s per epoch — the tunnel re-ships
        # argument metadata per call).
        use_device = (
            self.device_data
            if self.device_data is not None
            else (self.mesh is None and not self._has_rnn)
        )
        use_steps = use_device and self._has_rnn
        if use_device:
            t0 = time.time()
            dd_train = (
                train_ds
                if isinstance(train_ds, DeviceDataset)
                else DeviceDataset(train_ds)
            )
            dd_val = (
                val_ds if isinstance(val_ds, DeviceDataset) else DeviceDataset(val_ds)
            )
            self.log(
                f"device-resident data: {len(dd_train)}+{len(dd_val)} samples "
                f"staged to HBM in {time.time() - t0:.1f}s"
            )

        epoch, val_loss = self._start_epoch - 1, self.best_val_loss
        for epoch in range(self._start_epoch, epochs):
            t0 = time.time()
            if use_steps:
                train_loss = self._device_step_epoch(dd_train, epoch)
                val_loss = self._device_step_validate(dd_val)
            elif use_device:
                train_loss = self._device_train_epoch(dd_train, epoch)
                val_loss = self._device_validate(dd_val)
            else:
                train_loss = self.train_epoch(train_ds, epoch)
                val_loss = self.validate(val_ds)
            self._plateau_update(val_loss)
            dt = time.time() - t0
            lr = lr_schedule_per_epoch(cfg, epoch, self._lr_scale)
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["lr"].append(lr)
            self.history["epoch_time"].append(dt)
            for tag, v in (
                ("train/epoch_loss", train_loss),
                ("val/loss", val_loss),
                ("train/lr", lr),
            ):
                self._log_scalar(tag, epoch, v)
            self.log(
                f"epoch {epoch + 1}/{epochs}  train {train_loss:.6f}  "
                f"val {val_loss:.6f}  lr {lr:.2e}  ({dt:.1f}s)"
            )

            if val_loss < self.best_val_loss - cfg.training.min_delta:
                self.best_val_loss = val_loss
                self.epochs_without_improvement = 0
                if cfg.training.save_best:
                    save_checkpoint(
                        model_dir / f"{self.name}_best",
                        self.model,
                        epoch=epoch,
                        val_loss=val_loss,
                    )
            else:
                self.epochs_without_improvement += 1

            # Rolling resumable checkpoint (model + optimizer + counters):
            # a killed run continues from here with an identical trajectory.
            save_checkpoint(
                model_dir / f"{self.name}_last",
                self.model,
                self.optimizer,
                **self._trainer_meta(epoch, val_loss),
            )
            if (epoch + 1) % cfg.training.save_freq == 0:
                save_checkpoint(
                    model_dir / f"{self.name}_epoch_{epoch + 1}",
                    self.model,
                    self.optimizer,
                    **self._trainer_meta(epoch, val_loss),
                )

            if (
                cfg.training.early_stopping
                and self.epochs_without_improvement >= cfg.training.patience
            ):
                self.log(f"Early stopping at epoch {epoch + 1}")
                break

        save_checkpoint(
            model_dir / f"{self.name}_final",
            self.model,
            epoch=epoch,
            val_loss=val_loss,
        )
        (model_dir / f"{self.name}_history.json").write_text(
            json.dumps(self.history, indent=2)
        )
        (model_dir / f"{self.name}_scalars.jsonl").write_text(
            "\n".join(json.dumps(r) for r in self._scalar_log)
        )
        if self._tb is not None:
            self._tb.close()
        return {
            "best_val_loss": self.best_val_loss,
            "epochs_run": len(self.history["train_loss"]),
            "history": self.history,
        }


def advanced_policy(cfg: ExperimentConfig, model_type: str) -> ExperimentConfig:
    """Per-model optimizer policy of the reference's AdvancedTrainer
    (run_phase6_advanced_training.py:138-160): LSTM → Adam at lr/2,
    Hybrid → AdamW with wd 1e-4, others → Adam; all with
    CosineAnnealingWarmRestarts(T_0=10, T_mult=2)."""
    import dataclasses

    tr = cfg.training
    if model_type == "lstm":
        tr = dataclasses.replace(
            tr, optimizer="adam", learning_rate=tr.learning_rate / 2
        )
    elif model_type in ("hybrid", "cnn_lstm"):
        tr = dataclasses.replace(tr, optimizer="adamw", weight_decay=1e-4)
    else:
        tr = dataclasses.replace(tr, optimizer="adam")
    tr = dataclasses.replace(tr, lr_scheduler="warm_restarts")
    return dataclasses.replace(cfg, training=tr)
