"""Two-stage trainer (reference C14, trainer.py:84-905), TPU-native.

Differences from the reference by design:

* Device placement / DDP / grad-accum / AMP (Accelerate) are replaced by the
  jitted, donated train steps in :mod:`pgica_tpu.training.train_step` running
  under an optional :class:`~pgica_tpu.parallel.mesh.MeshContext` — batches
  sharded over the ``data`` axis, params sharded by the TP/FSDP rules.
* NaN-safe batch skipping is on-device (no per-step ``.item()`` host syncs,
  reference trainer.py:481-508); the skip counter is fetched only at logging
  boundaries.
* Best-val-loss and early-stopping state are **per stage** (the reference
  shares one ``best_val_loss`` across stages — SURVEY §2.4.6).
* Stage 2 runs full DPO against a frozen reference policy snapshotted at
  stage-2 start (the reference trainer is reference-free — SURVEY §2.4.3);
  set ``training.stage2.reference_free: true`` for reference-parity behavior.
* MLflow/wandb logging is guarded so absent packages degrade to console
  logging (the reference crashes when wandb is None — SURVEY §2.4.5).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pgica_tpu.core import prng
from pgica_tpu.training.checkpoint import CheckpointManager
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import (
    TrainState,
    make_stage0_train_step,
    make_stage1_eval_step,
    make_stage1_train_step,
    make_stage2_eval_step,
    make_stage2_train_step,
)

logger = logging.getLogger(__name__)

try:  # optional experiment tracking (reference trainer.py:224-245)
    import mlflow  # type: ignore
except Exception:  # pragma: no cover
    mlflow = None
try:
    import wandb  # type: ignore
except Exception:  # pragma: no cover
    wandb = None
try:
    from tqdm import tqdm  # type: ignore
except Exception:  # pragma: no cover
    tqdm = None


class PreferenceGuidedTrainer:
    """Orchestrates Stage 1 (contrastive) and Stage 2 (DPO) training."""

    def __init__(
        self,
        model,
        config,
        train_loader=None,
        val_loader=None,
        preference_train_loader=None,
        preference_val_loader=None,
        mesh=None,
        output_dir: Optional[str] = None,
        profile_dir: Optional[str] = None,
        max_steps_per_epoch: Optional[int] = None,
    ):
        self.model = model
        self.config = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.preference_train_loader = preference_train_loader
        self.preference_val_loader = preference_val_loader
        self.mesh = mesh

        self.output_dir = Path(output_dir or config.get("paths.output_dir", "./outputs"))
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoints = CheckpointManager(
            config.get("paths.checkpoint_dir", self.output_dir / "checkpoints")
        )

        self.profile_dir = profile_dir
        self.max_steps_per_epoch = max_steps_per_epoch  # debug cap (--max-steps)
        self._profile_started = False
        self.global_step = 0
        self.current_epoch = 0
        self._lora_base = None  # frozen base params during LoRA training
        self._stage2_dropped = None  # text tower held out by drop_unused_tower
        self._zero1_gather = None  # flat-shard -> param-tree fn under mesh.zero1
        self.best_val_loss: Dict[int, float] = {1: float("inf"), 2: float("inf")}
        self.early_stopping_patience = config.get("training.early_stopping_patience", 3)
        self.logging_steps = config.get("training.logging_steps", 100)
        # Preemption-aware mid-epoch autosave cadence (async Orbax): enabled
        # when training.save_strategy == "steps" (reference schema key).
        strategy = str(config.get("training.save_strategy", "steps")).lower()
        self.save_steps = int(config.get("training.save_steps", 0) or 0) if strategy == "steps" else 0
        # Retain only the newest K per-epoch checkpoints (None = keep all).
        self.keep_checkpoints = config.get("training.keep_checkpoints")
        # Per-epoch checkpoint writes can dominate wall-clock at flagship
        # scale on slow hosts (~10 GB each); best-model + autosave still
        # cover recovery when this is off.
        self.save_epoch_checkpoints = bool(config.get("training.save_epoch_checkpoints", True))
        self.save_best_checkpoints = bool(config.get("training.save_best_checkpoints", True))
        self._resume: Optional[Dict[str, int]] = None  # stage/epoch/step_in_epoch
        self.seed = config.get("training.seed", 42)
        # Length bucketing (training/packing.py): slice each batch's token
        # columns to the smallest multiple-of-32 bucket covering its longest
        # real sequence — exact (causal attention + masked losses), and the
        # padded-width decoder pass is both stages' hot loop. One compile per
        # bucket actually hit. Buckets stay divisible by the seq axis under CP.
        if bool(config.get("training.length_bucketing", True)):
            from pgica_tpu.training.packing import default_buckets

            max_len = int(config.get("data.max_caption_length", 128))
            self._buckets = tuple(
                config.get("training.length_buckets") or default_buckets(max_len)
            )
            self._seq_multiple = (mesh.shape.get("seq", 1) if mesh is not None else 1)
        else:
            self._buckets = None
            self._seq_multiple = 1
        self.history: Dict[str, List] = {"stage0": [], "stage1": [], "stage2": []}
        self._setup_tracking()

    # ------------------------------------------------------------- tracking

    def _setup_tracking(self):
        self._mlflow_run = None
        self._wandb_run = None
        if mlflow is not None:
            try:
                mlflow.set_experiment(
                    self.config.get("logging.mlflow_experiment", "image-captioning-alignment")
                )
                self._mlflow_run = mlflow.start_run()
                mlflow.log_params(
                    {
                        "stage1_lr": self.config.get("training.stage1.learning_rate"),
                        "stage2_lr": self.config.get("training.stage2.learning_rate"),
                        "projection_dim": self.config.get("model.projection_dim"),
                        "temperature": self.config.get("model.temperature"),
                    }
                )
            except Exception as e:  # pragma: no cover
                logger.warning("MLflow unavailable: %s", e)
        if wandb is not None:
            try:
                self._wandb_run = wandb.init(
                    project=self.config.get("logging.wandb_project", "preference-guided-captioning"),
                    mode="offline",
                    config=self.config.to_dict(),
                )
            except Exception as e:  # pragma: no cover
                logger.warning("wandb unavailable: %s", e)

    def _log_metrics(self, metrics: Dict[str, float], step: int, prefix: str = "train"):
        scalars = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        logger.info("step %d | %s", step, " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
        if self._mlflow_run is not None:
            try:
                mlflow.log_metrics(scalars, step=step)
            except Exception:  # pragma: no cover
                pass
        if self._wandb_run is not None and wandb is not None and wandb.run:
            wandb.log(scalars, step=step)

    def _finish_tracking(self):
        if self._mlflow_run is not None:
            try:
                mlflow.end_run()
            except Exception:  # pragma: no cover
                pass
        if self._wandb_run is not None and wandb is not None and wandb.run:
            wandb.finish()

    # ------------------------------------------------------------- helpers

    def _stage_cfg(self, stage: int) -> Dict[str, Any]:
        return self.config.get(f"training.stage{stage}", {})

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        arrays.pop("preference_score", None)
        if self._buckets is not None:
            from pgica_tpu.training.packing import bucket_batch

            arrays = bucket_batch(arrays, self._buckets, self._seq_multiple)
        if self.mesh is not None:
            return self.mesh.shard_batch(arrays)
        return jax.tree.map(jnp.asarray, arrays)

    @property
    def _lora_static(self):
        """(alpha, rank, dropout) when the model carries LoRA adapters, else None.

        dropout feeds the train-time adapter-input DropConnect
        (models/lora.py:apply_lora); merge sites that must be deterministic
        (frozen DPO reference, final fold) slice ``[:2]``.
        """
        cfg = getattr(self.model, "lora_config", None)
        if cfg and getattr(self.model, "lora", None) is not None:
            return (float(cfg["alpha"]), int(cfg["rank"]), float(cfg.get("dropout", 0.0)))
        return None

    def _make_optimizer(self, stage: int, steps_per_epoch: int, params=None):
        cfg = self._stage_cfg(stage)
        accum = int(cfg.get("gradient_accumulation_steps", 1))
        # The warmup-cosine horizon must reflect the steps that will actually
        # run: under the --max-steps debug cap the epoch is truncated, and
        # sizing the schedule from the full loader length would leave the
        # whole run inside warmup (LR never reaching peak).
        if self.max_steps_per_epoch is not None:
            steps_per_epoch = min(steps_per_epoch, self.max_steps_per_epoch)
        total_updates = max(1, steps_per_epoch * int(cfg.get("num_epochs", 1)) // max(accum, 1))
        lora = self._lora_static is not None
        # Modules outside the stage's gradient graph are excluded from the
        # optimizer entirely (torch AdamW semantics: grad-None params are
        # skipped, reference trainer.py:274-281) — otherwise optax.adamw
        # would weight-decay the untrained decoder during stage 1 and the
        # contrastive text tower during stage 2. The stage-2 decoder pass
        # never touches text_encoder/* (its shared-tower backbone lives
        # under shared_lm/), and stages 0/1 never touch caption_decoder/*
        # except stage 0's CE warmup.
        frozen_prefixes = ()
        if not lora:
            if stage == 1:
                frozen_prefixes = (("caption_decoder",),)
            elif stage in (0, 2):  # generation-mode stages: text tower unused
                frozen_prefixes = (("text_encoder",),)
        return create_optimizer(
            learning_rate=float(cfg.get("learning_rate", 5e-5)),
            total_steps=total_updates,
            warmup_steps=int(cfg.get("warmup_steps", 500)),
            weight_decay=float(cfg.get("weight_decay", 0.01)),
            max_grad_norm=float(cfg.get("max_grad_norm", 1.0)),
            gradient_accumulation_steps=accum,
            # LoRA: the optimizer only ever sees the adapter pytree, so no
            # freezing partitions are needed — the base is frozen by never
            # being differentiated (models/lora.py design).
            params_for_freezing=None if lora else (
                params if params is not None else self.model.params
            ),
            freeze_vision_backbone=False if lora else self.model.freeze_vision_backbone,
            freeze_text_backbone=False if lora else self.model.freeze_text_backbone,
            frozen_prefixes=frozen_prefixes,
        )

    def _shard_state_params(self, params):
        if self.mesh is None:
            return params
        from pgica_tpu.parallel.sharding import shard_params

        return shard_params(params, self.mesh.mesh)

    # ------------------------------------------------------------- ZeRO-1

    def _zero1_active(self, lora) -> bool:
        """``mesh.zero1`` routes training through the explicit
        reduce-scatter step (parallel/zero1.py): flat parameter buffer +
        Adam moments sharded over the ``data`` axis."""
        if not bool(self.config.get("mesh.zero1", False)):
            return False
        if self.mesh is None or self.mesh.shape.get("data", 1) <= 1:
            raise ValueError("mesh.zero1 requires a device mesh with data > 1")
        if lora is not None:
            raise ValueError(
                "mesh.zero1 does not compose with LoRA (the adapter "
                "optimizer state is tiny; use the default path)"
            )
        shape = self.mesh.shape
        bad = {a: shape.get(a, 1) for a in ("dcn", "fsdp", "model", "seq") if shape.get(a, 1) > 1}
        if bad:
            raise ValueError(
                f"mesh.zero1 shards the optimizer state over the data axis "
                f"only; set {sorted(bad)} to 1 (got {bad})"
            )
        if bool(self.config.get("mesh.zero3", False)):
            raise ValueError("mesh.zero1 and mesh.zero3 are mutually exclusive")
        return True

    # ------------------------------------------------------------- ZeRO-3

    def _zero3_axis(self):
        """Manual shard axis (name or tuple): every >1 axis among data/fsdp —
        canonical ZeRO shards batch and params over the SAME devices."""
        names = tuple(a for a in ("data", "fsdp") if self.mesh.shape.get(a, 1) > 1)
        return names if len(names) != 1 else names[0]

    def _zero3_active(self, lora) -> bool:
        """``mesh.zero3`` routes training through the explicit per-layer
        parameter-gather step (parallel/zero3.py): block params stay sharded
        at rest and are gathered one scan iteration at a time."""
        if not bool(self.config.get("mesh.zero3", False)):
            return False
        if self.mesh is None or (
            self.mesh.shape.get("data", 1) * self.mesh.shape.get("fsdp", 1) <= 1
        ):
            raise ValueError("mesh.zero3 requires a device mesh with data*fsdp > 1")
        if not getattr(self.model.module, "text_config").scan_layers:
            raise ValueError(
                "mesh.zero3 requires model.scan_layers: true (stacked-block "
                "lax.scan layout — the per-layer gather hook lives in the "
                "scan body)"
            )
        if lora is not None:
            raise ValueError("mesh.zero3 does not compose with LoRA")
        shape = self.mesh.shape
        bad = {a: shape.get(a, 1) for a in ("dcn", "model", "seq") if shape.get(a, 1) > 1}
        if bad:
            raise ValueError(
                f"mesh.zero3 runs manual over data/fsdp only; set "
                f"{sorted(bad)} to 1 (got {bad}; use the GSPMD scan_layers "
                f"path for fsdp x model meshes)"
            )
        return True

    def _init_zero3(self, stage: int, cfg, steps_per_epoch: int, loss_fn,
                    ref_params=None):
        """(state, jitted step, sharded ref) for the ZeRO-3 path of ``stage``."""
        from pgica_tpu.parallel.zero3 import make_zero3_train_step
        from pgica_tpu.training.optim import freeze_labels, warmup_cosine_schedule

        if int(cfg.get("gradient_accumulation_steps", 1)) > 1:
            raise ValueError(
                "mesh.zero3 does not support gradient_accumulation_steps > 1 "
                "(accumulate via a larger data/fsdp world instead)"
            )
        axis = self._zero3_axis()
        names = axis if isinstance(axis, tuple) else (axis,)
        n = 1
        for a in names:
            n *= self.mesh.shape[a]
        loader = self.train_loader if stage == 1 else self.preference_train_loader
        batch_size = int(
            getattr(loader, "batch_size", 0) or cfg.get("batch_size", 0) or 0
        )
        if batch_size and batch_size % n:
            raise ValueError(
                f"mesh.zero3: global batch_size {batch_size} must be divisible "
                f"by the data*fsdp world ({n})"
            )
        if self.max_steps_per_epoch is not None:
            steps_per_epoch = min(steps_per_epoch, self.max_steps_per_epoch)
        total_updates = max(1, steps_per_epoch * int(cfg.get("num_epochs", 1)))
        schedule = warmup_cosine_schedule(
            float(cfg.get("learning_rate", 5e-5)),
            int(cfg.get("warmup_steps", 500)),
            total_updates,
        )
        mask = None
        if self.model.freeze_vision_backbone or self.model.freeze_text_backbone:
            labels = freeze_labels(
                self.model.params,
                self.model.freeze_vision_backbone,
                self.model.freeze_text_backbone,
            )
            mask = jax.tree.map(lambda label: label == "train", labels)
        init_fn, step_fn = make_zero3_train_step(
            loss_fn,
            mesh=self.mesh.mesh,
            axis_name=axis,
            learning_rate=schedule,
            weight_decay=float(cfg.get("weight_decay", 0.01)),
            max_grad_norm=float(cfg.get("max_grad_norm", 1.0)),
            trainable_mask=mask,
            with_ref=ref_params is not None,
        )
        state = self._maybe_resume_opt_state(init_fn(self.model.params))
        ref_shards = init_fn.shard_ref(ref_params) if ref_params is not None else None
        self._zero1_gather = step_fn.gather_params
        logger.info(
            "Stage %d under ZeRO-3: block params sharded + gathered per layer "
            "over %s (world %d)", stage, axis, n,
        )
        return state, jax.jit(step_fn, donate_argnums=(0,)), ref_shards

    def _init_zero1(self, stage: int, cfg, steps_per_epoch: int, loss_fn):
        """Build (state, jitted step) for the ZeRO-1 path of ``stage``."""
        from pgica_tpu.parallel.zero1 import make_zero1_train_step
        from pgica_tpu.training.optim import freeze_labels, warmup_cosine_schedule

        if int(cfg.get("gradient_accumulation_steps", 1)) > 1:
            raise ValueError(
                "mesh.zero1 does not support gradient_accumulation_steps > 1 "
                "(accumulate via a larger data axis instead)"
            )
        n_data = self.mesh.shape["data"]
        loader = self.train_loader if stage == 1 else self.preference_train_loader
        batch_size = int(
            getattr(loader, "batch_size", 0) or cfg.get("batch_size", 0) or 0
        )
        if batch_size and batch_size % n_data:
            raise ValueError(
                f"mesh.zero1: global batch_size {batch_size} must be divisible "
                f"by the data axis ({n_data}) — shard_map splits the batch "
                f"evenly (GSPMD tolerates uneven shards; this mode does not)"
            )
        if self.max_steps_per_epoch is not None:
            steps_per_epoch = min(steps_per_epoch, self.max_steps_per_epoch)
        total_updates = max(1, steps_per_epoch * int(cfg.get("num_epochs", 1)))
        schedule = warmup_cosine_schedule(
            float(cfg.get("learning_rate", 5e-5)),
            int(cfg.get("warmup_steps", 500)),
            total_updates,
        )
        mask = None
        if self.model.freeze_vision_backbone or self.model.freeze_text_backbone:
            labels = freeze_labels(
                self.model.params,
                self.model.freeze_vision_backbone,
                self.model.freeze_text_backbone,
            )
            mask = jax.tree.map(lambda label: label == "train", labels)
        init_fn, step_fn = make_zero1_train_step(
            loss_fn,
            mesh=self.mesh.mesh,
            axis_name="data",
            learning_rate=schedule,
            weight_decay=float(cfg.get("weight_decay", 0.01)),
            max_grad_norm=float(cfg.get("max_grad_norm", 1.0)),
            trainable_mask=mask,
        )
        state = self._maybe_resume_opt_state(init_fn(self.model.params))
        self._zero1_gather = step_fn.gather_params
        logger.info(
            "Stage %d under ZeRO-1: flat Adam state sharded over data=%d",
            stage, self.mesh.shape["data"],
        )
        return state, jax.jit(step_fn, donate_argnums=(0,))

    def _train_params(self, state):
        """Full parameter tree for a train state (gathers under ZeRO-1/3)."""
        if hasattr(state, "param_shard") or hasattr(state, "rest_flat"):
            return self._zero1_gather(state)
        return state.params

    def _check_early_stopping(self, stage: int, val_loss: float, counter: int) -> int:
        """Returns updated patience counter; caller stops when it exceeds patience."""
        if val_loss < self.best_val_loss[stage]:
            return 0
        return counter + 1

    def _resume_window(self, stage: int, num_epochs: int):
        """(start_epoch, skip_steps) for this stage given a restored checkpoint.

        Mid-epoch autosaves (step_in_epoch > 0) resume INSIDE that epoch by
        skipping the already-consumed leading batches (the loader's shuffle is
        pinned per epoch, so the order replays exactly); end-of-epoch
        checkpoints resume at the next epoch.
        """
        if not self._resume or self._resume.get("stage") != stage:
            return 0, 0
        info, self._resume = self._resume, None  # consume once
        epoch = int(info.get("epoch", 0))
        step_in_epoch = int(info.get("step_in_epoch", 0))
        if step_in_epoch > 0:
            return min(epoch, num_epochs), step_in_epoch
        return min(epoch + 1, num_epochs), 0

    def _maybe_autosave(self, stage: int, epoch: int, step_idx: int, state):
        if not self.save_steps or self.global_step % self.save_steps != 0:
            return
        if stage == 0:
            # Stage-0 warmup is checkpoint-free by contract (train_stage0
            # docstring): an autosave here would later be mis-resumed as a
            # stage-1 mid-epoch point, silently skipping both the remaining
            # warmup epochs AND that many stage-1 batches.
            return
        self.checkpoints.save_autosave(
            stage, epoch=epoch, opt_state=state.opt_state,
            global_step=self.global_step, step_in_epoch=step_idx + 1,
            config=self.config.to_dict(), **self._ckpt_payload(state),
        )

    def _merge_dropped(self, params):
        """Re-attach the tower held out by ``drop_unused_tower`` (missing keys
        only — never clobbers a live subtree)."""
        if self._stage2_dropped:
            extra = {k: v for k, v in self._stage2_dropped.items() if k not in params}
            if extra:
                params = {**params, **extra}
        return params

    def _sync_model(self, state):
        """Push the train state back onto the model wrapper."""
        if self._lora_base is not None:
            self.model.lora = state.params
        else:
            self.model.params = self._merge_dropped(self._train_params(state))

    def _ckpt_payload(self, state) -> Dict[str, Any]:
        """Checkpoint content: full params, or frozen base + adapter factors."""
        if self._lora_base is not None:
            from pgica_tpu.models.lora import lora_to_tree

            return {
                "params": self._lora_base,
                "lora": lora_to_tree(state.params),
                "lora_config": dict(self.model.lora_config),
            }
        return {"params": self._merge_dropped(self._train_params(state))}

    # ------------------------------------------------------------- stage 0

    def train_stage0(self) -> Dict[str, Any]:
        """OPTIONAL caption-CE (language-modeling) warmup before stage 1.

        Inert unless ``training.stage0.num_epochs`` > 0 — a beyond-reference
        utility: the reference inherits language modeling from pretrained
        gpt2-medium, so fully-offline from-scratch runs need this for the
        decoder to emit text at all (results/eval_conceptual/NOTES.md).
        Trains the full model with teacher-forced caption cross-entropy on
        the stage-1 corpus; no checkpoints or early stopping (short warmup).
        """
        cfg = self._stage_cfg(0)
        num_epochs = int(cfg.get("num_epochs", 0))
        if num_epochs <= 0:
            return {"skipped": True}
        if self.train_loader is None:
            raise ValueError("Stage 0 requires a contrastive train_loader")
        if self._lora_static is not None:
            raise ValueError("stage0 warmup is full-parameter; disable it for LoRA runs")
        optimizer = self._make_optimizer(0, len(self.train_loader))
        state = self._maybe_resume_opt_state(
            TrainState.create(self._shard_state_params(self.model.params), optimizer)
        )
        train_step = jax.jit(
            make_stage0_train_step(self.model.module, optimizer, augment=True),
            donate_argnums=(0,),
        )
        rng = prng.purpose_key(prng.root_key(self.seed), "train_stage0")
        logger.info("Stage 0 (caption-CE warmup): %d epochs x %d steps",
                    num_epochs, len(self.train_loader))
        start_epoch, skip_steps = self._resume_window(0, num_epochs)
        for epoch in range(start_epoch, num_epochs):
            state, epoch_metrics = self._run_epoch(
                state, self.train_loader, train_step, rng, stage=0, epoch=epoch,
                skip_steps=skip_steps if epoch == start_epoch else 0,
            )
            self.history["stage0"].append(
                {
                    "epoch": epoch,
                    "train_loss": epoch_metrics.get("loss"),
                    "input_wait_fraction": epoch_metrics.get("input_wait_fraction"),
                }
            )
        self._sync_model(state)
        return {"history": self.history["stage0"]}

    # ------------------------------------------------------------- stage 1

    def train_stage1(self) -> Dict[str, Any]:
        if self.train_loader is None:
            raise ValueError("Stage 1 requires a contrastive train_loader")
        cfg = self._stage_cfg(1)
        num_epochs = int(cfg.get("num_epochs", 1))
        lora = self._lora_static
        temperature = float(self.config.get("model.temperature", 0.5))

        if self._zero3_active(lora):
            from pgica_tpu.parallel.zero3 import make_zero3_module
            from pgica_tpu.training.train_step import stage1_loss_fn

            self._lora_base = None
            axis = self._zero3_axis()
            module3 = make_zero3_module(self.model.module, axis)

            def z3_loss(params, batch, rng):
                # Block params arrive as local shards; the module clone
                # gathers them one layer per scan iteration. NT-Xent
                # negatives all-gather over the same manual axis.
                return stage1_loss_fn(
                    params, batch, rng, module3, temperature,
                    augment=True, axis_name=axis,
                )

            state, z_step, _ = self._init_zero3(1, cfg, len(self.train_loader), z3_loss)

            def train_step(state, batch, rng, base_params=None):
                return z_step(state, batch, rng)

        elif self._zero1_active(lora):
            from pgica_tpu.training.train_step import stage1_loss_fn

            self._lora_base = None
            module = self.model.module

            def z_loss(params, batch, rng):
                # Explicit-collective NT-Xent: negatives all-gathered over
                # the data axis inside the shard_map body.
                return stage1_loss_fn(
                    params, batch, rng, module, temperature,
                    augment=True, axis_name="data",
                )

            state, z_step = self._init_zero1(1, cfg, len(self.train_loader), z_loss)

            def train_step(state, batch, rng, base_params=None):
                return z_step(state, batch, rng)

        else:
            self._zero1_gather = None
            optimizer = self._make_optimizer(1, len(self.train_loader))
            if lora is not None:
                self._lora_base = self.model.params  # frozen; passed per-step
                trainable = self.model.lora
            else:
                self._lora_base = None
                trainable = self._shard_state_params(self.model.params)
            state = self._maybe_resume_opt_state(TrainState.create(trainable, optimizer))
            train_step = jax.jit(
                make_stage1_train_step(
                    self.model.module, optimizer, temperature, augment=True, lora=lora
                ),
                donate_argnums=(0,),
            )
        eval_step = jax.jit(make_stage1_eval_step(self.model.module, temperature, lora=lora))
        # Purpose-keyed stream (core/prng.py): the step folds in state.step,
        # so a resumed run replays the exact same per-step keys.
        rng = prng.purpose_key(prng.root_key(self.seed), "train_stage1")

        logger.info("Stage 1: %d epochs x %d steps", num_epochs, len(self.train_loader))
        patience_counter = 0
        start_epoch, skip_steps = self._resume_window(1, num_epochs)
        for epoch in range(start_epoch, num_epochs):
            self.current_epoch = epoch
            state, epoch_metrics = self._run_epoch(
                state, self.train_loader, train_step, rng, stage=1, epoch=epoch,
                skip_steps=skip_steps if epoch == start_epoch else 0,
            )
            val_loss = self._validate(
                self._train_params(state), self.val_loader, eval_step, stage=1, epoch=epoch
            )
            record = {
                "epoch": epoch,
                "train_loss": epoch_metrics.get("loss"),
                "val_loss": val_loss,
                "input_wait_fraction": epoch_metrics.get("input_wait_fraction"),
            }
            self.history["stage1"].append(record)

            self._sync_model(state)
            if self.save_epoch_checkpoints:
                self.checkpoints.save_epoch(
                    1, epoch, opt_state=state.opt_state,
                    global_step=self.global_step, val_loss=val_loss,
                    config=self.config.to_dict(), **self._ckpt_payload(state),
                )
                if self.keep_checkpoints:
                    self.checkpoints.prune_epochs(1, int(self.keep_checkpoints))
            if val_loss is not None:
                patience_counter = self._check_early_stopping(1, val_loss, patience_counter)
                if val_loss < self.best_val_loss[1]:
                    self.best_val_loss[1] = val_loss
                    if self.save_best_checkpoints:
                        self.checkpoints.save_best(
                            1, epoch=epoch,
                            global_step=self.global_step, val_loss=val_loss,
                            config=self.config.to_dict(), **self._ckpt_payload(state),
                        )
                if patience_counter >= self.early_stopping_patience:
                    logger.info("Stage 1 early stopping at epoch %d", epoch)
                    break
        self._sync_model(state)
        return {"best_val_loss": self.best_val_loss[1], "history": self.history["stage1"]}

    # ------------------------------------------------------------- stage 2

    def train_stage2(self) -> Dict[str, Any]:
        cfg = self._stage_cfg(2)
        num_epochs = int(cfg.get("num_epochs", 1))
        if num_epochs <= 0:
            logger.info("Stage 2 disabled (num_epochs=%d)", num_epochs)
            return {"skipped": True}
        if self.preference_train_loader is None:
            raise ValueError("Stage 2 requires a preference_train_loader")

        lora = self._lora_static
        reference_free = bool(cfg.get("reference_free", False))
        zero1 = self._zero1_active(lora)
        zero3 = self._zero3_active(lora)
        # Stage 2 never executes the contrastive text tower (generation mode
        # runs the vision tower + caption decoder only; flax never looks the
        # subtree up), yet its fp32 masters + Adam zeros + the bf16
        # frozen-reference copy still occupy HBM — ~4.7 GB at GPT-2-Large
        # scale (results/PROFILE_scaled.md). drop_unused_tower removes the
        # subtree from the policy AND the reference for the duration of the
        # stage — loss-identical — and merges it back for every
        # checkpoint/eval sync (_sync_model/_ckpt_payload).
        drop_tower = bool(cfg.get("drop_unused_tower", False))
        self._stage2_dropped = None
        if drop_tower and (lora is not None or zero1 or zero3):
            raise ValueError(
                "training.stage2.drop_unused_tower composes with the plain "
                "jit/TP/CP paths only (LoRA and ZeRO-1/3 manage their own "
                "parameter layouts)"
            )
        if not (zero1 or zero3):
            self._zero1_gather = None
            opt_params = self.model.params
            if drop_tower and lora is None and "text_encoder" in opt_params:
                opt_params = {k: v for k, v in opt_params.items() if k != "text_encoder"}
            optimizer = self._make_optimizer(
                2, len(self.preference_train_loader), params=opt_params,
            )
        if lora is not None:
            self._lora_base = self.model.params
            trainable = self.model.lora  # carries over any stage-1 adaptation
            # Frozen reference = the merged policy at stage-2 start.
            ref_params = None
            if not reference_free:
                from pgica_tpu.models.lora import apply_lora

                alpha, rank = lora[:2]
                ref_params = apply_lora(self._lora_base, trainable, alpha=alpha, rank=rank)
        else:
            self._lora_base = None
            full = self.model.params
            if drop_tower and "text_encoder" in full:
                # Hold the tower OUT OF HBM entirely: device_get moves it to
                # host memory for the duration of the stage (merge-back and
                # checkpointing accept numpy leaves; anything that later runs
                # it re-uploads lazily). Keeping the device buffers alive here
                # used to re-occupy ~2.9 GB at GPT-2-Large scale — the
                # difference between fitting and OOM on one v5e chip
                # (results/PROFILE_scaled.md, round-5 fit boundary).
                self._stage2_dropped = {
                    "text_encoder": jax.device_get(full["text_encoder"])
                }
                full = {k: v for k, v in full.items() if k != "text_encoder"}
            # Under ZeRO-1/3 the step manages parameter layout itself; the
            # GSPMD device_put here would only replicate a second full tree.
            trainable = full if (zero1 or zero3) else self._shard_state_params(full)
            # Frozen reference policy = the policy at stage-2 start (standard
            # DPO). Deep copy: the train state is donated, so the reference
            # must own separate buffers. The reference only runs forward in
            # the compute dtype anyway, so by default its weights are stored
            # bf16 — halving its HBM footprint (1.6 GB at GPT-2-medium scale,
            # measured +33% stage-2 throughput via the larger feasible batch).
            # Set training.stage2.reference_dtype: float32 to keep masters.
            ref_params = None
            if not reference_free:
                from pgica_tpu.core.precision import cast_floating, compute_dtype

                ref_dtype = compute_dtype(cfg.get("reference_dtype", "bf16"))
                # jit the cast: XLA allocates only the OUTPUT tree (jit
                # results never alias inputs without donation, so leaves
                # already in ref_dtype still get fresh buffers — required
                # because the train state is donated). The eager
                # copy-then-cast it replaces materialized a transient full
                # f32 copy first: +3.1 GB peak at GPT-2-Large scale.
                ref_params = self._stage2_reference(
                    ref_dtype,
                    lambda: jax.jit(lambda p: cast_floating(p, ref_dtype))(trainable),
                )
        beta = float(cfg.get("dpo_beta", 0.1))
        length_normalized = bool(cfg.get("length_normalized", False))
        label_smoothing = float(cfg.get("label_smoothing", 0.0))
        if zero3:
            from pgica_tpu.parallel.zero3 import make_zero3_module
            from pgica_tpu.training.train_step import stage2_loss_fn

            axis = self._zero3_axis()
            module3 = make_zero3_module(self.model.module, axis)

            def z3_loss(params, ref_tree, batch, rng):
                # ref_tree arrives pre-gathered by the zero3 step body (the
                # frozen reference is sharded at rest via init_fn.shard_ref).
                return stage2_loss_fn(
                    params, ref_tree, batch, rng, module3, beta,
                    reference_free, length_normalized, label_smoothing, True,
                )

            if reference_free:
                def z3_loss(params, batch, rng, _fn=z3_loss):  # noqa: E306
                    return _fn(params, None, batch, rng)

            state, z_step, ref_shards = self._init_zero3(
                2, cfg, len(self.preference_train_loader), z3_loss,
                ref_params=None if reference_free else ref_params,
            )

            def zero1_train_step(state, ref, batch, rng, base_params=None):
                return z_step(state, batch, rng, ref=ref_shards)

        elif zero1:
            from pgica_tpu.training.train_step import stage2_loss_fn

            module = self.model.module
            ref_const = ref_params  # static over stage 2; closed over the step

            def z_loss(params, batch, rng):
                return stage2_loss_fn(
                    params, ref_const, batch, rng, module, beta,
                    reference_free, length_normalized, label_smoothing, True,
                )

            state, z_step = self._init_zero1(
                2, cfg, len(self.preference_train_loader), z_loss
            )

            def zero1_train_step(state, ref, batch, rng, base_params=None):
                return z_step(state, batch, rng)

        else:
            state = self._maybe_resume_opt_state(TrainState.create(trainable, optimizer))

        # Under tensor parallelism the DPO logprob reduction goes through the
        # vocab-parallel shard_map path (sequence_logprobs_from_hidden) so the
        # model-axis-sharded wte is never gathered.
        tp_mesh = None
        if not (zero1 or zero3) and self.mesh is not None and self.mesh.shape.get("model", 1) > 1 and lora is None:
            tp_mesh = self.mesh.mesh

        # Context parallelism (mesh.seq > 1): the decoder's sequence dim is
        # sharded over the 'seq' axis through the loss (training/cp_step.py).
        cp = self.mesh is not None and self.mesh.shape.get("seq", 1) > 1
        if zero1 or zero3:
            # _zero1_active/_zero3_active already rejected seq/model > 1 meshes.
            train_step = zero1_train_step
            eval_step = jax.jit(
                make_stage2_eval_step(
                    self.model.module,
                    beta=beta,
                    reference_free=reference_free,
                    length_normalized=length_normalized,
                )
            )
        elif cp:
            if lora is not None:
                raise ValueError(
                    "mesh.seq context parallelism composes with dcn/data/fsdp "
                    "and model axes but not with LoRA"
                )
            from pgica_tpu.training.cp_step import (
                make_stage2_cp_eval_step,
                make_stage2_cp_train_step,
            )

            seq_len = int(self.config.get("data.max_caption_length", 128))
            if seq_len % self.mesh.shape["seq"] != 0:
                raise ValueError(
                    f"max_caption_length {seq_len} not divisible by mesh.seq "
                    f"{self.mesh.shape['seq']}"
                )
            common = dict(
                mesh=self.mesh.mesh, axis_name="seq",
                beta=float(cfg.get("dpo_beta", 0.1)),
                reference_free=reference_free,
                length_normalized=bool(cfg.get("length_normalized", False)),
                data_axis=("dcn", "data", "fsdp"),
                # TP x CP: seq/data manual, model axis auto (GSPMD Megatron
                # rules partition the decoder inside the shard_map body).
                tp_axis="model" if tp_mesh is not None else None,
                # Without the fused path CP materializes the full
                # (2B, S_local, V) logits per device — the exact HBM cost
                # sequence sharding exists to avoid.
                use_fused_ce=bool(self.config.get("pallas.fused_cross_entropy", True)),
            )
            train_step = jax.jit(
                make_stage2_cp_train_step(
                    self.model.module, optimizer, augment=True,
                    label_smoothing=float(cfg.get("label_smoothing", 0.0)),
                    **common,
                ),
                donate_argnums=(0,),
            )
            eval_step = jax.jit(make_stage2_cp_eval_step(self.model.module, **common))
        else:
            train_step = jax.jit(
                make_stage2_train_step(
                    self.model.module,
                    optimizer,
                    beta=float(cfg.get("dpo_beta", 0.1)),
                    reference_free=reference_free,
                    length_normalized=bool(cfg.get("length_normalized", False)),
                    label_smoothing=float(cfg.get("label_smoothing", 0.0)),
                    augment=True,
                    lora=lora,
                    mesh=tp_mesh,
                ),
                donate_argnums=(0,),
            )
            eval_step = jax.jit(
                make_stage2_eval_step(
                    self.model.module,
                    beta=float(cfg.get("dpo_beta", 0.1)),
                    reference_free=reference_free,
                    length_normalized=bool(cfg.get("length_normalized", False)),
                    lora=lora,
                    mesh=tp_mesh,
                )
            )
        rng = prng.purpose_key(prng.root_key(self.seed), "train_stage2")

        logger.info("Stage 2: %d epochs x %d steps", num_epochs, len(self.preference_train_loader))
        patience_counter = 0
        start_epoch, skip_steps = self._resume_window(2, num_epochs)
        for epoch in range(start_epoch, num_epochs):
            self.current_epoch = epoch
            state, epoch_metrics = self._run_epoch(
                state, self.preference_train_loader, train_step, rng,
                stage=2, epoch=epoch, ref_params=ref_params,
                skip_steps=skip_steps if epoch == start_epoch else 0,
            )
            val_loss = self._validate(
                self._train_params(state), self.preference_val_loader, eval_step,
                stage=2, epoch=epoch, ref_params=ref_params,
            )
            record = {
                "epoch": epoch,
                "train_loss": epoch_metrics.get("loss"),
                "val_loss": val_loss,
                "input_wait_fraction": epoch_metrics.get("input_wait_fraction"),
            }
            self.history["stage2"].append(record)

            self._sync_model(state)
            if self.save_epoch_checkpoints:
                self.checkpoints.save_epoch(
                    2, epoch, opt_state=state.opt_state,
                    global_step=self.global_step, val_loss=val_loss,
                    config=self.config.to_dict(), **self._ckpt_payload(state),
                )
                if self.keep_checkpoints:
                    self.checkpoints.prune_epochs(2, int(self.keep_checkpoints))
            if val_loss is not None:
                patience_counter = self._check_early_stopping(2, val_loss, patience_counter)
                if val_loss < self.best_val_loss[2]:
                    self.best_val_loss[2] = val_loss
                    if self.save_best_checkpoints:
                        self.checkpoints.save_best(
                            2, epoch=epoch,
                            global_step=self.global_step, val_loss=val_loss,
                            config=self.config.to_dict(), **self._ckpt_payload(state),
                        )
                if patience_counter >= self.early_stopping_patience:
                    logger.info("Stage 2 early stopping at epoch %d", epoch)
                    break
        self._sync_model(state)
        self._stage2_dropped = None  # model carries the full tree again
        return {"best_val_loss": self.best_val_loss[2], "history": self.history["stage2"]}

    # ------------------------------------------------------------- loops

    def _stage2_reference(self, ref_dtype, fresh_fn):
        """Frozen DPO reference = the policy at STAGE-2 START, persisted.

        Rebuilding the reference from the restored policy after a preemption
        would silently move the implicit-KL anchor to wherever training was
        interrupted (reward margins reset; the continued run optimizes a
        different objective). The reference is written once at stage-2 start
        and restored whenever a stage-2 checkpoint is being resumed.
        """
        from pgica_tpu.core.precision import cast_floating

        name = "stage2_reference"
        path = self.checkpoints._path(name)
        if self._resume is not None and self._resume.get("stage") == 2 and path.exists():
            payload = self.checkpoints.restore(name)
            logger.info("Restored stage-2 DPO reference (stage-2 start policy) from %s", path)
            return cast_floating(jax.tree.map(jnp.asarray, payload["params"]), ref_dtype)
        ref = fresh_fn()
        if self.save_steps or self.save_epoch_checkpoints or self.save_best_checkpoints:
            # Only worth persisting when some checkpoint could be resumed.
            self.checkpoints.save(name, ref, stage=2)
        return ref

    def _maybe_profile(self):
        """Capture a jax.profiler trace of steps 2-7 when profile_dir is set."""
        if self.profile_dir is None:
            return
        if self.global_step == 2 and not self._profile_started:
            jax.profiler.start_trace(str(self.profile_dir))
            self._profile_started = True
            logger.info("Started jax.profiler trace -> %s", self.profile_dir)
        elif self.global_step >= 8 and self._profile_started:
            self._stop_profile()

    def _stop_profile(self):
        if self._profile_started:
            jax.profiler.stop_trace()
            self._profile_started = False
            logger.info("Stopped jax.profiler trace")

    def _run_epoch(self, state, loader, train_step, rng, stage, epoch, ref_params=None, skip_steps=0):
        losses = []
        t0 = time.perf_counter()
        n_items = 0
        if hasattr(loader, "set_epoch"):
            loader.set_epoch(epoch)  # deterministic per-epoch order for resume
        start_idx = 0
        if skip_steps and hasattr(loader, "iter_batches"):
            # O(1) resume: consumed batches are never fetched (the fallback
            # below decodes and discards them).
            base_iter = loader.iter_batches(skip_steps)
            start_idx, skip_steps = skip_steps, 0
        else:
            base_iter = loader
        iterator = base_iter
        if tqdm is not None and jax.process_index() == 0:
            iterator = tqdm(
                base_iter, total=len(loader), initial=start_idx,
                desc=f"stage{stage} epoch {epoch}", leave=False,
            )

        # Input-starvation detector: time spent blocked in the loader's
        # next() vs everything else (device step dispatch + donation waits).
        # On the 1-core dev host this validates/refutes the multi-core feed
        # capacity model (BACKLOG.md) the first time a many-core host runs.
        input_wait_s = 0.0

        def _timed(it):
            nonlocal input_wait_s
            it = iter(it)
            while True:
                t_wait = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    return
                input_wait_s += time.perf_counter() - t_wait
                yield batch

        for step_idx, batch in enumerate(_timed(iterator), start=start_idx):
            if self.max_steps_per_epoch is not None and step_idx >= self.max_steps_per_epoch:
                break
            if step_idx < skip_steps:
                continue  # already consumed before the mid-epoch checkpoint
            self._maybe_profile()
            device_batch = self._device_batch(batch)
            n_items += device_batch["image"].shape[0]
            if stage <= 1:  # stage 0 (CE warmup) and stage 1 share the signature
                state, metrics = train_step(state, device_batch, rng, self._lora_base)
            else:
                state, metrics = train_step(state, ref_params, device_batch, rng, self._lora_base)
            self.global_step += 1
            self._maybe_autosave(stage, epoch, step_idx, state)
            if self.global_step % self.logging_steps == 0:
                host = {k: float(v) for k, v in metrics.items()}
                self._log_metrics(host, self.global_step, prefix=f"stage{stage}/train")
            losses.append(metrics["loss"])
        # Single host sync per epoch for the mean loss; NaN-skipped steps are
        # excluded (reference semantics, trainer.py:523-544).
        if losses:
            stacked = jnp.stack(losses)
            finite = jnp.isfinite(stacked)
            mean_loss = float(
                jnp.sum(jnp.where(finite, stacked, 0.0)) / jnp.clip(jnp.sum(finite), 1, None)
            )
        else:
            mean_loss = float("nan")
        dt = time.perf_counter() - t0
        skipped = int(state.skipped)
        input_wait_fraction = input_wait_s / max(dt, 1e-6)
        logger.info(
            "stage %d epoch %d: train_loss=%.4f (%d steps, %.1f pairs/s, "
            "%d NaN-skipped, input wait %.0f%%)",
            stage, epoch, mean_loss, len(losses), n_items / max(dt, 1e-6), skipped,
            100.0 * input_wait_fraction,
        )
        if input_wait_fraction > 0.25 and len(losses) > 1:
            logger.warning(
                "stage %d epoch %d is INPUT-BOUND: %.0f%% of epoch wall time was "
                "spent waiting on the data loader (%.1fs of %.1fs). Raise "
                "data.num_workers / switch data.loader_backend, or the TPU idles.",
                stage, epoch, 100.0 * input_wait_fraction, input_wait_s, dt,
            )
        self._stop_profile()  # close the trace even for very short epochs
        return state, {
            "loss": mean_loss,
            "pairs_per_sec": n_items / max(dt, 1e-6),
            "skipped": skipped,
            "input_wait_fraction": round(input_wait_fraction, 4),
        }

    def _validate(self, params, loader, eval_step, stage, epoch, ref_params=None) -> Optional[float]:
        if loader is None or len(loader) == 0:
            return None
        losses = []
        for batch in loader:
            device_batch = self._device_batch(batch)
            if stage == 1:
                metrics = eval_step(params, device_batch, self._lora_base)
            else:
                metrics = eval_step(params, ref_params, device_batch, self._lora_base)
            losses.append(metrics["loss"])
        val_loss = float(jnp.mean(jnp.stack(losses)))
        self._log_metrics({"loss": val_loss}, self.global_step, prefix=f"stage{stage}/val")
        return val_loss

    # ------------------------------------------------------------- pipeline

    def train(self) -> Dict[str, Any]:
        """Run the full two-stage pipeline (reference trainer.py:855-905)."""
        results: Dict[str, Any] = {}
        t0 = time.perf_counter()
        resume_stage = (self._resume or {}).get("stage")
        try:
            if resume_stage in (None, 0) and int(self._stage_cfg(0).get("num_epochs", 0)) > 0:
                # resume_stage == 0 can only come from a legacy stage-0
                # autosave (current builds never checkpoint stage 0);
                # re-enter the warmup at its recorded resume point.
                results["stage0"] = self.train_stage0()
            if int(self._stage_cfg(1).get("num_epochs", 0)) > 0:
                if resume_stage == 2:
                    # Re-running stage 1 would train the restored DPO policy
                    # with the contrastive objective (and feed the stage-2
                    # opt_state into the stage-1 optimizer).
                    logger.info("Skipping stage 1: resuming a stage-2 checkpoint")
                else:
                    results["stage1"] = self.train_stage1()
            results["stage2"] = self.train_stage2()
        finally:
            self._finish_tracking()
            self.checkpoints.wait()  # finalize any in-flight async autosave
            for ld in (self.train_loader, self.val_loader,
                       self.preference_train_loader, self.preference_val_loader):
                if hasattr(ld, "close"):
                    ld.close()  # release worker pools (fork snapshots)
        if bool(self.config.get("training.load_best_model_at_end", False)):
            self._load_best_at_end()
        elif self._lora_base is not None and self.model.lora is not None:
            self._fold_lora()
        self._write_results(results, wall_clock_s=time.perf_counter() - t0)
        return results

    def _fold_lora(self):
        """After training, merge final adapters into the wrapper's params so
        generate_captions / CLIs see the adapted model. ``model.lora`` is
        cleared to prevent double-merging downstream."""
        from pgica_tpu.models.lora import apply_lora

        alpha, rank = self._lora_static[:2]
        self.model.params = apply_lora(self._lora_base, self.model.lora, alpha=alpha, rank=rank)
        self.model.lora = None
        logger.info("Folded LoRA adapters into model params for inference")

    def _load_best_at_end(self):
        """Leave the best-val-loss checkpoint installed on the model
        (``training.load_best_model_at_end``, HF Trainer semantics). The most
        recent stage with a recorded best wins (stage 2 over stage 1)."""
        for stage in (2, 1):
            if self.best_val_loss[stage] == float("inf"):
                continue
            path = self.checkpoints._path(f"best_model_stage{stage}")
            if not path.exists():
                continue
            from pgica_tpu.training.checkpoint import effective_params

            payload = self.checkpoints.restore(path)
            self.model.params = jax.tree.map(jnp.asarray, effective_params(payload))
            if payload.get("lora") is not None:
                self.model.lora = None  # merged — prevent double-application
            logger.info(
                "load_best_model_at_end: restored best stage-%d params (val_loss %.4f)",
                stage, self.best_val_loss[stage],
            )
            return
        logger.info("load_best_model_at_end: no best checkpoint recorded; keeping final params")

    def _write_results(self, results: Dict[str, Any], wall_clock_s: float):
        """Emit results.json / results_summary.json artifacts (reference C25)."""
        import json

        import jax as _jax

        counts = self.model.num_parameters() if hasattr(self.model, "num_parameters") else {}
        payload = {
            "framework": "pgica_tpu",
            "hardware": f"{_jax.default_backend()} x{len(_jax.devices())}",
            "total_parameters": counts.get("total"),
            "trainable_parameters": counts.get("trainable"),
            "total_steps": self.global_step,
            "wall_clock_minutes": round(wall_clock_s / 60.0, 2),
            "stage0": {"history": self.history.get("stage0", [])},
            "stage1": {
                "best_val_loss": None
                if self.best_val_loss[1] == float("inf")
                else self.best_val_loss[1],
                "history": self.history["stage1"],
            },
            "stage2": {
                "best_val_loss": None
                if self.best_val_loss[2] == float("inf")
                else self.best_val_loss[2],
                "history": self.history["stage2"],
            },
            "nan_skipped_note": "per-stage skip counts are logged per epoch",
            # Starvation detector: worst per-epoch fraction of wall time spent
            # blocked on the data loader (per-epoch values in each history
            # record). >0.25 means the run was input-bound — raise
            # data.num_workers before believing any throughput number.
            "input_wait_fraction": max(
                (
                    rec["input_wait_fraction"]
                    for recs in self.history.values()
                    for rec in recs
                    if rec.get("input_wait_fraction") is not None
                ),
                default=None,
            ),
        }
        path = self.output_dir / "results.json"
        path.write_text(json.dumps(payload, indent=2))
        summary = {
            "hardware": payload["hardware"],
            "wall_clock_minutes": payload["wall_clock_minutes"],
            "stage1_final_train_loss": (
                self.history["stage1"][-1]["train_loss"] if self.history["stage1"] else None
            ),
            "stage1_best_val_loss": payload["stage1"]["best_val_loss"],
            "stage2_final_train_loss": (
                self.history["stage2"][-1]["train_loss"] if self.history["stage2"] else None
            ),
            "stage2_best_val_loss": payload["stage2"]["best_val_loss"],
            "total_steps": self.global_step,
        }
        (self.output_dir / "results_summary.json").write_text(json.dumps(summary, indent=2))
        logger.info("Wrote results artifacts to %s", self.output_dir)

    def load_checkpoint(self, path) -> Dict[str, Any]:
        payload = self.checkpoints.restore(path)
        if payload.get("lora") is not None and getattr(self.model, "lora_config", None):
            # Resume LoRA training: base and adapter factors restored separately.
            from pgica_tpu.models.lora import lora_from_tree

            self.model.params = jax.tree.map(jnp.asarray, payload["params"])
            self.model.lora = jax.tree.map(jnp.asarray, lora_from_tree(payload["lora"]))
        else:
            from pgica_tpu.training.checkpoint import effective_params

            self.model.params = jax.tree.map(jnp.asarray, effective_params(payload))
        # Optimizer state (Adam moments + schedule counter) resumes the next
        # stage start when its tree structure matches the fresh optimizer.
        self._restored_opt_state = payload.get("opt_state")
        meta = payload.get("meta", {})
        self.global_step = int(meta.get("global_step", 0) or 0)
        self.current_epoch = int(meta.get("epoch", 0) or 0)
        # NB: `or 1` would coerce a legitimate stage 0 to 1 (0 is falsy);
        # only a *missing* stage defaults to 1.
        meta_stage = meta.get("stage")
        self._resume = {
            "stage": 1 if meta_stage is None else int(meta_stage),
            "epoch": self.current_epoch,
            "step_in_epoch": int(meta.get("step_in_epoch", 0) or 0),
        }
        logger.info(
            "Restored checkpoint from %s (stage %s, epoch %d, step %d, step_in_epoch %d)",
            path, self._resume["stage"], self.current_epoch, self.global_step,
            self._resume["step_in_epoch"],
        )
        return meta

    def _maybe_resume_opt_state(self, state: TrainState) -> TrainState:
        restored = getattr(self, "_restored_opt_state", None)
        if restored is None:
            return state
        self._restored_opt_state = None  # consume once
        try:
            import flax.serialization

            # Rebuild the typed optax state (namedtuples etc.) from the
            # canonical state-dict encoding against the fresh optimizer state;
            # raises if shapes/structure genuinely changed.
            restored_typed = flax.serialization.from_state_dict(state.opt_state, restored)

            # Restore each leaf straight onto the fresh state's sharding:
            # materializing unsharded first would place e.g. the ZeRO-1
            # flat Adam moments full-size on one device.
            def _put(r, s):
                sharding = getattr(s, "sharding", None)
                if sharding is not None:
                    return jax.device_put(np.asarray(r), sharding)
                return jnp.asarray(r)

            restored_typed = jax.tree.map(_put, restored_typed, state.opt_state)
            fresh_shapes = jax.tree.map(lambda x: jnp.shape(x), state.opt_state)
            rest_shapes = jax.tree.map(lambda x: jnp.shape(x), restored_typed)
            if fresh_shapes != rest_shapes:
                raise ValueError("optimizer state shapes changed")
            logger.info("Resumed optimizer state from checkpoint")
            return state.replace(
                opt_state=restored_typed, step=jnp.asarray(self.global_step, jnp.int32)
            )
        except Exception as e:
            logger.warning("Could not resume optimizer state (%s); starting fresh", e)
            return state
