"""Orbax checkpointing with the reference's naming and payload scheme.

Reference checkpoints (trainer.py:770-813): per-epoch files
``checkpoint_stage{S}_epoch{E}.pt`` plus ``best_model_stage{S}.pt`` holding
epoch/stage/global_step/model/optimizer/scheduler/val_loss/config. Here the
payload is an Orbax PyTree checkpoint (params + opt_state + counters + the
resolved config dict); directory names keep the reference pattern so tooling
expectations carry over.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def effective_params(payload: Dict[str, Any]):
    """Inference-ready params from a restored payload.

    Checkpoints written during LoRA training store the frozen base under
    ``params`` plus the adapter factors under ``lora`` (with the peft-style
    config in meta); this merges them so every consumer (predict/evaluate/
    run_evaluation CLIs, load_best_model_at_end) sees a plain param tree.
    """
    params = payload["params"]
    lora_tree = payload.get("lora")
    if not lora_tree:
        return params
    from pgica_tpu.models.lora import apply_lora, lora_from_tree

    cfg = (payload.get("meta") or {}).get("lora_config") or {}
    return apply_lora(
        params,
        lora_from_tree(lora_tree),
        alpha=float(cfg.get("alpha", 32.0)),
        rank=int(cfg.get("rank", 16)),
    )


class CheckpointManager:
    """Save/restore training state with per-epoch + per-stage-best files,
    plus a rotating async mid-epoch autosave for preemption recovery."""

    def __init__(self, checkpoint_dir, async_save: bool = True):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()
        self._async = None
        if async_save:
            try:
                self._async = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            except Exception as e:  # pragma: no cover
                logger.warning("Async checkpointing unavailable (%s)", e)

    def _path(self, name: str) -> Path:
        return (self.checkpoint_dir / name).resolve()

    def save(
        self,
        name: str,
        params: Any,
        opt_state: Any = None,
        *,
        epoch: int = 0,
        stage: int = 1,
        global_step: int = 0,
        val_loss: Optional[float] = None,
        config: Optional[Dict] = None,
        overwrite: bool = True,
        lora: Any = None,
        lora_config: Optional[Dict] = None,
        step_in_epoch: int = 0,
        use_async: bool = False,
    ) -> Path:
        path = self._path(name)
        meta = {
            "epoch": epoch,
            "stage": stage,
            "global_step": global_step,
            "step_in_epoch": int(step_in_epoch),
            "val_loss": None if val_loss is None else float(val_loss),
            "config": config,
        }
        if lora_config is not None:
            meta["lora_config"] = jax.tree.map(
                lambda x: list(x) if isinstance(x, tuple) else x, lora_config,
                is_leaf=lambda x: isinstance(x, tuple),
            )
        payload = {"params": _to_host(params)}
        # The meta rides INSIDE the payload (as a uint8 JSON blob) so it
        # commits atomically with the Orbax tmp-dir rename: for async saves
        # a sidecar written up front could pair a NEW step count with the
        # PREVIOUS payload if preemption landed mid-write, silently skipping
        # batches on resume. The sidecar below is kept for humans/tooling.
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ).copy()
        if opt_state is not None:
            # Canonical encoding: orbax flattens optax's namedtuple states to
            # plain dicts (losing the treedef), so serialize via flax's
            # state-dict form — restore rebuilds the typed structure against
            # a freshly-initialized optimizer state (trainer._maybe_resume_
            # opt_state).
            import flax.serialization

            payload["opt_state"] = _to_host(flax.serialization.to_state_dict(opt_state))
        if lora is not None:
            payload["lora"] = _to_host(lora)
        if use_async and self._async is not None:
            # Preemption-safe rotating save: IO proceeds in the background
            # (Orbax finalizes into the target dir atomically); the next save
            # on this manager waits for the in-flight one first.
            self._async.wait_until_finished()
            self._async.save(path, payload, force=overwrite)
        else:
            self._ckpt.save(path, payload, force=overwrite)
        if use_async and self._async is not None:
            # The async save finalizes by RENAMING a tmp dir onto `path`;
            # pre-creating path/meta.json would break that. Sidecar instead.
            meta_path = self.checkpoint_dir / f"{name}.meta.json"
        else:
            meta_path = path / "meta.json"
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("Saved checkpoint %s (stage %d epoch %d step %d)", path, stage, epoch, global_step)
        return path

    def save_epoch(self, stage: int, epoch: int, **kw) -> Path:
        return self.save(f"checkpoint_stage{stage}_epoch{epoch}", stage=stage, epoch=epoch, **kw)

    def save_best(self, stage: int, **kw) -> Path:
        return self.save(f"best_model_stage{stage}", stage=stage, **kw)

    def save_autosave(self, stage: int, **kw) -> Path:
        """Rotating mid-epoch checkpoint (``autosave_stage{S}``), written
        asynchronously so the train loop is not blocked on IO."""
        return self.save(f"autosave_stage{stage}", stage=stage, use_async=True, **kw)

    def wait(self) -> None:
        """Block until any in-flight async save has finalized."""
        if self._async is not None:
            self._async.wait_until_finished()

    def restore(self, name_or_path) -> Dict[str, Any]:
        self.wait()  # never read a half-written autosave from this process
        path = Path(name_or_path)
        if not path.exists():
            path = self._path(str(name_or_path))
        if not path.exists():
            raise FileNotFoundError(f"Checkpoint not found: {name_or_path}")
        payload = self._ckpt.restore(path)
        if "meta_json" in payload:
            # Authoritative: committed atomically with the payload (see save).
            blob = np.asarray(payload.pop("meta_json"), dtype=np.uint8)
            meta = json.loads(bytes(blob).decode("utf-8"))
        else:  # pre-meta_json checkpoints: sidecar / in-dir file
            meta_path = path / "meta.json"
            if not meta_path.exists():  # async saves keep a sidecar meta file
                meta_path = path.parent / f"{path.name}.meta.json"
            meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        payload["meta"] = meta
        return payload

    def prune_epochs(self, stage: int, keep: int) -> None:
        """Delete all but the newest ``keep`` per-epoch checkpoints for a
        stage (best/autosave untouched). At flagship scale an epoch save is
        ~10 GB (fp32 params + Adam moments); unbounded retention is a disk
        blowup (``training.keep_checkpoints``; unset keeps everything,
        reference behavior)."""
        import shutil

        cands = sorted(
            self.checkpoint_dir.glob(f"checkpoint_stage{stage}_epoch*"),
            key=lambda p: int(p.name.rsplit("epoch", 1)[1]),
        )
        for path in cands[: max(0, len(cands) - keep)]:
            shutil.rmtree(path, ignore_errors=True)
            side = path.parent / f"{path.name}.meta.json"
            if side.exists():
                side.unlink()
            logger.info("Pruned old checkpoint %s", path)

    def latest(self, stage: Optional[int] = None) -> Optional[Path]:
        pattern = f"checkpoint_stage{stage or '*'}_epoch*"
        candidates = sorted(
            self.checkpoint_dir.glob(pattern),
            key=lambda p: (p.stat().st_mtime, p.name),
        )
        return candidates[-1] if candidates else None
