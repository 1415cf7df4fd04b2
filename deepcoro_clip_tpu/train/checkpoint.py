"""Checkpointing: orbax pytree snapshots with the reference's retention policy.

Reference policy (reference: runners/video_constrative_learning_runner.py:
1071-1115): ``checkpoint`` (latest, every epoch), ``best_model_epoch_{e}``
(lowest val loss), ``highest_alignment_epoch_{e}`` (highest alignment score);
rank-0-only torch.save. Here: orbax (sharded-aware, atomic) + a sidecar JSON
for scalars; older best/alignment dirs are pruned so only the current best of
each kind is kept (reference keeps latest+best,
runners/linear_probing_runner.py:828-883).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------ #

    def _save(self, name: str, state: Any, meta: Dict[str, Any]) -> Path:
        # Crash-safe replace: write the new snapshot under a temp name, then
        # swap it in — the previous checkpoint stays restorable until the new
        # one is fully on disk (a crash mid-save must never leave zero
        # resumable checkpoints).
        path = (self.dir / name).resolve()
        tmp = (self.dir / f"{name}.tmp").resolve()
        old = (self.dir / f"{name}.old").resolve()
        for stale in (tmp, old):
            if stale.exists():
                shutil.rmtree(stale)
        self._ckpt.save(tmp, jax.device_get(state))
        self._ckpt.wait_until_finished()
        if path.exists():
            path.rename(old)
        tmp.rename(path)
        if old.exists():
            shutil.rmtree(old, ignore_errors=True)
        (self.dir / f"{name}.json").write_text(json.dumps(meta, default=float))
        return path

    def _prune(self, prefix: str, keep: str) -> None:
        for p in self.dir.glob(f"{prefix}*"):
            if p.name.split(".json")[0] != keep:
                if p.is_dir():
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    p.unlink(missing_ok=True)

    def save_latest(self, state: Any, meta: Dict[str, Any]) -> Path:
        return self._save("checkpoint", state, meta)

    def save_debug(self, name: str, state: Any, meta: Dict[str, Any]) -> Path:
        """Diagnostic snapshot under its own name — never touches the
        resumable ``checkpoint`` tree (a NaN-poisoned state must not become
        the resume target)."""
        return self._save(name, state, meta)

    def save_best(self, state: Any, epoch: int, meta: Dict[str, Any]) -> Path:
        name = f"best_model_epoch_{epoch}"
        path = self._save(name, state, meta)
        self._prune("best_model_epoch_", name)
        return path

    def save_alignment(self, state: Any, epoch: int, meta: Dict[str, Any]) -> Path:
        name = f"highest_alignment_epoch_{epoch}"
        path = self._save(name, state, meta)
        self._prune("highest_alignment_epoch_", name)
        return path

    # ------------------------------------------------------------------ #

    def restore(self, state_like: Any, name: str = "checkpoint") -> Any:
        """Restore into the structure/shardings of ``state_like``."""
        path = (self.dir / name).resolve()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._ckpt.restore(path, abstract)

    def load_meta(self, name: str = "checkpoint") -> Optional[Dict[str, Any]]:
        p = self.dir / f"{name}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def latest_exists(self) -> bool:
        return (self.dir / "checkpoint").exists()

    def find_best(self) -> Optional[str]:
        for p in sorted(self.dir.glob("best_model_epoch_*")):
            if p.is_dir():
                return p.name
        return None
