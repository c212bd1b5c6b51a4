"""Checkpointing: best-k + last train states via orbax, with sidecars.

Replaces Lightning's ModelCheckpoint / load_from_checkpoint flow
(reference SURVEY.md §5.4): saves params + batch_stats + opt_state, keeps
the top-k checkpoints by `val/score` plus `last`, and stores the model
hparams + dataset statistics sidecar next to the weights so `predict()` can
rebuild the exact model (the analog of save_hyperparameters() +
dataset_statistics.pt, reference model/model.py:66, data/dataset.py:129-142).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_sidecar", "load_sidecar"]


def save_sidecar(directory, hparams: Dict[str, Any], statistics_arrays: Dict[str, np.ndarray]):
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / "hparams.json", "w") as f:
        json.dump(hparams, f, indent=2, default=str)
    np.savez(directory / "dataset_statistics.npz", **statistics_arrays)


def load_sidecar(directory):
    directory = Path(directory)
    with open(directory / "hparams.json") as f:
        hparams = json.load(f)
    stats_path = directory / "dataset_statistics.npz"
    stats = dict(np.load(stats_path)) if stats_path.exists() else {}
    return hparams, stats


class CheckpointManager:
    """Best-k (min val/score) + last checkpoints in `directory`."""

    def __init__(self, directory, save_top_k: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self._ckptr = ocp.PyTreeCheckpointer()
        self._scores: Dict[int, float] = {}
        self._load_index()

    def _index_path(self) -> Path:
        return self.directory / "index.json"

    def _load_index(self):
        if self._index_path().exists():
            with open(self._index_path()) as f:
                raw = json.load(f)
            self._scores = {int(k): float(v) for k, v in raw.items()}

    def _save_index(self):
        with open(self._index_path(), "w") as f:
            json.dump(self._scores, f)

    def _epoch_dir(self, epoch: int) -> Path:
        return self.directory / f"epoch_{epoch}"

    def save(self, epoch: int, state, metrics: Dict[str, float]):
        path = self._epoch_dir(epoch)
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._scores[epoch] = float(metrics.get("val/score", float("inf")))
        # prune beyond top-k
        if len(self._scores) > self.save_top_k:
            worst = max(self._scores, key=self._scores.get)
            self._scores.pop(worst)
            wpath = self._epoch_dir(worst)
            if wpath.exists():
                shutil.rmtree(wpath)
        self._save_index()

    def save_last(self, state, loop_state: Optional[Dict[str, Any]] = None):
        """Save the rolling `last` checkpoint (+ training-loop state).

        Called every epoch (reference ModelCheckpoint save_last=True
        semantics): a crash resumes from the latest epoch with the
        optimizer, LR-scheduler and early-stopping positions intact.
        """
        path = self.directory / "last"
        tmp = self.directory / "last_tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state)
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        if loop_state is not None:
            # atomic write: a crash mid-write must not leave corrupt JSON
            # (resume would die on json.load)
            ltmp = self.directory / "loop_state.json.tmp"
            with open(ltmp, "w") as f:
                json.dump(loop_state, f)
            os.replace(ltmp, self.directory / "loop_state.json")

    def load_loop_state(self) -> Optional[Dict[str, Any]]:
        p = self.directory / "loop_state.json"
        if not p.exists():
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            # corrupt sidecar (crash between `last` rename and the loop-state
            # write): fall back to state-only resume
            return None

    def has_last(self) -> bool:
        return (self.directory / "last").exists()

    @property
    def best_epoch(self) -> Optional[int]:
        if not self._scores:
            return None
        return min(self._scores, key=self._scores.get)

    def restore(self, target, epoch: Optional[int] = None, last: bool = False):
        """Restore into the structure of `target` (a template TrainState)."""
        if last:
            path = self.directory / "last"
        else:
            epoch = epoch if epoch is not None else self.best_epoch
            if epoch is None:
                raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._epoch_dir(epoch)
        restored = self._ckptr.restore(path, item=target)
        return restored
