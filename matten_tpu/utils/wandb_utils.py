"""Optional Weights & Biases experiment utilities (no-op without wandb).

Reference: utils_wandb.py:44-207 — run metadata capture (cwd, hostname,
git commit), file uploads, and checkpoint-dir lookup by run identifier.
The wandb package is not a dependency; everything degrades to no-ops or
local JSON metadata files when it is missing.
"""

from __future__ import annotations

import json
import logging
import socket
import subprocess
from pathlib import Path
from typing import Dict, Optional, Sequence

logger = logging.getLogger(__name__)

__all__ = ["wandb_available", "write_running_metadata", "WandbLogger"]


def wandb_available() -> bool:
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


def _git_commit(repo_path: str = ".") -> Optional[str]:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=repo_path,
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
        )
    except Exception:  # noqa: BLE001
        return None


def write_running_metadata(path: str = "running_metadata.json") -> Dict:
    """Capture cwd/hostname/git-commit (reference utils_wandb.py:44-70)."""
    meta = {
        "cwd": str(Path.cwd()),
        "hostname": socket.gethostname(),
        "git_commit": _git_commit(),
    }
    with open(path, "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class WandbLogger:
    """Metric logger: wandb when available+configured, JSONL file otherwise."""

    def __init__(
        self,
        project: Optional[str] = None,
        save_dir: str = "matten_tpu_logs",
        config: Optional[Dict] = None,
        enabled: bool = True,
    ):
        self._run = None
        self._jsonl = None
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        if enabled and project and wandb_available():
            import wandb

            self._run = wandb.init(project=project, dir=save_dir, config=config)
        else:
            self._jsonl = open(Path(save_dir) / "metrics.jsonl", "a")
            if config:
                with open(Path(save_dir) / "config.json", "w") as f:
                    json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)
        elif self._jsonl is not None:
            rec = dict(metrics)
            if step is not None:
                rec["step"] = step
            self._jsonl.write(json.dumps(rec, default=float) + "\n")
            self._jsonl.flush()

    def save_files(self, paths: Sequence[str]) -> None:
        if self._run is not None:
            import wandb

            for p in paths:
                wandb.save(p)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
        if self._jsonl is not None:
            self._jsonl.close()
