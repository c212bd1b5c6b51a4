"""YAML config -> trainer/mesh construction (shared by both train scripts).

Honors the reference's class_path/init_args instantiation surface
(reference model/model.py:447-480 via Lightning `instantiate_class`): the
optimizer and LR scheduler are selected from `class_path`, and an
unrecognized class errors loudly instead of silently training with the
defaults. The trainer's device/mesh surface replaces the reference's
Lightning `num_nodes/devices/accelerator` knobs
(scripts/configs/materials_tensor.yaml:73-76) with an explicit SPMD mesh:

    trainer:
      devices: 8              # flat data parallelism over 8 chips, or
      mesh:
        data: 4               # data-parallel axis size
        graph: 2              # graph-partition axis size
        mode: edge            # edge | node | node_ring
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

from matten_tpu.train.trainer import TrainerConfig

__all__ = ["build_trainer_config", "build_mesh_spec", "MeshSpec"]

# class_path basename (case-insensitive) -> trainer optimizer kind
_OPTIMIZERS = {
    "adam": "adam",
    "adamw": "adamw",
    "sgd": "sgd",
}
_PLATEAU_NAMES = {"reducelronplateau", "reduce_on_plateau", "plateau"}
_NONE_NAMES = {"none", "null", ""}


def _basename(class_path: str) -> str:
    return class_path.rsplit(".", 1)[-1].lower()


def _parse_optimizer(section: Optional[Dict[str, Any]]) -> str:
    """Map optimizer.class_path to a supported kind (default adam)."""
    cp = (section or {}).get("class_path")
    if cp is None:
        return "adam"
    kind = _OPTIMIZERS.get(_basename(str(cp)))
    if kind is None:
        raise ValueError(
            f"unsupported optimizer.class_path {cp!r}: the trainer implements "
            f"{sorted(set(_OPTIMIZERS))} (matched by class basename)"
        )
    return kind


def _parse_scheduler(section: Optional[Dict[str, Any]]) -> str:
    """Map lr_scheduler.class_path to 'plateau' | 'none' (reference
    _config_lr_scheduler allows none/null, model/model.py:464-480)."""
    if section is None:
        return "plateau"
    cp = section.get("class_path")
    if cp is None or _basename(str(cp)) in _NONE_NAMES:
        return "none"
    if _basename(str(cp)) in _PLATEAU_NAMES:
        return "plateau"
    raise ValueError(
        f"unsupported lr_scheduler.class_path {cp!r}: the trainer implements "
        f"ReduceLROnPlateau (or none/null to disable)"
    )


def build_trainer_config(config: Dict[str, Any]) -> TrainerConfig:
    tr = config.get("trainer", {}) or {}
    opt_sec = config.get("optimizer") or {}
    sched_sec = config.get("lr_scheduler")
    opt = opt_sec.get("init_args", {}) or {}
    sched = (sched_sec or {}).get("init_args", {}) or {}
    cb = {c.get("class_path", ""): c.get("init_args", {}) for c in tr.get("callbacks", [])}
    early = next((v for k, v in cb.items() if "EarlyStopping" in k), {})
    ckpt = next((v for k, v in cb.items() if "ModelCheckpoint" in k), {})
    return TrainerConfig(
        max_epochs=tr.get("max_epochs", 10),
        lr=opt.get("lr", 0.01),
        weight_decay=opt.get("weight_decay", 1e-5),
        optimizer=_parse_optimizer(opt_sec),
        scheduler=_parse_scheduler(sched_sec),
        lr_factor=sched.get("factor", 0.5),
        lr_patience=sched.get("patience", 50),
        early_stopping_patience=early.get("patience", 150),
        save_top_k=ckpt.get("save_top_k", 3),
        checkpoint_dir=tr.get("checkpoint_dir", "checkpoints"),
        seed=config.get("seed_everything", 35),
        scan_steps=int(tr.get("scan_steps", 1)),
        save_last_every_epochs=int(tr.get("save_last_every_epochs", 1)),
    )


@dataclass
class MeshSpec:
    """Parsed trainer.devices / trainer.mesh section."""

    n_data: int = 1
    n_graph: int = 1
    mode: str = "edge"  # edge | node | node_ring

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_graph

    @property
    def is_multichip(self) -> bool:
        return self.n_devices > 1

    def make_mesh(self):
        from matten_tpu.parallel.sharding import make_mesh

        return make_mesh(n_data=self.n_data, n_graph=self.n_graph)

    def loader_kwargs(self) -> Dict[str, Any]:
        """BatchLoader sharding knobs for this mesh layout."""
        return dict(
            num_shards=self.n_data,
            num_edge_shards=self.n_graph,
            node_shard=self.mode in ("node", "node_ring"),
            ring=self.mode == "node_ring",
        )


def build_mesh_spec(config: Dict[str, Any]) -> Optional[MeshSpec]:
    """trainer.devices / trainer.mesh -> MeshSpec (None = single device).

    `devices: N` alone is flat data parallelism (the Lightning DDP analog);
    `mesh: {data, graph, mode}` exposes the graph-partition axis as well.
    """
    tr = config.get("trainer", {}) or {}
    mesh = tr.get("mesh")
    if mesh:
        spec = MeshSpec(
            n_data=int(mesh.get("data", 1)),
            n_graph=int(mesh.get("graph", 1)),
            mode=str(mesh.get("mode", "edge")),
        )
        if spec.mode not in ("edge", "node", "node_ring"):
            raise ValueError(
                f"trainer.mesh.mode {spec.mode!r} not in edge|node|node_ring"
            )
        devices = tr.get("devices")
        if devices is not None and int(devices) != spec.n_devices:
            raise ValueError(
                f"trainer.devices={devices} inconsistent with mesh "
                f"data*graph={spec.n_devices}"
            )
        return spec if spec.is_multichip else None
    devices = int(tr.get("devices", 1) or 1)
    if devices > 1:
        return MeshSpec(n_data=devices)
    return None
