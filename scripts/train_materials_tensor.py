"""Train a graph-level tensor model (e.g. crystal elasticity).

Usage: python scripts/train_materials_tensor.py [path/to/config.yaml]

Mirrors the reference entry point (scripts/train_materials_tensor.py:34-68):
YAML config with data / model / trainer / optimizer / lr_scheduler sections,
seed, datamodule setup, model build from hparams + dataset hand-off, fit,
then test with the best checkpoint state.
"""

import argparse
import logging
import os
from pathlib import Path

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import numpy as np
import yaml

from matten_tpu.data.datamodule import TensorDataModule
from matten_tpu.models import create_scalar_tensor_model
from matten_tpu.train import CanonicalRegressionTask, Trainer
from matten_tpu.train.checkpoint import save_sidecar
from matten_tpu.train.config import build_mesh_spec, build_trainer_config

from matten_tpu.utils.logging import set_logger

# jax/sitecustomize configures the root logger before us, so
# basicConfig would be a no-op; set_logger replaces the handlers
set_logger("INFO", filename="matten_tpu.log")
logger = logging.getLogger("train")


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "config", nargs="?", default=Path(__file__).parent / "configs" / "materials_tensor.yaml"
    )
    return p.parse_args()


def main(config: dict):
    seed = config.get("seed_everything", 35)
    np.random.seed(seed)

    # kernel tier: MATTEN_TP_IMPL=pallas|xla (default: pallas on TPU),
    # matmul dtype: MATTEN_AGG_DTYPE (default bf16 with pallas)
    from matten_tpu.kernels.fused_tp import configure_default_tiers

    configure_default_tiers()

    dm = TensorDataModule(**config["data"], seed=seed)
    dm.setup()
    dataset_hparams = dm.get_to_model_info()
    logger.info("dataset hand-off: %s", dataset_hparams)

    # multi-chip SPMD from config (trainer.devices / trainer.mesh — the
    # reference exposes this via Lightning num_nodes/devices/accelerator,
    # scripts/configs/materials_tensor.yaml:73-76)
    mesh_spec = build_mesh_spec(config)
    mesh = None
    if mesh_spec is not None:
        mesh = mesh_spec.make_mesh()
        dm.set_sharding(**mesh_spec.loader_kwargs())
        logger.info(
            "mesh: data=%d graph=%d mode=%s",
            mesh_spec.n_data, mesh_spec.n_graph, mesh_spec.mode,
        )

    # multi-task surface: scalar targets named in the data config get their
    # own 0e heads + weighted loss/metric terms (reference BaseModel
    # multi-task semantics, model/model.py:234-274,398-445)
    scalar_names = list(config["data"].get("scalar_target_names") or [])
    norm_scalars = list(config["data"].get("normalize_scalar_targets") or [])
    task_weights = config.get("model", {}).get("task_weights", {}) or {}
    model_hparams = dict(
        config["model"],
        tensor_target_name=config["data"].get("tensor_target_name", "elastic_tensor_full"),
        scalar_target_names=scalar_names,
    )
    model_hparams.pop("task_weights", None)
    if mesh_spec is not None and mesh_spec.n_graph > 1:
        model_hparams["graph_parallel_axis"] = "graph"
        model_hparams["graph_parallel_mode"] = mesh_spec.mode
    model = create_scalar_tensor_model(model_hparams, dataset_hparams)

    tensor_name = config["data"].get("tensor_target_name", "elastic_tensor_full")
    tasks = [
        CanonicalRegressionTask(
            name=tensor_name,
            loss_weight=float(task_weights.get(tensor_name, 1.0)),
            metric_weight=float(task_weights.get(tensor_name, 1.0)),
            normalizer=dm.statistics.target_normalizer if dm.normalize_tensor_target else None,
        )
    ]
    for i, name in enumerate(scalar_names):
        normalized = bool(norm_scalars[i]) if i < len(norm_scalars) else False
        tasks.append(
            CanonicalRegressionTask(
                name=name,
                loss_weight=float(task_weights.get(name, 1.0)),
                metric_weight=float(task_weights.get(name, 1.0)),
                normalizer=dm.statistics.scalar_normalizers[name] if normalized else None,
            )
        )

    tcfg = build_trainer_config(config)
    trainer = Trainer(
        model,
        tasks,
        tcfg,
        mesh=mesh,
        graph_shard_mode=mesh_spec.mode if mesh_spec is not None else "edge",
    )
    state = trainer.init_state(next(iter(dm.train_dataloader())), rng_seed=seed)

    if tcfg.checkpoint_dir:
        save_sidecar(
            tcfg.checkpoint_dir,
            hparams={
                "model": config["model"],
                "data": {
                    k: v
                    for k, v in config["data"].items()
                    if k not in ("trainset_filename", "valset_filename", "testset_filename", "root")
                },
                "dataset_hparams": dataset_hparams,
                "normalize_tensor_target": dm.normalize_tensor_target,
            },
            statistics_arrays=dm.statistics.to_arrays(),
        )

    # `restore: true` (reference pretrained/20230627/config_final.yaml:48):
    # resume from the `last` checkpoint with the full loop state
    resume = bool(config.get("restore", config.get("trainer", {}).get("restore", False)))
    state = trainer.fit(state, dm, resume=resume)
    # test with the BEST checkpoint (reference trainer.test(ckpt_path="best"),
    # scripts/train_materials_tensor.py:65), not the post-plateau final state
    test_state = trainer.restore_best(state) if trainer.has_best() else state
    metrics = trainer.test(test_state, dm)
    logger.info("test metrics (best checkpoint): %s", metrics)
    return metrics


if __name__ == "__main__":
    args = get_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    main(cfg)
