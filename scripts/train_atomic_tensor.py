"""Train a per-atom tensor model (e.g. Si NMR shielding).

Usage: python scripts/train_atomic_tensor.py [path/to/config.yaml]
Mirrors the reference entry point (scripts/train_atomic_tensor.py:34-68).
"""

import argparse
import logging
from pathlib import Path

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import numpy as np
import yaml

from matten_tpu.data.datamodule import TensorDataModule
from matten_tpu.models import create_atomic_tensor_model
from matten_tpu.train import CanonicalRegressionTask, Trainer
from matten_tpu.train.checkpoint import save_sidecar
from train_materials_tensor import build_trainer_config

from matten_tpu.utils.logging import set_logger

# jax/sitecustomize configures the root logger before us, so
# basicConfig would be a no-op; set_logger replaces the handlers
set_logger("INFO", filename="matten_tpu.log")
logger = logging.getLogger("train")


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "config", nargs="?", default=Path(__file__).parent / "configs" / "atomic_tensor.yaml"
    )
    return p.parse_args()


def main(config: dict):
    import os

    import jax

    from matten_tpu.kernels.fused_tp import set_tp_impl

    seed = config.get("seed_everything", 35)
    np.random.seed(seed)
    impl = os.environ.get("MATTEN_TP_IMPL")
    set_tp_impl(impl or ("pallas" if jax.default_backend() == "tpu" else "xla"))

    dm = TensorDataModule(**config["data"], seed=seed)
    dm.setup()
    dataset_hparams = dm.get_to_model_info()
    logger.info("dataset hand-off: %s", dataset_hparams)

    model = create_atomic_tensor_model(config["model"], dataset_hparams)
    task = CanonicalRegressionTask(
        name=config["data"].get("tensor_target_name", "nmr_tensor"),
        per_atom=True,
        normalizer=dm.statistics.target_normalizer if dm.normalize_tensor_target else None,
    )

    tcfg = build_trainer_config(config)
    trainer = Trainer(model, [task], tcfg)
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

    state = trainer.fit(state, dm)
    metrics = trainer.test(state, dm)
    logger.info("test metrics: %s", metrics)
    return metrics


if __name__ == "__main__":
    args = get_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    main(cfg)
