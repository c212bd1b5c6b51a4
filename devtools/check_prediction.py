"""End-to-end check: predict() reproduces evaluation-time MAE.

Analog of the reference's devtools/check_prediction.py:18-55 — runs the
predict() API over the example elasticity set and compares the MAE (in
irreps space) against the trainer's own test-set evaluation of the same
checkpoint. Requires a trained checkpoint directory (produced by
scripts/train_materials_tensor.py).

Usage: python devtools/check_prediction.py [checkpoint_dir] [dataset.json]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from matten_tpu.data.structure import Structure
from matten_tpu.ops.cartesian import cartesian_tensor_map
from matten_tpu.predict import predict


def main(
    checkpoint_dir="checkpoints_materials",
    dataset="/root/reference/datasets/example_crystal_elasticity_tensor_n100.json",
):
    df = pd.read_json(dataset)
    structures = [Structure.from_dict(d) for d in df["structure"]]
    targets = [np.asarray(t, dtype=np.float64) for t in df["elastic_tensor_full"]]

    preds = predict(structures, checkpoint_dir)

    cmap = cartesian_tensor_map("ijkl=jikl=klij")
    errs = []
    for p, t in zip(preds, targets):
        if p is None:
            continue
        pv = np.asarray(cmap.from_cartesian(p))
        tv = np.asarray(cmap.from_cartesian(t))
        errs.append(np.abs(pv - tv))
    mae = float(np.mean(np.stack(errs)))
    n_failed = sum(1 for p in preds if p is None)
    print(f"predict() MAE over {len(errs)} structures (irreps space): {mae:.4f} GPa")
    if n_failed:
        print(f"{n_failed} structures failed conversion")
    return mae


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*args)
