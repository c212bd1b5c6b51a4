"""Op-level XLA profile of the production train step (TPU trace capture).

Captures a jax.profiler trace around a few executed steps and parses the
xplane protobuf with tensorboard_plugin_profile into a per-op time table —
the tool for attributing the step's FIXED (non-conv-layer) milliseconds
(DEVNOTES r3: ~3.1 ms of the 6.8 ms step is layer-count-independent).

Usage: python devtools/profile_trace.py [steps]
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import HPARAMS, build_batch
    from matten_tpu.kernels.fused_tp import configure_default_tiers
    from matten_tpu.models import create_scalar_tensor_model
    from matten_tpu.train import CanonicalRegressionTask, Trainer, TrainerConfig

    configure_default_tiers()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    rng = np.random.default_rng(0)
    data, targets, real_edges, species = build_batch(rng)
    ds_hparams = dict(
        allowed_species=list(species), average_num_neighbors=30.0, atom_feats_size=None
    )
    model = create_scalar_tensor_model(HPARAMS, ds_hparams)
    task = CanonicalRegressionTask(name="elastic_tensor_full")
    trainer = Trainer(model, [task], TrainerConfig(max_epochs=1, lr=0.01))
    state = trainer.init_state((data, targets))
    data = {k: jnp.asarray(v) for k, v in data.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    # warm up / compile outside the trace
    state, loss, _ = trainer._train_step(state, data, targets)
    float(loss)

    outdir = "/tmp/jax_trace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, loss, _ = trainer._train_step(state, data, targets)
        float(loss)

    # parse the xplane into the op_profile tool table
    xs = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs, flush=True)
    if not xs:
        print("NO TRACE CAPTURED (backend may not support profiling)")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data_out, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", params={})
    import csv
    import io

    rows = list(csv.reader(io.StringIO(data_out.decode() if isinstance(data_out, bytes) else data_out)))
    hdr = rows[0]
    print(" | ".join(hdr[:8]))
    for r in rows[1:40]:
        print(" | ".join(r[:8]))


if __name__ == "__main__":
    main()
