"""Component-level timing of the production train step on the real TPU.

Uses the DEVNOTES.md timing protocol: chain N dispatches, one host
readback at the end (block_until_ready does not fence on the tunneled
backend). Prints a per-component table to locate where the step time goes
before choosing the next kernel optimization.

Usage:  python devtools/profile_step.py [iters]
"""

import os
import sys
import time

import numpy as np


def timeit(fn, fence, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_batch
    from matten_tpu.kernels.fused_tp import configure_default_tiers
    from matten_tpu.models import create_scalar_tensor_model
    from matten_tpu.train import CanonicalRegressionTask, Trainer, TrainerConfig

    impl = configure_default_tiers()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    rng = np.random.default_rng(0)
    data, targets, real_edges, species = build_batch(rng)
    hparams = dict(
        species_embedding_dim=16,
        irreps_edge_sh="0e+1o+2e+3o+4e",
        num_radial_basis=8,
        radial_basis_start=0.0,
        radial_basis_end=5.0,
        radial_basis_type="bessel",
        num_layers=n_layers,
        invariant_layers=2,
        invariant_neurons=32,
        average_num_neighbors=30.0,
        conv_layer_irreps="32x0o+32x0e+16x1o+16x1e+4x2o+4x2e+2x3o+2x3e+2x4e",
        nonlinearity_type="gate",
        normalization="batch",
        conv_to_output_hidden_irreps_out="16x0e+2x2e+4e",
        output_format="irreps",
        output_formula="ijkl=jikl=klij",
        reduce="mean",
    )
    ds_hparams = dict(
        allowed_species=list(species), average_num_neighbors=30.0, atom_feats_size=None
    )
    model = create_scalar_tensor_model(hparams, ds_hparams)
    task = CanonicalRegressionTask(name="elastic_tensor_full")
    trainer = Trainer(model, [task], TrainerConfig(max_epochs=1, lr=0.01))
    state = trainer.init_state((data, targets))
    data = {k: jnp.asarray(v) for k, v in data.items()}
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    n_nodes = int(data["node_mask"].shape[0])
    n_edges_pad = int(data["edge_mask"].shape[0])
    print(
        f"backend={jax.default_backend()} impl={impl} nodes(pad)={n_nodes} "
        f"edges(pad)={n_edges_pad} real_edges={real_edges}",
        flush=True,
    )

    fence = lambda out: float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    # 1. full train step
    def full_step():
        nonlocal state
        state, loss, _ = trainer._train_step(state, data, targets)
        return loss

    t_full = timeit(full_step, lambda o: float(o), iters)
    print(f"full train step           : {t_full*1e3:8.2f} ms   "
          f"({real_edges/t_full/1e6:.2f}M edges/s)", flush=True)

    # speed-of-light: achieved % of the analytic roofline + classic MFU
    from kernel_roofline import report_measured

    report_measured(
        t_full * 1e3, E=n_edges_pad, real_edges=real_edges,
        N=n_nodes, layers=n_layers, species=len(species),
    )

    # 2. forward-only loss (jitted)
    params = state.params
    bstats = state.batch_stats

    def fwd_loss(p):
        variables = {"params": p}
        if bstats:
            variables["batch_stats"] = bstats
            out, _ = model.apply(
                variables, data, mutable=["batch_stats"], use_running_average=False
            )
        else:
            out = model.apply(variables, data, use_running_average=False)
        preds = out if isinstance(out, dict) else {task.name: out}
        return jnp.sum(preds[task.name] ** 2)

    fwd_j = jax.jit(fwd_loss)
    t_fwd = timeit(lambda: fwd_j(params), lambda o: float(o), iters)
    print(f"forward only              : {t_fwd*1e3:8.2f} ms", flush=True)

    # 3. fwd+bwd grad (no Adam)
    gf = jax.jit(jax.grad(fwd_loss))
    t_grad = timeit(lambda: gf(params), fence, iters)
    print(f"forward+backward (grad)   : {t_grad*1e3:8.2f} ms", flush=True)

    # 4. isolated conv kernel timings at this batch's shape
    from matten_tpu.nn.conv import _conv_plans
    from matten_tpu.ops.irreps import Irreps

    feats_ir = Irreps(hparams["conv_layer_irreps"])
    attrs_ir = Irreps(f"{len(species)}x0e")
    sh_ir = Irreps(hparams["irreps_edge_sh"])
    # layer 2/3 shape: feats = conv irreps (after gate the scalars shrink,
    # but the uvu input is the conv irreps; close enough for the breakdown)
    _, _, uvu, lin2 = _conv_plans(feats_ir, attrs_ir, sh_ir, feats_ir)
    print(f"uvu plan: paths={len(uvu.instructions)} out_dim={uvu.irreps_out.dim} "
          f"w={uvu.weight_numel} lin2_w={lin2.weight_numel}", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n_nodes, feats_ir.dim), jnp.float32)
    sh = jax.random.normal(key, (n_edges_pad, sh_ir.dim), jnp.float32)
    w = jax.random.normal(key, (n_edges_pad, uvu.weight_numel), jnp.float32)
    src = jnp.asarray(np.random.default_rng(1).integers(0, n_nodes, n_edges_pad), jnp.int32)
    dst = jnp.sort(jnp.asarray(np.random.default_rng(2).integers(0, n_nodes, n_edges_pad), jnp.int32))

    if impl == "pallas":
        from matten_tpu.kernels.fused_conv import fused_uvu_conv, fits_vmem

        print(f"fits_vmem={fits_vmem(uvu, n_nodes)}", flush=True)
        f_fwd = jax.jit(lambda x, sh, w: fused_uvu_conv(uvu, x, sh, w, src, dst))
        t_k = timeit(lambda: f_fwd(x, sh, w), fence, iters)
        print(f"fused fwd kernel (1 layer): {t_k*1e3:8.2f} ms", flush=True)

        g_k = jax.jit(jax.grad(lambda x, sh, w: jnp.sum(fused_uvu_conv(uvu, x, sh, w, src, dst) ** 2), argnums=(0, 2)))
        t_kb = timeit(lambda: g_k(x, sh, w), fence, iters)
        print(f"fused fwd+bwd (1 layer)   : {t_kb*1e3:8.2f} ms", flush=True)

    # 5. XLA-tier pieces: lin2 FCTP on the wide agg
    agg = jax.random.normal(key, (n_nodes, uvu.irreps_out.dim), jnp.float32)
    attrs = jax.nn.one_hot(
        jax.random.randint(key, (n_nodes,), 0, len(species)), len(species)
    )
    wl2 = jax.random.normal(key, (lin2.weight_numel,), jnp.float32)
    f_lin2 = jax.jit(lambda a, at, ww: lin2.apply(a, at, ww))
    t_l2 = timeit(lambda: f_lin2(agg, attrs, wl2), fence, iters)
    print(f"lin2 FCTP fwd (1 layer)   : {t_l2*1e3:8.2f} ms", flush=True)

    g_l2 = jax.jit(jax.grad(lambda a, at, ww: jnp.sum(lin2.apply(a, at, ww) ** 2), argnums=(0, 2)))
    t_l2b = timeit(lambda: g_l2(agg, attrs, wl2), fence, iters)
    print(f"lin2 FCTP fwd+bwd         : {t_l2b*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
