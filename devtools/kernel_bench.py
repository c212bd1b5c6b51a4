"""Microbenchmark of the fused uvu conv kernel phases on real TPU.

Protocol: K dependent kernel invocations chained INSIDE one jit (so one
dispatch covers K executions — the tunneled backend's per-dispatch cost
otherwise dominates ms-scale kernels), one host readback at the end.

Measures, at a bench-like production batch:
  fwd               — forward kernel only
  fwd+dx            — grad wrt x (XLA DCEs the dw kernel + dsh composition)
  fwd+dx+dw         — grad wrt (x, w): the train-step-relevant total
for the single-accumulator path, the chunked path (C=128), and with the
bf16 aggregation matmul.

Usage: python devtools/kernel_bench.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_CHAIN = 8


def timeit(fn, *args, iters=8, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / (iters * K_CHAIN)


def main():
    import jax
    import jax.numpy as jnp

    from matten_tpu.data import keys as K
    from matten_tpu.data.graph import chunk_align_edges
    from matten_tpu.kernels import fused_tp
    from matten_tpu.kernels.fused_conv import EdgeChunks, fused_uvu_conv
    from matten_tpu.ops.irreps import Irreps
    from matten_tpu.ops.tensor_product import uvu_tp_plan

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    feats = Irreps("32x0o+32x0e+16x1o+16x1e+4x2o+4x2e+2x3o+2x3e+2x4e")
    sh_ir = Irreps("0e+1o+2e+3o+4e")
    plan = uvu_tp_plan(feats, sh_ir, feats)
    print(f"plan: {len(plan.instructions)} paths, mid={plan.irreps_out.dim}, "
          f"w={plan.weight_numel}, backend={jax.default_backend()}, "
          f"chain={K_CHAIN}")

    rng = np.random.default_rng(0)
    n, e = 256, 24 * 1024
    dst_np = np.sort(rng.integers(0, n - 1, e)).astype(np.int32)
    src_np = rng.integers(0, n - 1, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, plan.irreps_in1.dim)), jnp.float32)
    d1 = plan.irreps_in1.dim

    def chained(conv, grad_args):
        """K_CHAIN dependent (fwd [+ bwd subset]) evaluations in one jit —
        a fori_loop so the body compiles once but executes K times per
        dispatch (the tunneled backend's dispatch cost otherwise dominates
        ms-scale kernels)."""

        def loss(x, sh, w):
            out = conv(x, sh, w)
            return (out * 1e-3).sum(), out

        if grad_args:
            step = jax.grad(lambda *a: loss(*a)[0], argnums=grad_args)
        else:
            step = lambda *a: loss(*a)[1]

        def run(x, sh, w):
            def body(_, acc):
                r = step(acc, sh, w)
                first = r[0] if isinstance(r, tuple) else r
                # dependency without shape change (not DCE-able)
                return acc + 1e-30 * first[: acc.shape[0], :d1]

            return jax.lax.fori_loop(0, K_CHAIN, body, x)

        return jax.jit(run)

    ms = lambda t: f"{t*1e3:7.3f} ms"
    eps = lambda t: f"{e/t/1e6:7.2f} Me/s"

    def measure(tag, make_conv, sh, w):
        rows = []
        for label, ga in (("fwd", ()), ("fwd+dx", (0,)), ("fwd+dx+dw", (0, 2))):
            t = timeit(chained(make_conv, ga), x, sh, w, iters=iters)
            rows.append((label, t))
            print(f"{tag:26s} {label:10s}: {ms(t)} {eps(t)}")
        return rows

    # --- single-accumulator path ---
    sh = jnp.asarray(rng.normal(size=(e, plan.irreps_in2.dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(e, plan.weight_numel)), jnp.float32)
    src = jnp.asarray(src_np)
    dst = jnp.asarray(dst_np)
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    conv1 = lambda a, b, c: fused_uvu_conv(plan, a, b, c, src, dst,
                                           interpret=False)
    if which in ("all", "single"):
        measure("single-acc C=256 f32", conv1, sh, w)

    # --- chunked C=128 ---
    chunk = 128
    mask = np.ones(e, dtype=bool)
    cap = int(np.ceil((e + ((n // chunk) + 2) * 256) / 256)) * 256
    fields = chunk_align_edges(
        np.stack([src_np, dst_np]), np.zeros((e, 3), np.float32),
        mask, n, chunk, 256, cap,
    )
    ch = EdgeChunks(
        jnp.asarray(fields[K.EDGE_DST_CHUNK]),
        jnp.asarray(fields[K.EDGE_SRC_PERM]),
        jnp.asarray(fields[K.EDGE_SRC_CHUNK]),
    )
    cs = jnp.asarray(fields[K.EDGE_INDEX][0])
    cd = jnp.asarray(fields[K.EDGE_INDEX][1])
    csh = jnp.asarray(rng.normal(size=(cap, plan.irreps_in2.dim)), jnp.float32)
    cw = jnp.asarray(rng.normal(size=(cap, plan.weight_numel)), jnp.float32)
    convc = lambda a, b, c: fused_uvu_conv(
        plan, a, b, c, cs, cd, chunks=ch, node_chunk=chunk, interpret=False)
    if which in ("all", "chunked"):
        measure(f"chunked C={chunk} f32", convc, csh, cw)

    # --- bf16 aggregation matmul ---
    if which in ("all", "bf16"):
        try:
            fused_tp.set_agg_matmul_dtype("bfloat16")
            measure("single-acc C=256 bf16agg", conv1, sh, w)
            measure(f"chunked C={chunk} bf16agg", convc, csh, cw)
        finally:
            fused_tp.set_agg_matmul_dtype("float32")

    # --- v2: resident nodes, in-kernel gathers, merged bwd ---
    from matten_tpu.kernels.fused_conv import fused_uvu_conv_t

    wT = jnp.asarray(np.asarray(w).T)
    cwT = jnp.asarray(np.asarray(cw).T)
    conv2 = lambda a, b, c: fused_uvu_conv_t(
        plan, a, b, c, src, dst, num_nodes_out=n, interpret=False)
    conv2c = lambda a, b, c: fused_uvu_conv_t(
        plan, a, b, c, cs, cd, chunks=ch, node_chunk=chunk, interpret=False)
    if which in ("all", "v2"):
        measure("v2 single-acc f32", conv2, sh, wT)
    if which in ("all", "v2c"):
        measure(f"v2 chunked C={chunk} f32", conv2c, csh, cwT)
    if which in ("all", "v2bf16"):
        try:
            fused_tp.set_agg_matmul_dtype("bfloat16")
            measure("v2 single-acc bf16mm", conv2, sh, wT)
            measure(f"v2 chunked C={chunk} bf16mm", conv2c, csh, cwT)
        finally:
            fused_tp.set_agg_matmul_dtype("float32")

    if which in ("all", "v2in16"):
        # bf16 STORAGE of the sh/w edge arrays (the dominant HBM reads) on
        # top of the production bf16 aggregation operands — the r2 hazard
        # (16-sublane bf16 tiles + odd-offset path slices -> relayouts)
        # re-measured in the v2 layout (round-3 verdict weak #8)
        try:
            fused_tp.set_agg_matmul_dtype("bfloat16")
            fused_tp.set_kernel_in_dtype("bfloat16")
            measure("v2 single bf16mm+in16", conv2, sh, wT)
            measure(f"v2 chunked C={chunk} bf16mm+in16", conv2c, csh, cwT)
        finally:
            fused_tp.set_agg_matmul_dtype("float32")
            fused_tp.set_kernel_in_dtype("float32")

    # --- edge-block sweep (single-acc; the chunked layout pins B=256 at
    # collation) ---
    if which.startswith("v2b") and which[3:].isdigit():
        blk = int(which[3:])
        conv2b = lambda a, b, c: fused_uvu_conv_t(
            plan, a, b, c, src, dst, num_nodes_out=n, block=blk, interpret=False)
        try:
            fused_tp.set_agg_matmul_dtype("bfloat16")
            measure(f"v2 single-acc B={blk} bf16mm", conv2b, sh, wT)
        finally:
            fused_tp.set_agg_matmul_dtype("float32")


if __name__ == "__main__":
    main()
