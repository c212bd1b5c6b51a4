"""Microbenchmark of the fused uvu conv kernel phases on real TPU.

Times (DEVNOTES readback-fence protocol) the production plan at a
bench-like batch: fwd single-accumulator vs chunked at several node-chunk
sizes, the dx/dw backward kernels, and the XLA reference — to locate the
kernel time before optimizing.

Usage: python devtools/kernel_bench.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    import jax

    return float(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, iters=20, warmup=2):
    out = None
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

    from matten_tpu.data import keys as K
    from matten_tpu.data.graph import chunk_align_edges
    from matten_tpu.kernels.fused_conv import (
        EdgeChunks,
        _reference,
        fused_uvu_conv,
    )
    from matten_tpu.ops.irreps import Irreps
    from matten_tpu.ops.tensor_product import uvu_tp_plan

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    feats = Irreps("32x0o+32x0e+16x1o+16x1e+4x2o+4x2e+2x3o+2x3e+2x4e")
    sh_ir = Irreps("0e+1o+2e+3o+4e")
    plan = uvu_tp_plan(feats, sh_ir, feats)
    print(f"plan: {len(plan.instructions)} paths, mid={plan.irreps_out.dim}, "
          f"w={plan.weight_numel}, backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    n, e = 256, 24 * 1024  # bench-like batch (~21.4K real edges padded)
    deg = e // n
    dst_np = np.sort(rng.integers(0, n - 1, e)).astype(np.int32)
    src_np = rng.integers(0, n - 1, e).astype(np.int32)
    x = jnp.asarray(rng.normal(size=(n, plan.irreps_in1.dim)), jnp.float32)
    sh = jnp.asarray(rng.normal(size=(e, plan.irreps_in2.dim)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(e, plan.weight_numel)), jnp.float32)
    src = jnp.asarray(src_np)
    dst = jnp.asarray(dst_np)
    g = jnp.asarray(rng.normal(size=(n, plan.irreps_out.dim)), jnp.float32)

    ms = lambda t: f"{t*1e3:8.3f} ms"
    eps = lambda t: f"{e/t/1e6:7.1f} Me/s"

    # XLA reference fwd
    f_ref = jax.jit(lambda x, sh, w: _reference(plan, x, sh, w, src, dst, n))
    t = timeit(lambda: f_ref(x, sh, w), iters=max(iters // 4, 3))
    print(f"xla fwd              : {ms(t)} {eps(t)}")

    # fused fwd, single accumulator (current default at n=256)
    f1 = jax.jit(lambda x, sh, w: fused_uvu_conv(plan, x, sh, w, src, dst,
                                                 interpret=False))
    t1 = timeit(lambda: f1(x, sh, w), iters=iters)
    print(f"fused fwd (acc=all)  : {ms(t1)} {eps(t1)}")

    # fused fwd+bwd (dx+dw+dsh via custom vjp)
    def fb(x, sh, w):
        out, vjp = jax.vjp(
            lambda a, b, c: fused_uvu_conv(plan, a, b, c, src, dst,
                                           interpret=False), x, sh, w)
        return vjp(g)

    fbj = jax.jit(fb)
    t2 = timeit(lambda: fbj(x, sh, w), iters=iters)
    print(f"fused fwd+bwd        : {ms(t2)} {eps(t2)}")

    # chunked variants
    mask = np.ones(e, dtype=bool)
    for chunk in (128, 64, 32):
        cap = e + ((n // chunk) + 2) * 256
        cap = int(np.ceil(cap / 256)) * 256
        fields = chunk_align_edges(
            np.stack([src_np, dst_np]), np.zeros((e, 3), np.float32),
            mask, n, chunk, 256, cap,
        )
        ch = EdgeChunks(
            jnp.asarray(fields[K.EDGE_DST_CHUNK]),
            jnp.asarray(fields[K.EDGE_SRC_PERM]),
            jnp.asarray(fields[K.EDGE_SRC_CHUNK]),
        )
        ei = fields[K.EDGE_INDEX]
        emask = fields[K.EDGE_MASK]
        cs = jnp.asarray(ei[0])
        cd = jnp.asarray(ei[1])
        csh = jnp.asarray(
            np.where(emask[:, None],
                     np.zeros((cap, plan.irreps_in2.dim), np.float32), 0.0))
        # re-make sh/w in the aligned order (values irrelevant for timing)
        csh = jnp.asarray(rng.normal(size=(cap, plan.irreps_in2.dim)), jnp.float32)
        cw = jnp.asarray(rng.normal(size=(cap, plan.weight_numel)), jnp.float32)

        fc = jax.jit(lambda x, s, ww: fused_uvu_conv(
            plan, x, s, ww, cs, cd, chunks=ch, node_chunk=chunk,
            interpret=False))
        t3 = timeit(lambda: fc(x, csh, cw), iters=iters)

        def fbc(x, s, ww):
            out, vjp = jax.vjp(
                lambda a, b, c: fused_uvu_conv(
                    plan, a, b, c, cs, cd, chunks=ch, node_chunk=chunk,
                    interpret=False), x, s, ww)
            return vjp(g)

        fbcj = jax.jit(fbc)
        t4 = timeit(lambda: fbcj(x, csh, cw), iters=iters)
        print(f"chunked C={chunk:<4} fwd    : {ms(t3)} {eps(t3)}  (cap {cap})")
        print(f"chunked C={chunk:<4} fwd+bwd: {ms(t4)} {eps(t4)}")


if __name__ == "__main__":
    main()
