"""Fused per-edge uvu tensor-product Pallas kernel.

The hot op of the TFN convolution (reference nn/conv.py:113 — e3nn
TensorProduct codegen + torch_scatter on GPU; SURVEY.md N1/N2): for every
edge, contract gathered source-node irreps features with the edge spherical
harmonics through per-path CG tables, scaled by radial-MLP weights.

The XLA tier (ops/tensor_product.py) emits one einsum chain per CG path,
each materializing an [E, mul, dim] intermediate in HBM. This kernel
computes ALL paths of a block of edges in VMEM and writes the concatenated
message once:

  HBM reads:  x_src [B, D1], sh [B, D2], w [B, W]     (once per block)
  HBM writes: msg [B, Dmid]                           (once per block)

Per path, the (sh x CG) contraction is one MXU matmul [B, d2] @ [d2, d1*d3]
and the remaining per-channel contraction is a short static VPU fma loop —
the op is HBM-bandwidth-bound, so eliminating the per-path intermediates is
the speed-of-light move (see BASELINE.json north star).

Gradients: jax.custom_vjp with the XLA-tier contraction as the backward
(correct by construction; backward kernels are a follow-up optimization).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from matten_tpu.ops.tensor_product import TensorProductPlan
from matten_tpu.ops.wigner import wigner_3j

_TP_IMPL = "xla"  # "xla" | "pallas"
_INTERPRET = False  # pallas interpreter mode (CPU tests)


def set_tp_impl(impl: str, interpret: Optional[bool] = None) -> None:
    """Select the tensor-product implementation tier globally."""
    global _TP_IMPL, _INTERPRET
    assert impl in ("xla", "pallas"), impl
    _TP_IMPL = impl
    if interpret is not None:
        _INTERPRET = interpret


def get_tp_impl() -> str:
    return _TP_IMPL


def _make_kernel(plan: TensorProductPlan, block: int, dtype):
    """Build the Pallas kernel body for a static plan."""
    from jax.experimental import pallas as pl  # deferred: TPU-only path

    in1_slices = plan.irreps_in1.slices()
    in2_slices = plan.irreps_in2.slices()
    out_slices = plan.irreps_out.slices()

    # per-instruction static metadata; CG tables concatenated column-wise
    # into one [max_d2, total_cols] constant passed as a kernel input
    metas = []
    w_off = 0
    col_off = 0
    c_blocks = []
    max_d2 = max(mi.ir.dim for mi in plan.irreps_in2)
    for ins, pw, wshape in zip(plan.instructions, plan.path_weights, plan.weight_shapes):
        mul1, ir1 = plan.irreps_in1[ins.i_in1]
        mul2, ir2 = plan.irreps_in2[ins.i_in2]
        mul_out, ir3 = plan.irreps_out[ins.i_out]
        assert ins.mode == "uvu" and mul2 == 1, "kernel supports uvu with mul2==1"
        c = (wigner_3j(ir1.l, ir2.l, ir3.l) * pw).astype(np.float32)
        # [d2, d1*d3] for the MXU contraction sh @ C, zero-padded to max_d2 rows
        c2 = np.ascontiguousarray(
            c.transpose(1, 0, 2).reshape(ir2.dim, ir1.dim * ir3.dim)
        )
        c2p = np.zeros((max_d2, c2.shape[1]), dtype=np.float32)
        c2p[: ir2.dim] = c2
        c_blocks.append(c2p)
        cols = c2.shape[1]
        metas.append(
            dict(
                sl1=in1_slices[ins.i_in1],
                sl2=in2_slices[ins.i_in2],
                slo=out_slices[ins.i_out],
                wsl=slice(w_off, w_off + mul1),
                csl=slice(col_off, col_off + cols),
                mul=mul1,
                d1=ir1.dim,
                d2=ir2.dim,
                d3=ir3.dim,
            )
        )
        w_off += int(np.prod(wshape))
        col_off += cols
    assert w_off == plan.weight_numel
    c_all = np.concatenate(c_blocks, axis=1)  # [max_d2, total_cols]

    def kernel(x_ref, sh_ref, w_ref, c_ref, out_ref):
        for m in metas:
            y = sh_ref[:, m["sl2"]].astype(jnp.float32)  # [B, d2]
            c2 = c_ref[: m["d2"], m["csl"]]  # [d2, d1*d3]
            t = jnp.dot(y, c2, preferred_element_type=jnp.float32)  # [B, d1*d3]
            d1, d3, mul = m["d1"], m["d3"], m["mul"]
            x_all = x_ref[:, m["sl1"]].astype(jnp.float32)  # [B, mul*d1]
            w_all = w_ref[:, m["wsl"]].astype(jnp.float32)  # [B, mul]
            outs = []
            for u in range(mul):
                xu = x_all[:, u * d1 : (u + 1) * d1]  # [B, d1]
                acc = xu[:, 0:1] * t[:, 0:d3]
                for m1 in range(1, d1):
                    acc = acc + xu[:, m1 : m1 + 1] * t[:, m1 * d3 : (m1 + 1) * d3]
                outs.append(acc * w_all[:, u : u + 1])
            out_ref[:, m["slo"]] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)

    return kernel, c_all


@functools.lru_cache(maxsize=None)
def _build_pallas_call(
    plan: TensorProductPlan, n_edges: int, block: int, dtype_name: str, interpret: bool
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    d1, d2 = plan.irreps_in1.dim, plan.irreps_in2.dim
    dw, dout = plan.weight_numel, plan.irreps_out.dim
    kernel, c_all = _make_kernel(plan, block, dtype)
    grid = (n_edges // block,)

    def row_block(d):
        return pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM)

    const_spec = pl.BlockSpec(
        c_all.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_block(d1), row_block(d2), row_block(dw), const_spec],
        out_specs=row_block(dout),
        out_shape=jax.ShapeDtypeStruct((n_edges, dout), dtype),
        interpret=interpret,
    )
    c_arr = jnp.asarray(c_all)
    return lambda x, sh, w: call(x, sh, w, c_arr)


def _pallas_forward(plan: TensorProductPlan, x, sh, w, block: int = 256):
    e = x.shape[0]
    blk = min(block, e)
    # pad edge count to a block multiple (caller's padding already masks)
    e_pad = int(np.ceil(e / blk)) * blk
    if e_pad != e:
        pad = [(0, e_pad - e), (0, 0)]
        x, sh, w = (jnp.pad(a, pad) for a in (x, sh, w))
    call = _build_pallas_call(plan, e_pad, blk, jnp.result_type(x).name, _INTERPRET)
    out = call(x, sh, w)
    return out[:e]


@functools.lru_cache(maxsize=None)
def _make_fused_fn(plan: TensorProductPlan, block: int):
    """custom_vjp wrapper: Pallas forward, XLA-tier backward."""

    @jax.custom_vjp
    def fused(x, sh, w):
        return _pallas_forward(plan, x, sh, w, block)

    def fwd(x, sh, w):
        return _pallas_forward(plan, x, sh, w, block), (x, sh, w)

    def bwd(res, g):
        x, sh, w = res
        _, vjp = jax.vjp(lambda a, b, c: plan.apply(a, b, c), x, sh, w)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def fused_uvu_tp(
    plan: TensorProductPlan,
    x: jnp.ndarray,
    sh: jnp.ndarray,
    w: jnp.ndarray,
    block: int = 256,
) -> jnp.ndarray:
    """Compute the per-edge uvu TP with the fused Pallas kernel.

    x: [E, irreps_in1.dim] gathered source features; sh: [E, irreps_in2.dim];
    w: [E, weight_numel]. Returns [E, irreps_out.dim].
    """
    return _make_fused_fn(plan, block)(x, sh, w)
