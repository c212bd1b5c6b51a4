"""Pallas fused-conv kernel parity tests (interpreter mode on CPU).

The real-TPU timing/compile checks run via bench.py; here a small plan
keeps the interpreter fast while covering the kernel's path bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np

from matten_tpu.kernels.fused_conv import _reference, fused_uvu_conv
from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.tensor_product import uvu_tp_plan


def _setup(rng, ir1_str="8x0e+4x1o+2x2e", ir2_str="0e+1o+2e", e=100, n=24):
    ir1 = Irreps(ir1_str)
    ir2 = Irreps(ir2_str)
    plan = uvu_tp_plan(ir1, ir2, ir1)
    x = jnp.asarray(rng.normal(size=(n, ir1.dim)), dtype=jnp.float32)
    sh = jnp.asarray(rng.normal(size=(e, ir2.dim)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(e, plan.weight_numel)), dtype=jnp.float32)
    src = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    return plan, x, sh, w, src, dst, n


def test_forward_parity():
    rng = np.random.default_rng(0)
    plan, x, sh, w, src, dst, n = _setup(rng)
    ref = np.asarray(_reference(plan, x, sh, w, src, dst, n))
    out = np.asarray(
        fused_uvu_conv(plan, x, sh, w, src, dst, block=64, interpret=True)
    )
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    plan, x, sh, w, src, dst, n = _setup(rng, e=70, n=16)

    def loss_fused(x, sh, w):
        return (
            fused_uvu_conv(plan, x, sh, w, src, dst, block=64, interpret=True) ** 2
        ).sum()

    def loss_ref(x, sh, w):
        return (_reference(plan, x, sh, w, src, dst, n) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, sh, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, sh, w)
    for a, b in zip(g1, g2):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4
        )


def test_edge_padding():
    """Edge count not divisible by the block: zero-padded edges are inert."""
    rng = np.random.default_rng(2)
    plan, x, sh, w, src, dst, n = _setup(rng, e=37, n=8)
    ref = np.asarray(_reference(plan, x, sh, w, src, dst, n))
    out = np.asarray(
        fused_uvu_conv(plan, x, sh, w, src, dst, block=32, interpret=True)
    )
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)


def test_model_level_parity():
    """Full PointConv forward with pallas tier == xla tier (interpret)."""
    from matten_tpu.data import keys as K
    from matten_tpu.kernels import fused_tp
    from matten_tpu.nn.common import freeze_irreps
    from matten_tpu.nn.conv import PointConv

    rng = np.random.default_rng(3)
    feats = Irreps("4x0e+2x1o")
    attrs = Irreps("2x0e")
    sh = Irreps("0e+1o")
    n, e = 10, 40
    data = {
        K.NODE_FEATURES: jnp.asarray(rng.normal(size=(n, feats.dim)), dtype=jnp.float32),
        K.NODE_ATTRS: jnp.asarray(rng.normal(size=(n, attrs.dim)), dtype=jnp.float32),
        K.EDGE_ATTRS: jnp.asarray(rng.normal(size=(e, sh.dim)), dtype=jnp.float32),
        K.EDGE_EMBEDDING: jnp.asarray(rng.normal(size=(e, 8)), dtype=jnp.float32),
        K.EDGE_INDEX: jnp.asarray(
            np.stack([
                np.sort(rng.integers(0, n, e)),
                np.sort(rng.integers(0, n, e)),
            ]).astype(np.int32)
        ),
        K.NUM_NEIGH: jnp.asarray(np.full(n, 4.0), dtype=jnp.float32),
    }
    conv = PointConv(
        irreps_in=freeze_irreps(
            {K.NODE_FEATURES: feats, K.NODE_ATTRS: attrs, K.EDGE_ATTRS: sh}
        ),
        conv_layer_irreps=Irreps("4x0e+2x1o+2x1e"),
        avg_num_neighbors=4.0,
    )
    variables = conv.init(jax.random.PRNGKey(0), data)
    out_xla = np.asarray(conv.apply(variables, data)[K.NODE_FEATURES])
    try:
        fused_tp.set_tp_impl("pallas", interpret=True)
        out_pl = np.asarray(conv.apply(variables, data)[K.NODE_FEATURES])
    finally:
        fused_tp.set_tp_impl("xla")
    np.testing.assert_allclose(out_pl, out_xla, atol=1e-5)


def test_bf16_input_dtype_parity():
    """bfloat16 kernel-input storage keeps f32 accumulation accuracy."""
    from matten_tpu.kernels import fused_tp

    rng = np.random.default_rng(5)
    plan, x, sh, w, src, dst, n = _setup(rng, e=64, n=16)
    ref = np.asarray(
        fused_uvu_conv(plan, x, sh, w, src, dst, block=64, interpret=True)
    )
    try:
        fused_tp.set_kernel_in_dtype("bfloat16")
        out = np.asarray(
            fused_uvu_conv(plan, x, sh, w, src, dst, block=64, interpret=True)
        )
    finally:
        fused_tp.set_kernel_in_dtype("float32")
    scale = max(np.abs(ref).max(), 1.0)
    # bf16 storage: ~3 decimal digits
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)
