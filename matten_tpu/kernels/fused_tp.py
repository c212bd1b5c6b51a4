"""Kernel-tier configuration.

The fused tensor-product/aggregation kernel lives in
matten_tpu/kernels/fused_conv.py; this module holds the global tier switch
(consulted by nn.conv.PointConv).

History: an earlier per-edge message kernel in [E, D] layout (features on
lanes) was abandoned — unaligned lane slicing per CG path caused Mosaic
relayout/compile-time blowup (see DEVNOTES.md). The transposed-layout
fused_conv kernel supersedes it.
"""

from __future__ import annotations

from typing import Optional

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


_KERNEL_IN_DTYPE = "float32"  # "float32" | "bfloat16" (kernel input storage)


def set_kernel_in_dtype(name: str) -> None:
    """Storage dtype for fused-kernel inputs (compute/accumulate stay f32).

    bfloat16 halves the dominant HBM reads (x/sh/w edge arrays); validate
    training quality before enabling in production runs.
    """
    global _KERNEL_IN_DTYPE
    assert name in ("float32", "bfloat16"), name
    _KERNEL_IN_DTYPE = name


def get_kernel_in_dtype() -> str:
    return _KERNEL_IN_DTYPE


_AGG_MATMUL_DTYPE = "float32"  # "float32" | "bfloat16"


def set_agg_matmul_dtype(name: str) -> None:
    """Operand dtype of the in-kernel aggregation (one-hot) matmul.

    The segment-sum-as-dense-matmul contraction is the kernel's dominant
    MXU cost; bf16 operands run it at ~4x the f32 rate (accumulation stays
    f32 via preferred_element_type). The one-hot factor is exact in bf16,
    so the only rounding is one bf16 quantization of each message —
    mixed-precision-activation-level noise. f32 default keeps kernel==XLA
    parity tests exact."""
    global _AGG_MATMUL_DTYPE
    assert name in ("float32", "bfloat16"), name
    _AGG_MATMUL_DTYPE = name


def get_agg_matmul_dtype() -> str:
    return _AGG_MATMUL_DTYPE


def configure_default_tiers() -> str:
    """Entry-point tier selection (bench, train scripts, predict):

      MATTEN_TP_IMPL  = pallas | xla   (default: pallas on TPU, xla off-TPU)
      MATTEN_AGG_DTYPE = bfloat16 | float32
          (default: bfloat16 with the pallas tier — the kernels' one-hot
          gather/scatter/aggregation matmuls run ~4x faster on the MXU and
          f32 Mosaic compiles of the merged backward are pathologically
          slow; float32 otherwise)

    Returns the selected impl. Tests bypass this (module defaults stay
    xla/float32 for exact parity)."""
    import os

    import jax

    impl = os.environ.get("MATTEN_TP_IMPL")
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    set_tp_impl(impl)
    agg = os.environ.get("MATTEN_AGG_DTYPE")
    if agg is None:
        agg = "bfloat16" if impl == "pallas" else "float32"
    set_agg_matmul_dtype(agg)
    return impl
