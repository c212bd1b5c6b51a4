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
