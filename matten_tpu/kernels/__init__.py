"""Pallas TPU kernel tier: fused equivariant message-passing kernels."""

from matten_tpu.kernels.fused_conv import fused_uvu_conv
from matten_tpu.kernels.fused_tp import get_tp_impl, set_tp_impl

__all__ = ["fused_uvu_conv", "set_tp_impl", "get_tp_impl"]
