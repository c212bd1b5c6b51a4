"""Pallas TPU kernel tier: fused equivariant message-passing kernels."""

from matten_tpu.kernels.fused_tp import fused_uvu_tp, set_tp_impl, get_tp_impl

__all__ = ["fused_uvu_tp", "set_tp_impl", "get_tp_impl"]
