"""Task definitions: loss + metric + transform hook per prediction target.

Reference: Task/CanonicalRegressionTask (model/task.py:23-254) and the
factory tasks that denormalize before computing metrics
(model_factory/task.py:10-109).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from matten_tpu.data.transform import MeanNormNormalize


@dataclass
class Task:
    name: str
    loss_weight: float = 1.0
    metric_weight: float = 1.0
    per_atom: bool = False  # per-node target masked by atom_selector
    normalizer: Optional[MeanNormNormalize] = None  # inverse before metrics

    def transform_for_metric(self, x: jnp.ndarray) -> jnp.ndarray:
        """Map loss-space values to metric space (denormalization)."""
        if self.normalizer is not None and self.normalizer.initialized:
            return self.normalizer.inverse(x)
        return x


class CanonicalRegressionTask(Task):
    """MSE loss + MAE metric (reference model/task.py:226-254)."""


def masked_mse_sums(pred, target, mask, sample_weight=None):
    """(sum of squared errors, element count) over rows where mask is True."""
    m = mask.astype(pred.dtype)
    if sample_weight is not None:
        m = m * sample_weight.astype(pred.dtype)
    se = ((pred - target) ** 2).sum(-1) * m
    return se.sum(), m.sum() * pred.shape[-1]


def masked_mse(pred, target, mask, sample_weight=None, psum_axis=None):
    """Mean squared error over rows where mask is True.

    pred/target: [R, D]; mask: [R] bool; sample_weight: [R] or None.
    Mean over real rows x D elements (matches torch mse_loss reduction over
    the unmasked subset). With `psum_axis`, numerator and denominator are
    reduced across the shard axis first (rows sharded, e.g. per-atom
    targets under node-sharded graph parallelism).
    """
    num, den = masked_mse_sums(pred, target, mask, sample_weight)
    if psum_axis is not None:
        import jax

        num = jax.lax.psum(num, psum_axis)
        den = jax.lax.psum(den, psum_axis)
    return num / jnp.maximum(den, 1.0)


def masked_abs_err_sum(pred, target, mask):
    """(sum |err|, element count) for streaming MAE accumulation."""
    m = mask.astype(pred.dtype)
    ae = jnp.abs(pred - target).sum(-1) * m
    return ae.sum(), m.sum() * pred.shape[-1]
