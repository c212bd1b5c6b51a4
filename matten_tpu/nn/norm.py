"""Irreps-aware batch / instance normalization, mask-aware for padded graphs.

Replaces e3nn.nn.BatchNorm (reference N6; used via NormalizationLayer,
nn/utils.py:397-446) with e3nn semantics: per-irrep-entry statistics,
scalars get mean subtraction, all entries get second-moment ("component")
normalization, running statistics with momentum, affine weight (+ bias for
scalars). Statistics exclude padded nodes via the node mask — the reference
has no padding so this is the TPU-correctness addition SURVEY.md §7 calls
out (hard part 3).

The reference's custom InstanceNorm has a known train/eval bug
(nn/utils.py:440-441); the instance norm here is implemented cleanly
(per-graph statistics always, no running stats).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.scatter import scatter_mean

__all__ = ["IrrepsBatchNorm", "IrrepsInstanceNorm"]


class IrrepsBatchNorm(nn.Module):
    irreps: Irreps
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    # shard_map axis over which nodes are sharded: statistics are reduced
    # across it (cross-replica batch-norm sync; not needed for edge-shard
    # or pure data parallelism where per-shard stats mirror torch DDP)
    axis: Optional[str] = None

    def _reduce(self, num, den):
        if self.axis is not None and not self.is_initializing():
            import jax

            num = jax.lax.psum(num, self.axis)
            den = jax.lax.psum(den, self.axis)
        return num / jnp.maximum(den, 1.0)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        irreps = Irreps(self.irreps)
        num_scalars = sum(mul for mul, ir in irreps if ir.l == 0)
        num_features = irreps.num_irreps

        running_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros(num_scalars)
        )
        running_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones(num_features)
        )
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (num_features,))
            bias = self.param("bias", nn.initializers.zeros, (num_scalars,))

        if mask is not None:
            m = mask.astype(x.dtype)
        else:
            m = jnp.ones(x.shape[0], dtype=x.dtype)
        count = m.sum()

        new_means = []
        new_vars = []
        out = []
        off = 0
        i_mean = 0
        i_feat = 0
        for mul, ir in irreps:
            d = ir.dim
            blk = x[..., off : off + mul * d].reshape(x.shape[:-1] + (mul, d))
            off += mul * d
            if ir.l == 0:
                if use_running_average:
                    fmean = running_mean.value[i_mean : i_mean + mul]
                else:
                    fmean = self._reduce((blk[..., 0] * m[:, None]).sum(0), count)
                    new_means.append(fmean)
                blk = blk - fmean.astype(x.dtype)[:, None]
            if use_running_average:
                fnorm = running_var.value[i_feat : i_feat + mul]
            else:
                # component normalization: mean square per channel over
                # (real) nodes and m-components
                fnorm = self._reduce(((blk**2).mean(-1) * m[:, None]).sum(0), count)
                new_vars.append(fnorm)
            factor = 1.0 / jnp.sqrt(fnorm.astype(x.dtype) + self.eps)
            if self.affine:
                factor = factor * weight[i_feat : i_feat + mul].astype(x.dtype)
            blk = blk * factor[:, None]
            if ir.l == 0 and self.affine:
                blk = blk + bias[i_mean : i_mean + mul].astype(x.dtype)[:, None]
            if ir.l == 0:
                i_mean += mul
            i_feat += mul
            out.append(blk.reshape(blk.shape[:-2] + (mul * d,)))

        if not use_running_average and not self.is_initializing():
            if new_means:
                bm = jnp.concatenate(new_means)
                running_mean.value = (
                    (1 - self.momentum) * running_mean.value + self.momentum * bm
                )
            if new_vars:
                bv = jnp.concatenate(new_vars)
                running_var.value = (
                    (1 - self.momentum) * running_var.value + self.momentum * bv
                )
        return jnp.concatenate(out, axis=-1)


class IrrepsInstanceNorm(nn.Module):
    """Per-graph irreps norm: statistics over each graph's (real) nodes."""

    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True
    reduce: str = "mean"  # reduction over nodes for the norm statistic

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        batch: jnp.ndarray,
        num_graphs: int,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,  # unused; instance stats always
    ) -> jnp.ndarray:
        irreps = Irreps(self.irreps)
        num_scalars = sum(mul for mul, ir in irreps if ir.l == 0)
        num_features = irreps.num_irreps
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (num_features,))
            bias = self.param("bias", nn.initializers.zeros, (num_scalars,))

        out = []
        off = 0
        i_mean = 0
        i_feat = 0
        for mul, ir in irreps:
            d = ir.dim
            blk = x[..., off : off + mul * d].reshape(x.shape[:-1] + (mul, d))
            off += mul * d
            if ir.l == 0:
                gmean = scatter_mean(blk[..., 0], batch, num_graphs, weights=mask)
                blk = blk - gmean[batch][..., None]
            fnorm = scatter_mean((blk**2).mean(-1), batch, num_graphs, weights=mask)
            factor = 1.0 / jnp.sqrt(fnorm[batch] + self.eps)
            if self.affine:
                factor = factor * weight[i_feat : i_feat + mul].astype(x.dtype)
            blk = blk * factor[..., None]
            if ir.l == 0 and self.affine:
                blk = blk + bias[i_mean : i_mean + mul].astype(x.dtype)[:, None]
                i_mean += mul
            i_feat += mul
            out.append(blk.reshape(blk.shape[:-2] + (mul * d,)))
        return jnp.concatenate(out, axis=-1)
