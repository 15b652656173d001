"""Mask-aware normalization layers.

The reference uses `torch.nn.BatchNorm1d` over node features everywhere
(e.g. node_classification_clean/models.py:127,184,238 and
graph_classification/models.py:106). Under static-shape padded batching the
padded rows must not skew batch statistics, so this BatchNorm computes its
statistics over masked rows only — semantics identical to torch BatchNorm1d
(momentum 0.1, eps 1e-5, biased batch variance for normalization, unbiased
for the running-stat update) restricted to valid rows.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MaskedBatchNorm(nn.Module):
    num_features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        use_running_average: Optional[bool] = None,
    ) -> Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))

        # statistics always in f32 (bf16 inputs upcast inside the fused
        # reductions — XLA folds the convert into the sum, so HBM traffic
        # stays at the input width)
        xf = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            # under halo_mode the node rows are sharded across a mesh axis:
            # batch statistics are psum'd so every shard normalizes with the
            # GLOBAL mean/var (sync-BN; exact parity with the unsharded math)
            from kagnn_tpu.ops import segment as _segment
            ax = _segment.node_stats_axis()

            if mask is None:
                m = jnp.ones((x.shape[0], 1), jnp.float32)
            else:
                m = mask.astype(jnp.float32)[:, None]
            n = m.sum()
            s = (xf * m).sum(axis=0)
            if ax is not None:
                n = jax.lax.psum(n, ax)
                s = jax.lax.psum(s, ax)
            n = jnp.maximum(n, 1.0)
            mean = s / n
            sq = (((xf - mean) ** 2) * m).sum(axis=0)
            if ax is not None:
                sq = jax.lax.psum(sq, ax)
            var = sq / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        # fold normalize+affine into one FMA in the input dtype:
        # y = x*a + b with a = scale/sqrt(var+eps), b = bias - mean*a —
        # one pass over x instead of three, bf16 traffic under mixed precision
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        y = x * a.astype(x.dtype) + b.astype(x.dtype)
        if mask is not None:
            y = jnp.where(mask[:, None], y, 0.0)
        return y
