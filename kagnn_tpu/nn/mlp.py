"""MLP update/readout networks matching the reference's `make_mlp` helpers.

Replicates reference semantics including their quirks (documented, since
downstream accuracy parity depends on them):

  * hidden blocks are Linear -> ReLU (-> BatchNorm when batch_norm=True),
    reference graph_classification/models.py:9-24;
  * the FINAL layer has NO activation — the reference passes `nn.ReLU()` as
    the (truthy) `bias` argument of `nn.Linear` by mistake
    (models.py:20 `nn.Linear(hidden_dim, out_dim, nn.ReLU())`), so no ReLU is
    applied;
  * the single-layer case (hidden_layers < 2) IS Linear -> ReLU
    (node_classification_clean/models.py:15) with no BatchNorm.

Linear layers use torch's default init (U(±1/sqrt(fan_in)) for kernel and
bias).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.ops.norm import MaskedBatchNorm

Array = jax.Array


def torch_linear_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return nn.initializers.uniform(scale=2 * bound, offset=-bound) if hasattr(
        nn.initializers, "uniform") else None


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """nn.Linear with torch's default initialization."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bound = 1.0 / math.sqrt(self.in_features)
        kernel = self.param("kernel", _uniform(bound),
                            (self.in_features, self.out_features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", _uniform(bound), (self.out_features,))
            y = y + bias
        return y


class MLP(nn.Module):
    """`make_mlp(num_features, hidden_dim, out_dim, hidden_layers,
    batch_norm)` equivalent."""

    num_features: int
    hidden_dim: int
    out_dim: int
    hidden_layers: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        if self.hidden_layers >= 2:
            dims = [self.num_features] + [self.hidden_dim] * (self.hidden_layers - 1)
            for i in range(self.hidden_layers - 1):
                x = TorchLinear(dims[i], dims[i + 1])(x)
                x = nn.relu(x)
                if self.batch_norm:
                    x = MaskedBatchNorm(dims[i + 1])(
                        x, mask=mask, use_running_average=not train)
            x = TorchLinear(dims[-1], self.out_dim)(x)
        else:
            x = TorchLinear(self.num_features, self.out_dim)(x)
            x = nn.relu(x)
        return x
