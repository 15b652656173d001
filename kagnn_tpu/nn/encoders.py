"""OGB-style categorical input encoders for molecular graphs.

Parity targets: reference graph_regression/models.py:244-336 (`AtomEncoder`,
`BondEncoder`, `allowable_features` vocab sizes). Each integer feature column
gets its own embedding table (Xavier-uniform init); embeddings are summed.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# vocab sizes per reference graph_regression/models.py:282-336
ATOM_FEATURE_DIMS: tuple[int, ...] = (119, 5, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS: tuple[int, ...] = (5, 6, 2)


class CategoricalSumEncoder(nn.Module):
    """Sum of per-column embeddings: x (N, n_cols) int -> (N, emb_dim)."""

    feature_dims: Sequence[int]
    emb_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = jnp.zeros((x.shape[0], self.emb_dim), jnp.float32)
        for i, dim in enumerate(self.feature_dims):
            table = self.param(f"emb_{i}", nn.initializers.xavier_uniform(),
                               (dim, self.emb_dim))
            idx = jnp.clip(x[:, i].astype(jnp.int32), 0, dim - 1)
            out = out + jnp.take(table, idx, axis=0)
        return out


class AtomEncoder(nn.Module):
    emb_dim: int
    feature_dims: Sequence[int] = ATOM_FEATURE_DIMS

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return CategoricalSumEncoder(self.feature_dims, self.emb_dim)(x)


class BondEncoder(nn.Module):
    emb_dim: int
    feature_dims: Sequence[int] = BOND_FEATURE_DIMS

    @nn.compact
    def __call__(self, edge_attr: Array) -> Array:
        return CategoricalSumEncoder(self.feature_dims, self.emb_dim)(edge_attr)
