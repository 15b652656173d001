"""Gaussian radial-basis evaluation (the fastkan basis family).

Functional JAX port of the math in the reference's vendored fastkan
(`node_classification_clean/fastkan.py:30-47`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_rbf_grid(grid_min: float, grid_max: float, num_grids: int) -> Array:
    return jnp.linspace(grid_min, grid_max, num_grids)


def rbf_basis(x: Array, grid: Array, denominator: float) -> Array:
    """exp(-((x[..., None] - grid) / denominator)^2).

    Args:
      x: (..., in_features).
      grid: (num_grids,) fixed centers.

    Returns: (..., in_features, num_grids).
    """
    return jnp.exp(-(((x[..., None] - grid) / denominator) ** 2))
