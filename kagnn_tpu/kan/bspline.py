"""B-spline basis evaluation (the efficient-kan basis family).

Functional JAX port of the math in the reference's vendored efficient-kan
(`node_classification_clean/ekan.py:79-112` — Cox–de Boor recursion; and
`:114-144` — least-squares curve fitting). Shapes and conventions match the
reference exactly so ported weights produce allclose activations.

The recursion here is the *generic-grid* path used by autodiff-visible code;
the uniform-grid closed form (used by the fused Pallas kernels) lives in
`kagnn_tpu/pallas/bspline_fused.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_grid(
    in_features: int,
    grid_size: int,
    spline_order: int,
    grid_range: tuple[float, float] = (-1.0, 1.0),
) -> jnp.ndarray:
    """Uniform extended knot vector, shape (in_features, grid_size + 2*order + 1).

    Mirrors reference ekan.py:28-37.
    """
    lo, hi = grid_range
    h = (hi - lo) / grid_size
    pts = jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=jnp.float32)
    grid = pts * h + lo
    return jnp.broadcast_to(grid, (in_features, grid.shape[0]))


def b_splines(x: Array, grid: Array, spline_order: int) -> Array:
    """Evaluate B-spline bases.

    Args:
      x: (batch, in_features).
      grid: (in_features, grid_size + 2*order + 1) knot vector.
      spline_order: k.

    Returns:
      (batch, in_features, grid_size + spline_order) basis values.

    Math per reference ekan.py:79-112 (Cox–de Boor, iterative).
    """
    x = x[..., None]  # (B, in, 1)
    # order-0: indicator of the half-open knot interval
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - x) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def curve2coeff(
    x: Array, y: Array, grid: Array, spline_order: int
) -> Array:
    """Fit spline coefficients interpolating (x, y) pointwise, per in-feature.

    Args:
      x: (batch, in_features) sample positions.
      y: (batch, in_features, out_features) target values.

    Returns:
      (out_features, in_features, grid_size + spline_order) coefficients.

    Mirrors reference ekan.py:114-144 (torch.linalg.lstsq over batched
    per-feature systems).
    """
    A = jnp.transpose(b_splines(x, grid, spline_order), (1, 0, 2))  # (in, B, C)
    B = jnp.transpose(y, (1, 0, 2))  # (in, B, out)

    def solve(a, b):
        sol, _, _, _ = jnp.linalg.lstsq(a, b)
        return sol

    solution = jax.vmap(solve)(A, B)  # (in, C, out)
    return jnp.transpose(solution, (2, 0, 1))


def update_grid(
    x: Array,
    grid: Array,
    spline_weight: Array,
    spline_scaler: Array | None,
    grid_size: int,
    spline_order: int,
    grid_eps: float = 0.02,
    margin: float = 0.01,
) -> tuple[Array, Array]:
    """Adapt the knot vector to the empirical distribution of `x` and refit the
    spline coefficients to preserve the represented function.

    Port of reference ekan.py:164-211. Offline/host-side op (not jitted in the
    hot path). Returns (new_grid, new_spline_weight).
    """
    batch = x.shape[0]
    splines = jnp.transpose(b_splines(x, grid, spline_order), (1, 0, 2))  # (in,B,C)
    scaled = spline_weight if spline_scaler is None else (
        spline_weight * spline_scaler[..., None])
    coeff = jnp.transpose(scaled, (1, 2, 0))  # (in, C, out)
    unreduced = jnp.transpose(jnp.einsum("ibc,ico->ibo", splines, coeff), (1, 0, 2))

    x_sorted = jnp.sort(x, axis=0)
    idx = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[idx]
    uniform_step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (
        jnp.arange(grid_size + 1, dtype=x.dtype)[:, None] * uniform_step
        + x_sorted[0]
        - margin
    )
    new_grid = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    lower = new_grid[:1] - uniform_step * jnp.arange(spline_order, 0, -1, dtype=x.dtype)[:, None]
    upper = new_grid[-1:] + uniform_step * jnp.arange(1, spline_order + 1, dtype=x.dtype)[:, None]
    new_grid = jnp.concatenate([lower, new_grid, upper], axis=0).T  # (in, knots)
    new_weight = curve2coeff(x, unreduced, new_grid, spline_order)
    return new_grid, new_weight
