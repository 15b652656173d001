"""Fused RBF-basis + spline-GEMM Pallas kernel (FastKAN hot path).

The XLA path materializes the RBF basis tensor (N, D, G) in HBM
(reference fastkan.py:47 does the same on GPU), which is G x the size of the
activations — the layer is HBM-bandwidth-bound. This kernel recomputes the
basis per row-tile in VMEM and feeds the MXU directly, so the basis never
touches HBM; the backward pass rematerializes it the same way
(SURVEY.md §2.4 N7 — the north-star fusion).

Layout: the spline weight is pre-reshaped to (G, D, O) so the contraction is
G successive (T, D) x (D, O) MXU matmuls — no 3D reshapes inside the kernel.

out[n, o] = sum_g exp(-((x[n, d] - c_g) / h)^2) @ W[g, d, o]
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kagnn_tpu.pallas.spmm import vma_shape

Array = jax.Array

FWD_TILE_N = 1024  # measured best on v5e (tile sweep; PERFORMANCE.md)
BWD_TILE_N = 512   # bwd holds basis+dbasis+wide (T, G*D) tensors in VMEM


def _tile_for(n_rows: int, tile: int) -> int:
    """Shrink the row tile for small inputs so heads/tests don't pad 4x."""
    while tile > 256 and tile > 2 * n_rows:
        tile //= 2
    return tile


def _centers(grid_min: float, grid_max: float, num_grids: int) -> np.ndarray:
    return np.linspace(grid_min, grid_max, num_grids).astype(np.float32)


def _wide_basis(x, centers, inv_h):
    """(T, D) -> basis (T, G*D) and scaled distance d (T, G*D), computed as
    ONE wide elementwise chain (full 8x128 lane utilization even for small D;
    a per-center loop of (T, D) ops runs half-empty at D=64).

    The per-column center row is built in closed form from an iota (the
    centers are always a linspace) — pallas kernels cannot capture array
    constants."""
    G = len(centers)
    D = x.shape[1]
    step = float(centers[1] - centers[0]) if G > 1 else 0.0
    xb = jnp.concatenate([x] * G, axis=1)  # (T, G*D)
    col_g = jax.lax.broadcasted_iota(jnp.int32, (1, G * D), 1) // D
    c_row = float(centers[0]) + col_g.astype(x.dtype) * step
    d = (xb - c_row) * inv_h
    return jnp.exp(-(d * d)), d


def _fwd_kernel(x_ref, w_ref, out_ref, *, centers, inv_h):
    # wide basis tile (T, G*D), then ONE MXU matmul with the g-major weight
    # (G*D, O). Per-center (T, D)x(D, O) matmuls underuse the MXU K dim
    # (measured slower than XLA's fused path).
    basis, _ = _wide_basis(x_ref[...], centers, inv_h)
    out_ref[...] = jnp.dot(basis, w_ref[...],
                           preferred_element_type=jnp.float32
                           ).astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, *, centers, inv_h):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...]  # (T, D)
    dout = g_ref[...]  # (T, O)
    D = x.shape[1]
    basis, d = _wide_basis(x, centers, inv_h)
    # dW = basis^T @ dout (accumulated across row tiles)
    dw_ref[...] += jax.lax.dot_general(
        basis, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    # dbasis = dout @ W^T ; dbasis/dx = basis * (-2 d * inv_h)
    dbasis = jax.lax.dot_general(
        dout, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, G*D)
    wide = dbasis * basis * (-2.0 * inv_h) * d  # (T, G*D)
    dx = jnp.zeros(x.shape, jnp.float32)
    for g in range(len(centers)):
        dx += wide[:, g * D:(g + 1) * D]
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pad_rows(x: Array, tile: int) -> tuple[Array, int]:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def rbf_spline_matmul(x: Array, w_gdo: Array, grid_min: float,
                      grid_max: float, num_grids: int, denominator: float,
                      interpret: bool = False) -> Array:
    """x (N, D), w_gdo (G, D, O) -> (N, O). Fused basis+GEMM."""
    return _rbf_fwd_impl(x, w_gdo, grid_min, grid_max, num_grids,
                         denominator, interpret)


def _rbf_fwd_impl(x, w_gdo, grid_min, grid_max, num_grids, denominator,
                  interpret):
    centers = _centers(grid_min, grid_max, num_grids)
    inv_h = float(1.0 / denominator)
    G, D, O = w_gdo.shape
    T = _tile_for(x.shape[0], FWD_TILE_N)
    xp, n = _pad_rows(x, T)
    np_rows = xp.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, centers=centers, inv_h=inv_h),
        grid=(np_rows // T,),
        in_specs=[
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * D, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma_shape((np_rows, O), x.dtype, xp),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_rows * D * O * G + 4 * np_rows * D * G,
            bytes_accessed=4 * (np_rows * D + G * D * O + np_rows * O),
            transcendentals=np_rows * D * G),
        interpret=interpret,
    )(xp, w_gdo.reshape(G * D, O))
    return out[:n]


def _rbf_vjp_fwd(x, w_gdo, grid_min, grid_max, num_grids, denominator,
                 interpret):
    out = _rbf_fwd_impl(x, w_gdo, grid_min, grid_max, num_grids, denominator,
                        interpret)
    return out, (x, w_gdo)


def _rbf_vjp_bwd(grid_min, grid_max, num_grids, denominator, interpret,
                 res, dout):
    x, w_gdo = res
    centers = _centers(grid_min, grid_max, num_grids)
    inv_h = float(1.0 / denominator)
    G, D, O = w_gdo.shape
    T = _tile_for(x.shape[0], BWD_TILE_N)
    xp, n = _pad_rows(x, T)
    gp, _ = _pad_rows(dout, T)
    np_rows = xp.shape[0]
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, centers=centers, inv_h=inv_h),
        grid=(np_rows // T,),
        in_specs=[
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * D, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * D, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            vma_shape((np_rows, D), x.dtype, xp),
            vma_shape((G * D, O), w_gdo.dtype, xp),
        ),
        interpret=interpret,
    )(xp, w_gdo.reshape(G * D, O), gp)
    return dx[:n], dw.reshape(G, D, O)


rbf_spline_matmul.defvjp(_rbf_vjp_fwd, _rbf_vjp_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def fastkan_fused(xs: Array, spline_weight: Array, grid_min: float,
                  grid_max: float, num_grids: int, denominator: float,
                  interpret: Optional[bool] = None) -> Array:
    """Drop-in fused replacement for
    `rbf_basis(xs).reshape(N, -1) @ spline_weight.T`.

    spline_weight is the layer's (O, D*G) parameter with columns ordered
    (d0g0..d0g{G-1}, d1g0..) — reshaped here to the kernel's (G, D, O).
    """
    O = spline_weight.shape[0]
    D = xs.shape[-1]
    G = num_grids
    w_gdo = jnp.transpose(spline_weight.reshape(O, D, G), (2, 1, 0))
    if interpret is None:
        interpret = not _on_tpu()
    return rbf_spline_matmul(xs, w_gdo, float(grid_min), float(grid_max),
                             int(G), float(denominator), bool(interpret))
