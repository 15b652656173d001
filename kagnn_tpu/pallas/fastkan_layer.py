"""Fully-fused FastKANLayer Pallas kernel: layernorm + RBF basis + spline
GEMM + base (SiLU) GEMM + bias in ONE launch.

The reference layer (fastkan.py:76-85) is
    spline_linear(rbf(layernorm(x)).flatten) + base_linear(silu(x))
which on the XLA path costs three separate HBM passes over the (N, D)
activations (layernorm reduce+write, basis+spline GEMM read, base GEMM
read) plus the (N, D*G) basis tensor when XLA declines to fuse the exp into
the GEMM prologue. Here each row tile is read ONCE into VMEM; mean/var,
the normalized/affine xs, the wide RBF basis, both MXU matmuls and the bias
all happen before anything returns to HBM. The backward kernel
rematerializes every intermediate from the same single x tile (no residuals
besides x itself) and fuses the layernorm VJP, so the whole layer is one
fwd + one bwd launch.

This replaces the standalone basis+GEMM kernel (rbf_fused.py) whenever the
layer runs with its defaults (layernorm on, base update on) — the
configuration every model in the reference uses. rbf_fused remains the
dispatch for layernorm-free/base-free variants.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kagnn_tpu.pallas.rbf_fused import (BWD_TILE_N, FWD_TILE_N, _centers,
                                         _pad_rows, _tile_for, _wide_basis)

from kagnn_tpu.pallas.spmm import vma_shape

Array = jax.Array


def _ln_stats(x: Array, eps: float):
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc * rstd  # xhat


def _fwd_kernel(x_ref, lng_ref, lnb_ref, w_ref, wb_ref, bb_ref, out_ref, *,
                centers, inv_h, eps):
    x = x_ref[...].astype(jnp.float32)
    xhat = _ln_stats(x, eps)
    xs = xhat * lng_ref[...].astype(jnp.float32) \
        + lnb_ref[...].astype(jnp.float32)
    basis, _ = _wide_basis(xs, centers, inv_h)
    out = jnp.dot(basis, w_ref[...], preferred_element_type=jnp.float32)
    sx = x * jax.nn.sigmoid(x)
    out += jnp.dot(sx, wb_ref[...], preferred_element_type=jnp.float32)
    out += bb_ref[...].astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, lng_ref, lnb_ref, w_ref, wb_ref, g_ref,
                dx_ref, dlng_ref, dlnb_ref, dw_ref, dwb_ref, dbb_ref, *,
                centers, inv_h, eps):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dlng_ref[...] = jnp.zeros_like(dlng_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dbb_ref[...] = jnp.zeros_like(dbb_ref)

    x = x_ref[...].astype(jnp.float32)
    dout = g_ref[...].astype(jnp.float32)  # (T, O)
    D = x.shape[1]
    lng = lng_ref[...].astype(jnp.float32)
    # rematerialize forward intermediates from the x tile
    xhat = _ln_stats(x, eps)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xs = xhat * lng + lnb_ref[...].astype(jnp.float32)
    basis, d = _wide_basis(xs, centers, inv_h)

    # spline: dW = basis^T @ dout ; dxs via dbasis
    dw_ref[...] += jax.lax.dot_general(
        basis, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    dbasis = jax.lax.dot_general(
        dout, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, G*D)
    wide = dbasis * basis * (-2.0 * inv_h) * d
    dxs = jnp.zeros(x.shape, jnp.float32)
    for g in range(len(centers)):
        dxs += wide[:, g * D:(g + 1) * D]

    # layernorm affine + normalization VJP
    dlng_ref[...] += jnp.sum(dxs * xhat, axis=0, keepdims=True
                             ).astype(dlng_ref.dtype)
    dlnb_ref[...] += jnp.sum(dxs, axis=0, keepdims=True
                             ).astype(dlnb_ref.dtype)
    dxhat = dxs * lng
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)

    # base path: silu(x) @ Wb + bb
    sig = jax.nn.sigmoid(x)
    sx = x * sig
    dwb_ref[...] += jax.lax.dot_general(
        sx, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dwb_ref.dtype)
    dbb_ref[...] += jnp.sum(dout, axis=0, keepdims=True).astype(dbb_ref.dtype)
    ds = jax.lax.dot_general(
        dout, wb_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T, D)
    dx += ds * (sig * (1.0 + x * (1.0 - sig)))
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _layer_core(x, lng, lnb, w_gdo, wb_do, bb, grid_min, grid_max, num_grids,
                denominator, eps, interpret, axis=None):
    return _layer_fwd_impl(x, lng, lnb, w_gdo, wb_do, bb, grid_min, grid_max,
                           num_grids, denominator, eps, interpret)


def _layer_fwd_impl(x, lng, lnb, w_gdo, wb_do, bb, grid_min, grid_max,
                    num_grids, denominator, eps, interpret):
    centers = _centers(grid_min, grid_max, num_grids)
    inv_h = float(1.0 / denominator)
    GD, O = w_gdo.shape
    D = x.shape[1]
    T = _tile_for(x.shape[0], FWD_TILE_N)
    xp, n = _pad_rows(x, T)
    rows = xp.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, centers=centers, inv_h=inv_h, eps=eps),
        grid=(rows // T,),
        in_specs=[
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GD, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma_shape((rows, O), x.dtype, xp),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * D * O * (num_grids + 1) + 8 * rows * D,
            bytes_accessed=4 * (rows * D + GD * O + D * O + rows * O),
            transcendentals=rows * D * (num_grids + 1)),
        interpret=interpret,
    )(xp, lng, lnb, w_gdo, wb_do, bb)
    return out[:n]


def _layer_vjp_fwd(x, lng, lnb, w_gdo, wb_do, bb, grid_min, grid_max,
                   num_grids, denominator, eps, interpret, axis=None):
    out = _layer_fwd_impl(x, lng, lnb, w_gdo, wb_do, bb, grid_min, grid_max,
                          num_grids, denominator, eps, interpret)
    return out, (x, lng, lnb, w_gdo, wb_do)


def _layer_vjp_bwd(grid_min, grid_max, num_grids, denominator, eps,
                   interpret, axis, res, dout):
    x, lng, lnb, w_gdo, wb_do = res
    centers = _centers(grid_min, grid_max, num_grids)
    inv_h = float(1.0 / denominator)
    GD, O = w_gdo.shape
    D = x.shape[1]
    T = _tile_for(x.shape[0], BWD_TILE_N)
    xp, n = _pad_rows(x, T)
    gp, _ = _pad_rows(dout, T)  # zero rows -> zero grads
    rows = xp.shape[0]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    dx, dlng, dlnb, dw, dwb, dbb = pl.pallas_call(
        functools.partial(_bwd_kernel, centers=centers, inv_h=inv_h, eps=eps),
        grid=(rows // T,),
        in_specs=[
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((1, D)), full((1, D)), full((GD, O)), full((D, O)),
            pl.BlockSpec((T, O), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((1, D)), full((1, D)), full((GD, O)), full((D, O)),
            full((1, O)),
        ),
        out_shape=(
            vma_shape((rows, D), x.dtype, xp),
            vma_shape((1, D), lng.dtype, xp),
            vma_shape((1, D), lnb.dtype, xp),
            vma_shape((GD, O), w_gdo.dtype, xp),
            vma_shape((D, O), wb_do.dtype, xp),
            vma_shape((1, O), wb_do.dtype, xp),
        ),
        interpret=interpret,
    )(xp, lng, lnb, w_gdo, wb_do, gp)
    return dx[:n], dlng, dlnb, dw, dwb, dbb


_layer_core.defvjp(_layer_vjp_fwd, _layer_vjp_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def fastkan_layer_fused(x: Array, ln_scale: Array, ln_bias: Array,
                        spline_weight: Array, base_weight: Array,
                        base_bias: Array, grid_min: float, grid_max: float,
                        num_grids: int, denominator: float,
                        eps: float = 1e-5,
                        interpret: Optional[bool] = None) -> Array:
    """Drop-in fused FastKANLayer forward (layernorm + base update on).

    x (N, D); ln_scale/ln_bias (D,); spline_weight (O, D*G) with columns
    ordered (d0g0..d0g{G-1}, d1g0..) as in the layer's parameter;
    base_weight (O, D); base_bias (O,). Returns (N, O).
    """
    O = spline_weight.shape[0]
    D = x.shape[-1]
    G = int(num_grids)
    w_gdo = jnp.transpose(spline_weight.reshape(O, D, G),
                          (2, 1, 0)).reshape(G * D, O)
    from kagnn_tpu.ops import segment

    if interpret is None:
        interpret = not _on_tpu()
    hs = segment.halo_state()
    return _layer_core(x, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
                       w_gdo, jnp.transpose(base_weight),
                       base_bias.reshape(1, O), float(grid_min),
                       float(grid_max), G, float(denominator), float(eps),
                       bool(interpret),
                       hs.axis if hs is not None else None)
