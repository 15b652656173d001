"""Grid adaptation for trained/training KAN stacks.

Functional counterpart of the reference's in-place grid updates
(`KAN.forward(update_grid=True)`, ekan.py:270-275, and
`KANLinear.update_grid`, ekan.py:164-211): given a stack's variables and a
batch of inputs, adapt each layer's knot vector to the empirical activation
distribution and refit its spline weights, propagating activations through
the updated layers (exactly the reference's layer-by-layer order).

Offline/host-side op — returns a NEW variables dict; nothing is mutated.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax

from kagnn_tpu.kan import bspline
from kagnn_tpu.kan.layers import KANLinear

Array = jax.Array


def update_kan_linear(params: Mapping[str, Any], buffers: Mapping[str, Any],
                      x: Array, grid_size: int, spline_order: int,
                      grid_eps: float = 0.02,
                      margin: float = 0.01) -> tuple[dict, dict]:
    """Adapt one KANLinear's (grid, spline_weight) to inputs `x`."""
    scaler = params.get("spline_scaler")
    new_grid, new_w = bspline.update_grid(
        x, buffers["grid"], params["spline_weight"], scaler,
        grid_size=grid_size, spline_order=spline_order, grid_eps=grid_eps,
        margin=margin)
    new_params = dict(params)
    new_params["spline_weight"] = new_w
    new_buffers = dict(buffers)
    new_buffers["grid"] = new_grid
    return new_params, new_buffers


def update_kan_stack(module, variables: Mapping[str, Any],
                     x: Array) -> dict:
    """Adapt every layer of a `kagnn_tpu.kan.layers.KAN` stack.

    `module` is the KAN module (provides sizes/grid config); `variables` its
    {"params", "buffers"} dict. Returns the updated variables dict.
    """
    params = dict(variables["params"])
    buffers = dict(variables.get("buffers", {}))
    sizes = list(module.layers_hidden)
    for i, (fin, fout) in enumerate(zip(sizes[:-1], sizes[1:])):
        name = f"layers_{i}"
        p, b = update_kan_linear(
            params[name], buffers[name], x,
            grid_size=module.grid_size, spline_order=module.spline_order,
            grid_eps=module.grid_eps)
        params[name] = p
        buffers[name] = b
        layer = KANLinear(fin, fout, grid_size=module.grid_size,
                          spline_order=module.spline_order,
                          grid_eps=module.grid_eps,
                          grid_range=module.grid_range)
        x = layer.apply({"params": p, "buffers": b}, x)
    out = dict(variables)
    out["params"] = params
    out["buffers"] = buffers
    return out
