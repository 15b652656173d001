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


def _kan_in_paths(tree, prefix=()):
    """Paths of modules that sowed a 'kan_in' intermediate (one per
    KANLinear), in sorted (≈ execution) order."""
    paths = []
    if isinstance(tree, Mapping):
        if "kan_in" in tree:
            paths.append(prefix)
        for k in sorted(tree):
            if k != "kan_in":
                paths.extend(_kan_in_paths(tree[k], prefix + (k,)))
    return paths


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    tree = dict(tree)
    if not path:
        return value
    tree[path[0]] = _set(tree.get(path[0], {}), path[1:], value)
    return tree


def adapt_model_grids(model, variables: Mapping[str, Any], *apply_args,
                      **apply_kwargs) -> dict:
    """In-training grid adaptation for a WHOLE model (any module tree
    containing KANLinears) — the counterpart of the reference's
    `KAN.forward(update_grid=True)` training-time mode (ekan.py:270-275)
    generalized to grafted convs and heads.

    Each KANLinear sows its transform input ('kan_in'); layers are updated
    ONE PER PASS in execution order, re-running the forward between passes
    so later layers are refit against activations produced by the
    already-updated earlier layers — the reference's exact layer-by-layer
    semantics. `model` must be an UNFUSED module (the fused GIN kernel
    keeps its aggregate in-kernel and cannot sow it); pass the fused
    model's variables — the trees are identical.

    Returns a NEW variables dict ({'params', 'buffers'} updated).
    """
    import jax.numpy as jnp

    variables = dict(variables)
    done: set = set()
    for _ in range(64):  # bound: one pass per KANLinear
        _, mut = model.apply(variables, *apply_args,
                             mutable=["intermediates"], **apply_kwargs)
        inter = mut["intermediates"]
        # first layer (execution order) not yet adapted in this call
        target = next((p for p in _kan_in_paths(inter) if p not in done),
                      None)
        if target is None:
            break
        done.add(target)
        x = _get(inter, target)["kan_in"][0].astype(jnp.float32)
        p = _get(variables["params"], target)
        b = _get(variables["buffers"], target)
        K = b["grid"].shape[1]
        n_coeff = p["spline_weight"].shape[2]
        spline_order = K - n_coeff - 1
        grid_size = n_coeff - spline_order
        new_p, new_b = update_kan_linear(p, b, x, grid_size, spline_order)
        variables["params"] = _set(variables["params"], target, new_p)
        variables["buffers"] = _set(variables["buffers"], target, new_b)
    return variables
