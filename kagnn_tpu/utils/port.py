"""Weight-porting utilities: reference (torch) state_dicts -> kagnn_tpu
variable collections.

Used by the per-layer parity tests (SURVEY.md §4 test strategy (b)) and for
migrating checkpoints trained with the reference implementation. Torch is
imported lazily — the framework itself never depends on it.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def port_kan_linear(sd: Mapping[str, Any], prefix: str = "") -> tuple[dict, dict]:
    """Port an efficient-kan `KANLinear` state_dict (reference ekan.py) to
    (params, buffers) dicts for `kagnn_tpu.kan.layers.KANLinear`."""
    p = {
        "base_weight": _np(sd[prefix + "base_weight"]),
        "spline_weight": _np(sd[prefix + "spline_weight"]),
    }
    if prefix + "spline_scaler" in sd:
        p["spline_scaler"] = _np(sd[prefix + "spline_scaler"])
    b = {"grid": _np(sd[prefix + "grid"])}
    return p, b


def port_kan(sd: Mapping[str, Any], n_layers: int, prefix: str = "") -> tuple[dict, dict]:
    """Port an efficient-kan `KAN` stack state_dict."""
    params, buffers = {}, {}
    for i in range(n_layers):
        p, b = port_kan_linear(sd, f"{prefix}layers.{i}.")
        params[f"layers_{i}"] = p
        buffers[f"layers_{i}"] = b
    return params, buffers


def port_fastkan_layer(sd: Mapping[str, Any], prefix: str = "",
                       use_layernorm: bool = True,
                       use_base_update: bool = True) -> dict:
    """Port a fastkan `FastKANLayer` state_dict (reference fastkan.py:49-85)
    to params for `kagnn_tpu.kan.layers.FastKANLayer`."""
    p: dict = {
        "spline_weight": _np(sd[prefix + "spline_linear.weight"]),
    }
    if use_layernorm:
        p["layernorm"] = {
            "scale": _np(sd[prefix + "layernorm.weight"]),
            "bias": _np(sd[prefix + "layernorm.bias"]),
        }
    if use_base_update:
        p["base_weight"] = _np(sd[prefix + "base_linear.weight"])
        p["base_bias"] = _np(sd[prefix + "base_linear.bias"])
    return p


def port_fastkan(sd: Mapping[str, Any], n_layers: int, prefix: str = "") -> dict:
    return {
        f"layers_{i}": port_fastkan_layer(sd, f"{prefix}layers.{i}.")
        for i in range(n_layers)
    }


def port_torch_linear(sd: Mapping[str, Any], prefix: str = "") -> dict:
    """torch nn.Linear -> kagnn_tpu TorchLinear params (kernel transposed)."""
    p = {"kernel": _np(sd[prefix + "weight"]).T}
    if prefix + "bias" in sd:
        p["bias"] = _np(sd[prefix + "bias"])
    return p
