"""Graph-regression models (ZINC / QM9 task family).

One parametric `GraphRegressor` covering the reference's six model classes
(GIN/GCN x MLP/KAN/FastKAN on GINEConv/GCNConv,
graph_regression/models.py:26-242) via `conv_type` and `architecture`.

Replicated reference semantics:
  * input encoders: OGB-style AtomEncoder/BondEncoder when
    `ogb_encoders=True` (ZINC), else Linear encoders (QM9)
    (models.py:30-35);
  * GIN family: GINEConv (edge features; messages ReLU(x_j + e_ij)); the
    KAN/FastKAN variants add an external BatchNorm per layer; dropout;
    global_add_pool; same-family head; RAW (un-softmaxed) output;
  * GCN family: GCNConv -> SiLU -> dropout; global_ADD_pool
    (models.py:78 — note: add, unlike the classification GCN's mean);
    single-layer readout.

Deviation from the reference (deliberate, SURVEY.md §7 "bugs NOT to
replicate"): the reference's regression KAGCN ignores its grid_size/spline
hyperparameters (models.py:184 builds `KAGCN_Layer(hidden, hidden)` with
defaults); here they are honored.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.kan.layers import KAN, FastKAN
from kagnn_tpu.nn.convs import (GCNConv, GINEConv, fastkan_transform,
                                global_add_pool, kan_transform)
from kagnn_tpu.nn.encoders import AtomEncoder, BondEncoder
from kagnn_tpu.nn.mlp import MLP, TorchLinear
from kagnn_tpu.ops.norm import MaskedBatchNorm

Array = jax.Array


class GraphRegressor(nn.Module):
    conv_type: str  # gin | gcn
    architecture: str  # mlp | kan | fastkan
    gnn_layers: int
    num_node_features: int
    num_edge_features: int
    hidden_dim: int
    num_targets: int = 1
    hidden_layers: int = 2
    grid_size: int = 4
    spline_order: int = 3
    dropout: float = 0.0
    ogb_encoders: bool = True
    fused: bool = False
    compute_dtype: Optional[Any] = None  # e.g. jnp.bfloat16

    def _transform(self):
        from kagnn_tpu.kan.layers import FastKANLayer, KANLinear

        cd = self.compute_dtype
        if self.architecture == "kan":
            def make(fin, fout):
                return KANLinear(fin, fout, grid_size=self.grid_size,
                                 spline_order=self.spline_order,
                                 fused=self.fused, compute_dtype=cd)
            return make
        if self.architecture == "fastkan":
            def make(fin, fout):
                return FastKANLayer(fin, fout, num_grids=self.grid_size,
                                    fused=self.fused, compute_dtype=cd)
            return make
        return None

    def _net(self, fin: int, fout: int, depth: int, batch_norm: bool) -> nn.Module:
        sizes = [fin] + [self.hidden_dim] * (depth - 1) + [fout]
        if self.architecture == "kan":
            return KAN(sizes, grid_size=self.grid_size,
                       spline_order=self.spline_order, fused=self.fused,
                       compute_dtype=self.compute_dtype)
        if self.architecture == "fastkan":
            return FastKAN(sizes, num_grids=self.grid_size, fused=self.fused,
                           compute_dtype=self.compute_dtype)
        return MLP(fin, self.hidden_dim, fout, depth, batch_norm=batch_norm)

    @nn.compact
    def __call__(self, g: GraphBatch, x: Optional[Array] = None,
                 edge_attr: Optional[Array] = None,
                 train: bool = False) -> Array:
        if x is None:
            x = g.nodes
        if edge_attr is None:
            edge_attr = g.edges
        Hd = self.hidden_dim

        if self.ogb_encoders:
            x = AtomEncoder(Hd)(x)
        else:
            x = TorchLinear(self.num_node_features, Hd, name="atom_encoder")(x)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        if self.conv_type == "gin":
            if edge_attr.ndim == 1:
                edge_attr = edge_attr[:, None]
            if self.ogb_encoders:
                e = BondEncoder(Hd)(edge_attr)
            else:
                e = TorchLinear(self.num_edge_features, Hd,
                                name="bond_encoder")(edge_attr)
            external_bn = self.architecture != "mlp"
            for i in range(self.gnn_layers):
                x = GINEConv(self._net(Hd, Hd, self.hidden_layers,
                                       batch_norm=True))(g, x, e, train=train)
                if external_bn:
                    x = MaskedBatchNorm(Hd)(x, mask=g.node_mask,
                                            use_running_average=not train)
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            pooled = global_add_pool(g, x)
            out = self._net(Hd, self.num_targets, self.hidden_layers,
                            batch_norm=False)(pooled, mask=g.graph_mask,
                                              train=train)
        elif self.conv_type == "gcn":
            for i in range(self.gnn_layers):
                x = GCNConv(Hd, Hd, transform=self._transform())(g, x)
                x = nn.silu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            pooled = global_add_pool(g, x)
            out = self._net(Hd, self.num_targets, 1, batch_norm=False)(
                pooled, mask=g.graph_mask, train=train)
        else:
            raise ValueError(f"unknown conv_type {self.conv_type}")
        return out.astype(jnp.float32)
