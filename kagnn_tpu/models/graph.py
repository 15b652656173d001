"""Graph-classification models.

One parametric `GraphClassifier` covering the reference's nine model classes
(GIN/GCN/GAT x MLP/KAN/FastKAN, graph_classification/models.py:26-288) via
`conv_type` and `architecture`.

Replicated reference semantics:
  * GIN family: GINConv with an update net (MLP-with-BN / KAN / FastKAN);
    KAN/FastKAN variants add an external BatchNorm after each conv
    (models.py:113-116) while the MLP variant's BN lives inside its update
    MLP; dropout after each layer; global_add_pool; same-family head;
    log_softmax output.
  * GCN family: conv -> SiLU -> dropout; global_MEAN_pool (models.py:65);
    single-layer same-family readout; log_softmax.
  * GAT family: conv -> SiLU -> dropout; global_ADD_pool (models.py:87);
    single-layer readout; log_softmax.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.kan.layers import KAN, FastKAN
from kagnn_tpu.nn.convs import (GATConv, GCNConv, GINConv, fastkan_transform,
                                global_add_pool, global_mean_pool,
                                kan_transform)
from kagnn_tpu.nn.mlp import MLP
from kagnn_tpu.ops.norm import MaskedBatchNorm

Array = jax.Array


class GraphClassifier(nn.Module):
    conv_type: str  # gin | gcn | gat
    architecture: str  # mlp | kan | fastkan
    gnn_layers: int
    num_features: int
    hidden_dim: int
    num_classes: int
    hidden_layers: int = 2  # update-net / head depth (GIN family)
    grid_size: int = 4
    spline_order: int = 3
    dropout: float = 0.0
    heads: int = 4
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
        """Same-family multi-layer net (GIN update nets and heads)."""
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
                 train: bool = False) -> Array:
        if x is None:
            x = g.nodes
        if self.compute_dtype is not None and jnp.issubdtype(x.dtype,
                                                             jnp.floating):
            x = x.astype(self.compute_dtype)
        Hd = self.hidden_dim
        heads = self.heads

        if self.conv_type == "gin":
            external_bn = self.architecture != "mlp"
            for i in range(self.gnn_layers):
                fin = self.num_features if i == 0 else Hd
                x = GINConv(self._net(fin, Hd, self.hidden_layers,
                                      batch_norm=True))(g, x, train=train)
                if external_bn:
                    x = MaskedBatchNorm(Hd)(x, mask=g.node_mask,
                                            use_running_average=not train)
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            pooled = global_add_pool(g, x)
            out = self._net(Hd, self.num_classes, self.hidden_layers,
                            batch_norm=False)(pooled, mask=g.graph_mask,
                                              train=train)
        elif self.conv_type == "gcn":
            for i in range(self.gnn_layers):
                fin = self.num_features if i == 0 else Hd
                x = GCNConv(fin, Hd, transform=self._transform())(g, x)
                x = nn.silu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            pooled = global_mean_pool(g, x)
            out = self._net(Hd, self.num_classes, 1, batch_norm=False)(
                pooled, mask=g.graph_mask, train=train)
        elif self.conv_type == "gat":
            for i in range(self.gnn_layers):
                fin = self.num_features if i == 0 else Hd * heads
                x = GATConv(fin, Hd, heads=heads,
                            transform=self._transform())(g, x)
                x = nn.silu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=not train)
            pooled = global_add_pool(g, x)
            out = self._net(Hd * heads, self.num_classes, 1, batch_norm=False)(
                pooled, mask=g.graph_mask, train=train)
        else:
            raise ValueError(f"unknown conv_type {self.conv_type}")
        return nn.log_softmax(out.astype(jnp.float32), axis=1)
