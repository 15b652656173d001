"""Node-classification models.

One parametric `NodeClassifier` covering the reference's three model classes
(`GNN_Nodes` / `GKAN_Nodes` / `GFASTKAN_Nodes`,
node_classification_clean/models.py:94-257) via `architecture` in
{"mlp", "kan", "fastkan"} and `conv_type` in {"gcn", "gat", "gin"}.

Replicated reference semantics (including quirks that affect parity):
  * per message-passing layer: conv -> BatchNorm1d -> dropout;
  * jumping-knowledge skip: concat [x0, h1, ..., hL] before the head when
    `skip` (models.py:135-148); the KAN/FastKAN variants always *collect*
    layer outputs but only concat when skip (models.py:192-203);
  * head: Linear (mlp) / KANLinear (kan) / FastKANLayer (fastkan);
  * `heads` forced to 1 unless conv_type == "gat" (models.py:107).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kagnn_tpu.graphs.batch import GraphBatch
from kagnn_tpu.kan.layers import KAN, FastKAN, FastKANLayer, KANLinear
from kagnn_tpu.nn.convs import (GATConv, GCNConv, GINConv, dense_transform,
                                fastkan_transform, kan_transform)
from kagnn_tpu.nn.mlp import MLP, TorchLinear
from kagnn_tpu.ops.norm import MaskedBatchNorm

Array = jax.Array


class NodeClassifier(nn.Module):
    conv_type: str  # gcn | gat | gin
    architecture: str  # mlp | kan | fastkan
    mp_layers: int
    num_features: int
    hidden_channels: int
    num_classes: int
    skip: bool = True
    grid_size: int = 4
    spline_order: int = 3
    hidden_layers: int = 2  # GIN update-net depth
    dropout: float = 0.0
    heads: int = 4
    fused: bool = False
    compute_dtype: Optional[Any] = None  # e.g. jnp.bfloat16 mixed precision

    def _transform(self):
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
        return None  # dense

    def _gin_update(self, fin: int, fout: int) -> nn.Module:
        if self.architecture == "kan":
            sizes = [fin] + [self.hidden_channels] * (self.hidden_layers - 1) + [fout]
            return KAN(sizes, grid_size=self.grid_size,
                       spline_order=self.spline_order, fused=self.fused,
                       compute_dtype=self.compute_dtype)
        if self.architecture == "fastkan":
            sizes = [fin] + [self.hidden_channels] * (self.hidden_layers - 1) + [fout]
            return FastKAN(sizes, num_grids=self.grid_size, fused=self.fused,
                           compute_dtype=self.compute_dtype)
        # reference node make_mlp: no batch norm (models.py:8-17)
        return MLP(fin, self.hidden_channels, fout, self.hidden_layers,
                   batch_norm=False)

    @nn.compact
    def __call__(self, g: GraphBatch, x: Optional[Array] = None,
                 train: bool = False) -> Array:
        if x is None:
            x = g.nodes
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        heads = self.heads if self.conv_type == "gat" else 1
        H = self.hidden_channels

        collected = [x]
        for i in range(self.mp_layers):
            fin = self.num_features if i == 0 else H * heads
            if self.conv_type == "gcn":
                x = GCNConv(fin, H, transform=self._transform())(g, x)
            elif self.conv_type == "gat":
                x = GATConv(fin, H, heads=heads, transform=self._transform())(g, x)
            elif self.conv_type == "gin":
                x = GINConv(self._gin_update(fin, H))(g, x, train=train)
            else:
                raise ValueError(f"unknown conv_type {self.conv_type}")
            # BatchNorm statistics accumulate in f32 inside the layer; the
            # normalize itself stays in the compute dtype (one FMA pass)
            x = MaskedBatchNorm(H * heads)(x, mask=g.node_mask,
                                           use_running_average=not train)
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
            collected.append(x)

        if self.skip:
            x = jnp.concatenate(collected, axis=1)
        dim_head = (self.num_features + self.mp_layers * H * heads
                    if self.skip else H * heads)

        if self.architecture == "kan":
            x = KANLinear(dim_head, self.num_classes, grid_size=self.grid_size,
                          spline_order=self.spline_order, fused=self.fused,
                          compute_dtype=self.compute_dtype, name="head")(x)
        elif self.architecture == "fastkan":
            x = FastKANLayer(dim_head, self.num_classes,
                             num_grids=self.grid_size, fused=self.fused,
                             compute_dtype=self.compute_dtype, name="head")(x)
        else:
            x = TorchLinear(dim_head, self.num_classes, name="head")(x)
        # logits in f32 (loss stability)
        return x.astype(jnp.float32)
