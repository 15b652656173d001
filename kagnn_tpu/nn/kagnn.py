"""Reference-named convenience constructors.

Users coming from the reference find its exact class/helper names here
(node_classification_clean/models.py:8-92); each is a thin alias over the
compositional core (`kagnn_tpu.nn.convs` + `kagnn_tpu.kan.layers`) — the
grafting pattern expressed as transform factories.
"""
from __future__ import annotations

import flax.linen as nn

from kagnn_tpu.kan.layers import KAN, FastKAN
from kagnn_tpu.nn.convs import (GATConv, GCNConv, GINConv, GINEConv,
                                fastkan_transform, kan_transform)
from kagnn_tpu.nn.mlp import MLP


def make_mlp(num_features: int, hidden_dim: int, out_dim: int,
             hidden_layers: int, batch_norm: bool = False) -> nn.Module:
    """Reference `make_mlp` (models.py:8-17 / graph models.py:9-24)."""
    return MLP(num_features, hidden_dim, out_dim, hidden_layers,
               batch_norm=batch_norm)


def make_kan(num_features: int, hidden_dim: int, out_dim: int,
             hidden_layers: int, grid_size: int, spline_order: int,
             fused: bool = False) -> nn.Module:
    """Reference `make_kan` (models.py:19-21)."""
    sizes = [num_features] + [hidden_dim] * (hidden_layers - 1) + [out_dim]
    return KAN(sizes, grid_size=grid_size, spline_order=spline_order,
               fused=fused)


def make_fastkan(num_features: int, hidden_dim: int, out_dim: int,
                 hidden_layers: int, grid_size: int,
                 fused: bool = False) -> nn.Module:
    """Reference `make_fastkan` (models.py:23-25)."""
    sizes = [num_features] + [hidden_dim] * (hidden_layers - 1) + [out_dim]
    return FastKAN(sizes, num_grids=grid_size, fused=fused)


def KAGCNConv(in_feat: int, out_feat: int, grid_size: int = 4,
              spline_order: int = 3, fused: bool = False) -> GCNConv:
    """Reference `KAGCNConv`/`KAGCN_Layer` (models.py:31-37): GCN with a
    B-spline KAN feature transform."""
    return GCNConv(in_feat, out_feat,
                   transform=kan_transform(grid_size, spline_order, fused))


def KAGATConv(in_feat: int, out_feat: int, heads: int, grid_size: int = 4,
              spline_order: int = 3, fused: bool = False) -> GATConv:
    """Reference `KAGATConv`/`KAGAT_Layer` (models.py:39-46)."""
    return GATConv(in_feat, out_feat, heads=heads,
                   transform=kan_transform(grid_size, spline_order, fused))


def GIKANLayer(in_feat: int, out_feat: int, grid_size: int = 4,
               spline_order: int = 3, hidden_dim: int = 16,
               nb_layers: int = 2, fused: bool = False) -> GINConv:
    """Reference `GIKANLayer` (models.py:48-56): GIN with a KAN update net."""
    return GINConv(make_kan(in_feat, hidden_dim, out_feat, nb_layers,
                            grid_size, spline_order, fused))


def FASTKAGCNConv(in_feat: int, out_feat: int, grid_size: int = 4,
                  fused: bool = False) -> GCNConv:
    """Reference `FASTKAGCNConv`/`FASTKAGCN_Layer` (models.py:68-74)."""
    return GCNConv(in_feat, out_feat,
                   transform=fastkan_transform(grid_size, fused))


def FASTKAGATConv(in_feat: int, out_feat: int, heads: int,
                  grid_size: int = 4, fused: bool = False) -> GATConv:
    """Reference `FASTKAGATConv` (models.py:76-83)."""
    return GATConv(in_feat, out_feat, heads=heads,
                   transform=fastkan_transform(grid_size, fused))


def GIFASTKANLayer(in_feat: int, out_feat: int, grid_size: int = 4,
                   hidden_dim: int = 16, nb_layers: int = 2,
                   fused: bool = False) -> GINConv:
    """Reference `GIFASTKANLayer` (models.py:85-92)."""
    return GINConv(make_fastkan(in_feat, hidden_dim, out_feat, nb_layers,
                                grid_size, fused))


def KAGINEConv(hidden_dim: int, hidden_layers: int, grid_size: int = 4,
               spline_order: int = 3, fused: bool = False) -> GINEConv:
    """GINE with a KAN update net (reference graph_regression/models.py:96-99)."""
    return GINEConv(make_kan(hidden_dim, hidden_dim, hidden_dim,
                             hidden_layers, grid_size, spline_order, fused))
