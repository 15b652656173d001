"""Device-mesh helpers.

The reference has no distributed code at all (SURVEY.md §2.4 N8/N9); the
TPU-native scaling design is GSPMD over a named `jax.sharding.Mesh`:

  * axis "data"  — data parallelism over stacked padded GraphBatches;
  * axis "graph" — edge-partition graph parallelism *within* a batch
    (the GNN analogue of context/sequence parallelism): edge arrays are
    sharded, node arrays replicated, and XLA turns each partial
    segment-sum into local scatter + all-reduce over ICI.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("data", "graph"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on axis 'data' x 1 'graph'. Pass shape=(d, g) to
    split explicitly (d * g must equal the device count used).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def graph_batch_shardings(mesh: Mesh, stacked: bool = True,
                          data_axis: str = "data",
                          edge_axis: str | None = "graph"):
    """Per-leaf shardings for a (stacked) GraphBatch pytree.

    Edge-indexed leaves get (data, graph) sharding — the edge partition;
    node/graph-indexed leaves get (data,) and are replicated across the
    edge axis (each edge shard needs all node features of its replica —
    the halo is realized by XLA as all-reduce of partial aggregates).
    """
    from kagnn_tpu.graphs.batch import GraphBatch

    lead = (data_axis,) if stacked else ()

    def spec_for(name: str):
        if name in ("senders", "receivers", "edge_mask", "edges"):
            ax = lead + ((edge_axis,) if edge_axis else ())
            return P(*ax)
        if name in ("n_node", "n_edge", "n_graph"):
            return P(*lead)
        return P(*lead)  # node/graph leaves: replicated over edge axis

    def build(g: GraphBatch):
        import dataclasses

        specs = {}
        for f in dataclasses.fields(g):
            v = getattr(g, f.name)
            specs[f.name] = None if v is None else NamedSharding(
                mesh, spec_for(f.name))
        return dataclasses.replace(
            g, **{k: jax.device_put(getattr(g, k), s)
                  for k, s in specs.items() if s is not None})

    return build
