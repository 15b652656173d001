"""kagnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the KAGNN
model family (Kolmogorov-Arnold Networks meet Graph Learning).

Built from scratch against the capability surface of RomanBresson/KAGNN
(see SURVEY.md at the repo root): 2 KAN basis families x 4 conv types x
3 task verticals, plus data pipelines, HPO, fused Pallas kernels, and
multi-chip graph-parallel training the reference lacks.
"""

__version__ = "0.1.0"

from kagnn_tpu.graphs import GraphBatch, PadSpec, batch_graphs, pad_spec_for, single_graph  # noqa: E402,F401
from kagnn_tpu.models import GraphClassifier, GraphRegressor, NodeClassifier  # noqa: E402,F401
from kagnn_tpu.kan import KAN, KANLinear, FastKAN, FastKANLayer  # noqa: E402,F401
