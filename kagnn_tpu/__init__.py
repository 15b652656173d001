"""kagnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the KAGNN
model family (Kolmogorov-Arnold Networks meet Graph Learning).

Built from scratch against the capability surface of RomanBresson/KAGNN
(see SURVEY.md at the repo root): 2 KAN basis families x 4 conv types x
3 task verticals, plus data pipelines, HPO, fused Pallas kernels, and
multi-chip graph-parallel training the reference lacks.
"""

__version__ = "0.1.0"
