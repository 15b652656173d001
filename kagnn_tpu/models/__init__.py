from kagnn_tpu.models.node import NodeClassifier
from kagnn_tpu.models.graph import GraphClassifier
from kagnn_tpu.models.regression import GraphRegressor
