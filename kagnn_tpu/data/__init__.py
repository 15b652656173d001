from kagnn_tpu.data.registry import (DATASET_LAYERS, GRAPH_DATASETS,
                                     NODE_DATASETS, load_graph_dataset,
                                     load_node_dataset,
                                     load_regression_dataset)
from kagnn_tpu.data.splits import fold_indices, load_splits
from kagnn_tpu.data import synthetic, transforms
