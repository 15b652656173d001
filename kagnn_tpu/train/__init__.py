from kagnn_tpu.train import hpo, losses
from kagnn_tpu.train.loops import (EarlyStopper, TrainState,
                                   create_train_state, make_graph_cls_steps,
                                   make_graph_reg_steps, make_node_steps,
                                   train_graph_epochs)
from kagnn_tpu.train.prefetch import prefetch_to_device
from kagnn_tpu.train import checkpoint, experiments
