from kagnn_tpu.dist.mesh import make_mesh
from kagnn_tpu.dist.sharded import (make_sharded_train_step,
                                    shard_stacked_batch, stack_batches)
from kagnn_tpu.dist.init import initialize_multihost
from kagnn_tpu.dist.partition import (make_edge_partitioned_node_step,
                                      scaling_report)
