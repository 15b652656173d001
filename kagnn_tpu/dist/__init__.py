from kagnn_tpu.dist.mesh import make_mesh
from kagnn_tpu.dist.sharded import (make_sharded_train_step,
                                    shard_stacked_batch, stack_batches)
