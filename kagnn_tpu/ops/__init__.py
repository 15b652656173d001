from kagnn_tpu.ops import segment
from kagnn_tpu.ops.norm import MaskedBatchNorm
