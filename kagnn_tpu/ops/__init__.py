from kagnn_tpu.ops import segment
from kagnn_tpu.ops.norm import MaskedBatchNorm
from kagnn_tpu.ops.segment import edge_axis, use_pallas_spmm
