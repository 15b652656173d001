from kagnn_tpu.utils import port
