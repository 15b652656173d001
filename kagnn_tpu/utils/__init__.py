from kagnn_tpu.utils import port, profiling
from kagnn_tpu.utils.platform import apply_platform_env
