from kagnn_tpu.kan.layers import KAN, KANLinear, FastKAN, FastKANLayer
from kagnn_tpu.kan import bspline, rbf
