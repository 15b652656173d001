from kagnn_tpu.pallas.bspline_fused import bspline_kan_matmul, kan_linear_fused
from kagnn_tpu.pallas.rbf_fused import fastkan_fused, rbf_spline_matmul
