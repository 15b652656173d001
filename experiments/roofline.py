"""Per-kernel roofline report for the fused KAN kernels (BASELINE.md
deliverable: fused spline kernel throughput vs speed-of-light).

    python experiments/roofline.py --n 131072 --d 64 --o 64
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--o", type=int, default=64)
    p.add_argument("--grid_size", type=int, default=4)
    p.add_argument("--spline_order", type=int, default=3)
    p.add_argument("--num_grids", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from kagnn_tpu.utils.profiling import kernel_report

    rows = kernel_report(args.n, args.d, args.o, args.grid_size,
                         args.spline_order, args.num_grids, args.iters)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
