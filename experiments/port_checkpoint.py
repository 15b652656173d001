"""Port reference (torch) KAN weights into kagnn_tpu checkpoints.

Reads a torch state_dict saved with torch.save (the reference saves these at
node_classification_clean/utils.py:163 and whole-model pickles in the graph
drivers) and writes the corresponding kagnn_tpu variables as an Orbax
checkpoint. Supports the pure-KAN module families (KANLinear/KAN stacks,
FastKANLayer/FastKAN stacks) — the parity anchor; full PyG-model porting
additionally needs the conv-internal tensors, which map through the same
layer-level porters in kagnn_tpu.utils.port.

    python experiments/port_checkpoint.py --torch_file model.pt \
        --family kan --layers 2 --out ckpt_dir
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kagnn_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_file", required=True)
    p.add_argument("--family", choices=["kan", "fastkan", "kan_linear",
                                        "fastkan_layer"], required=True)
    p.add_argument("--layers", type=int, default=1,
                   help="number of stacked layers (kan/fastkan families)")
    p.add_argument("--prefix", default="", help="state_dict key prefix")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    args = p.parse_args()

    import torch

    import orbax.checkpoint as ocp

    from kagnn_tpu.utils import port

    obj = torch.load(args.torch_file, map_location="cpu",
                     weights_only=False)
    sd = obj if isinstance(obj, dict) else obj.state_dict()

    if args.family == "kan_linear":
        params, buffers = port.port_kan_linear(sd, args.prefix)
        variables = {"params": params, "buffers": buffers}
    elif args.family == "kan":
        params, buffers = port.port_kan(sd, args.layers, args.prefix)
        variables = {"params": params, "buffers": buffers}
    elif args.family == "fastkan_layer":
        variables = {"params": port.port_fastkan_layer(sd, args.prefix)}
    else:
        variables = {"params": port.port_fastkan(sd, args.layers,
                                                 args.prefix)}

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), variables, force=True)
    ckptr.wait_until_finished()
    import jax

    n = sum(int(x.size) for x in jax.tree.leaves(variables))
    print(f"ported {args.family} ({n} parameters) -> {args.out}")


if __name__ == "__main__":
    main()
