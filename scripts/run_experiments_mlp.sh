#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/.."
for DATASET in Cora CiteSeer Texas Cornell Wisconsin Actor ogbn-arxiv; do
  for CONV in gcn gin gat; do
    python experiments/node_classification.py --dataset "$DATASET" \
      --architecture mlp --conv_type "$CONV" "$@"
  done
done
