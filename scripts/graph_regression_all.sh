#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/.."
for GNN in GIN GCN; do
  for MODEL in KAN FASTKAN MLP; do
    python experiments/graph_regression.py --dataset ZINC --gnn-type "$GNN" \
      --model-type "$MODEL" "$@"
    python experiments/graph_regression.py --dataset QM9 --gnn-type "$GNN" \
      --model-type "$MODEL" "$@"
  done
done
