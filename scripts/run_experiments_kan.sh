#!/usr/bin/env bash
# Node-classification sweep, KAN architecture (counterpart of reference
# node_classification_clean/scripts/run_experiments_kan.sh).
set -e
cd "$(dirname "$0")/.."
for DATASET in Cora CiteSeer Texas Cornell Wisconsin Actor ogbn-arxiv; do
  for CONV in gcn gin gat; do
    python experiments/node_classification.py --dataset "$DATASET" \
      --architecture kan --conv_type "$CONV" "$@"
  done
done
