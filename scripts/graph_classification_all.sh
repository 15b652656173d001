#!/usr/bin/env bash
# Graph-classification sweep (counterpart of reference
# graph_classification/scripts/ + all_expes.sh). Batch sizes per dataset
# follow the reference scripts (MUTAG 32, NCI1 129, DD 64, default 64).
set -e
cd "$(dirname "$0")/.."
declare -A BS=( [MUTAG]=32 [NCI1]=129 [DD]=64 [PROTEINS_full]=64 \
                [ENZYMES]=64 [IMDB-BINARY]=64 [IMDB-MULTI]=64 )
for ARCH in kan fastkan mlp; do
  for DATASET in MUTAG PROTEINS_full NCI1 DD ENZYMES IMDB-BINARY IMDB-MULTI; do
    for MODEL in GIN GCN GAT; do
      python experiments/graph_classification.py --dataset "$DATASET" \
        --model_type "$MODEL" --architecture "$ARCH" \
        --batch-size "${BS[$DATASET]:-64}" "$@"
    done
  done
done
