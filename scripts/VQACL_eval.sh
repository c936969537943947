#!/bin/bash
# Eval-only over saved per-task checkpoints (counterpart of
# VL-T5/scripts/VQACL.sh without --now_train).
output=${1:-snap/VQACL}
shift || true

PYTHONPATH=$PYTHONPATH:./ \
python -m vqacl_tpu.cli.vqacl_train \
    --valid_batch_size 100 \
    --output $output \
    "$@"
