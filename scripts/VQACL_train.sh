#!/bin/bash
# VQACL standard training (counterpart of the reference
# VL-T5/scripts/VQACL_train.sh — same hyperparameters, TPU runtime;
# no torch.distributed.launch: one process drives the whole mesh).
name=VQACL
output=snap/$name

PYTHONPATH=$PYTHONPATH:./ \
python -m vqacl_tpu.cli.vqacl_train \
    --train karpathy_train \
    --valid karpathy_val \
    --test karpathy_test \
    --batch_size 80 \
    --valid_batch_size 100 \
    --epochs 3 \
    --lr 1e-4 \
    --warmup_ratio 0.1 \
    --clip_grad_norm 5 \
    --output $output \
    --from_scratch \
    --memory --m_size 5000 \
    --comp_cate G-1 \
    --now_train \
    "$@"
