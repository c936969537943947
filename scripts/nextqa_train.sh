#!/bin/bash
# NExT-QA continual learning (counterpart of VL-T5/nextqa/train.sh:
# bs 80, 3 epochs, M=500, alpha 0.3, beta 0.5, seed 6666).
name=NExT_QA
output=snap/$name

PYTHONPATH=$PYTHONPATH:./ \
python -m vqacl_tpu.cli.nextqa_train \
    --dataset_root datasets/nextqa \
    --batch_size 80 \
    --valid_batch_size 100 \
    --epochs 3 \
    --lr 1e-4 \
    --output $output \
    --from_scratch \
    --memory --m_size 500 \
    --proto_alpha 0.3 --proto_beta 0.5 \
    --seed 6666 \
    --now_train \
    "$@"
