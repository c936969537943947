#!/bin/bash
# Novel-composition training: hold out G5 during training, comp/noncomp
# test matrices (counterpart of VL-T5/scripts/VQACL_COMP_train.sh).
name=VQACL_COMP
output=snap/$name

PYTHONPATH=$PYTHONPATH:./ \
python -m vqacl_tpu.cli.vqacl_train \
    --batch_size 80 \
    --valid_batch_size 100 \
    --epochs 3 \
    --lr 1e-4 \
    --output $output \
    --from_scratch \
    --memory --m_size 5000 \
    --comp_cate G5 \
    --now_train \
    "$@"
