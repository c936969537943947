"""NExT-QA continual-learning entry point (reference: nextqa/train.sh →
nextqa/nextqa_CL.py).

    python -m vqacl_tpu.cli.nextqa_train --dataset_root /path/nextqa \
        --memory --m_size 500 --proto_alpha 0.3 --proto_beta 0.5 \
        --seed 6666 --now_train --output snap/nextqa
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp

from vqacl_tpu.cli.args import install_cli_runtime, parse_config
from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.nextqa.data import (ANS_LEN, N_CLIPS, TEXT_LEN,
                                   NextQADataModule)
from vqacl_tpu.parallel import make_mesh


def main(argv=None) -> None:
    cfg = parse_config(argv)
    cli = cfg._cli
    install_cli_runtime(cli)
    # NExT-QA geometry (nextqa_data.py:172-207) + linear LR schedule
    # (nextqa/trainer_base.py:207)
    cfg.model.max_text_length = TEXT_LEN
    cfg.model.n_boxes = N_CLIPS
    cfg.model.target_max_length = ANS_LEN
    cfg.model.n_ques_types = 8
    cfg.train.schedule = "linear_warmup"
    # nextqa train_step has no λ memory-loss terms (nextqa_CL.py:445)
    cfg.train.lambda_Q = 0.0
    cfg.train.lambda_V = 0.0

    tok = VLT5Tokenizer(vocab_file=cli.tokenizer)
    data = NextQADataModule.from_root(
        cfg.data.dataset_root, tok,
        add_reference_path=os.path.join(cfg.data.dataset_root,
                                        "add_reference_answer_test.json"))
    ctx = make_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp, pp=cfg.mesh.pp)
    dtype = jnp.bfloat16 if cfg.mesh.dtype == "bfloat16" else jnp.float32
    # nextqa_CL.py runs comp/noncomp tests per task iff comp_cate is a
    # real group key (:421-423: ``if composition_test_cate in
    # Category_splits``); the shipped G-1 therefore disables them
    from vqacl_tpu.cl.comp_trainer import CompVQACLTrainer, comp_enabled
    from vqacl_tpu.nextqa.data import NEXTQA_SPLITS
    cls = CompVQACLTrainer if comp_enabled(cli.comp_cate, NEXTQA_SPLITS) \
        else VQACLTrainer
    trainer = cls(cfg, data, tok, mesh_ctx=ctx, dtype=dtype)
    if cli.now_train:
        resume = None if cli.checkpoint in ("None", None) else cli.checkpoint
        trainer.train(resume_task=resume)
    else:
        print(trainer.Test())


if __name__ == "__main__":
    main(sys.argv[1:])
