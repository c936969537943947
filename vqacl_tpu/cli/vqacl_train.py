"""VQACL training entry point (reference: scripts/VQACL_train.sh →
src/vqacl.py; comp variant: scripts/VQACL_COMP_train.sh → vqacl_comp.py).

    python -m vqacl_tpu.cli.vqacl_train --memory --m_size 5000 \
        --comp_cate G-1 --now_train --from_scratch --output snap/vqacl

Eval-only (the reference's ``VQACL.sh`` without ``--now_train``): omit
``--now_train`` to run ``Test()`` over saved per-task checkpoints.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from vqacl_tpu.cli.args import install_cli_runtime, parse_config
from vqacl_tpu.cl.comp_trainer import CompVQACLTrainer, comp_enabled
from vqacl_tpu.cl.tasks import CATEGORY_SPLITS
from vqacl_tpu.cl.trainer import VQACLTrainer
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.data.vqa_module import VQADataModule
from vqacl_tpu.parallel import make_mesh


def main(argv=None) -> None:
    cfg = parse_config(argv)
    cli = cfg._cli
    install_cli_runtime(cli)
    tok = VLT5Tokenizer(vocab_file=cli.tokenizer)
    data = VQADataModule(cfg.data.dataset_root, tok,
                         train_split=cfg.data.train_split,
                         valid_split=cfg.data.valid_split,
                         test_split=cfg.data.test_split,
                         train_topk=cfg.data.train_topk,
                         valid_topk=cfg.data.valid_topk,
                         seed=cfg.train.seed)
    ctx = make_mesh(dp=cfg.mesh.dp, tp=cfg.mesh.tp, pp=cfg.mesh.pp)
    dtype = jnp.bfloat16 if cfg.mesh.dtype == "bfloat16" else jnp.float32

    init_params = None
    # --tiny_model never loads the t5-base backbone: the shapes cannot
    # match, and on an offline box the hub lookup hangs through minutes
    # of DNS retry/backoff before failing
    if not cfg.train.from_scratch and cfg.backbone \
            and not getattr(cli, "tiny_model", False):
        from vqacl_tpu.models.hf_import import load_t5_base
        try:
            init_params = load_t5_base(cfg.model, cfg.backbone)
            print(f"loaded pretrained backbone {cfg.backbone}")
        except Exception as e:  # offline images: fall back to scratch
            print(f"pretrained load failed ({e}); training from scratch")

    cls = CompVQACLTrainer if comp_enabled(cli.comp_cate, CATEGORY_SPLITS) \
        else VQACLTrainer
    trainer = cls(cfg, data, tok, mesh_ctx=ctx, init_params=init_params,
                  dtype=dtype)
    if cli.now_train:
        resume = None if cli.checkpoint in ("None", None) else cli.checkpoint
        trainer.train(resume_task=resume)
    else:
        metrics = trainer.Test()
        print(metrics)


if __name__ == "__main__":
    main(sys.argv[1:])
