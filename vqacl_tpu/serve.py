"""Batched inference API: checkpoint in, answers out.

The reference's deploy config (cog.yaml:28) points at a ``predict.py``
that is absent from its repo (SURVEY §2.5); this is the working
equivalent, shaped for production serving: one compiled decode program,
static batch buckets, feature store injection (h5 / native pack /
in-memory), optional on-the-fly region extraction for raw images.

    predictor = VQAPredictor.from_checkpoint("snap/vqacl/q_causal_LAST",
                                             tokenizer, feature_store)
    answers = predictor.answer(["what color is the cat?"], ["COCO_..._42"])
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from vqacl_tpu.data.collate import collate
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.train.checkpoint import load_checkpoint
from vqacl_tpu.train.step import make_eval_step
from vqacl_tpu.utils.config import Config


class VQAPredictor:
    def __init__(self, cfg: Config, params, proto: ProtoState, tokenizer,
                 feature_store, batch_size: int = 16,
                 num_beams: int = 1, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.proto = proto
        self.tok = tokenizer
        self.features = feature_store
        self.batch_size = batch_size
        self._eval = make_eval_step(cfg, dtype=dtype, num_beams=num_beams)

    @classmethod
    def from_checkpoint(cls, path: str, tokenizer, feature_store,
                        cfg: Optional[Config] = None, **kw) -> "VQAPredictor":
        params, proto, _ = load_checkpoint(path)
        return cls(cfg or Config(), params, proto, tokenizer,
                   feature_store, **kw)

    def _examples(self, questions: Sequence[str],
                  img_ids: Sequence[str]) -> List[Dict]:
        out = []
        for q, img in zip(questions, img_ids):
            feats, boxes = self.features.get(img)
            out.append({
                "input_ids": self.tok.encode(
                    f"vqa: {q}", max_length=self.cfg.model.max_text_length),
                "vis_feats": feats, "boxes": boxes,
                "ques_label": 0, "cate_label": 0,
            })
        return out

    def answer(self, questions: Sequence[str],
               img_ids: Sequence[str]) -> List[str]:
        """Batched answers (padded to the static batch size)."""
        assert len(questions) == len(img_ids)
        exs = self._examples(questions, img_ids)
        m = self.cfg.model
        answers: List[str] = []
        for s in range(0, len(exs), self.batch_size):
            chunk = exs[s:s + self.batch_size]
            b = collate(chunk, max_text_length=m.max_text_length,
                        n_boxes=m.n_boxes,
                        target_max_length=m.target_max_length,
                        n_ques_types=m.n_ques_types,
                        n_categories=m.n_categories, feat_dim=m.feat_dim,
                        pad_to_batch=self.batch_size, with_targets=False)
            tokens = np.asarray(self._eval(self.params, self.proto,
                                           b["tensors"]))
            answers.extend(self.tok.batch_decode(tokens[:len(chunk)]))
        return answers
