"""Static-shape batch collation.

The reference pads each batch to its own max length
(``vqa_data_memory.py:291-400``) — fine for CUDA, a recompilation storm
for XLA. Here every batch is padded to the GLOBAL static geometry
(text 20, boxes 36, answer 10; SURVEY.md §7.3 "variable-length
batches"): identical semantics via masks, one compiled program.

Produces exactly the tensor set the compiled steps consume:
  input_ids   [B, L]   int32, pad=0
  vis_feats   [B, N, 2048] float32
  boxes       [B, N, 4]    float32 (x1,y1,x2,y2 normalized to [0,1])
  target_ids  [B, T]   int32, -100 on padding (vqa_data_memory.py:366-368)
  scores      [B]      float32 (per-sample answer weight, :276)
  ques_labels [B, 10]  float32 one-hot (collate :390-394)
  cate_labels [B, 80]  float32 one-hot
Plus host-side metadata (question_ids, sents, answers) kept as lists.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np


def collate(examples: Sequence[Dict[str, Any]],
            max_text_length: int = 20,
            n_boxes: int = 36,
            target_max_length: int = 10,
            n_ques_types: int = 10,
            n_categories: int = 80,
            feat_dim: int = 2048,
            pad_to_batch: Optional[int] = None,
            with_targets: bool = True) -> Dict[str, Any]:
    """examples: dicts with input_ids (list[int]), vis_feats [N,2048],
    boxes [N,4], target_ids (list[int]), score (float), ques_label (int),
    cate_label (int), question_id, sent, answers (optional)."""
    B = len(examples)
    Bp = pad_to_batch or B
    L, N, T = max_text_length, n_boxes, target_max_length

    # slot mode: examples carry HBM-cache slot indices instead of raw
    # features (data/device_cache.py); pad rows get slot -1 → zeros
    slot_mode = B > 0 and "slot" in examples[0]

    input_ids = np.zeros((Bp, L), np.int32)
    if slot_mode:
        slots = np.full((Bp,), -1, np.int32)
        vis_feats = boxes = None
    else:
        vis_feats = np.zeros((Bp, N, feat_dim), np.float32)
        boxes = np.zeros((Bp, N, 4), np.float32)
    scores = np.zeros((Bp,), np.float32)
    ques_labels = np.zeros((Bp, n_ques_types), np.float32)
    cate_labels = np.zeros((Bp, n_categories), np.float32)
    target_ids = np.full((Bp, T), -100, np.int32) if with_targets else None
    # DER replay batches carry the logits stored at buffer-insert time
    # (cl/trainer.py::_der_capture); f16 on host, cast on device. Pad
    # rows stay zero — their targets are all -100 so the loss masks them.
    der_logits = None
    if B > 0 and with_targets and "der_logits" in examples[0]:
        V = int(np.asarray(examples[0]["der_logits"]).shape[-1])
        der_logits = np.zeros((Bp, T, V), np.float16)

    question_ids, sents, answers = [], [], []
    for i, ex in enumerate(examples):
        ids = ex["input_ids"][:L]
        input_ids[i, :len(ids)] = ids
        if slot_mode:
            slots[i] = ex["slot"]
        else:
            vis_feats[i] = ex["vis_feats"]
            boxes[i] = np.clip(ex["boxes"], 0.0, 1.0)
        if with_targets and "target_ids" in ex:
            t = ex["target_ids"][:T]
            target_ids[i, :len(t)] = t
            scores[i] = ex.get("score", 1.0)
        if der_logits is not None:
            z = np.asarray(ex["der_logits"], np.float16)
            der_logits[i, :z.shape[0]] = z[:T]
        ques_labels[i, ex["ques_label"]] = 1.0
        cate_labels[i, ex["cate_label"]] = 1.0
        question_ids.append(ex.get("question_id", i))
        sents.append(ex.get("sent", ""))
        answers.append(ex.get("answers"))

    batch: Dict[str, Any] = {
        "input_ids": input_ids,
        "scores": scores,
        "ques_labels": ques_labels,
        "cate_labels": cate_labels,
    }
    if slot_mode:
        batch["slots"] = slots
    else:
        batch["vis_feats"] = vis_feats
        batch["boxes"] = boxes
    if with_targets:
        batch["target_ids"] = target_ids
    if der_logits is not None:
        batch["der_logits"] = der_logits
    meta = {"question_ids": question_ids, "sents": sents,
            "answers": answers, "n_real": B}
    return {"tensors": batch, "meta": meta}
