"""End-to-end over the REAL artifact formats, synthesized on disk.

Creates the reference's exact file layout in a tmp dir — Partition_Q
jsons, QuesId/ImgId maps, ``*_obj36.h5`` features, NExT-QA CSVs +
``app_mot_*.h5`` — then drives the real VQADataModule / NextQADataModule
through a short CL run. This is the path real data will take.
"""

import csv
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.data.features import write_h5
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)

TASKS = ["q_recognition", "q_location"]


@pytest.fixture(scope="module")
def vqa_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    rng = np.random.default_rng(0)
    os.makedirs(root / "vqa" / "Partition_Q")
    os.makedirs(root / "COCO" / "features")

    ques_map, cate_map = {}, {}
    h5_records = []
    qid = 0
    for t_idx, task in enumerate(TASKS):
        for split in ("karpathy_train", "karpathy_val", "karpathy_test"):
            n = 40 if "train" in split else 10
            items = []
            for _ in range(n):
                img_id = f"COCO_val2014_{qid:012d}"
                c = int(rng.integers(0, 80))
                cate_map[img_id] = c
                ques_map[str(qid)] = t_idx
                ans = f"ans{c % 3}"
                items.append({
                    "img_id": img_id,
                    "question_id": qid,
                    "sent": f"what is category {c}",
                    "label": {ans: 1.0},
                    "answers": [{"answer": ans}] * 10,
                    "question_type": "what is",
                    "answer_type": "other",
                })
                feats = (np.full((36, 2048), c / 80.0, np.float32)
                         + 0.1 * rng.normal(size=(36, 2048)).astype(np.float32))
                boxes = rng.uniform(0, 50, (36, 4)).astype(np.float32)
                boxes[:, 2:] += boxes[:, :2]
                h5_records.append((img_id, {
                    "features": feats, "boxes": boxes.clip(0, 100),
                    "img_h": 100, "img_w": 100}))
                qid += 1
            with open(root / "vqa" / "Partition_Q"
                      / f"{split}_{task}.json", "w") as f:
                json.dump(items, f)
    with open(root / "QuesId_task_map.json", "w") as f:
        json.dump(ques_map, f)
    with open(root / "ImgId_cate_map.json", "w") as f:
        json.dump(cate_map, f)
    write_h5(str(root / "COCO" / "features" / "val2014_obj36.h5"),
             h5_records)
    return str(root)


def test_vqa_module_end_to_end(vqa_root, tmp_path):
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.data.vqa_module import VQADataModule

    cfg = Config()
    cfg.model = tiny_model_config(vocab_size=32200)
    cfg.model.feat_dim = 2048
    cfg.model.n_boxes = 36
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 8
    cfg.train.valid_batch_size = 8
    cfg.train.epochs = 1
    cfg.train.m_size = 10
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    data = VQADataModule(vqa_root, tok, tasks=TASKS)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
    metrics = trainer.train()
    res = trainer.result_matrix.to_dict()
    assert res["q_location"]["q_recognition"] >= 0
    assert np.isfinite(metrics["Avg_acc"])
    assert os.path.exists(os.path.join(cfg.output,
                                       "q_location_LAST.npz"))


@pytest.fixture(scope="module")
def nextqa_root(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("nextqa")
    rng = np.random.default_rng(1)
    os.makedirs(root / "Partition_Q_v2")
    os.makedirs(root / "vid_feat")
    vids, feats = [], []
    vid_n = 0
    for task in ("CW", "TN"):
        for mode in ("train", "val", "test"):
            n = 24 if mode == "train" else 8
            rows = []
            for _ in range(n):
                video = f"{3000 + vid_n}"
                vid_n += 1
                big = int(rng.integers(1, 81))
                rows.append({"video": video, "qid": "0",
                             "question": f"what happens {big}",
                             "answer": f"act{big % 3}", "type": task,
                             "bigCate": big})
                vids.append(video.encode())
                feats.append(rng.normal(size=(16, 4096)).astype(np.float32))
            with open(root / "Partition_Q_v2" / f"{mode}_{task}.csv",
                      "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=["video", "qid", "question",
                                                  "answer", "type",
                                                  "bigCate"])
                w.writeheader()
                w.writerows(rows)
    for mode in ("train", "val", "test"):
        with h5py.File(root / "vid_feat" / f"app_mot_{mode}.h5", "w") as f:
            f["ids"] = np.asarray(vids)
            f["feat"] = np.stack(feats)
    with open(root / "add_reference_answer_test.json", "w") as f:
        json.dump({}, f)
    return str(root)


def test_nextqa_from_root_end_to_end(nextqa_root, tmp_path):
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.nextqa.data import NextQADataModule

    cfg = Config()
    cfg.model = tiny_model_config(
        vocab_size=32200, max_text_length=23, n_boxes=16,
        target_max_length=6, feat_dim=2048, n_ques_types=8)
    cfg.train.lr = 1e-2
    cfg.train.batch_size = 8
    cfg.train.valid_batch_size = 8
    cfg.train.epochs = 1
    cfg.train.m_size = 10
    cfg.train.schedule = "linear_warmup"
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    data = NextQADataModule.from_root(nextqa_root, tok, tasks=["CW", "TN"])
    # motion half only (nextqa_data.py:143-149)
    some_video = next(iter(data.features["train"].table))
    assert data.features["train"].table[some_video].shape == (16, 2048)
    trainer = VQACLTrainer(cfg, data, tok, verbose=False, dtype=jnp.float32)
    metrics = trainer.train()
    assert np.isfinite(metrics["Avg_acc"])
    res = trainer.result_matrix.to_dict()
    assert res["TN"]["CW"] >= 0


def test_cli_end_to_end(vqa_root, tmp_path, monkeypatch):
    """vqacl_train CLI main() over the synthesized artifacts: train two
    tiny tasks, then eval-only mode over the saved checkpoints."""
    from vqacl_tpu.cli import vqacl_train
    import vqacl_tpu.data.vqa_module as vm

    # CLI uses ALL_TASKS; restrict to our two synthesized tasks
    monkeypatch.setattr(vm, "ALL_TASKS", TASKS)
    orig_init = vm.VQADataModule.__init__

    def patched(self, root, tok, tasks=TASKS, **kw):
        orig_init(self, root, tok, tasks=TASKS, **kw)

    monkeypatch.setattr(vm.VQADataModule, "__init__", patched)

    out = str(tmp_path / "cli_snap")
    args = ["--dataset_root", vqa_root, "--output", out, "--tiny_model",
            "--batch_size", "8", "--valid_batch_size", "8",
            "--epochs", "1", "--m_size", "10", "--memory",
            "--from_scratch", "--lr", "1e-2", "--dtype", "float32",
            "--now_train"]
    vqacl_train.main(args)
    assert os.path.exists(os.path.join(out, "q_location_LAST.npz"))
    assert os.path.exists(os.path.join(out, "metrics.json"))
    # eval-only (reference VQACL.sh without --now_train)
    vqacl_train.main([a for a in args if a != "--now_train"])


def test_nextqa_cli_end_to_end(nextqa_root, tmp_path, monkeypatch):
    """nextqa_train CLI main() over the synthesized reference-format
    artifacts (CSV partitions + app_mot h5 + add-reference json,
    nextqa/train.sh semantics): geometry overrides (23-token text /
    16 clips / 6-token answers / 8 question types), linear schedule,
    λ_Q=λ_V=0, and the comp gate disabled at the shipped G-1."""
    from vqacl_tpu.cl.comp_trainer import comp_enabled
    from vqacl_tpu.cli import nextqa_train
    from vqacl_tpu.nextqa.data import NEXTQA_SPLITS, NextQADataModule

    # the gate nextqa_train.main dispatches on (nextqa_CL.py:421-423)
    assert not comp_enabled("G-1", NEXTQA_SPLITS)
    assert comp_enabled("G2", NEXTQA_SPLITS)

    # CLI builds all 8 tasks by default; restrict to the synthesized two
    orig = NextQADataModule.from_root.__func__
    monkeypatch.setattr(
        NextQADataModule, "from_root",
        classmethod(lambda cls, root, tok, tasks=None, **kw:
                    orig(cls, root, tok, tasks=["CW", "TN"], **kw)))

    out = str(tmp_path / "nextqa_snap")
    args = ["--dataset_root", nextqa_root, "--output", out, "--tiny_model",
            "--batch_size", "8", "--valid_batch_size", "8",
            "--epochs", "1", "--m_size", "10", "--memory",
            "--from_scratch", "--lr", "1e-2", "--dtype", "float32",
            "--proto_alpha", "0.3", "--proto_beta", "0.5",
            "--now_train"]
    nextqa_train.main(args)
    assert os.path.exists(os.path.join(out, "TN_LAST.npz"))
    assert os.path.exists(os.path.join(out, "metrics.json"))
    # eval-only (train.sh without --now_train)
    nextqa_train.main([a for a in args if a != "--now_train"])
