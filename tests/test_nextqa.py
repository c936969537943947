"""NExT-QA path: WUPS scoring, data module, and a 2-task CL smoke run."""

import numpy as np
import pytest

import jax.numpy as jnp

from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.evaluation.wups import get_wups, remove_stopwords
from vqacl_tpu.nextqa.data import (
    NEXTQA_SPLITS_0BASED, NextQADataModule, NextQAEvaluator,
    VideoFeatureStore, dummy_boxes, items_from_rows,
)

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_wups_basics():
    assert get_wups("dog", "dog", 0) == 1.0
    assert get_wups("", "", 0) == 1.0
    assert get_wups("dog", "", 0) == 0.0
    # without WordNet corpus: distinct words → 0; with it, > 0
    s = get_wups("dog", "cat", 0)
    assert 0.0 <= s <= 1.0
    # multiword: min over both directions
    assert get_wups("red dog", "red dog", 0) == 1.0
    assert get_wups("red dog", "red", 0) < 1.0 or \
        get_wups("red dog", "red", 0) == pytest.approx(
            min(1.0 * get_wups("dog", "red", 0), 1.0), abs=1e-6)


def test_remove_stopwords():
    assert remove_stopwords("the dog is running") == "dog running"
    assert remove_stopwords("a an the") == ""


def test_evaluator_cc_exact_and_wups():
    id2datum = {
        "v1_0": {"gt_answer": "yes", "type": "CC", "video": "v1", "qid": "0"},
        "v2_1": {"gt_answer": "running fast", "type": "CW",
                 "video": "v2", "qid": "1"},
    }
    ev = NextQAEvaluator(id2datum)
    out = ev.evaluate_raw({"v1_0": "yes", "v2_1": "running fast"})
    assert out["overall"] == 100.0
    out = ev.evaluate_raw({"v1_0": "no", "v2_1": "running fast"})
    assert out["overall"] == 50.0


def test_evaluator_add_reference():
    id2datum = {"v1_0": {"gt_answer": "yes", "type": "CC",
                         "video": "v1", "qid": "0"}}
    ev = NextQAEvaluator(id2datum, add_reference={"v1": {"0": "no"}})
    assert ev.evaluate_raw({"v1_0": "no"})["overall"] == 100.0


def make_synthetic_module(tok, tasks=("CW", "TN"), n=40, seed=0):
    rng = np.random.default_rng(seed)
    feats = VideoFeatureStore()
    rows = {}
    vid = 0
    for t_idx, task in enumerate(tasks):
        rows[task] = {}
        for split, count in (("train", n), ("val", 8), ("test", 8)):
            rs = []
            for _ in range(count):
                big = int(rng.integers(1, 81))
                video = f"vid{vid}"
                vid += 1
                feats.put(video, rng.normal(
                    size=(16, 2048)).astype(np.float32) * 0.1 + big / 80.0)
                rs.append({"video": video, "qid": "0",
                           "question": f"what is happening {big}",
                           "answer": f"ans{big % 3}", "type": task,
                           "bigCate": big})
            rows[task][split] = items_from_rows(rs)
    return NextQADataModule(tok, rows,
                            {m: feats for m in ("train", "val", "test")},
                            tasks=list(tasks))


def test_data_module_shapes():
    tok = VLT5Tokenizer()
    mod = make_synthetic_module(tok)
    ds = mod.dataset("CW", "train", task_idx=0)
    ex = ds.example(0)
    assert ex["vis_feats"].shape == (16, 2048)
    assert ex["boxes"].shape == (16, 4)
    np.testing.assert_allclose(ex["boxes"], dummy_boxes())
    assert len(ex["input_ids"]) <= 23
    assert len(ex["target_ids"]) <= 6
    assert 0 <= ex["cate_label"] <= 79


def test_nextqa_cl_smoke(tmp_path):
    """2-task NExT-QA CL loop through the shared trainer."""
    from vqacl_tpu.cl.trainer import VQACLTrainer
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config(
        vocab_size=32200, max_text_length=23, n_boxes=16,
        target_max_length=6, feat_dim=2048, n_ques_types=8)
    cfg.train.lr = 5e-3
    cfg.train.batch_size = 8
    cfg.train.valid_batch_size = 8
    cfg.train.epochs = 1
    cfg.train.m_size = 20
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    mod = make_synthetic_module(tok, tasks=("CW", "TN"), n=40)
    trainer = VQACLTrainer(cfg, mod, tok, verbose=False, dtype=jnp.float32)
    metrics = trainer.train()
    res = trainer.result_matrix.to_dict()
    assert res["TN"]["CW"] >= 0
    assert np.isfinite(metrics["Avg_acc"])


def test_nextqa_comp_trainer_smoke(tmp_path):
    """NExT-QA through the composition trainer (nextqa_CL.py:420-423
    runs comp+noncomp tests per task)."""
    from vqacl_tpu.cl.comp_trainer import CompVQACLTrainer
    from vqacl_tpu.utils.config import Config, tiny_model_config

    cfg = Config()
    cfg.model = tiny_model_config(
        vocab_size=32200, max_text_length=23, n_boxes=16,
        target_max_length=6, feat_dim=2048, n_ques_types=8)
    cfg.train.lr = 5e-3
    cfg.train.batch_size = 8
    cfg.train.valid_batch_size = 8
    cfg.train.epochs = 1
    cfg.train.m_size = 10
    cfg.train.comp_cate = "G2"
    cfg.output = str(tmp_path)

    tok = VLT5Tokenizer()
    mod = make_synthetic_module(tok, tasks=("CW", "TN"), n=40)
    trainer = CompVQACLTrainer(cfg, mod, tok, verbose=False,
                               dtype=jnp.float32)
    out = trainer.train()
    assert set(out) == {"standard", "comp", "noncomp"}
    # holdout honored: G2 trained only on the first task
    groups = [(e["task"], e["group"]) for e in trainer.metrics_log]
    assert ("TN", "G2") not in groups
