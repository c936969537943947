"""Serving API + LXMERT tsv converter."""

import base64
import os

import numpy as np

import jax
import jax.numpy as jnp

from vqacl_tpu.data.features import MemoryFeatureStore
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

import pytest

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


def test_predictor_roundtrip(tmp_path, rng):
    """Save a checkpoint, load through VQAPredictor, get string answers."""
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.serve import VQAPredictor
    from vqacl_tpu.train.checkpoint import save_checkpoint

    cfg = Config()
    cfg.model = tiny_model_config(vocab_size=32200)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, proto, step=0)

    store = MemoryFeatureStore()
    for i in range(3):
        store.put(f"img{i}",
                  rng.normal(size=(cfg.model.n_boxes,
                                   cfg.model.feat_dim)).astype(np.float32),
                  rng.uniform(0, 1, (cfg.model.n_boxes, 4)).astype(np.float32))

    tok = VLT5Tokenizer()
    pred = VQAPredictor.from_checkpoint(path, tok, store, cfg=cfg,
                                        batch_size=2, dtype=jnp.float32)
    answers = pred.answer(["what is this?", "is it red?", "how many?"],
                          ["img0", "img1", "img2"])
    assert len(answers) == 3
    assert all(isinstance(a, str) for a in answers)


def test_tsv_roundtrip(tmp_path, rng):
    from vqacl_tpu.data.features import H5FeatureStore
    from vqacl_tpu.data.tsv_convert import load_obj_tsv, tsv_to_h5

    n = 36
    feats = rng.normal(size=(n, 2048)).astype(np.float32)
    boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
    row = "\t".join([
        "COCO_test_1", "90", "120",
        base64.b64encode(np.arange(n, dtype=np.int64).tobytes()).decode(),
        base64.b64encode(np.ones(n, np.float32).tobytes()).decode(),
        base64.b64encode(np.zeros(n, np.int64).tobytes()).decode(),
        base64.b64encode(np.ones(n, np.float32).tobytes()).decode(),
        str(n),
        base64.b64encode(boxes.tobytes()).decode(),
        base64.b64encode(feats.tobytes()).decode(),
    ])
    tsv = tmp_path / "test.tsv"
    tsv.write_text(row + "\n")

    rows = list(load_obj_tsv(str(tsv)))
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0]["features"], feats)
    assert rows[0]["img_h"] == 90

    h5p = str(tmp_path / "out_obj36.h5")
    assert tsv_to_h5([str(tsv)], h5p) == 1
    store = H5FeatureStore({"COCO_test": h5p})
    f, b = store.get("COCO_test_1")
    np.testing.assert_allclose(f, feats)
    assert b.max() <= 1.0


def test_subset_h5(tmp_path):
    """coco_val_compact.py parity: subset an h5 by id list (dict or str)."""
    import numpy as np

    from vqacl_tpu.data.features import subset_h5, write_h5

    src = str(tmp_path / "all.h5")
    recs = [(f"img_{i}", {"features": np.full((4, 8), i, np.float32),
                          "boxes": np.ones((4, 4), np.float32),
                          "img_h": 10, "img_w": 12}) for i in range(5)]
    write_h5(src, recs)
    dst = str(tmp_path / "subset.h5")
    n = subset_h5(src, dst, [{"img_id": "img_1"}, "img_3", "img_9"])
    assert n == 2
    import h5py
    with h5py.File(dst) as f:
        assert set(f.keys()) == {"img_1", "img_3"}
        assert f["img_1/features"][()][0, 0] == 1.0
        assert set(f["img_3"].keys()) == set(
            dict(recs)["img_3"].keys())
