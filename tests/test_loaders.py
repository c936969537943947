"""Group loaders, exemplar buffer, and static-batch padding semantics."""

import random

import numpy as np

from vqacl_tpu.cl.exemplar import ExemplarBuffer
from vqacl_tpu.cl.tasks import CATEGORY_SPLITS, make_rng, random_dic
from vqacl_tpu.data.collate import collate
from vqacl_tpu.data.features import MemoryFeatureStore
from vqacl_tpu.data.partition import (BatchLoader, VQAPartitionDataset,
                                      group_loaders, split_by_group)
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.parallel.multihost import (all_gather_object, barrier,
                                          merge_quesid2ans)


def make_dataset(n=50, seed=0):
    rng = np.random.default_rng(seed)
    store = MemoryFeatureStore()
    items, cate_map, ques_map = [], {}, {}
    for i in range(n):
        img = f"img{i}"
        c = int(rng.integers(0, 80))
        store.put(img, rng.normal(size=(36, 2048)).astype(np.float32),
                  rng.uniform(0, 1, (36, 4)).astype(np.float32))
        cate_map[img] = c
        ques_map[str(i)] = i % 10
        items.append({"img_id": img, "question_id": i,
                      "sent": f"question {i}", "label": {"yes": 1.0}})
    tok = VLT5Tokenizer()
    return VQAPartitionDataset(items, tok, store, ques_map, cate_map), cate_map


def test_split_by_group_partitions_everything():
    ds, cate_map = make_dataset()
    groups = split_by_group(ds)
    all_idx = sorted(i for idx in groups.values() for i in idx)
    assert all_idx == list(range(len(ds)))
    # each example's category is in its group's split
    for g, idx in groups.items():
        for i in idx:
            assert cate_map[ds.data[i]["img_id"]] in CATEGORY_SPLITS[g]


def test_static_batch_padding():
    ds, _ = make_dataset(n=10)
    loader = BatchLoader(ds, np.arange(10), batch_size=8, shuffle=False,
                         prefetch=False)
    batches = list(loader)
    assert len(batches) == 2
    last = batches[1]
    t = last["tensors"]
    assert t["input_ids"].shape == (8, 20)          # padded to batch size
    assert last["meta"]["n_real"] == 2
    # pad rows carry zero labels and scores → no loss/proto contribution
    assert t["ques_labels"][2:].sum() == 0
    assert t["scores"][2:].sum() == 0
    assert (t["target_ids"][2:] == -100).all()


def test_prefetch_equals_sync():
    ds, _ = make_dataset(n=30)
    a = BatchLoader(ds, np.arange(30), 8, shuffle=True, seed=5,
                    prefetch=False)
    b = BatchLoader(ds, np.arange(30), 8, shuffle=True, seed=5,
                    prefetch=True)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["tensors"]["input_ids"],
                                      bb["tensors"]["input_ids"])


def test_prefetch_reraises_producer_exception():
    """A corrupt/missing feature row must kill the run with the real
    traceback, not silently truncate the epoch (the producer thread's
    sentinel-on-any-exception would otherwise swallow it)."""
    import pytest

    ds, _ = make_dataset(n=30)
    boom = RuntimeError("corrupt feature row img17")
    orig_get = ds.features.get

    def failing_get(img_id, *a, **kw):
        if img_id == "img17":
            raise boom
        return orig_get(img_id, *a, **kw)

    ds.features.get = failing_get
    loader = BatchLoader(ds, np.arange(30), 8, shuffle=False, prefetch=True)
    with pytest.raises(RuntimeError, match="corrupt feature row img17"):
        for _ in loader:
            pass


def test_exemplar_quota_over_tasks():
    rng = make_rng(66666)
    buf = ExemplarBuffer(m_size=100)
    items = [{"img_id": f"img{i}"} for i in range(500)]
    cate_map = {f"img{i}": i % 80 for i in range(500)}
    for t in range(1, 4):
        buf.update(t, items, cate_map, rng)
        assert len(buf) <= 100
        # per-group per-task slices equal-length after truncation
        per = (100 // t) // 5
        for g in buf.sets:
            for slot in buf.sets[g]:
                assert len(slot) <= per


def test_random_dic_deterministic():
    d = {k: None for k in ["G1", "G2", "G3", "G4", "G5"]}
    o1 = list(random_dic(d, make_rng(66666)))
    o2 = list(random_dic(d, make_rng(66666)))
    assert o1 == o2
    assert sorted(o1) == sorted(d)


def test_multihost_single_process_noops():
    barrier()
    assert all_gather_object({"a": 1}) == [{"a": 1}]
    assert merge_quesid2ans({1: "yes"}) == {1: "yes"}


def test_parallel_loader_matches_serial_eval_mode():
    """num_workers>1 yields identical batches in identical order when no
    sampling is involved (eval mode: argmax answer selection)."""
    ds, _ = make_dataset(n=37)
    ds.mode = "val"
    serial = BatchLoader(ds, np.arange(37), batch_size=8, shuffle=True,
                         seed=3, prefetch=False)
    par = BatchLoader(ds, np.arange(37), batch_size=8, shuffle=True,
                      seed=3, num_workers=4)
    for a, b in zip(list(serial), list(par)):
        for k in a["tensors"]:
            np.testing.assert_array_equal(a["tensors"][k], b["tensors"][k])
        assert a["meta"]["question_ids"] == b["meta"]["question_ids"]


def test_parallel_loader_worker_count_invariant_sampling():
    """Train-mode answer sampling is per-example-seeded: 2 and 4 workers
    (and epochs replayed) give identical sampled targets."""
    rng = np.random.default_rng(1)
    store = MemoryFeatureStore()
    items, cate_map, ques_map = [], {}, {}
    for i in range(30):
        img = f"img{i}"
        store.put(img, rng.normal(size=(36, 2048)).astype(np.float32),
                  rng.uniform(0, 1, (36, 4)).astype(np.float32))
        cate_map[img] = int(rng.integers(0, 80))
        ques_map[str(i)] = i % 10
        items.append({"img_id": img, "question_id": i,
                      "sent": f"question {i}",
                      "label": {"yes": 0.4, "no": 0.3, "maybe": 0.3}})
    tok = VLT5Tokenizer()
    ds = VQAPartitionDataset(items, tok, store, ques_map, cate_map,
                             mode="train", seed=11)
    outs = []
    for nw in (2, 4):
        loader = BatchLoader(ds, np.arange(30), batch_size=8, shuffle=True,
                             seed=5, num_workers=nw)
        outs.append([b["tensors"]["target_ids"].copy() for b in loader])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_parallel_loader_propagates_worker_errors():
    ds, _ = make_dataset(n=16)
    ds.data[9] = {"img_id": "MISSING", "question_id": 9, "sent": "q"}
    loader = BatchLoader(ds, np.arange(16), batch_size=4, shuffle=False,
                         num_workers=3)
    import pytest
    with pytest.raises(Exception):
        list(loader)
