"""Continuous-batching server + HTTP frontend.

The reference ships no serving path at all (cog.yaml points at an
absent predict.py); these tests pin the online-serving extension:
concurrent requests coalesce into single compiled decode calls, bad
requests fail alone, and the HTTP surface round-trips JSON.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from vqacl_tpu.data.features import MemoryFeatureStore
from vqacl_tpu.data.tokenizer import VLT5Tokenizer
from vqacl_tpu.utils.config import Config, tiny_model_config

pytestmark = pytest.mark.slow  # full-pipeline / compile-heavy (>5 s)


@pytest.fixture(scope="module")
def predictor():
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.serve import VQAPredictor

    cfg = Config()
    cfg.model = tiny_model_config(vocab_size=32200)
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg.model)
    proto = ProtoState.create(cfg.model.n_ques_types,
                              cfg.model.n_categories, cfg.model.d_model)
    store = MemoryFeatureStore()
    rng = np.random.default_rng(0)
    for i in range(8):
        store.put(f"img{i}",
                  rng.normal(size=(cfg.model.n_boxes,
                                   cfg.model.feat_dim)).astype(np.float32),
                  rng.uniform(0, 1, (cfg.model.n_boxes, 4)
                              ).astype(np.float32))
    return VQAPredictor(cfg, params, proto, VLT5Tokenizer(), store,
                        batch_size=4, dtype=jnp.float32)


def test_concurrent_submits_coalesce(predictor):
    """8 requests from 8 threads with a wide batching window must land
    in far fewer compiled calls than requests (continuous batching)."""
    from vqacl_tpu.serve import VQAServer

    with VQAServer(predictor, max_wait_ms=250.0) as srv:
        # warm the compile outside the measured window
        srv.submit("warmup?", "img0").result()

        results = [None] * 8
        start = threading.Barrier(8 + 1)

        def fire(i):
            start.wait()
            results[i] = srv.submit(f"question {i}?", f"img{i}").result()

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        start.wait()
        for t in threads:
            t.join()

        assert all(isinstance(r, str) for r in results)
        st = srv.stats()
        assert st["requests"] == 9
        assert st["errors"] == 0
        # capacity 4 → 8 concurrent requests need ≥2 batches but far
        # fewer than 8 one-item batches (warmup batch is a 9th request)
        assert st["batches"] <= 5, st
        assert st["mean_batch_fill"] > 1.0, st
        assert st["latency_p50_ms"] is not None


def test_bad_request_fails_alone(predictor):
    from vqacl_tpu.serve import VQAServer

    with VQAServer(predictor, max_wait_ms=50.0) as srv:
        good = srv.submit("fine?", "img0")
        bad = srv.submit("broken?", "no-such-img")
        assert isinstance(good.result(), str)
        with pytest.raises(KeyError):
            bad.result()
        assert srv.stats()["errors"] == 1


def test_closed_server_rejects(predictor):
    from vqacl_tpu.serve import VQAServer

    srv = VQAServer(predictor, max_wait_ms=1.0)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit("late?", "img0").result()


def test_close_fails_requests_stranded_behind_sentinel(predictor):
    """A request that races past the _closed check and lands in the
    queue after the stop sentinel must still resolve (with an error) —
    close() drains the queue and fails leftover futures instead of
    leaving their callers blocked forever."""
    import time
    from concurrent.futures import Future

    from vqacl_tpu.serve import VQAServer

    srv = VQAServer(predictor, max_wait_ms=1.0)
    srv.close()
    # simulate the losing side of the race: enqueue directly, behind
    # the sentinel the worker already consumed
    fut: Future = Future()
    ex = predictor._examples(["raced?"], ["img0"])[0]
    srv._q.put((ex, fut, time.monotonic()))
    srv.close()   # idempotent close drains and fails it
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)


def test_http_roundtrip(predictor):
    from vqacl_tpu.cli.serve_http import (make_http_server,
                                          serve_forever_in_thread)
    from vqacl_tpu.serve import VQAServer

    with VQAServer(predictor, max_wait_ms=20.0) as srv:
        httpd = make_http_server(srv, host="127.0.0.1", port=0)
        serve_forever_in_thread(httpd)
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
                assert json.load(r) == {"ok": True}

            req = urllib.request.Request(
                base + "/v1/vqa",
                data=json.dumps({"question": "what is this?",
                                 "img_id": "img1"}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                assert isinstance(json.load(r)["answer"], str)

            batch = urllib.request.Request(
                base + "/v1/vqa",
                data=json.dumps({"items": [
                    {"question": "a?", "img_id": "img2"},
                    {"question": "b?", "img_id": "img3"},
                ]}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(batch, timeout=120) as r:
                answers = json.load(r)["answers"]
                assert len(answers) == 2

            with urllib.request.urlopen(base + "/stats", timeout=30) as r:
                st = json.load(r)
                assert st["requests"] >= 3 and st["batch_capacity"] == 4

            with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
                text = r.read().decode()
                assert "vqa_requests" in text and \
                    "# TYPE vqa_requests counter" in text

            bad = urllib.request.Request(
                base + "/v1/vqa",
                data=json.dumps({"question": "x?",
                                 "img_id": "missing"}).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad, timeout=120)
            assert ei.value.code == 400
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_hbm_cache_serving_matches_host_path(predictor):
    """Predictor over the HBM-resident feature table must answer
    identically to the host-fed path (same params, f32 cache)."""
    from vqacl_tpu.data.device_cache import DeviceFeatureCache
    from vqacl_tpu.serve import VQAPredictor

    store = predictor.features
    ids = sorted(store.table)
    cache, slot_of = DeviceFeatureCache.from_store(
        store, ids, feat_dtype=jnp.float32)
    cached = VQAPredictor(predictor.cfg, predictor.params, predictor.proto,
                          predictor.tok, None, batch_size=4,
                          dtype=jnp.float32, device_cache=cache,
                          slot_of=slot_of)
    qs = [f"question {i}?" for i in range(6)]
    imgs = [f"img{i}" for i in range(6)]
    assert cached.answer(qs, imgs) == predictor.answer(qs, imgs)


def test_pipelined_server_resolves_all(predictor):
    """pipeline_depth>=1 (dispatch runs ahead, finisher thread pulls)
    must resolve every future with the same answers as the synchronous
    path."""
    from vqacl_tpu.serve import VQAServer

    qs = [f"question {i}?" for i in range(8)]
    imgs = [f"img{i}" for i in range(8)]
    with VQAServer(predictor, max_wait_ms=5.0) as sync_srv:
        expected = sync_srv.answer(qs, imgs)
    with VQAServer(predictor, max_wait_ms=5.0, pipeline_depth=2) as srv:
        got = srv.answer(qs, imgs)
        assert got == expected
        assert srv.stats()["errors"] == 0
