"""Batched inference API: checkpoint in, answers out.

The reference's deploy config (cog.yaml:28) points at a ``predict.py``
that is absent from its repo (SURVEY §2.5); this is the working
equivalent, shaped for production serving: one compiled decode program,
static batch buckets, feature store injection (h5 / native pack /
in-memory), optional on-the-fly region extraction for raw images.

    predictor = VQAPredictor.from_checkpoint("snap/vqacl/q_causal_LAST",
                                             tokenizer, feature_store)
    answers = predictor.answer(["what color is the cat?"], ["COCO_..._42"])

For online serving, ``VQAServer`` adds continuous batching on top:
concurrent ``submit()`` calls (one per in-flight request) coalesce into
single compiled decode calls on a background worker, so TPU batch fill
tracks offered load instead of per-caller batch sizes.
``cli/serve_http.py`` exposes it over HTTP.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple

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
                 num_beams: int = 1, dtype=jnp.bfloat16,
                 device_cache=None, slot_of: Optional[Dict[str, int]] = None):
        """``device_cache``/``slot_of`` (a ``DeviceFeatureCache`` and its
        img_id→slot map, data/device_cache.py) switch serving to the
        HBM-resident feature table: requests carry int32 slots, the
        gather runs inside the compiled step, and per-batch host→device
        traffic drops from ~MB of features to bytes of indices — same
        tiering the trainer uses (``--device_cache``)."""
        self.cfg = cfg
        if dtype == jnp.bfloat16:
            # weights are static for the predictor's lifetime: pre-cast
            # once so the compiled step skips the per-call f32→bf16
            # weight copies (bit-identical outputs)
            from vqacl_tpu.models.vlt5 import cast_params_for_inference
            params = cast_params_for_inference(params, dtype)
        self.params = params
        self.proto = proto
        self.tok = tokenizer
        self.features = feature_store
        self.batch_size = batch_size
        self._slot_of = slot_of
        if device_cache is not None:
            from vqacl_tpu.data.device_cache import make_cached_eval_step
            assert slot_of is not None, "device_cache requires slot_of"
            self._eval = make_cached_eval_step(cfg, device_cache,
                                               dtype=dtype,
                                               num_beams=num_beams)
        else:
            self._eval = make_eval_step(cfg, dtype=dtype,
                                        num_beams=num_beams)

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
            ex = {
                "input_ids": self.tok.encode(
                    f"vqa: {q}", max_length=self.cfg.model.max_text_length),
                "ques_label": 0, "cate_label": 0,
            }
            if self._slot_of is not None:       # HBM-cache serving
                ex["slot"] = self._slot_of[img]
            else:
                feats, boxes = self.features.get(img)
                ex["vis_feats"], ex["boxes"] = feats, boxes
            out.append(ex)
        return out

    def dispatch_chunk(self, chunk: List[Dict]):
        """Launch one compiled decode call on ≤ batch_size prepared
        examples; returns the DEVICE token array without synchronizing
        (the host↔device round trip happens in :meth:`finish_chunk`),
        so a server can overlap the next batch's dispatch with this
        one's result pull."""
        assert len(chunk) <= self.batch_size, (len(chunk), self.batch_size)
        m = self.cfg.model
        b = collate(chunk, max_text_length=m.max_text_length,
                    n_boxes=m.n_boxes,
                    target_max_length=m.target_max_length,
                    n_ques_types=m.n_ques_types,
                    n_categories=m.n_categories, feat_dim=m.feat_dim,
                    pad_to_batch=self.batch_size, with_targets=False)
        return self._eval(self.params, self.proto, b["tensors"])

    def finish_chunk(self, tokens_dev, n: int) -> List[str]:
        """Pull + detokenize a :meth:`dispatch_chunk` result."""
        return self.tok.batch_decode(np.asarray(tokens_dev)[:n])

    def decode_chunk(self, chunk: List[Dict]) -> List[str]:
        """One compiled decode call on ≤ batch_size prepared examples."""
        return self.finish_chunk(self.dispatch_chunk(chunk), len(chunk))

    def answer(self, questions: Sequence[str],
               img_ids: Sequence[str]) -> List[str]:
        """Batched answers (padded to the static batch size)."""
        assert len(questions) == len(img_ids)
        exs = self._examples(questions, img_ids)
        answers: List[str] = []
        for s in range(0, len(exs), self.batch_size):
            answers.extend(self.decode_chunk(exs[s:s + self.batch_size]))
        return answers


class VQAServer:
    """Continuous-batching online server over one ``VQAPredictor``.

    Requests enter through :meth:`submit` (thread-safe, returns a
    ``Future``); a single background worker drains the queue, coalescing
    whatever is in flight — up to the predictor's static batch size,
    waiting at most ``max_wait_ms`` after the first request of a batch —
    into ONE compiled decode call. This is the serving counterpart of the
    reference's offline ``predict()`` loop (``vqacl.py:364-389``): batch
    fill follows offered load, the compiled program never re-traces
    (static bucket padding), and a bad request (unknown ``img_id``,
    feature-store IO error) fails only its own future, never the batch.

    Per-request example prep (tokenize + feature fetch) runs on the
    caller's thread at submit time, so the worker thread spends its time
    only on device steps — callers are the natural host-side parallelism.
    """

    _STOP = object()

    def __init__(self, predictor: VQAPredictor, max_wait_ms: float = 5.0,
                 latency_window: int = 1024, pipeline_depth: int = 0):
        """``pipeline_depth=0`` (default): the worker decodes each batch
        synchronously — the device call itself becomes the batching
        window, so under closed-loop load batches fill to the number of
        waiting clients and request latency is minimal (measured best on
        this setup, BENCH_NOTES "online serving"). ``pipeline_depth>=1``
        lets the dispatch worker run ahead by that many device calls
        while a finisher thread pulls tokens and detokenizes — worth it
        only when offered load exceeds what the synchronous loop
        sustains (open-loop traffic, multi-core hosts)."""
        self.predictor = predictor
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._requests = 0
        self._batches = 0
        self._batched_items = 0
        self._errors = 0
        self._lat = []              # ring buffer of request latencies (s)
        self._lat_cap = latency_window
        self._closed = False
        self._pipelined = int(pipeline_depth) >= 1
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="vqa-server-dispatch")
        if self._pipelined:
            self._fin_q: "queue.Queue" = queue.Queue(
                maxsize=int(pipeline_depth))
            self._finisher = threading.Thread(target=self._finish_loop,
                                              daemon=True,
                                              name="vqa-server-finish")
            self._finisher.start()
        self._worker.start()

    # -- client side ----------------------------------------------------
    def submit(self, question: str, img_id: str) -> "Future":
        """Enqueue one request; resolve to the answer string."""
        fut: Future = Future()
        if self._closed:
            fut.set_exception(RuntimeError("VQAServer is closed"))
            return fut
        with self._lock:
            self._requests += 1
        try:
            ex = self.predictor._examples([question], [img_id])[0]
        except Exception as e:          # unknown img_id / store IO error
            with self._lock:
                self._errors += 1
            fut.set_exception(e)
            return fut
        self._q.put((ex, fut, time.monotonic()))
        return fut

    def answer(self, questions: Sequence[str],
               img_ids: Sequence[str]) -> List[str]:
        """Synchronous convenience: submit all, wait for all."""
        futs = [self.submit(q, i) for q, i in zip(questions, img_ids)]
        return [f.result() for f in futs]

    # -- worker side ----------------------------------------------------
    def _loop(self) -> None:
        cap = self.predictor.batch_size
        while True:
            first = self._q.get()
            if first is self._STOP:
                return
            batch: List[Tuple] = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < cap:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is self._STOP:
                    self._q.put(item)   # re-queue for the outer loop
                    break
                batch.append(item)
            exs = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            try:
                tokens_dev = self.predictor.dispatch_chunk(exs)
            except Exception as e:      # device-side failure: fail batch
                with self._lock:
                    self._errors += len(futs)
                for f in futs:
                    if not f.done():
                        f.set_exception(e)
                continue
            if self._pipelined:
                # bounded put = backpressure: at most pipeline_depth
                # device calls in flight before dispatch stalls
                self._fin_q.put((tokens_dev, batch, futs))
            else:
                self._finish_batch(tokens_dev, batch, futs)

    def _finish_loop(self) -> None:
        while True:
            item = self._fin_q.get()
            if item is self._STOP:
                return
            self._finish_batch(*item)

    def _finish_batch(self, tokens_dev, batch, futs) -> None:
        try:
            answers = self.predictor.finish_chunk(tokens_dev, len(batch))
        except Exception as e:
            with self._lock:
                self._errors += len(futs)
            for f in futs:
                if not f.done():
                    f.set_exception(e)
            return
        now = time.monotonic()
        with self._lock:
            self._batches += 1
            self._batched_items += len(batch)
            for (_, _, t0) in batch:
                if len(self._lat) >= self._lat_cap:
                    self._lat.pop(0)
                self._lat.append(now - t0)
        for f, a in zip(futs, answers):
            try:
                f.set_result(a)
            except Exception:   # close() failed it first — drop the race
                pass

    # -- lifecycle / telemetry ------------------------------------------
    def stats(self) -> Dict:
        with self._lock:
            lat = sorted(self._lat)
            n = len(lat)
            return {
                "requests": self._requests,
                "batches": self._batches,
                "errors": self._errors,
                "mean_batch_fill": (self._batched_items / self._batches
                                    if self._batches else 0.0),
                "batch_capacity": self.predictor.batch_size,
                "latency_p50_ms": 1e3 * lat[n // 2] if n else None,
                "latency_p99_ms": (1e3 * lat[min(n - 1, (99 * n) // 100)]
                                   if n else None),
            }

    def close(self, timeout: float = 10.0) -> None:
        """Drain in-flight work and stop the stage threads in order."""
        self._closed = True
        self._q.put(self._STOP)
        self._worker.join(timeout=timeout)
        if self._pipelined:
            self._fin_q.put(self._STOP)
            self._finisher.join(timeout=timeout)
        # fail any request that slipped past the _closed check into the
        # queue after the sentinel (or was left behind by a stuck
        # worker) — its Future would otherwise never resolve and the
        # caller's fut.result() would block forever
        err = RuntimeError("VQAServer closed before this request was served")
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is self._STOP:
                continue
            _, fut, _ = item
            try:
                fut.set_exception(err)
            except Exception:   # lost the race against a live worker
                pass

    def __enter__(self) -> "VQAServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
