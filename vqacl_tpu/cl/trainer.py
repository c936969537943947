"""VQACL continual-learning trainer: the dual-level task loop.

Rebuild of ``Trainer`` (/root/reference/VL-T5/src/vqacl.py:54-635) as
thin host orchestration around two compiled programs (train step, eval
step). Loop structure kept bit-for-comparable:

  for task in 10 linguistic tasks:                (vqacl.py:165)
    rebuild exemplar buffer from prev task         (:170-203)
    build per-group train/val/memory loaders + test loaders (:214-283)
    shuffle group order (seeded)                   (:314)
    for group in G1..G5 (shuffled):                (:316)
      fresh optimizer, t_total = (2×)train size    (:324-335)
      skip if group == comp_cate and not first task (:337-339)
      for epoch in epochs:                         (:342)
        for batch, mem_batch in zip(train, cycle(memory)):  (:358-373)
          train_step(batch); train_step(mem_batch)
        validate on the group's val loader         (:399)
    save {task}_LAST checkpoint                    (:414)
    test(task): eval on all previously trained tasks → result matrix (:417,533-584)
  final: Avg-Acc / Avg-Forget metrics              (:661-673)

DDP barriers/all_gathers vanish (single-process mesh, SURVEY §2.4).
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqacl_tpu.cl.exemplar import ExemplarBuffer
from vqacl_tpu.cl.metrics import ResultMatrix, evaluate_metric
from vqacl_tpu.cl.tasks import CATEGORY_SPLITS, make_rng, random_dic
from vqacl_tpu.data.partition import BatchLoader, group_loaders, all_loader
from vqacl_tpu.models.prototype import ProtoState
from vqacl_tpu.models.vlt5 import init_vlt5_params
from vqacl_tpu.parallel import make_mesh, replicate, shard_batch
from vqacl_tpu.train.checkpoint import (AsyncCheckpointer,
                                        load_checkpoint, save_checkpoint)
from vqacl_tpu.train.optim import make_transform
from vqacl_tpu.train.state import TrainState
from vqacl_tpu.train.step import make_eval_step, make_train_step


class LossMeter:
    """Window-100 running mean (utils.py:40-56)."""

    def __init__(self, maxlen: int = 100):
        self.vals: List[float] = []
        self.maxlen = maxlen

    def update(self, v: float) -> None:
        self.vals.append(v)
        if len(self.vals) > self.maxlen:
            self.vals.pop(0)

    @property
    def val(self) -> float:
        return sum(self.vals) / len(self.vals) if self.vals else 0.0


class VQACLTrainer:
    def __init__(self, cfg, data, tokenizer, verbose: bool = True,
                 mesh_ctx=None, init_params=None, dtype=None):
        self.cfg = cfg
        self.data = data                      # DataModule (see synthetic_module)
        self.tok = tokenizer
        self.verbose = verbose
        self.tasks: List[str] = list(data.tasks)
        self.ctx = mesh_ctx or make_mesh()
        self.dtype = dtype or jnp.bfloat16
        from vqacl_tpu.utils.config import resolve_fused_attention
        resolve_fused_attention(cfg.model,
                                n_devices=self.ctx.mesh.devices.size,
                                mesh=self.ctx.mesh)
        # pipeline-parallel stacks (parallel/pipeline.py): record the
        # mesh on the model config (non-field attr, like fused_mesh) so
        # encode()/decode_hidden() route through the GPipe stacks
        if self.ctx.pp > 1:
            cfg.model.pp_mesh = self.ctx.mesh
            cfg.model.pp_micro = getattr(cfg.mesh, "pp_micro", 4)

        rng = jax.random.PRNGKey(cfg.train.seed)
        params = init_params if init_params is not None else \
            init_vlt5_params(rng, cfg.model)
        proto = ProtoState.create(cfg.model.n_ques_types,
                                  cfg.model.n_categories, cfg.model.d_model)
        # LR-less transform (dynamic schedule lives in state.sched), so
        # per-group optimizer resets never trigger a recompile
        self._tx = make_transform(cfg.train)
        # rbg PRNG: TPU-native hardware RNG for dropout masks — threefry
        # costs ~28ms/step on t5-base at bs80, rbg ~6ms
        # params placed per cfg.mesh.param_layout (replicated / tp /
        # fsdp); tx.init's zeros_like moments inherit the layout, so the
        # whole optimizer state shards with the params
        params = self._place_params(params)
        state = TrainState.create(params, self._tx, proto,
                                  jax.random.key(cfg.train.seed + 1,
                                                 impl="rbg"))
        self.state = state._replace(
            step=replicate(self.ctx, state.step),
            proto=replicate(self.ctx, state.proto),
            rng=replicate(self.ctx, state.rng),
            sched=replicate(self.ctx, state.sched))

        # HBM feature cache: whole feature table on device, batches carry
        # slot indices; ~8× real-training speedup vs per-step host upload
        # on this setup (see BENCH_NOTES.md / data/device_cache.py).
        self._cache = None
        self._slot_of = None
        if getattr(cfg.data, "device_cache", False) and \
                hasattr(getattr(data, "features", None), "get"):
            from vqacl_tpu.data.device_cache import (DeviceFeatureCache,
                                                     make_cached_eval_step)
            img_ids = sorted(data.cate_map.keys())
            import jax.numpy as _jnp
            _cdt = {"bfloat16": _jnp.bfloat16, "float32": _jnp.float32,
                    "int8": _jnp.int8}[getattr(cfg.data,
                                               "device_cache_dtype",
                                               "bfloat16")]
            self._cache, self._slot_of = DeviceFeatureCache.from_store(
                data.features, img_ids, mesh_ctx=self.ctx,
                shard=getattr(cfg.data, "device_cache_sharded", False),
                feat_dtype=_cdt)
            self._log(f"HBM feature cache: {self._cache.n} images "
                      f"({self._cache.feats.nbytes / 1e9:.2f} GB)")
            self.eval_step = make_cached_eval_step(cfg, self._cache,
                                                   dtype=self.dtype)
        else:
            self.eval_step = make_eval_step(cfg, dtype=self.dtype)
        self._train_step_cache: Dict[Any, Any] = {}

        # EWC/MAS parameter-importance baselines (cl/regularizers.py —
        # Table-1 comparison methods the reference repo doesn't ship).
        # RegState pytrees are built from the PLACED params so omega and
        # anchor inherit the replicated/tp/fsdp layout.
        self._reg = None
        self._imp_step = None
        # DER/DER++ (train/step.py::make_der_replay_step): replay batches
        # distill against logits snapshotted at buffer-insert time
        self._der = getattr(cfg.train, "cl_reg", "none") in ("der", "derpp")
        self._der_step_fn = None
        self._logits_step = None
        cl_reg = getattr(cfg.train, "cl_reg", "none")
        if cl_reg in ("ewc", "mas"):
            from vqacl_tpu.cl.regularizers import init_reg_state
            self._reg = init_reg_state(self.state.params)
            self._log(f"CL regularizer: {cl_reg} "
                      f"(λ={cfg.train.reg_lambda})")
        elif self._der:
            if not cfg.train.memory:
                raise ValueError("cl_reg='der'/'derpp' is a replay method "
                                 "— it requires --memory")
            self._log(f"CL regularizer: {cl_reg} "
                      f"(α={cfg.train.reg_lambda}"
                      + (f", β={cfg.train.der_beta}" if cl_reg == "derpp"
                         else "") + ")")

        # NExT-QA swaps in its G0..G4 video-category groups
        self.splits = getattr(data, "category_splits", CATEGORY_SPLITS)
        self.buffer = ExemplarBuffer(cfg.train.m_size, splits=self.splits)
        self.result_matrix = ResultMatrix(self.tasks)
        self.py_rng = make_rng(cfg.train.seed)
        # task-boundary saves go through a background writer: the
        # npz write overlaps the (much longer) per-task test matrix.
        # Emergency saves stay synchronous (nothing to overlap with).
        self._ckpt_writer = AsyncCheckpointer()
        self.task_total_num: Dict[int, int] = {}
        self.metrics_log: List[Dict] = []
        self.test_loader_dict_all: Dict[str, BatchLoader] = {}

    # ------------------------------------------------------------------
    def _place_params(self, params):
        """Place a params pytree per ``cfg.mesh.param_layout``:
        "replicated" (reference DDP semantics), "tp" (Megatron head/
        hidden sharding over the tp axis), or "fsdp" (ZeRO-3-style dp
        sharding composed with tp) — parallel/sharding.py rules."""
        layout = getattr(self.cfg.mesh, "param_layout", "replicated")
        if layout == "tp":
            from vqacl_tpu.parallel.sharding import shard_params
            return shard_params(self.ctx.mesh, params)
        if layout == "fsdp":
            from vqacl_tpu.parallel.sharding import shard_params_fsdp
            return shard_params_fsdp(self.ctx.mesh, params)
        return replicate(self.ctx, params)

    def _train_step(self, use_memory_loss: bool):
        key = bool(use_memory_loss)
        if key not in self._train_step_cache:
            reg_lambda = float(self.cfg.train.reg_lambda) \
                if self._reg is not None else 0.0
            if self._cache is not None:
                from vqacl_tpu.data.device_cache import make_cached_train_step
                fn = make_cached_train_step(
                    self.cfg, self._tx, self._cache, dtype=self.dtype,
                    use_memory_loss=use_memory_loss,
                    remat=self.cfg.mesh.remat, reg_lambda=reg_lambda)
            else:
                fn = make_train_step(
                    self.cfg, self._tx, dtype=self.dtype,
                    use_memory_loss=use_memory_loss,
                    remat=self.cfg.mesh.remat, reg_lambda=reg_lambda)
            if self._reg is not None:
                raw = fn
                # late-bound: consolidation swaps self._reg between tasks
                fn = lambda state, batch: raw(state, batch, self._reg)  # noqa: E731
            self._train_step_cache[key] = fn
        return self._train_step_cache[key]

    def _slotify(self, ds):
        """Switch a dataset into HBM-cache slot mode."""
        if self._slot_of is not None:
            ds.slot_of = self._slot_of
        return ds

    def _der_replay_step(self):
        if self._der_step_fn is None:
            if self._cache is not None:
                from vqacl_tpu.data.device_cache import make_cached_der_step
                self._der_step_fn = make_cached_der_step(
                    self.cfg, self._tx, self._cache, dtype=self.dtype,
                    remat=self.cfg.mesh.remat)
            else:
                from vqacl_tpu.train.step import make_der_replay_step
                self._der_step_fn = make_der_replay_step(
                    self.cfg, self._tx, dtype=self.dtype,
                    remat=self.cfg.mesh.remat)
        return self._der_step_fn

    def _der_capture(self, task_idx: int) -> None:
        """Snapshot teacher-forced logits for the exemplars that just
        entered the buffer (DER: the stored ``der_logits`` [T,V] f16 —
        plus the sampled target and score that produced them — become
        the replay distillation target for the rest of the run).

        Cost: T·V f16 per exemplar on host (t5-base: ~0.63 MB, so
        M=5000 ≈ 3.2 GB host RAM); batches ship the [B,T,V] tensor per
        replay step, so DER is for host-fed or cache-fed training with
        spare host→device bandwidth — ER (plain replay) remains the
        cheap default."""
        # normal flow: only the just-inserted slot (task_idx-1) lacks
        # logits; on resume every rebuilt slot does — those re-capture
        # with the loaded checkpoint's weights (the closest available
        # stand-in for the insert-time model)
        new_items = [d for g in self.buffer.sets
                     for slot in self.buffer.sets[g]
                     for d in slot if "der_logits" not in d]
        if not new_items:
            return
        if self._logits_step is None:
            if self._cache is not None:
                from vqacl_tpu.data.device_cache import \
                    make_cached_logits_step
                self._logits_step = make_cached_logits_step(
                    self.cfg, self._cache, dtype=self.dtype)
            else:
                from vqacl_tpu.train.step import make_logits_step
                self._logits_step = make_logits_step(self.cfg,
                                                     dtype=self.dtype)
        ds = self._slotify(self.data.make_dataset(new_items, mode="train",
                                                  task_idx=task_idx - 1))
        bs = self.cfg.train.batch_size
        loader = BatchLoader(ds, np.arange(len(ds)), bs, shuffle=False,
                             with_targets=True, drop_last=False,
                             collate_kw=self._ck())
        off = 0
        for batch in loader:
            logits = self._logits_step(
                self.state.params, self.state.proto,
                shard_batch(self.ctx, batch["tensors"]))
            arr = np.asarray(logits).astype(np.float16)
            tgt = np.asarray(batch["tensors"]["target_ids"])
            sc = np.asarray(batch["tensors"]["scores"])
            n = batch["meta"]["n_real"]
            for i in range(n):
                d = new_items[off + i]
                d["der_logits"] = arr[i]
                d["der_target_ids"] = tgt[i].tolist()
                d["der_score"] = float(sc[i])
            off += n
        mb = off * arr.shape[1] * arr.shape[2] * 2 / 1e6
        self._log(f"   DER capture: {off} exemplars ({mb:.1f} MB logits)")

    def _reset_optimizer(self, total_train_num: int) -> None:
        """Fresh AdamW per group with the reference's t_total accounting
        (trainer_base.py:137-145)."""
        bs = self.cfg.train.batch_size
        batch_per_epoch = max(int(total_train_num / bs), 1)
        t_total = batch_per_epoch * self.cfg.train.epochs
        # int(t_total*ratio) with NO floor: warmup 0 -> full lr from step
        # one, matching HF get_constant_schedule_with_warmup semantics
        warmup = int(t_total * self.cfg.train.warmup_ratio)
        self.state = self.state.reset_optimizer(self._tx, warmup, t_total)

    # ------------------------------------------------------------------
    def train(self, resume_task: Optional[str] = None) -> Dict:
        start_idx = 0
        if resume_task is not None:
            start_idx = self.tasks.index(resume_task) + 1
            params, proto, _ = load_checkpoint(
                os.path.join(self.cfg.output, f"{resume_task}_LAST"))
            self.state = self.state._replace(
                params=self._place_params(params),
                proto=replicate(self.ctx, proto))
            # rebuild exemplar-buffer history so the first resumed task
            # sees the same replay quota a continuous run would
            # (vqacl.py:147-160 resume marks tasks trained; its buffer
            # rebuild crashes upstream when combined with --memory —
            # deliberate fix here)
            if self.cfg.train.memory:
                for k in range(1, start_idx):
                    self.buffer.update(k,
                                       self.data.train_items(self.tasks[k - 1]),
                                       self.data.cate_map, self.py_rng)
                if self._der and start_idx > 0:
                    self._der_capture(start_idx)

        for task_idx in range(start_idx, len(self.tasks)):
            task = self.tasks[task_idx]
            self._log(f"======== task {task} ({task_idx}) ========")
            try:
                self.train_task(task_idx,
                                first_trained=(task_idx == start_idx))
                # inside the recovery scope: save() re-raises a PREVIOUS
                # task's failed background write, and the just-trained
                # params must still reach {task}_EMERGENCY in that case
                self._ckpt_writer.save(
                    os.path.join(self.cfg.output, f"{task}_LAST"),
                    jax.device_get(self.state.params),
                    jax.device_get(self.state.proto), int(self.state.step))
            except BaseException:
                # failure recovery beyond the reference (SURVEY §5: it has
                # none): preserve state so --checkpoint <prev task> plus
                # this emergency file lose at most the current task
                try:
                    self._ckpt_writer.wait()
                except BaseException as werr:
                    self._log(f"!! pending checkpoint write failed: {werr}")
                save_checkpoint(
                    os.path.join(self.cfg.output, f"{task}_EMERGENCY"),
                    jax.device_get(self.state.params),
                    jax.device_get(self.state.proto), int(self.state.step))
                self._log(f"!! saved {task}_EMERGENCY before re-raising")
                raise

            self.test(task)
            self._write_log()
            # task-boundary sync on multihost pods (SURVEY §5; no-op on
            # one process)
            from vqacl_tpu.parallel.multihost import barrier
            barrier(f"task_{task}")

        # drain the last background checkpoint write (and surface any
        # writer error) before declaring the run complete
        self._ckpt_writer.wait()

        # prototype export for reference parity (vqacl.py:420-426)
        os.makedirs(self.cfg.output, exist_ok=True)
        np.save(os.path.join(self.cfg.output, "Q_prototype.npy"),
                np.asarray(self.state.proto.q_proto))
        np.save(os.path.join(self.cfg.output, "V_prototype.npy"),
                np.asarray(self.state.proto.v_proto))
        metrics = evaluate_metric(self.result_matrix.to_dict())
        with open(os.path.join(self.cfg.output, "metrics.json"), "w") as f:
            json.dump({k: v for k, v in metrics.items()}, f, indent=2,
                      default=float)
        self._log(self.result_matrix.show())
        self._log(f"Avg_acc {metrics['Avg_acc']:.2f} "
                  f"Avg_forget {metrics['Avg_forget']:.2f}")
        return metrics

    # ------------------------------------------------------------------
    def train_task(self, task_idx: int, first_trained: bool = False) -> None:
        cfg = self.cfg
        task = self.tasks[task_idx]

        # -- exemplar rebuild from previous task (vqacl.py:170-203) --
        mem_items: List[dict] = []
        if cfg.train.memory and task_idx > 0:
            prev = self.data.train_items(self.tasks[task_idx - 1])
            self.buffer.update(task_idx, prev, self.data.cate_map, self.py_rng)
            mem_items = self.buffer.all_examplars()
            self._log(f"# memory size: {len(mem_items)}")
            if self._der:
                self._der_capture(task_idx)

        train_ds = self._slotify(self.data.dataset(task, "train",
                                                    task_idx=task_idx))
        val_ds = self._slotify(self.data.dataset(task, "val",
                                                 task_idx=task_idx))
        test_ds_all = self._slotify(self.data.dataset(task, "test",
                                                      task_idx=task_idx))
        self.task_total_num[task_idx] = len(train_ds)

        bs = cfg.train.batch_size
        vbs = cfg.train.valid_batch_size
        nw = self._loader_workers()
        train_loaders = group_loaders(train_ds, bs, shuffle=True,
                                      seed=cfg.train.seed,
                                      collate_kw=self._ck(),
                                      splits=self.splits, num_workers=nw)
        val_loaders = group_loaders(val_ds, vbs, shuffle=False,
                                    with_targets=True, collate_kw=self._ck(),
                                    splits=self.splits, num_workers=nw)
        mem_ds = self._slotify(self.data.make_dataset(mem_items,
                                                      mode="train",
                                                      task_idx=task_idx))
        mem_loaders = group_loaders(mem_ds, bs, shuffle=True,
                                    seed=cfg.train.seed + 7,
                                    collate_kw=self._ck(),
                                    splits=self.splits, num_workers=nw)
        self.test_loader_dict_all[task] = all_loader(
            test_ds_all, vbs, with_targets=False, collate_kw=self._ck(),
            num_workers=nw)

        self.state = self.state._replace(
            proto=self.state.proto.start_task(task_idx))

        group_order = random_dic({g: None for g in train_loaders},
                                 self.py_rng)
        use_mem_loss = cfg.train.use_memory_loss and cfg.train.memory \
            and task_idx > 0 and cfg.model.use_prototype

        for group in group_order:
            tl, vl, ml = train_loaders[group], val_loaders[group], \
                mem_loaders[group]
            if tl.num_examples == 0:
                continue
            total = 2 * tl.num_examples if ml.num_examples > 0 \
                else tl.num_examples
            self._reset_optimizer(total)

            # comp split: hold the comp group out except on the first
            # trained task (vqacl.py:337-339)
            if group == cfg.train.comp_cate and not first_trained:
                self._log(f"-- skip group {group} (composition holdout)")
                continue
            self._log(f"-- group {group}: {tl.num_examples} train, "
                      f"{ml.num_examples} memory")

            step_fn = self._train_step(use_mem_loss)
            meter, meter_mem = LossMeter(), LossMeter()
            for epoch in range(cfg.train.epochs):
                it = zip(tl, itertools.cycle(ml)) if ml.num_examples > 0 \
                    else ((b, None) for b in tl)
                # loss scalars stay ON DEVICE during the epoch — a
                # float() per step costs a full host round-trip (~40 ms
                # on tunneled chips, ≈ a whole train step); they drain
                # at epoch end when the queue is synced anyway
                pend, pend_mem = [], []
                for batch, mem_batch in it:
                    self.state, m = step_fn(
                        self.state, shard_batch(self.ctx, batch["tensors"]))
                    pend.append(m["loss"])
                    if mem_batch is not None:
                        # DER replay distills against stored logits; ER
                        # (the reference's replay) is a second CE step
                        mem_fn = self._der_replay_step() if self._der \
                            else step_fn
                        self.state, mm = mem_fn(
                            self.state,
                            shard_batch(self.ctx, mem_batch["tensors"]))
                        pend_mem.append(mm["loss"])
                for v in pend[-meter.maxlen:]:
                    meter.update(float(v))
                for v in pend_mem[-meter_mem.maxlen:]:
                    meter_mem.update(float(v))
                if vl.num_examples > 0:
                    score = self.evaluate(vl, task)
                    self._log(f"   {group} epoch {epoch}: loss {meter.val:.4f}"
                              f" mem {meter_mem.val:.4f}"
                              f" val {score.get('overall', 0):.2f}")
            self.metrics_log.append({"task": task, "group": group,
                                     "loss": meter.val})

        if self._reg is not None:
            self._consolidate_reg(train_ds)

    # ------------------------------------------------------------------
    def _consolidate_reg(self, train_ds) -> None:
        """End-of-task EWC/MAS consolidation: estimate parameter
        importance over (up to ``fisher_batches``) task batches with ONE
        jitted grad+accumulate program, then fold it into the running
        omega and re-anchor at the just-trained params."""
        from vqacl_tpu.cl import regularizers as R
        cfg = self.cfg
        if self._imp_step is None:
            self._imp_step = R.make_importance_step(
                cfg, cfg.train.cl_reg, dtype=self.dtype)
        bs = cfg.train.batch_size
        loader = BatchLoader(train_ds, np.arange(len(train_ds)), bs,
                             shuffle=True, seed=cfg.train.seed + 13,
                             with_targets=True,
                             drop_last=(len(train_ds) >= bs),
                             collate_kw=self._ck())
        acc = jax.tree.map(jnp.zeros_like, self._reg.omega)
        n = 0
        for batch in loader:
            t = dict(shard_batch(self.ctx, batch["tensors"]))
            if self._cache is not None:
                from vqacl_tpu.data.device_cache import _lookup_jit
                t["vis_feats"], t["boxes"] = _lookup_jit(
                    self._cache, t.pop("slots"))
            acc = self._imp_step(acc, self.state.params,
                                 self.state.proto, t)
            n += 1
            if n >= cfg.train.fisher_batches:
                break
        self._reg = R.consolidate(self._reg, self.state.params, acc, n)
        self._log(f"   {cfg.train.cl_reg} consolidated over {n} batches")

    # ------------------------------------------------------------------
    def predict(self, loader: BatchLoader) -> Dict[Any, str]:
        """Greedy generation over a loader → {question_id: answer string}
        (vqacl.py:586-624; the Gloo pickled-object all_gather at :613
        becomes `merge_quesid2ans` — identity on one process).

        Software-pipelined: batch i+1's decode is dispatched before batch
        i's tokens are pulled to host, hiding the device→host transfer
        (which pays a full tunnel RTT here) behind compute.

        Params are pre-cast to the compute dtype ONCE per predict() call
        (`cast_params_for_inference`): they don't change across the
        loader, and an f32-param eval step re-materializes the bf16
        weight copies every batch (~1.3 GB of cast traffic at t5-base).
        Bit-identical outputs."""
        from vqacl_tpu.models.vlt5 import cast_params_for_inference
        params = self.state.params
        if self.dtype == jnp.bfloat16:
            params = cast_params_for_inference(params, self.dtype)
        quesid2ans: Dict[Any, str] = {}
        pending = None  # (device tokens, meta)

        def drain(item):
            tokens, meta = item
            tokens = np.asarray(tokens)
            n_real = meta["n_real"]
            for qid, ans in zip(meta["question_ids"][:n_real],
                                self.tok.batch_decode(tokens[:n_real])):
                quesid2ans[qid] = ans

        for batch in loader:
            tokens = self.eval_step(params, self.state.proto,
                                    shard_batch(self.ctx, batch["tensors"]))
            if pending is not None:
                drain(pending)
            pending = (tokens, batch["meta"])
        if pending is not None:
            drain(pending)
        from vqacl_tpu.parallel.multihost import (merge_quesid2ans,
                                                  process_count)
        if process_count() > 1:
            quesid2ans = merge_quesid2ans(quesid2ans)
        return quesid2ans

    def evaluate(self, loader: BatchLoader, task: str) -> Dict[str, float]:
        quesid2ans = self.predict(loader)
        evaluator = self.data.evaluator(task, loader)
        return evaluator(quesid2ans)

    # ------------------------------------------------------------------
    def test(self, task: str, load: bool = False) -> None:
        """Evaluate on all previously trained tasks → result matrix row
        (vqacl.py:533-584)."""
        if load:
            params, proto, _ = load_checkpoint(
                os.path.join(self.cfg.output, f"{task}_LAST"))
            proto = self._maybe_load_reference_protos(proto)
            self.state = self.state._replace(
                params=self._place_params(params),
                proto=replicate(self.ctx, proto))
        trained_upto = self.tasks.index(task)
        for j in range(trained_upto + 1):
            test_task = self.tasks[j]
            loader = self.test_loader_dict_all.get(test_task)
            if loader is None:
                test_ds = self._slotify(
                    self.data.dataset(test_task, "test", task_idx=j))
                loader = all_loader(test_ds, self.cfg.train.valid_batch_size,
                                    with_targets=False, collate_kw=self._ck())
                self.test_loader_dict_all[test_task] = loader
            score = self.evaluate(loader, test_task)
            acc = score.get("overall", 0.0)
            self.result_matrix.record(task, test_task, acc)
            self._log(f"   test[{task}→{test_task}] = {acc:.2f}")
            # per-question/answer-type breakdown (vqacl.py:565-577)
            for key in ("perQuestionType", "perAnswerType"):
                if score.get(key):
                    self._log(f"     {key}: {score[key]}")

    def _maybe_load_reference_protos(self, proto):
        """Eval-only prototype ingest (vqacl.py:540-542): a reference
        run saves its banks as ``Q_prototype.pt``/``V_prototype.pt``
        (plain torch tensors) NEXT TO the ``{task}_LAST`` checkpoints,
        because upstream prototypes never enter ``state_dict``. When
        both files are present in ``cfg.output``, override the
        checkpoint's banks with them — the last step of "evaluate a
        reference-trained run on TPU". Our own checkpoints carry protos
        inline, so absence of the ``.pt`` files is the normal case."""
        qp = os.path.join(self.cfg.output, "Q_prototype.pt")
        vp = os.path.join(self.cfg.output, "V_prototype.pt")
        if os.path.exists(qp) and os.path.exists(vp):
            from vqacl_tpu.models.hf_import import load_reference_prototypes
            proto = load_reference_prototypes(proto, qp, vp)
            self._log(f"loaded reference prototype banks from {qp}, {vp}")
        return proto

    def Test(self) -> Dict:
        """Eval-only over the full sequence from saved per-task
        checkpoints (vqacl.py:511-531)."""
        for task in self.tasks:
            path = os.path.join(self.cfg.output, f"{task}_LAST.npz")
            if not os.path.exists(path):
                break
            self.test(task, load=True)
        return evaluate_metric(self.result_matrix.to_dict())

    # ------------------------------------------------------------------
    def _write_log(self) -> None:
        """Structured jsonl training log (the reference's wandb calls are
        all commented out upstream — SURVEY §5; this is the working
        observability equivalent)."""
        os.makedirs(self.cfg.output, exist_ok=True)
        path = os.path.join(self.cfg.output, "train_log.jsonl")
        with open(path, "w") as f:
            for entry in self.metrics_log:
                f.write(json.dumps(entry, default=float) + "\n")
            f.write(json.dumps(
                {"result_matrix": self.result_matrix.to_dict()},
                default=float) + "\n")

    def _loader_workers(self) -> int:
        """Host-fed loaders get the reference's DataLoader worker
        parallelism (vqa_data_memory.py:880, ``--num_workers`` default
        4: h5 reads + tokenize overlap across threads). With the HBM
        feature cache the batch is a handful of int32 arrays — worker
        threads only add scheduling noise, so stay serial."""
        if self._cache is not None:
            return 1
        return int(getattr(self.cfg.data, "n_workers", 1))

    def _ck(self) -> Dict:
        m = self.cfg.model
        return dict(max_text_length=m.max_text_length, n_boxes=m.n_boxes,
                    target_max_length=m.target_max_length,
                    n_ques_types=m.n_ques_types, n_categories=m.n_categories,
                    feat_dim=m.feat_dim)

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg, flush=True)
