"""Compiled train / eval steps.

The reference hot loop (vqacl.py:364-389 → vqa_model.py:18 →
modeling_t5_our.py:514) does per-batch host→device copies, a DDP
all-reduce, clip, AdamW step and LR-scheduler tick as separate torch
ops. Here the ENTIRE iteration — forward (incl. prototype EMA update +
retrieval), backward, clip, AdamW, schedule — is one jit-compiled XLA
program over the device mesh; gradient reduction is implicit in the
batch sharding (psum over ``dp`` inserted by GSPMD). Replay training
(two steps per iteration, vqacl.py:371-373) reuses the same compiled fn.

Eval is a second compiled program: encode → prototype retrieval
(hoisted out of the decode loop) → scan-based greedy decode.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vqacl_tpu.models import vlt5
from vqacl_tpu.models.generate import greedy_decode
from vqacl_tpu.train.optim import dynamic_lr
from vqacl_tpu.train.state import TrainState


def make_train_step(cfg, tx: optax.GradientTransformation,
                    dtype=jnp.bfloat16,
                    use_prototype: Optional[bool] = None,
                    use_memory_loss: bool = False,
                    remat: bool = False,
                    donate: bool = True,
                    reg_lambda: float = 0.0) -> Callable:
    """Returns jitted ``(state, batch) -> (state, metrics)``; with
    ``reg_lambda > 0`` the signature is ``(state, batch, reg)`` where
    ``reg`` is a ``cl.regularizers.RegState`` and the loss gains the
    EWC/MAS quadratic anchor penalty ``λ/2 Σ ω (θ−θ*)²`` (differentiated
    inside the same compiled program — no extra host step).

    batch: input_ids[B,L] i32, vis_feats[B,N,2048] f32, boxes[B,N,4] f32,
    target_ids[B,T] i32 (-100 pad), scores[B] f32, ques_labels[B,10],
    cate_labels[B,80].
    """
    mcfg, tcfg = cfg.model, cfg.train
    if use_prototype is None:
        use_prototype = mcfg.use_prototype

    def loss_fn(params, proto, batch, rng, reg=None):
        out = vlt5.forward_train(
            params, mcfg, batch, proto,
            proto_alpha=tcfg.proto_alpha, proto_beta=tcfg.proto_beta,
            use_prototype=use_prototype,
            use_memory_loss=use_memory_loss,
            lambda_q=tcfg.lambda_Q, lambda_v=tcfg.lambda_V,
            deterministic=False, rng=rng, dtype=dtype, remat=remat)
        loss = out.loss
        if reg is not None:
            from vqacl_tpu.cl.regularizers import penalty
            loss = loss + 0.5 * reg_lambda * penalty(params, reg)
        return loss, (out.proto_state, out.aux)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    accum = int(getattr(tcfg, "grad_accum", 1))

    def _accum_grads(state, batch, step_rng, reg=None):
        """lax.scan over ``accum`` equal microbatches: averaged grads are
        bit-for-bit the full-batch grads (the loss is a per-example batch
        mean), at 1/accum the activation memory. The prototype EMA bank
        threads sequentially through the microbatches — the same
        semantics as running the reference at the micro batch size. The
        reference declares ``--gradient_accumulation_steps``
        (param.py:108) but only ever divides its schedule length by it
        (trainer_base.py:139); this is the working version."""
        B = next(iter(batch.values())).shape[0]
        if B % accum:
            raise ValueError(f"batch size {B} not divisible by "
                             f"grad_accum={accum}")

        def _split(x):
            return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

        mbs = jax.tree.map(_split, batch)
        rngs = jax.random.split(step_rng, accum)
        zeros = jax.tree.map(jnp.zeros_like, state.params)

        def body(carry, xs):
            proto_c, gsum = carry
            mb, r = xs
            (l, (proto_c, aux)), g = grad_fn(state.params, proto_c, mb, r,
                                             reg)
            gsum = jax.tree.map(jnp.add, gsum, g)
            return (proto_c, gsum), (l, aux)

        (proto, gsum), (losses, auxes) = jax.lax.scan(
            body, (state.proto, zeros), (mbs, rngs))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        return losses.mean(), proto, jax.tree.map(jnp.mean, auxes), grads

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   reg=None) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)
        if accum > 1:
            loss, proto, aux, grads = _accum_grads(state, batch, step_rng,
                                                   reg)
        else:
            (loss, (proto, aux)), grads = grad_fn(
                state.params, state.proto, batch, step_rng, reg)
        # LR-less AdamW direction, then dynamic schedule (see optim.py)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        lr = dynamic_lr(state.step.astype(jnp.float32), state.sched,
                        tcfg.lr, tcfg.schedule)
        params = jax.tree.map(lambda p, u: p - lr * u,
                              state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, proto=proto, rng=rng,
                               sched=state.sched)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "lr": lr,
            "loss_memory_Q": aux.loss_memory_q,
            "loss_memory_V": aux.loss_memory_v,
            "retrieval_acc_Q": aux.retrieval_acc_q,
            "retrieval_acc_V": aux.retrieval_acc_v,
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg, dtype=jnp.bfloat16,
                   use_prototype: Optional[bool] = None,
                   max_length: Optional[int] = None,
                   num_beams: int = 1) -> Callable:
    """Returns jitted ``(params, proto, batch) -> token_ids [B, T]``.

    Mirrors ``test_step`` (vqa_model.py:69-119): encoder once, prototype
    retrieval WITHOUT update (modeling_t5_our.py:607-611), then greedy
    decode (the reference's effective behavior — SURVEY §2.5) or beam
    search when ``num_beams > 1``.
    """
    from vqacl_tpu.models.generate import beam_search

    mcfg = cfg.model
    if use_prototype is None:
        use_prototype = mcfg.use_prototype

    def eval_step(params, proto, batch):
        hidden, enc_mask = vlt5.encode(
            params, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=True, dtype=dtype)
        if use_prototype:
            hidden, enc_mask, _, _ = vlt5.augment(
                params, mcfg, hidden, enc_mask, proto,
                proto_update_flag=False)
        if num_beams > 1:
            return beam_search(params, mcfg, hidden, enc_mask,
                               num_beams=num_beams, max_length=max_length,
                               dtype=dtype)
        return greedy_decode(params, mcfg, hidden, enc_mask,
                             max_length=max_length, dtype=dtype)

    return jax.jit(eval_step)


def make_logits_step(cfg, dtype=jnp.bfloat16,
                     use_prototype: Optional[bool] = None) -> Callable:
    """Teacher-forced logits ``(params, proto, batch) -> [B,T,V] f32``
    with retrieval-only prototypes, deterministic — the DER capture
    pass (cl/trainer.py::_der_capture) that snapshots each exemplar's
    logits as it enters the replay buffer."""
    mcfg = cfg.model
    if use_prototype is None:
        use_prototype = mcfg.use_prototype

    def logits_step(params, proto, batch):
        hidden, enc_mask = vlt5.encode(
            params, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=True, dtype=dtype)
        if use_prototype:
            hidden, enc_mask, _, _ = vlt5.augment(
                params, mcfg, hidden, enc_mask, proto,
                proto_update_flag=False)
        return vlt5.decode_train(params, mcfg, hidden, enc_mask,
                                 batch["target_ids"], deterministic=True,
                                 dtype=dtype)

    return jax.jit(logits_step)


def make_der_replay_step(cfg, tx: optax.GradientTransformation,
                         dtype=jnp.bfloat16,
                         use_prototype: Optional[bool] = None,
                         remat: bool = False,
                         donate: bool = True) -> Callable:
    """Dark-Experience-Replay step (Buzzega et al. 2020) for memory
    batches — a Table-1 comparison method the reference repo doesn't
    implement (its replay is plain ER: a second CE step,
    vqacl.py:371-373).

    The batch carries ``der_logits`` [B,T,V] f16: the model's
    teacher-forced logits captured when each exemplar entered the
    buffer, with the teacher-forcing targets pinned at capture time
    (data/partition.py). Loss = α·MSE(current logits, stored logits)
    over valid target positions (α = ``train.reg_lambda``); DER++
    (``cl_reg='derpp'``) adds β·CE on the replay ground truth
    (β = ``train.der_beta``). Optimizer/clip/schedule scaffolding is
    identical to ``make_train_step`` — one compiled program. Prototype
    banks EMA-update exactly like a normal replay step so the SS/SI
    mechanism composes with DER when ``use_prototype`` is on.
    """
    mcfg, tcfg = cfg.model, cfg.train
    alpha = float(tcfg.reg_lambda)
    beta = float(getattr(tcfg, "der_beta", 0.5)) \
        if tcfg.cl_reg == "derpp" else 0.0
    if use_prototype is None:
        use_prototype = mcfg.use_prototype

    def loss_fn(params, proto, batch, rng):
        r_enc, r_dec = jax.random.split(rng)
        hidden, enc_mask = vlt5.encode(
            params, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=False, rng=r_enc, dtype=dtype,
            remat=remat)
        if use_prototype:
            hidden, enc_mask, proto_new, _ = vlt5.augment(
                params, mcfg, hidden, enc_mask, proto,
                batch["ques_labels"], batch["cate_labels"],
                proto_update_flag=True,
                proto_alpha=tcfg.proto_alpha, proto_beta=tcfg.proto_beta)
        else:
            proto_new = proto
        logits = vlt5.decode_train(params, mcfg, hidden, enc_mask,
                                   batch["target_ids"], deterministic=False,
                                   rng=r_dec, dtype=dtype, remat=remat)
        mask = (batch["target_ids"] != -100).astype(jnp.float32)   # [B,T]
        z = batch["der_logits"].astype(jnp.float32)
        se = jnp.mean((logits.astype(jnp.float32) - z) ** 2, axis=-1)
        mse = jnp.sum(se * mask) / jnp.clip(mask.sum(), 1.0, None)
        loss = alpha * mse
        if beta > 0.0:
            loss = loss + beta * vlt5.weighted_lm_loss(
                logits, batch["target_ids"], batch["scores"])
        return loss, (proto_new, mse)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def der_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                 ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)
        (loss, (proto, mse)), grads = grad_fn(
            state.params, state.proto, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        lr = dynamic_lr(state.step.astype(jnp.float32), state.sched,
                        tcfg.lr, tcfg.schedule)
        params = jax.tree.map(lambda p, u: p - lr * u,
                              state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, proto=proto, rng=rng,
                               sched=state.sched)
        return new_state, {"loss": loss, "der_mse": mse,
                           "grad_norm": optax.global_norm(grads), "lr": lr}

    return jax.jit(der_step, donate_argnums=(0,) if donate else ())


def make_loss_eval_step(cfg, dtype=jnp.bfloat16,
                        use_prototype: Optional[bool] = None) -> Callable:
    """Validation-loss step: teacher-forced loss with retrieval-only
    prototypes (no grad, no bank update)."""
    mcfg = cfg.model
    if use_prototype is None:
        use_prototype = mcfg.use_prototype

    def eval_loss(params, proto, batch):
        hidden, enc_mask = vlt5.encode(
            params, mcfg, batch["input_ids"], batch["vis_feats"],
            batch["boxes"], deterministic=True, dtype=dtype)
        if use_prototype:
            hidden, enc_mask, _, _ = vlt5.augment(
                params, mcfg, hidden, enc_mask, proto,
                proto_update_flag=False)
        logits = vlt5.decode_train(params, mcfg, hidden, enc_mask,
                                   batch["target_ids"], deterministic=True,
                                   dtype=dtype)
        return vlt5.weighted_lm_loss(logits, batch["target_ids"],
                                     batch["scores"])

    return jax.jit(eval_loss)
