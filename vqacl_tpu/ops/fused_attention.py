"""Pallas fused multi-head attention for the VL-T5 joint encoder.

The XLA path for ``t5.multihead_attention`` at this geometry (S=56,
d_kv=64, bs 80) spends more on LAYOUT than on math: every layer
physically transposes q/k/v [B,S,H,dk] → [B,H,S,dk] and the context
back again (xprof: ~7 ms/step of ``data formatting`` copies + the
copy-done staging they force), and round-trips [B,H,S,S] score/prob
tensors plus their dropout masks through HBM in the backward pass.

This kernel eliminates the layout domain entirely: it consumes q/k/v in
the **matmul-native [B, S, H·dk] layout** (exactly what the projection
GEMMs produce — no transpose, no reshape copies), slices each head's
[S, dk] panel in VMEM, and runs scores + bias + mask + softmax (+
in-kernel dropout from the TPU hardware PRNG) + weighted sum per batch
element without touching HBM. The backward pass is a second kernel
(flash-style: probabilities recomputed, dropout masks regenerated from
the same per-(b,h) PRNG streams) wired through ``jax.custom_vjp``; the
relative-position-bias gradient accumulates across the sequential batch
grid. One HBM read of q/k/v and one write of o (and their mirrors in
bwd) is all the attention traffic there is.

Semantics match ``t5.multihead_attention`` exactly (unscaled T5
attention, additive f32 bias = position bias + key-padding mask):
verified in tests against the einsum reference, fwd and grads.

Note: in-kernel dropout uses the TPU hardware PRNG (``pltpu.prng_seed``)
which has no CPU interpret-mode lowering — fused TRAINING (rate>0) is
TPU-only; fused inference/deterministic paths run everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _add_block(s: jnp.ndarray, blk: jnp.ndarray, L: int) -> jnp.ndarray:
    """s[:Lp,:Lp] += blk, where blk [Lp,Lp] is zero beyond row/col L.

    ``s`` may be rectangular [Tq, Sk] (decoder cross-attention).
    Implemented as zero-extension of ``blk`` followed by one add:
    Mosaic has no scatter-add, and concatenating *slices of s* trips
    its aligned-offset rules — fresh zero operands concat fine.
    (Head-pair block-diagonal dot packing was also tried here to fill
    the MXU: measured no gain over the serial per-head dots, which
    Mosaic already pipelines — reverted for simplicity.)"""
    del L
    Tq, Sk = s.shape
    Lp = blk.shape[0]
    blk = blk[:min(Lp, Tq), :min(Lp, Sk)]
    if blk.shape[1] < Sk:
        blk = jnp.concatenate(
            [blk, jnp.zeros((blk.shape[0], Sk - blk.shape[1]), blk.dtype)],
            axis=1)
    if blk.shape[0] < Tq:
        blk = jnp.concatenate(
            [blk, jnp.zeros((Tq - blk.shape[0], Sk), blk.dtype)], axis=0)
    return s + blk


def _pad_block(db: jnp.ndarray, H: int, L: int, Lp: int) -> jnp.ndarray:
    """[H,L,L] → [H,Lp,Lp] zero-padded via concat (no scatter)."""
    if L == Lp:
        return db
    db = jnp.concatenate(
        [db, jnp.zeros((H, L, Lp - L), db.dtype)], axis=2)
    return jnp.concatenate(
        [db, jnp.zeros((H, Lp - L, Lp), db.dtype)], axis=1)


def _pad_to(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _dropout_mask(seed, b, h, H, shape, rate):
    """Deterministic per-(batch, head) keep mask from the TPU PRNG —
    regenerated identically in the backward kernel."""
    pltpu.prng_seed(seed + b * H + h)
    bits = pltpu.prng_random_bits(shape)          # uint32
    thresh = np.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return bits < thresh


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref, o_ref,
                *, H, dk, L, dropout_rate, p_ref=None):
    """Per-batch-element block: q/k/v/o [1,S,H*dk], bias [H,Lp,Lp] (the
    text-text block only — the joint-encoder bias is structurally zero
    elsewhere, modeling_t5_our.py:258-273), mask [1,1,S]. Heads are
    [S,dk] panels of the minor dimension. With ``p_ref`` (train path)
    the PRE-dropout probabilities are saved [1,H*S,S] f32 so the
    backward kernel skips the scores dot + softmax recompute per head
    (the bwd kernel is latency-bound on small serial dots — dropping
    one of five is a measured win over the extra HBM round-trip)."""
    b = pl.program_id(0)
    qf = q_ref[0]                                  # [Tq, HD]
    kf = k_ref[0]                                  # [Sk, HD]
    vf = v_ref[0]
    S = qf.shape[0]                                # query length Tq
    neg = (1.0 - mask_ref[0, 0, :]) * NEG_INF      # [Sk]
    outs = []
    for h in range(H):
        sl = slice(h * dk, (h + 1) * dk)
        q = qf[:, sl].astype(jnp.float32)          # [Tq, dk]
        k = kf[:, sl].astype(jnp.float32)
        v = vf[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [Tq, Sk]
        if L > 0:
            s = _add_block(s, bias_ref[h], L)
        s = s + neg[None, :]
        p = jax.nn.softmax(s, axis=-1)
        if p_ref is not None:
            p_ref[0, h * S:(h + 1) * S, :] = p
        if dropout_rate > 0.0:
            keep = _dropout_mask(seed_ref[0], b, h, H, p.shape, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _fwd_kernel_save_p(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref,
                       o_ref, p_ref, *, H, dk, L, dropout_rate):
    _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref, o_ref,
                H=H, dk=dk, L=L, dropout_rate=dropout_rate, p_ref=p_ref)


def _stack_heads(f: jnp.ndarray, H: int, dk: int) -> jnp.ndarray:
    """[S, H·dk] → [H, S, dk] as a stack of head panels (Mosaic has no
    lane-splitting shape cast; panel slices relayout fine)."""
    return jnp.stack([f[:, h * dk:(h + 1) * dk] for h in range(H)], axis=0)


def _concat_heads(x: jnp.ndarray, H: int) -> jnp.ndarray:
    """[H, S, dk] → [S, H·dk]."""
    return jnp.concatenate([x[h] for h in range(H)], axis=1)


def _keep_masks(seed, b, H, shape, rate):
    """The fwd/bwd-shared per-(b,h) dropout streams, stacked [H,·,·]."""
    return jnp.stack([_dropout_mask(seed, b, h, H, shape, rate)
                      for h in range(H)], axis=0)


def _fwd_kernel_batched(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref,
                        o_ref, *, H, dk, L, dropout_rate, p_ref=None):
    """Head-batched forward: same math as ``_fwd_kernel`` but the 2·H
    per-head dots become 2 head-batched ``dot_general`` calls, which
    Mosaic pipelines as one MXU op sequence (measured faster than the
    serial per-head loop at the encoder geometry — attn_kernel_probe)."""
    b = pl.program_id(0)
    q = _stack_heads(q_ref[0], H, dk).astype(jnp.float32)   # [H,Tq,dk]
    k = _stack_heads(k_ref[0], H, dk).astype(jnp.float32)
    v = _stack_heads(v_ref[0], H, dk)
    Tq, Sk = q.shape[1], k.shape[1]
    neg = (1.0 - mask_ref[0, 0, :]) * NEG_INF                # [Sk]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [H,Tq,Sk]
    if L > 0:
        blk = bias_ref[...]                                  # [H,Lp,Lp]
        Lp = blk.shape[-1]
        blk = blk[:, :min(Lp, Tq), :min(Lp, Sk)]
        if blk.shape[2] < Sk:
            blk = jnp.concatenate(
                [blk, jnp.zeros((H, blk.shape[1], Sk - blk.shape[2]),
                                blk.dtype)], axis=2)
        if blk.shape[1] < Tq:
            blk = jnp.concatenate(
                [blk, jnp.zeros((H, Tq - blk.shape[1], Sk), blk.dtype)],
                axis=1)
        s = s + blk
    s = s + neg[None, None, :]
    p = jax.nn.softmax(s, axis=-1)                           # [H,Tq,Sk]
    if p_ref is not None:
        p_ref[0] = p.reshape(H * Tq, Sk)
    if dropout_rate > 0.0:
        keep = _keep_masks(seed_ref[0], b, H, (Tq, Sk), dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [H,Tq,dk]
    o_ref[0] = _concat_heads(o, H).astype(o_ref.dtype)


def _fwd_kernel_batched_save_p(q_ref, k_ref, v_ref, bias_ref, mask_ref,
                               seed_ref, o_ref, p_ref,
                               *, H, dk, L, dropout_rate):
    _fwd_kernel_batched(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref,
                        o_ref, H=H, dk=dk, L=L, dropout_rate=dropout_rate,
                        p_ref=p_ref)


def _bwd_kernel(q_ref, k_ref, v_ref, p_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, H, dk, L, dropout_rate):
    """Backward over saved probabilities: p_ref [1,H*Tq,Sk] f32 from the
    forward kernel replaces the per-head scores-dot + softmax recompute
    (bias/mask no longer needed — they only fed the scores). With
    ``L == 0`` (bias-free cross-attention) dbias is written once as
    zeros and the per-head block slices are skipped."""
    b = pl.program_id(0)
    qf = q_ref[0]                                  # [Tq, HD]
    kf = k_ref[0]                                  # [Sk, HD]
    vf = v_ref[0]
    dof = do_ref[0]
    S = qf.shape[0]                                # query length Tq
    Lp = dbias_ref.shape[-1]
    dqs, dks, dvs, dbs = [], [], [], []
    for h in range(H):
        sl = slice(h * dk, (h + 1) * dk)
        q = qf[:, sl].astype(jnp.float32)
        k = kf[:, sl].astype(jnp.float32)
        v = vf[:, sl].astype(jnp.float32)
        do = dof[:, sl].astype(jnp.float32)
        p = p_ref[0, h * S:(h + 1) * S, :]         # [Tq,Sk] f32
        if dropout_rate > 0.0:
            keep = _dropout_mask(seed_ref[0], b, h, H, p.shape, dropout_rate)
            pd = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            pd = p
        dv = jax.lax.dot_general(pd, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dpd / (1.0 - dropout_rate), 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))  # [S,S]
        dqs.append(jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dks.append(jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dvs.append(dv)
        if L > 0:
            dbs.append(ds[:L, :L])
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)
    if L == 0:
        @pl.when(b == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
        return
    db = _pad_block(jnp.stack(dbs, axis=0), H, L, Lp)   # [H,Lp,Lp]

    # accumulate bias grad across the (sequential) batch grid dimension
    @pl.when(b == 0)
    def _():
        dbias_ref[...] = db

    @pl.when(b != 0)
    def _():
        dbias_ref[...] = dbias_ref[...] + db


def _bwd_kernel_batched(q_ref, k_ref, v_ref, p_ref, seed_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, dbias_ref,
                        *, H, dk, L, dropout_rate):
    """Batched-dot backward: identical math to ``_bwd_kernel`` but the
    12 per-head python-loop iterations become 4 head-batched
    ``dot_general`` calls ([H,·,·] batch dimension — Mosaic lowers these
    as one pipelined MXU op sequence instead of 48 small serial dots).
    Costs one [S,H·dk]→[H,S,dk] relayout per operand; wins when the
    serial-dot pipeline, not the relayout, is the bottleneck — selected
    by measurement (scripts/attn_probe.py)."""
    b = pl.program_id(0)
    Tq = q_ref.shape[1]
    Sk = k_ref.shape[1]
    Lp = dbias_ref.shape[-1]

    q = _stack_heads(q_ref[0], H, dk).astype(jnp.float32)   # [H,Tq,dk]
    k = _stack_heads(k_ref[0], H, dk).astype(jnp.float32)
    v = _stack_heads(v_ref[0], H, dk).astype(jnp.float32)
    do = _stack_heads(do_ref[0], H, dk).astype(jnp.float32)
    p = p_ref[0].reshape(H, Tq, Sk)                # f32 (saved by fwd)
    if dropout_rate > 0.0:
        # regenerate the fwd kernel's EXACT per-(b,h) streams: only the
        # mask generation stays a per-head loop (VPU work), the dots
        # below are head-batched (MXU work)
        keep = _keep_masks(seed_ref[0], b, H, (Tq, Sk), dropout_rate)
        pd = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        pd = p
    bat = lambda a, bb, dims: jax.lax.dot_general(
        a, bb, (dims, ((0,), (0,))), preferred_element_type=jnp.float32)
    dv = bat(pd, do, ((1,), (1,)))                 # [H,Sk,dk]
    dpd = bat(do, v, ((2,), (2,)))                 # [H,Tq,Sk]
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dpd / (1.0 - dropout_rate), 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))   # [H,Tq,Sk]
    dq = bat(ds, k, ((2,), (1,)))                  # [H,Tq,dk]
    dk_ = bat(ds, q, ((1,), (1,)))                 # [H,Sk,dk]

    dq_ref[0] = _concat_heads(dq, H).astype(dq_ref.dtype)
    dk_ref[0] = _concat_heads(dk_, H).astype(dk_ref.dtype)
    dv_ref[0] = _concat_heads(dv, H).astype(dv_ref.dtype)
    if L == 0:
        @pl.when(b == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
        return
    db = _pad_block(ds[:, :L, :L], H, L, Lp)       # [H,Lp,Lp]

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = db

    @pl.when(b != 0)
    def _():
        dbias_ref[...] = dbias_ref[...] + db


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate, H, L,
              save_p: bool = False):
    B, Tq, HD = q.shape
    Sk = k.shape[1]
    Lp = bias.shape[-1]
    k_plain = _fwd_kernel_batched if FWD_IMPL == "batched" else _fwd_kernel
    k_save = (_fwd_kernel_batched_save_p if FWD_IMPL == "batched"
              else _fwd_kernel_save_p)
    q_spec = pl.BlockSpec((1, Tq, HD), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Sk, HD), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec,
                pl.BlockSpec((H, Lp, Lp), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Sk), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                _seed_spec()]
    if save_p:
        p_spec = pl.BlockSpec((1, H * Tq, Sk), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(k_save, H=H, dk=HD // H, L=L,
                              dropout_rate=dropout_rate),
            grid=(B,),
            in_specs=in_specs,
            out_specs=[q_spec, p_spec],
            out_shape=[jax.ShapeDtypeStruct((B, Tq, HD), q.dtype),
                       jax.ShapeDtypeStruct((B, H * Tq, Sk), jnp.float32)],
            interpret=interpret,
        )(q, k, v, bias, mask, seed)
    return pl.pallas_call(
        functools.partial(k_plain, H=H, dk=HD // H, L=L,
                          dropout_rate=dropout_rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, Tq, HD), q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask, seed)


# kernel implementations: "serial" (per-head dot loop) or "batched"
# (head-batched dot_generals — one pipelined MXU op sequence per call).
# Module-level so scripts/attn_kernel_probe.py can A/B them; defaults are
# the measured winners on v5e at the bench geometry (r5 paired probe,
# n=24 interleaved samples: batched/batched −1.5 ms/step vs
# serial/serial at >10× the paired SEM — BENCH_NOTES.md).
FWD_IMPL = "batched"
BWD_IMPL = "batched"


def _call_bwd(q, k, v, p, seed, do, interpret, dropout_rate, H, L, Lp):
    B, Tq, HD = q.shape
    Sk = k.shape[1]
    kern = _bwd_kernel_batched if BWD_IMPL == "batched" else _bwd_kernel
    q_spec = pl.BlockSpec((1, Tq, HD), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Sk, HD), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((H, Lp, Lp), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, H * Tq, Sk), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern, H=H, dk=HD // H, L=L,
                          dropout_rate=dropout_rate),
        grid=(B,),
        in_specs=[q_spec, kv_spec, kv_spec, p_spec, _seed_spec(), q_spec],
        out_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_shape=[jax.ShapeDtypeStruct((B, Tq, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, Sk, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, Sk, HD), q.dtype),
                   jax.ShapeDtypeStruct((H, Lp, Lp), jnp.float32)],
        interpret=interpret,
    )(q, k, v, p, seed, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool, dropout_rate: float, H: int, L: int,
                    bias: jnp.ndarray, mask: jnp.ndarray,
                    seed: jnp.ndarray) -> jnp.ndarray:
    """q/k/v [B,S,H*dk] in matmul-native layout (S multiple of 8);
    bias [H,Lp,Lp] f32 — the additive bias for the FIRST ``L`` query/key
    positions only (the T5 relative bias lives on the text-text block;
    the rest of the joint-encoder bias is structurally zero, so neither
    the zeros nor their gradients ever move through HBM); mask [B,1,S]
    1=attend; seed [1] int32 (per-layer dropout stream; identical keep
    masks are regenerated in the backward kernel). → [B,S,H*dk]."""
    return _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate,
                     H, L)


def _vjp_fwd(q, k, v, interpret, dropout_rate, H, L, bias, mask, seed):
    o, p = _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate,
                     H, L, save_p=True)
    return o, (q, k, v, p, seed, bias.shape[-1])


def _vjp_bwd(interpret, dropout_rate, H, L, res, do):
    q, k, v, p, seed, Lp = res
    dq, dk, dv, dbias = _call_bwd(q, k, v, p, seed, do,
                                  interpret, dropout_rate, H, L, Lp)
    return dq, dk, dv, dbias, None, None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               pos_bias: jnp.ndarray | None, mask: jnp.ndarray,
               interpret: bool = False,
               dropout_rate: float = 0.0,
               seed: jnp.ndarray | None = None,
               mesh=None, dp_axis: str = "dp") -> jnp.ndarray:
    """Shared rectangular core: q [B,Tq,H,dk], k/v [B,Sk,H,dk] (the
    projection outputs — reshaped flat for free, never transposed),
    pos_bias [H,L,L] f32 covering the first L query/key positions or
    ``None`` (bias-free cross-attention, L=0 fast path), mask [B,Sk]
    1=attend → [B,Tq,H*dk].

    ``mesh``: a ``pallas_call`` is not GSPMD-partitionable, so on a
    multi-device mesh the kernel runs under ``shard_map`` — batch dims
    split over ``dp_axis``, bias/seed replicated (shard_map's transpose
    psums the per-shard bias cotangents across ``dp``). Single-device
    callers pass ``mesh=None`` and skip the wrapper entirely."""
    B, Tq, H, dk = q.shape
    Sk = k.shape[1]
    HD = H * dk
    if pos_bias is None:
        L = 0
        bias_p = jnp.zeros((H, 8, 8), jnp.float32)   # dummy operand
    else:
        L = pos_bias.shape[-1]
        assert L <= min(Tq, Sk), (L, Tq, Sk)
        Lp = int(np.ceil(L / 8) * 8)
        bias_p = _pad_to(_pad_to(pos_bias.astype(jnp.float32), Lp, 1), Lp, 2)
    Tp = int(np.ceil(Tq / 8) * 8)
    Sp = int(np.ceil(Sk / 8) * 8)
    q2 = _pad_to(q.reshape(B, Tq, HD), Tp, 1)
    k2 = _pad_to(k.reshape(B, Sk, HD), Sp, 1)
    v2 = _pad_to(v.reshape(B, Sk, HD), Sp, 1)
    mask_p = _pad_to(mask.astype(jnp.float32), Sp, 1)[:, None, :]  # [B,1,Sk]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    # Any multi-device mesh must go through shard_map: a bare pallas_call
    # inside a multi-device jit is not GSPMD-partitionable. With dp==1
    # (pure-TP mesh) the P(dp_axis) specs degenerate to replicated and
    # every device runs the full kernel — correct, if redundant.
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        def per_shard(q2, k2, v2, mask_p, bias_p, seed):
            # decorrelate the per-(b,h) dropout streams across shards:
            # program_id(0) restarts at 0 on every device
            shift = jax.lax.axis_index(dp_axis).astype(jnp.int32) \
                * (q2.shape[0] * H)
            return fused_attention(q2, k2, v2, interpret, dropout_rate,
                                   H, L, bias_p, mask_p, seed + shift)

        o = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis),
                      P(), P()),
            out_specs=P(dp_axis), check_vma=False,
        )(q2, k2, v2, mask_p, bias_p, seed)
    else:
        o = fused_attention(q2, k2, v2, interpret, dropout_rate, H, L,
                            bias_p, mask_p, seed)
    return o[:, :Tq, :]


def fused_encoder_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            pos_bias: jnp.ndarray, mask: jnp.ndarray,
                            interpret: bool = False,
                            dropout_rate: float = 0.0,
                            seed: jnp.ndarray | None = None,
                            mesh=None, dp_axis: str = "dp") -> jnp.ndarray:
    """Self-attention entry point: q/k/v [B,S,H,dk], pos_bias [H,L,L]
    f32 covering the first L positions (pass [H,S,S] for a full bias —
    e.g. the decoder's causal+relative bias), mask [B,S] → [B,S,H*dk]."""
    return _fused_mha(q, k, v, pos_bias, mask, interpret=interpret,
                      dropout_rate=dropout_rate, seed=seed, mesh=mesh,
                      dp_axis=dp_axis)


def fused_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: jnp.ndarray,
                          interpret: bool = False,
                          dropout_rate: float = 0.0,
                          seed: jnp.ndarray | None = None,
                          mesh=None, dp_axis: str = "dp") -> jnp.ndarray:
    """Bias-free rectangular attention (decoder cross-attention):
    q [B,Tq,H,dk], k/v [B,Sk,H,dk], mask [B,Sk] → [B,Tq,H*dk]."""
    return _fused_mha(q, k, v, None, mask, interpret=interpret,
                      dropout_rate=dropout_rate, seed=seed, mesh=mesh,
                      dp_axis=dp_axis)
