"""Pallas fused multi-head attention for the VL-T5 joint encoder.

The unfused path materializes per-layer [B, H, S, S] f32 score/prob
tensors through HBM (S=58 → ~13 MB × several round-trips × 12 layers
per step). This kernel keeps the whole attention for one batch element
in VMEM: scores + bias + softmax + weighted sum never touch HBM.

Shapes are tiny by design (S ≤ 64 after padding, d_kv=64), so the
kernel processes ONE batch element per grid step with the head loop
unrolled — traffic-, not FLOP-, bound. Backward is a second Pallas
kernel (flash-style recompute of the probabilities) wired through
``jax.custom_vjp``; the relative-position-bias gradient is accumulated
across the batch grid dimension by revisiting the same output block.

Semantics match ``t5.multihead_attention`` exactly (unscaled T5
attention, additive f32 bias = position bias + key-padding mask):
verified in tests against the einsum reference, including in-kernel
attention-prob dropout (deterministic per-(b,h) TPU PRNG streams,
regenerated in the backward kernel).

Note: in-kernel dropout uses the TPU hardware PRNG (``pltpu.prng_seed``)
which has no CPU interpret-mode lowering — fused TRAINING (rate>0) is
TPU-only; fused inference/deterministic paths run everywhere.

MEASURED (v5e, t5-base geometry, bs 80): full train step 58.8 ms fused
vs 55.8 ms unfused — at S=58 XLA already fuses the softmax chain well
and the per-batch-element grid (80 × 12 unrolled 64×64 matmuls)
under-fills the MXU, so the kernel does not pay off at this geometry
and ``ModelConfig.fused_attention`` defaults to False. It becomes the
right tool when sequences grow (video frames, multi-image) — the
crossover is roughly S ≥ 256 where the [B,H,S,S] HBM traffic dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


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
                *, H, dropout_rate):
    """Per-batch-element block: q/k/v [H,S,dk], bias [H,S,S], mask [1,S]."""
    b = pl.program_id(0)
    mask_row = mask_ref[0, 0, :]                  # [S]
    neg = (1.0 - mask_row) * NEG_INF              # [S]
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)       # [S, dk]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [S, S]
        s = s + bias_ref[h] + neg[None, :]
        p = jax.nn.softmax(s, axis=-1)
        if dropout_rate > 0.0:
            keep = _dropout_mask(seed_ref[0], b, h, H, p.shape, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, seed_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, H, dropout_rate):
    b = pl.program_id(0)
    mask_row = mask_ref[0, 0, :]
    neg = (1.0 - mask_row) * NEG_INF
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h] + neg[None, :]
        p = jax.nn.softmax(s, axis=-1)            # [S,S]
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
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)

        # accumulate bias grad across the batch grid dimension
        @pl.when(b == 0)
        def _():
            dbias_ref[h] = ds

        @pl.when(b != 0)
        def _():
            dbias_ref[h] = dbias_ref[h] + ds


def _seed_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate):
    B, H, S, dk = q.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, dropout_rate=dropout_rate),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, S, dk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S, dk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S, dk), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, S, S), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _seed_spec(),
        ],
        out_specs=pl.BlockSpec((1, H, S, dk), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, dk), q.dtype),
        interpret=interpret,
    )(q, k, v, bias, mask, seed)


def _call_bwd(q, k, v, bias, mask, seed, do, interpret, dropout_rate):
    B, H, S, dk = q.shape
    spec_qkv = pl.BlockSpec((1, H, S, dk), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, dropout_rate=dropout_rate),
        grid=(B,),
        in_specs=[spec_qkv, spec_qkv, spec_qkv,
                  pl.BlockSpec((H, S, S), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  _seed_spec(),
                  spec_qkv],
        out_specs=[spec_qkv, spec_qkv, spec_qkv,
                   pl.BlockSpec((H, S, S), lambda b: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, H, S, dk), q.dtype),
                   jax.ShapeDtypeStruct((B, H, S, dk), q.dtype),
                   jax.ShapeDtypeStruct((B, H, S, dk), q.dtype),
                   jax.ShapeDtypeStruct((H, S, S), jnp.float32)],
        interpret=interpret,
    )(q, k, v, bias, mask, seed, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool, dropout_rate: float,
                    bias: jnp.ndarray, mask: jnp.ndarray,
                    seed: jnp.ndarray) -> jnp.ndarray:
    """q/k/v [B,H,S,dk] (S multiple of 8, dk of 64 recommended);
    bias [H,S,S] f32 (shared across batch — the T5 relative position
    bias, trainable); mask [B,1,S] 1=attend; seed [1] int32 (per-layer
    dropout stream; identical keep-masks are regenerated in the
    backward kernel). → [B,H,S,dk]."""
    return _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate)


def _vjp_fwd(q, k, v, interpret, dropout_rate, bias, mask, seed):
    o = _call_fwd(q, k, v, bias, mask, seed, interpret, dropout_rate)
    return o, (q, k, v, bias, mask, seed)


def _vjp_bwd(interpret, dropout_rate, res, do):
    q, k, v, bias, mask, seed = res
    dq, dk, dv, dbias = _call_bwd(q, k, v, bias, mask, seed, do,
                                  interpret, dropout_rate)
    return dq, dk, dv, dbias, None, None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fused_encoder_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            pos_bias: jnp.ndarray, mask: jnp.ndarray,
                            interpret: bool = False,
                            dropout_rate: float = 0.0,
                            seed: jnp.ndarray | None = None) -> jnp.ndarray:
    """Convenience wrapper handling S-padding to a sublane multiple.

    q/k/v [B,S,H,dk] (the layout t5.multihead_attention produces),
    pos_bias [H,S,S] f32, mask [B,S] → [B,S,H*dk].
    """
    B, S, H, dk = q.shape
    Sp = int(np.ceil(S / 8) * 8)
    qt = _pad_to(jnp.transpose(q, (0, 2, 1, 3)), Sp, 2)
    kt = _pad_to(jnp.transpose(k, (0, 2, 1, 3)), Sp, 2)
    vt = _pad_to(jnp.transpose(v, (0, 2, 1, 3)), Sp, 2)
    bias_p = _pad_to(_pad_to(pos_bias.astype(jnp.float32), Sp, 1), Sp, 2)
    mask_p = _pad_to(mask.astype(jnp.float32), Sp, 1)[:, None, :]  # [B,1,S]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    o = fused_attention(qt, kt, vt, interpret, dropout_rate,
                        bias_p, mask_p, seed)
    o = jnp.transpose(o[:, :, :S, :], (0, 2, 1, 3))    # [B,S,H,dk]
    return o.reshape(B, S, H * dk)
