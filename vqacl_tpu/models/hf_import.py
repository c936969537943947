"""Weight conversion: HF ``t5-base`` / reference VL-T5 checkpoints → pytree.

The reference builds its model with HF ``from_pretrained('t5-base')``
(/root/reference/VL-T5/src/trainer_base.py:92-102) and saves torch
``state_dict`` .pth files (``trainer_base.py:246-249`` with the
``vis_encoder.``→``encoder.`` key remap at :251-269). This module maps
either naming onto the vqacl_tpu parameter pytree so

- the T5 numerics can be cross-checked against HF (same weights → same
  logits) and
- users can carry reference-trained checkpoints over.

Pure numpy — no torch needed at run time (a torch ``state_dict`` can be
fed after ``{k: v.numpy() for ...}``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _a(x):
    return np.asarray(x, dtype=np.float32)


def _stack_params(sd: Mapping[str, np.ndarray], prefix: str, n_layers: int,
                  is_decoder: bool) -> Params:
    out: Params = {}
    for i in range(n_layers):
        b = f"{prefix}.block.{i}.layer"
        blk: Params = {
            "attn": {
                "wq": _t(sd[f"{b}.0.SelfAttention.q.weight"]),
                "wk": _t(sd[f"{b}.0.SelfAttention.k.weight"]),
                "wv": _t(sd[f"{b}.0.SelfAttention.v.weight"]),
                "wo": _t(sd[f"{b}.0.SelfAttention.o.weight"]),
            },
            "ln1": _a(sd[f"{b}.0.layer_norm.weight"]),
        }
        if is_decoder:
            blk["cross_attn"] = {
                "wq": _t(sd[f"{b}.1.EncDecAttention.q.weight"]),
                "wk": _t(sd[f"{b}.1.EncDecAttention.k.weight"]),
                "wv": _t(sd[f"{b}.1.EncDecAttention.v.weight"]),
                "wo": _t(sd[f"{b}.1.EncDecAttention.o.weight"]),
            }
            blk["ln2"] = _a(sd[f"{b}.1.layer_norm.weight"])
            ff = 2
        else:
            ff = 1
        blk["mlp"] = {
            "wi": _t(sd[f"{b}.{ff}.DenseReluDense.wi.weight"]),
            "wo": _t(sd[f"{b}.{ff}.DenseReluDense.wo.weight"]),
        }
        blk[f"ln{ff + 1}"] = _a(sd[f"{b}.{ff}.layer_norm.weight"])
        out[f"block_{i}"] = blk
    out["final_ln"] = _a(sd[f"{prefix}.final_layer_norm.weight"])
    out["rel_bias"] = _a(
        sd[f"{prefix}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"])
    return out


def _maybe_visual_embedding(sd: Mapping[str, np.ndarray], cfg) -> Params | None:
    """VL-T5 checkpoint visual-embedding params (modeling_t5_our.py:27-76);
    absent in a vanilla t5-base checkpoint."""
    candidates = ["encoder.visual_embedding", "vis_encoder.visual_embedding"]
    for pre in candidates:
        if f"{pre}.feat_embedding.0.weight" in sd:
            p: Params = {
                "feat_w": _t(sd[f"{pre}.feat_embedding.0.weight"]),
                "feat_b": _a(sd[f"{pre}.feat_embedding.0.bias"]),
                "pos_w": _t(sd[f"{pre}.absolute_vis_pos_embedding.0.weight"]),
                "pos_b": _a(sd[f"{pre}.absolute_vis_pos_embedding.0.bias"]),
            }
            if f"{pre}.feat_embedding.1.weight" in sd:
                p["feat_ln"] = _a(sd[f"{pre}.feat_embedding.1.weight"])
                p["pos_ln"] = _a(sd[f"{pre}.absolute_vis_pos_embedding.1.weight"])
            if f"{pre}.layer_norm.weight" in sd:
                p["joint_ln"] = _a(sd[f"{pre}.layer_norm.weight"])
            if f"{pre}.img_order_embedding.weight" in sd:
                p["img_order"] = _a(sd[f"{pre}.img_order_embedding.weight"])
            return p
    return None


def _resize_vocab(emb: np.ndarray, vocab_size: int, seed: int = 0) -> np.ndarray:
    """Extend/truncate the shared embedding to the VL-T5 vocab (32100 sp
    ids + 100 <vis_extra_id_*> rows at the top, tokenization.py:126).
    New rows get the T5 shared init N(0,1)."""
    v0, d = emb.shape
    if v0 == vocab_size:
        return emb
    if v0 > vocab_size:
        return emb[:vocab_size]
    extra = np.random.default_rng(seed).standard_normal(
        (vocab_size - v0, d)).astype(np.float32)
    return np.concatenate([emb, extra], axis=0)


def from_state_dict(sd: Mapping[str, Any], cfg,
                    strict_visual: bool = False) -> Params:
    """Convert an HF T5 / reference VL-T5 ``state_dict`` (numpy values)
    to the vqacl_tpu parameter pytree.

    Handles the reference's saved-checkpoint prefixes: strips a leading
    ``module.`` (DDP, utils.py:63-71) and remaps ``vis_encoder.`` →
    ``encoder.`` (trainer_base.py:251-269).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    sd = {("encoder." + k[len("vis_encoder."):] if k.startswith("vis_encoder.")
           else k): v for k, v in sd.items()}

    params: Params = {
        "shared": _resize_vocab(_a(sd["shared.weight"]), cfg.vocab_size),
        "encoder": _stack_params(sd, "encoder", cfg.num_layers, False),
        "decoder": _stack_params(sd, "decoder", cfg.num_decoder_layers, True),
    }
    vis = _maybe_visual_embedding(sd, cfg)
    if vis is not None:
        params["visual_embedding"] = vis
    elif strict_visual:
        raise KeyError("checkpoint has no visual_embedding weights")
    return params


def load_t5_base(cfg, name_or_path: str = "t5-base") -> Params:
    """Load HF t5-base weights (cached hub or local dir) → pytree.

    Tries the local HF cache first so offline machines fail fast
    instead of sitting through hub DNS retry/backoff cycles (observed:
    ~minutes of hang per file on a no-egress box); the network path
    only runs when the local lookup misses."""
    import transformers  # local import: torch only needed here

    try:
        model = transformers.T5ForConditionalGeneration.from_pretrained(
            name_or_path, local_files_only=True)
    except Exception:
        model = transformers.T5ForConditionalGeneration.from_pretrained(
            name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return from_state_dict(sd, cfg)


def to_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Inverse of :func:`from_state_dict`: pytree → reference/HF T5 key
    naming, so checkpoints trained here can be loaded back into the
    reference stack (``trainer_base.py:246-269`` — its loader strips
    ``module.`` and remaps ``vis_encoder.``, then ``load_state_dict``).

    Linear weights go back to torch ``[out, in]`` orientation; the tied
    ``encoder/decoder.embed_tokens`` and ``lm_head`` copies of
    ``shared`` are emitted so HF-style loads find every key. Prototype
    banks are NOT exported — the reference never saves them
    (``modeling_t5_our.py`` keeps them as plain module attrs outside
    the state_dict), so there is no key to round-trip them through.
    """
    sd: Dict[str, np.ndarray] = {}

    def put_stack(stack: Params, prefix: str, n_layers: int,
                  is_decoder: bool) -> None:
        for i in range(n_layers):
            blk = stack[f"block_{i}"]
            b = f"{prefix}.block.{i}.layer"
            for nm, w in (("q", "wq"), ("k", "wk"), ("v", "wv"),
                          ("o", "wo")):
                sd[f"{b}.0.SelfAttention.{nm}.weight"] = _t(blk["attn"][w])
            sd[f"{b}.0.layer_norm.weight"] = _a(blk["ln1"])
            if is_decoder:
                for nm, w in (("q", "wq"), ("k", "wk"), ("v", "wv"),
                              ("o", "wo")):
                    sd[f"{b}.1.EncDecAttention.{nm}.weight"] = \
                        _t(blk["cross_attn"][w])
                sd[f"{b}.1.layer_norm.weight"] = _a(blk["ln2"])
                ff = 2
            else:
                ff = 1
            sd[f"{b}.{ff}.DenseReluDense.wi.weight"] = _t(blk["mlp"]["wi"])
            sd[f"{b}.{ff}.DenseReluDense.wo.weight"] = _t(blk["mlp"]["wo"])
            sd[f"{b}.{ff}.layer_norm.weight"] = _a(blk[f"ln{ff + 1}"])
        sd[f"{prefix}.final_layer_norm.weight"] = _a(stack["final_ln"])
        sd[f"{prefix}.block.0.layer.0.SelfAttention"
           ".relative_attention_bias.weight"] = _a(stack["rel_bias"])

    shared = _a(params["shared"])
    sd["shared.weight"] = shared
    sd["encoder.embed_tokens.weight"] = shared
    sd["decoder.embed_tokens.weight"] = shared
    sd["lm_head.weight"] = shared
    put_stack(params["encoder"], "encoder", cfg.num_layers, False)
    put_stack(params["decoder"], "decoder", cfg.num_decoder_layers, True)
    vis = params.get("visual_embedding")
    if vis is not None:
        pre = "encoder.visual_embedding"
        sd[f"{pre}.feat_embedding.0.weight"] = _t(vis["feat_w"])
        sd[f"{pre}.feat_embedding.0.bias"] = _a(vis["feat_b"])
        sd[f"{pre}.absolute_vis_pos_embedding.0.weight"] = _t(vis["pos_w"])
        sd[f"{pre}.absolute_vis_pos_embedding.0.bias"] = _a(vis["pos_b"])
        if "feat_ln" in vis:
            sd[f"{pre}.feat_embedding.1.weight"] = _a(vis["feat_ln"])
            sd[f"{pre}.absolute_vis_pos_embedding.1.weight"] = \
                _a(vis["pos_ln"])
        if "joint_ln" in vis:
            sd[f"{pre}.layer_norm.weight"] = _a(vis["joint_ln"])
        if "img_order" in vis:
            sd[f"{pre}.img_order_embedding.weight"] = _a(vis["img_order"])
        # reference VL-T5 ties obj_order_embedding to shared
        # (modeling_t5_our.py:418) and the tied copy lands in its saved
        # state_dicts; emit it for exact key parity on strict loads
        sd[f"{pre}.obj_order_embedding.weight"] = shared
    return sd


def save_reference_pth(params: Params, path: str, cfg) -> None:
    """Export a trained pytree as a reference-loadable ``.pth``
    state_dict (the migration round-trip partner of
    :func:`load_reference_pth`)."""
    import torch

    # copy (not view) — to_state_dict can return read-only views of the
    # checkpoint arrays; torch.from_numpy on those warns and would alias
    # the checkpoint storage
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in to_state_dict(params, cfg).items()}
    torch.save(sd, path)


def load_reference_prototypes(proto, q_path: str, v_path: str):
    """Ingest reference-trained prototype banks (``Q_prototype.pt`` /
    ``V_prototype.pt``, plain ``torch.save``-d tensors — vqacl.py:420-426)
    into a :class:`ProtoState`, the eval-only load of vqacl.py:540-542.

    Returns ``proto`` with ``q_proto``/``v_proto`` replaced; the EMA
    bookkeeping fields are untouched (the reference does not save them —
    they only matter during training)."""
    import torch

    def _bank(path, want_shape, name):
        t = torch.load(path, map_location="cpu")
        arr = np.asarray(t.detach().cpu().numpy(), dtype=np.float32)
        if arr.shape != tuple(want_shape):
            raise ValueError(
                f"{name} bank shape {arr.shape} != expected {want_shape} "
                f"({path})")
        return arr

    q = _bank(q_path, proto.q_proto.shape, "Q_prototype")
    v = _bank(v_path, proto.v_proto.shape, "V_prototype")
    return proto._replace(q_proto=_like(proto.q_proto, q),
                          v_proto=_like(proto.v_proto, v))


def _like(ref, arr):
    """numpy → same array namespace/dtype as ``ref`` (jnp or np)."""
    import jax.numpy as jnp
    return jnp.asarray(arr, dtype=ref.dtype)


def load_reference_pth(path: str, cfg) -> Params:
    """Ingest a reference-trained checkpoint (``{task}_LAST.pth``,
    trainer_base.py:246-249): torch state_dict → pytree, with the
    ``module.``/``vis_encoder.`` remaps applied."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd and hasattr(
            sd["model"], "items"):
        sd = sd["model"]
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    return from_state_dict(sd, cfg)
