"""Run configuration.

TPU-native replacement for the reference's argparse ``Config``
(``VL-T5/src/param.py:54-246``): a typed dataclass covering every
behaviorally-live flag of the reference plus the TPU-specific knobs
(mesh shape, dtype policy). Supports yaml round-trip like
``param.py:237-246`` and a CLI bridge in ``vqacl_tpu.cli``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict

import yaml


@dataclass
class ModelConfig:
    """VL-T5 architecture hyperparameters (t5-base defaults).

    Mirrors the HF t5-base config consumed at
    ``VL-T5/src/trainer_base.py:57-90`` with the visual-embedding
    extensions of ``modeling_t5_our.py:27-76``.
    """

    vocab_size: int = 32200          # 32100 sentencepiece+extra ids + 100 vis ids
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 3072
    num_layers: int = 12             # encoder layers
    num_decoder_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # t5-base v1.0 uses ReLU
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0

    # --- visual embedding (modeling_t5_our.py:27-76) ---
    feat_dim: int = 2048             # Faster-RCNN region feature dim
    pos_dim: int = 4                 # (x1,y1,x2,y2); +1 area appended in-model
    n_images: int = 2                # img_order embedding table size
    use_vis_order_embedding: bool = True
    use_vis_layer_norm: bool = True
    individual_vis_layer_norm: bool = True

    # --- sequence geometry (static; modeling_t5_our.py:381-382) ---
    max_text_length: int = 20
    n_boxes: int = 36
    gen_max_length: int = 20         # HF generate() default max_length
    target_max_length: int = 10      # answer token budget (vqa_data_memory.py:252)

    # --- prototype mechanism (modeling_t5_our.py:391-396,465-511) ---
    n_ques_types: int = 10           # Q prototype bank rows
    n_categories: int = 80           # V prototype bank rows (COCO)
    use_prototype: bool = True

    # --- TPU kernel options ---
    # Pallas fused encoder attention: True / False / "auto".
    # "auto" resolves (resolve_fused_attention) to True on a single-device
    # TPU and False elsewhere: the kernel has no CPU lowering for its
    # in-kernel dropout PRNG, and a pallas_call is not GSPMD-partitionable
    # so multi-chip meshes keep the XLA einsum path. encode() treats only
    # a strict True as enabled.
    fused_attention: object = "auto"
    fused_interpret: bool = False    # interpret mode (CPU tests)
    # Pallas kernels for the TRAIN decoder (causal self-attn + rectangular
    # cross-attn). Default off: measured +0.6 ms/step vs the XLA einsum
    # path at the reference geometry (T=10, B=80 — the per-program kernel
    # latency of 24 small-tensor grids outweighs the layout copies they
    # remove; BENCH_NOTES round 3). The kernels are parity-tested and
    # available for larger decoder geometries.
    fused_decoder: bool = False
    # merged q/k/v (self) and k/v (cross) projection GEMMs
    # (t5.qkv_proj_merged). "auto" → True on single-device backends;
    # multi-device meshes keep separate projections (a weight concat
    # along the tp-sharded output dim would make GSPMD re-shard every
    # layer). Pure algebraic regrouping — no param-layout change.
    merged_qkv: object = "auto"
    # fold ALL decoder layers' cross-attention K/V projections (layer-
    # invariant input: the encoder states) into ONE [D, n·2·H·dk] GEMM
    # (t5.cross_kv_fold_all). MEASURED REGRESSION at the reference
    # geometry (BENCH_NOTES round 3: 56.3 vs 46.2 ms/step — the [B,S,
    # n·2·H·dk] activation plus its backward cotangent outweigh the
    # 24-small-GEMM overhead they replace, the qkv-merge decode lesson
    # at train scale). Parity-tested and kept as an opt-in for models
    # whose decoder is deep relative to batch·S.
    folded_cross_kv: bool = False

    @property
    def encoder_len(self) -> int:
        return self.max_text_length + self.n_boxes

    @property
    def encoder_len_with_proto(self) -> int:
        return self.encoder_len + (2 if self.use_prototype else 0)


@dataclass
class TrainConfig:
    """Optimization hyperparameters (``VL-T5/scripts/VQACL_train.sh:11-31``)."""

    lr: float = 1e-4
    warmup_ratio: float = 0.1
    weight_decay: float = 0.01
    adam_eps: float = 1e-6
    adam_dtype: str = "bfloat16"     # Adam moment storage; bf16 halves
                                     # optimizer HBM state+traffic, −2.6
                                     # ms/step at bench geometry (arithmetic
                                     # stays f32 — optim.py); "float32" =
                                     # bit-exact reference-AdamW parity
    adam_impl: str = "hf"            # "hf" = reference's transformers AdamW
                                     # direction (ε inside, correction in
                                     # step size); "torch" = optax/torch
                                     # m̂/(√v̂+ε) (optim.py)
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    clip_grad_norm: float = 5.0
    # microbatches per optimizer step (lax.scan inside the compiled
    # step; averaged grads == full-batch grads — train/step.py). The
    # reference declares this flag but never accumulates (param.py:108).
    grad_accum: int = 1
    batch_size: int = 80
    valid_batch_size: int = 100
    epochs: int = 3
    schedule: str = "constant_warmup"   # trainer_base.py:189 (nextqa: linear)
    freeze: bool = False                # trainer_base.py:162-186 embed-only training
    from_scratch: bool = True
    seed: int = 66666                   # Question_type.py:2
    # loss weights for the SI memory regularizer (param.py:178-181)
    lambda_Q: float = 0.01
    lambda_V: float = 0.1
    lambda_Q_new: float = 0.0
    lambda_V_new: float = 0.0
    memory: bool = True                 # experience replay on
    # SI memory regularizer: the mechanism the λ flags weight. DEAD in
    # the shipped reference (memory=True never passed — SURVEY §2.5);
    # off by default for shipped-behavior parity, flip on to train the
    # paper's full SS+SI objective.
    use_memory_loss: bool = False
    m_size: int = 5000                  # replay buffer size M
    comp_cate: str = "G-1"              # held-out category group ("G-1" = none)
    # EMA coefficients (param.py:190-191); NExT-QA's train.sh overrides
    # beta to 0.5 explicitly (nextqa/train.sh:12-14).
    proto_alpha: float = 0.5
    proto_beta: float = 0.3
    use_class_hierarchy: bool = True    # dual-level inner loop over G1..G5
    # CL baselines from the paper's Table 1 (the reference implements
    # none of them): "none" | "ewc" | "mas" (parameter-importance,
    # cl/regularizers.py) | "der" | "derpp" (dark experience replay,
    # train/step.py::make_der_replay_step — replay batches train on
    # α·MSE against the logits stored when each exemplar entered the
    # buffer; derpp adds β·CE on the replay ground truth)
    cl_reg: str = "none"
    reg_lambda: float = 1.0             # penalty weight λ (EWC/MAS) / α (DER)
    fisher_batches: int = 40            # importance-estimation batches/task
    der_beta: float = 0.5               # DER++ CE weight β (derpp only)


@dataclass
class MeshConfig:
    """Device mesh / sharding policy (TPU-native; replaces DDP+NCCL,
    ``vqacl.py:127,645``)."""

    dp: int = -1                 # -1: all devices on the data axis
    tp: int = 1                  # tensor-parallel axis size
    pp: int = 1                  # pipeline-parallel stages (GPipe,
    pp_micro: int = 4            # parallel/pipeline.py) + microbatches
    dtype: str = "bfloat16"      # compute dtype
    param_dtype: str = "float32"
    remat: bool = False          # jax.checkpoint the encoder/decoder blocks
    # parameter placement: "replicated" (reference DDP semantics),
    # "tp" (Megatron head/hidden sharding), "fsdp" (ZeRO-3-style dp
    # sharding; composes with tp) — parallel/sharding.py
    param_layout: str = "replicated"


@dataclass
class DataConfig:
    """Dataset locations + loader policy (vqa_data_memory.py paths)."""

    dataset_root: str = "datasets"
    feature_files: Dict[str, str] = field(default_factory=dict)
    train_split: str = "karpathy_train"
    valid_split: str = "karpathy_val"
    test_split: str = "karpathy_test"
    n_workers: int = 4
    train_topk: int = -1
    valid_topk: int = -1
    answer_normalize: bool = False
    host_cache_bytes: int = 4 << 30   # host-RAM tier of the feature cache
    # HBM tier: preload ALL region features to device, batches carry
    # slot indices (data/device_cache.py). ~8x faster real training on
    # tunneled/slow-host setups; requires the table to fit (bf16 ≈
    # 147 KB/image, optionally dp-sharded across the mesh).
    device_cache: bool = False
    device_cache_sharded: bool = False
    device_cache_dtype: str = "bfloat16"   # bfloat16|float32|int8


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    output: str = "snap/vqacl"
    backbone: str = "t5-base"
    verbose: bool = True

    # ---- yaml round-trip (param.py:237-246 parity) ----
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        kw: Dict[str, Any] = {}
        for f_ in dataclasses.fields(cls):
            if f_.name not in raw:
                continue
            v = raw[f_.name]
            sub = {"model": ModelConfig, "train": TrainConfig,
                   "mesh": MeshConfig, "data": DataConfig}.get(f_.name)
            kw[f_.name] = sub(**v) if sub is not None and isinstance(v, dict) else v
        return cls(**kw)


def tiny_model_config(**overrides) -> ModelConfig:
    """A scaled-down architecture for tests (same code path, tiny shapes)."""
    base = dict(
        vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feat_dim=16, max_text_length=6,
        n_boxes=4, gen_max_length=6, target_max_length=5,
        n_ques_types=10, n_categories=80,
    )
    base.update(overrides)
    return ModelConfig(**base)


def resolve_fused_attention(model_cfg: ModelConfig,
                            n_devices: int = 1, mesh=None) -> None:
    """Resolve ``fused_attention="auto"`` in place.

    ``auto`` → True only on a single-device TPU backend: the Pallas
    kernel's in-kernel dropout needs the TPU PRNG (no CPU interpret
    lowering), and a ``pallas_call`` cannot be GSPMD-partitioned, so
    auto keeps the XLA einsum attention on multi-device meshes.

    An EXPLICIT ``fused_attention=True`` (``--fused_attention on``) on a
    multi-device mesh opts into the shard_map-wrapped kernel: the mesh
    is recorded on the config (``fused_mesh``, a non-field attribute —
    invisible to the yaml round-trip) and the kernel runs per-shard with
    batch dims split over ``dp`` (ops/fused_attention.py)."""
    if model_cfg.fused_attention == "auto":
        try:
            import jax
            backend = jax.default_backend()
        except Exception:             # pragma: no cover
            backend = "cpu"
        model_cfg.fused_attention = bool(
            backend in ("tpu", "axon") and n_devices == 1)
    if model_cfg.fused_attention is True and mesh is not None \
            and n_devices > 1:
        model_cfg.fused_mesh = mesh
    if getattr(model_cfg, "merged_qkv", "auto") == "auto":
        model_cfg.merged_qkv = bool(n_devices == 1)
    if getattr(model_cfg, "folded_cross_kv", "auto") == "auto":
        model_cfg.folded_cross_kv = False   # measured regression; opt-in
