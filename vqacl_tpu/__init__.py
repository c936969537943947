"""vqacl_tpu — a TPU-native (JAX/XLA/Pallas) continual-learning VQA framework.

A from-scratch rebuild of the capabilities of zhangxi1997/VQACL (CVPR 2023):
the VQACL dual-level continual-learning benchmark protocol, the VL-T5
encoder-decoder model with sample-specific/sample-invariant prototypes,
experience replay, composition-split evaluation, and the upstream
region-feature extraction pipeline — all redesigned TPU-first:

- compute path: pure-functional JAX compiled with jit/pjit onto the MXU,
  bf16 matmuls with f32 accumulation, static shapes throughout;
- parallelism: `jax.sharding.Mesh` + NamedSharding (data parallel by
  default, optional tensor-parallel param sharding), XLA collectives over
  ICI instead of NCCL/DDP;
- stateful mechanisms of the reference (prototype banks mutated inside
  ``forward``) become explicit state threaded through one compiled step;
- host orchestration (task schedule, replay buffer, string metrics) stays
  thin Python around the compiled steps.

Reference behavior citations in docstrings point into /root/reference
(e.g. ``VL-T5/src/modeling_t5_our.py:514``) for parity checking.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for metadata access)."""
    api = {
        "Config": ("vqacl_tpu.utils.config", "Config"),
        "VQACLTrainer": ("vqacl_tpu.cl.trainer", "VQACLTrainer"),
        "CompVQACLTrainer": ("vqacl_tpu.cl.comp_trainer", "CompVQACLTrainer"),
        "VQADataModule": ("vqacl_tpu.data.vqa_module", "VQADataModule"),
        "NextQADataModule": ("vqacl_tpu.nextqa.data", "NextQADataModule"),
        "VLT5Tokenizer": ("vqacl_tpu.data.tokenizer", "VLT5Tokenizer"),
        "VQAPredictor": ("vqacl_tpu.serve", "VQAPredictor"),
        "VQAEvaluator": ("vqacl_tpu.evaluation.vqa_acc", "VQAEvaluator"),
        "make_mesh": ("vqacl_tpu.parallel.mesh", "make_mesh"),
    }
    if name in api:
        import importlib
        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'vqacl_tpu' has no attribute {name!r}")
