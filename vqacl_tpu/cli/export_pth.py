"""Export a vqacl_tpu ``.npz`` checkpoint as a reference-loadable ``.pth``.

The inverse of the ingest direction (``--checkpoint <task>_LAST.pth`` /
``models.hf_import.load_reference_pth``): converts a checkpoint trained
here into a torch ``state_dict`` with the reference's key naming
(``trainer_base.py:246-269``), so a TPU-trained model can be loaded
back into the reference stack for A/B comparison or migration back.

Prototype banks live inside the ``.npz`` but have no reference
state_dict key (upstream never saves them) — they are skipped here; use
the ``Q/V_prototype.npy`` files the trainer also writes for
reference-style prototype workflows.

Usage:
    python -m vqacl_tpu.cli.export_pth <snap>/q_recognition_LAST.npz out.pth
"""
from __future__ import annotations

import argparse

from ..models.hf_import import save_reference_pth
from ..train.checkpoint import load_checkpoint


class _ShapeCfg:
    """to_state_dict only consults layer counts; read them off the tree."""

    def __init__(self, params) -> None:
        self.num_layers = sum(
            1 for k in params["encoder"] if k.startswith("block_"))
        self.num_decoder_layers = sum(
            1 for k in params["decoder"] if k.startswith("block_"))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="vqacl_tpu .npz checkpoint -> reference .pth")
    ap.add_argument("checkpoint", help="path to {task}_LAST[.npz]")
    ap.add_argument("out", help="output .pth path")
    a = ap.parse_args(argv)

    params, proto, step = load_checkpoint(a.checkpoint)
    cfg = _ShapeCfg(params)
    save_reference_pth(params, a.out, cfg)
    try:
        import numpy as np
        nonempty = proto is not None and (
            float(np.abs(np.asarray(proto.q_proto)).sum()) > 0
            or float(np.abs(np.asarray(proto.v_proto)).sum()) > 0)
    except Exception:
        nonempty = False
    if nonempty:
        print("note: checkpoint contains non-empty prototype banks — "
              "NOT carried into the .pth (the reference never saves "
              "them in state_dict); use the Q/V_prototype.npy files "
              "the trainer writes alongside checkpoints")
    print(f"wrote {a.out} (step {step}, enc {cfg.num_layers} / "
          f"dec {cfg.num_decoder_layers} layers)")


if __name__ == "__main__":
    main()
