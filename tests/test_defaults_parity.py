"""Defaults-parity guard: our CLI defaults must reproduce the reference's
*effective* published-run configuration.

The effective value of a flag in the reference's published VQA v2 run is
(a) the value passed by ``VL-T5/scripts/VQACL_train.sh`` when present,
else (b) the argparse default in ``VL-T5/src/param.py``.  Round 1 shipped
a ``proto_beta``/``lambda_*`` divergence of exactly class (b) — this test
makes that class of bug impossible to reintroduce.

Two layers of defense:
  1. EXPECTED below is a hand-audited transcription (citations inline).
     ``parse_config`` with only the script-passed flags must reproduce it.
  2. When the reference tree is present, param.py is re-parsed and the
     transcription itself is cross-checked against the source.
"""

import os
import re

import pytest

from vqacl_tpu.cli.args import parse_config

REF_PARAM = "/root/reference/VL-T5/src/param.py"

# Flags the published run passes in VQACL_train.sh (overrides param.py).
SCRIPT_ARGS = [
    "--train", "karpathy_train", "--valid", "karpathy_val",
    "--test", "karpathy_test",
    "--warmup_ratio", "0.1", "--clip_grad_norm", "5", "--lr", "1e-4",
    "--epochs", "3", "--num_workers", "4", "--backbone", "t5-base",
    "--batch_size", "80", "--valid_batch_size", "100",
    "--from_scratch", "--memory", "--m_size", "5000",
    "--comp_cate", "G-1", "--now_train",
]

# Effective reference values NOT overridden by the script — i.e. the
# param.py argparse defaults the published run silently relies on.
# (file: /root/reference/VL-T5/src/param.py, line cited per flag)
PARAM_PY_DEFAULTS = {
    "seed": 66666,          # :58
    "weight_decay": 0.01,   # :106
    "adam_eps": 1e-6,       # :111
    "n_boxes": 36,          # :97
    "max_text_length": 20,  # :99
    "gen_max_length": 20,   # :127
    "lambda_Q": 0.01,       # :178
    "lambda_V": 0.1,        # :179
    "lambda_Q_new": 0.0,    # :180
    "lambda_V_new": 0.0,    # :181
    "proto_alpha": 0.5,     # :190
    "proto_beta": 0.3,      # :191
}


def test_effective_run_defaults_match_reference():
    cfg = parse_config(SCRIPT_ARGS)
    t, m = cfg.train, cfg.model
    got = {
        "seed": t.seed, "weight_decay": t.weight_decay,
        "adam_eps": t.adam_eps, "n_boxes": m.n_boxes,
        "max_text_length": m.max_text_length,
        "gen_max_length": m.gen_max_length,
        "lambda_Q": t.lambda_Q, "lambda_V": t.lambda_V,
        "lambda_Q_new": t.lambda_Q_new, "lambda_V_new": t.lambda_V_new,
        "proto_alpha": t.proto_alpha, "proto_beta": t.proto_beta,
    }
    assert got == pytest.approx(PARAM_PY_DEFAULTS)
    # script-passed values land too
    assert (t.lr, t.warmup_ratio, t.clip_grad_norm) == (1e-4, 0.1, 5.0)
    assert (t.batch_size, t.valid_batch_size, t.epochs) == (80, 100, 3)
    assert (t.memory, t.m_size, t.comp_cate) == (True, 5000, "G-1")
    assert t.from_scratch and cfg.backbone == "t5-base"


@pytest.mark.skipif(not os.path.exists(REF_PARAM),
                    reason="reference tree not mounted")
def test_transcription_matches_reference_source():
    """Re-parse param.py argparse defaults; PARAM_PY_DEFAULTS must agree."""
    src = open(REF_PARAM).read()
    for flag, expect in PARAM_PY_DEFAULTS.items():
        pat = (r"add_argument\(\s*['\"]--%s['\"][^)]*default=([^,)\s]+)"
               % re.escape(flag))
        matches = re.findall(pat, src)
        assert matches, f"--{flag} not found in reference param.py"
        assert float(matches[0]) == pytest.approx(float(expect)), flag


def test_bare_defaults_match_effective_run():
    """A flagless `vqacl_train` run must equal the published configuration
    (our parser defaults bake in the script-level values too)."""
    bare, scripted = parse_config([]), parse_config(SCRIPT_ARGS)
    bare_t, s_t = bare.train, scripted.train
    for f in ("lr", "warmup_ratio", "clip_grad_norm", "batch_size",
              "valid_batch_size", "epochs", "seed", "m_size", "comp_cate",
              "proto_alpha", "proto_beta", "lambda_Q", "lambda_V",
              "lambda_Q_new", "lambda_V_new", "weight_decay", "adam_eps"):
        assert getattr(bare_t, f) == getattr(s_t, f), f
