"""Per-row config keying of the ablation sweep's resume cache.

scripts/ablation.py caches each (row, seed) cell as a JSONL record so a
multi-hour 6-row × 5-seed sweep resumes instead of restarting. The cache
key is per-row: retuning a hyperparameter that only affects one row
(e.g. the DER α) must invalidate THAT row's cells and no others —
otherwise every retune throws away hours of unrelated cells.
"""

import json
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from ablation import CFG_FIELDS, ROW_CFG_FIELDS, cfg_key, load_cache


def make_args(cache, **over):
    base = dict(tasks=5, n_train=1000, n_eval=500, epochs=3, m_size=500,
                answer_vocab=10, residue_centroids=True,
                lambda_q=0.01, lambda_v=0.1, ewc_lambda=100.0,
                mas_lambda=1.0, der_alpha=50.0, fisher_batches=10)
    base.update(over)
    return SimpleNamespace(cache=cache, **base)


def write_cells(path, args, rows):
    with open(path, "w") as f:
        for row, seed in rows:
            rec = {"row": row, "seed": seed, "Avg_acc": 50.0,
                   "Avg_forget": 10.0, "cfg": cfg_key(args, row)}
            f.write(json.dumps(rec) + "\n")


def test_row_hyperparam_retune_keeps_other_rows(tmp_path):
    cache = str(tmp_path / "cells.jsonl")
    old = make_args(cache, der_alpha=0.5)
    write_cells(cache, old, [("vanilla", 0), ("er", 0), ("ours", 0),
                             ("der", 0), ("ewc", 0), ("mas", 0)])

    new = make_args(cache, der_alpha=50.0)   # the retune
    cells = load_cache(new)
    assert ("vanilla", 0) in cells
    assert ("er", 0) in cells
    assert ("ours", 0) in cells
    assert ("ewc", 0) in cells
    assert ("mas", 0) in cells
    assert ("der", 0) not in cells           # only der invalidated


def test_shared_field_change_invalidates_every_row(tmp_path):
    cache = str(tmp_path / "cells.jsonl")
    old = make_args(cache, n_train=600)
    write_cells(cache, old, [("vanilla", 0), ("der", 0)])
    cells = load_cache(make_args(cache, n_train=1000))
    assert not cells


def test_legacy_full_config_records_still_load(tmp_path):
    """Pre-per-row records carry ALL fields in cfg; comparison must use
    only the fields relevant to that record's row."""
    cache = str(tmp_path / "cells.jsonl")
    args = make_args(cache, der_alpha=0.5)
    legacy_cfg = {f: getattr(args, f) for f in CFG_FIELDS}
    for row, fields in ROW_CFG_FIELDS.items():
        legacy_cfg.update({f: getattr(args, f) for f in fields})
    with open(cache, "w") as f:
        f.write(json.dumps({"row": "vanilla", "seed": 3, "Avg_acc": 40.0,
                            "Avg_forget": 75.0, "cfg": legacy_cfg}) + "\n")
    cells = load_cache(make_args(cache, der_alpha=50.0))
    assert ("vanilla", 3) in cells


def test_missing_cache_file_is_empty():
    assert load_cache(make_args("/nonexistent/cells.jsonl")) == {}


def test_malformed_cache_lines_skipped(tmp_path, capsys):
    """A sweep killed mid-append leaves a truncated final line (and old
    tools can leave records without a seed); resume must skip them with
    a warning, not crash — that is the exact scenario the cache exists
    for."""
    cache = str(tmp_path / "cells.jsonl")
    args = make_args(cache)
    write_cells(cache, args, [("vanilla", 0)])
    with open(cache, "a") as f:
        f.write('{"row": "er", "seed": 1, "Avg')          # truncated
        f.write("\n")
        f.write(json.dumps({"row": "vanilla",             # no "seed"
                            "cfg": cfg_key(args, "vanilla")}) + "\n")
    cells = load_cache(args)
    assert ("vanilla", 0) in cells and len(cells) == 1
    err = capsys.readouterr().err
    assert err.count("skipping malformed cache line") == 2
