"""Buffer-regime sensitivity rendering of the ablation doc.

scripts/ablation.py renders a second table from another sweep's
cells.jsonl (`--sensitivity`) so the M=500 saturated-replay regime
stays in ABLATION.md as COMPUTED statistics, not hand-quoted numbers.
These tests pin that the rendered stats come from the file's data and
that the section vanishes (rather than erroring) when no file exists.
"""

import json
import math
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from ablation import _sensitivity_lines, _stats


def _cell(row, seed, acc, fgt, m_size=500):
    return {"row": row, "seed": seed, "Avg_acc": acc, "Avg_forget": fgt,
            "diag_acc": 99.0, "cfg": {"m_size": m_size}}


def _write(path, cells):
    with open(path, "w") as f:
        for c in cells:
            f.write(json.dumps(c) + "\n")


def test_missing_file_renders_nothing(tmp_path):
    a = SimpleNamespace(sensitivity=str(tmp_path / "nope.jsonl"),
                        n_train=1000, m_size=100)
    assert _sensitivity_lines(a) == []
    a.sensitivity = None
    assert _sensitivity_lines(a) == []


def test_stats_computed_from_file(tmp_path):
    path = str(tmp_path / "cells.jsonl")
    er = [(0, 80.0, 20.0), (1, 90.0, 10.0), (2, 85.0, 15.0)]
    ours = [(0, 82.0, 18.0), (1, 94.0, 6.0), (2, 88.0, 12.0)]
    _write(path, [_cell("er", s, a, f) for s, a, f in er]
                 + [_cell("ours", s, a, f) for s, a, f in ours])
    a = SimpleNamespace(sensitivity=path, n_train=1000, m_size=100)
    text = "\n".join(_sensitivity_lines(a))

    m, sd = _stats([x[1] for x in er])
    assert f"| er | 3 | {m:.2f} ± {sd:.2f}" in text
    m, sd = _stats([x[1] for x in ours])
    assert f"| ours | 3 | {m:.2f} ± {sd:.2f}" in text
    # paired delta: ours−er = +2, +4, +3 → mean +3, SEM = std/√2
    dm, dsd = _stats([2.0, 4.0, 3.0])
    sem = dsd / math.sqrt(2)
    assert f"{dm:+.2f} ± {sem:.2f} (SEM, n=3)" in text
    assert "SEPARATES (paired)" in text
    # regime description comes from the cells' cfg, not hardcoded
    assert "M=500" in text and "50%" in text


def test_paired_delta_uses_matching_seeds_only(tmp_path):
    path = str(tmp_path / "cells.jsonl")
    _write(path, [_cell("er", 0, 80.0, 20.0), _cell("er", 1, 90.0, 10.0),
                  _cell("ours", 1, 95.0, 5.0), _cell("ours", 7, 10.0, 90.0)])
    a = SimpleNamespace(sensitivity=path, n_train=1000, m_size=100)
    text = "\n".join(_sensitivity_lines(a))
    # only seed 1 pairs up; the unmatched seeds must not contaminate —
    # and one pair has a degenerate SEM (population std of a single
    # delta is 0), so NO separation verdict may be claimed from it
    assert "(n=1 — too few pairs for a verdict)" in text
    assert "SEPARATES" not in text and "REVERSED" not in text
    # the matched pair's delta is still reported (ours 95 − er 90)
    assert "AP (ours − er): +5.00" in text


def test_repo_m500_cells_render_the_committed_tie():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "docs", "ablation_m500_cells.jsonl")
    a = SimpleNamespace(sensitivity=path, n_train=1000, m_size=100)
    text = "\n".join(_sensitivity_lines(a))
    # the committed M=500 regime measured a tie — the rendered section
    # must keep saying so (this is the anti-claim-drift guarantee)
    assert text.count("not separated even paired") == 2
    assert "| ours | 5 | 92.73 ± 7.38 | 8.45 ± 8.69 |" in text


def test_coverage_uses_the_files_own_n_train(tmp_path):
    """The sensitivity sweep can have run at a different --n_train than
    the headline run; its buffer-coverage percentages must come from
    the FILE's cfg records, not the current invocation."""
    path = str(tmp_path / "cells.jsonl")
    cells = [_cell("er", s, 80.0, 20.0) for s in (0, 1)]
    for c in cells:
        c["cfg"]["n_train"] = 600
    _write(path, cells)
    a = SimpleNamespace(sensitivity=path, n_train=1000, m_size=100)
    text = "\n".join(_sensitivity_lines(a))
    assert "covers 83%" in text          # 500/600, not 500/1000 = 50%
    assert "M=100 (10% coverage)" in text   # headline still uses a.*
