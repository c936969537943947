"""Backbone weight acquisition (counterpart of the reference's
``download_backbones.py``: caches t5-base weights + tokenizer).

In connected environments this pulls from the HF hub; in air-gapped
ones it reports what's missing and where to place files.
"""

from __future__ import annotations

from typing import Optional


def download_backbones(names=("t5-base",), cache_dir: Optional[str] = None
                       ) -> dict:
    """Try to fetch model + tokenizer for each backbone. Returns a
    status dict {name: 'ok' | error string}."""
    status = {}
    for name in names:
        try:
            from transformers import AutoTokenizer, T5ForConditionalGeneration
            T5ForConditionalGeneration.from_pretrained(
                name, cache_dir=cache_dir)
            AutoTokenizer.from_pretrained(name, cache_dir=cache_dir)
            status[name] = "ok"
        except Exception as e:
            status[name] = (f"unavailable ({type(e).__name__}); place a "
                            f"local checkpoint dir and pass its path as "
                            f"--backbone, and spiece.model as --tokenizer")
    return status


if __name__ == "__main__":
    for k, v in download_backbones().items():
        print(f"{k}: {v}")
