"""VL-T5 tokenizer: T5 sentencepiece + 100 ``<vis_extra_id_*>`` tokens.

Rebuild of ``VLT5Tokenizer``/``VLT5TokenizerFast``
(/root/reference/VL-T5/src/tokenization.py:8-191) without the
``sentencepiece`` python package (absent in this image):

- a ~50-line pure-python protobuf reader pulls (piece, score) pairs out
  of a standard ``spiece.model`` (sentencepiece ModelProto field 1), and
- the HF ``tokenizers`` Rust Unigram model does the actual encoding —
  the same engine HF's fast T5 tokenizer compiles to, so subwords match
  the reference given the same model file.

Id layout matches ``tokenization.py:68-89`` exactly:
  sp pieces           0 .. 31999
  ``<extra_id_i>``    32099 - i      (i in 0..99)
  ``<vis_extra_id_i>``32199 - i      (i in 0..99)
  pad=0, eos=1 (``</s>`` appended by the post-processor), unk=2.

When no vocab file is available (this environment has zero egress and no
HF cache), ``VLT5Tokenizer(vocab_file=None)`` falls back to a
deterministic hash-based word tokenizer over the same id space — same
API, stable ids across processes — used by tests and synthetic
benchmarks only.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Dict, List, Optional, Sequence, Tuple

SP_VOCAB = 32000
N_EXTRA = 100
N_VIS = 100
VOCAB_SIZE = SP_VOCAB + N_EXTRA + N_VIS  # 32200

PAD_ID, EOS_ID, UNK_ID = 0, 1, 2


# ---------------------------------------------------------------------------
# minimal sentencepiece ModelProto reader
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_spiece_model(path: str) -> List[Tuple[str, float]]:
    """Extract (piece, score) in id order from a sentencepiece model file.

    ModelProto: field 1 = repeated SentencePiece{1: piece (string),
    2: score (float), 3: type (enum)}. Unknown fields are skipped, so
    this tolerates any sentencepiece version.
    """
    with open(path, "rb") as f:
        buf = f.read()
    pieces: List[Tuple[str, float]] = []
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # repeated SentencePiece
            length, pos = _read_varint(buf, pos)
            sub = buf[pos:pos + length]
            pos += length
            piece, score = "", 0.0
            spos = 0
            while spos < len(sub):
                stag, spos = _read_varint(sub, spos)
                sfield, swire = stag >> 3, stag & 7
                if sfield == 1 and swire == 2:
                    slen, spos = _read_varint(sub, spos)
                    piece = sub[spos:spos + slen].decode("utf-8")
                    spos += slen
                elif sfield == 2 and swire == 5:
                    score = struct.unpack("<f", sub[spos:spos + 4])[0]
                    spos += 4
                elif swire == 0:
                    _, spos = _read_varint(sub, spos)
                elif swire == 2:
                    slen, spos = _read_varint(sub, spos)
                    spos += slen
                elif swire == 5:
                    spos += 4
                elif swire == 1:
                    spos += 8
                else:
                    raise ValueError(f"bad wire type {swire}")
            pieces.append((piece, score))
        elif wire == 0:
            _, pos = _read_varint(buf, pos)
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            pos += length
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:
            raise ValueError(f"bad wire type {wire}")
    return pieces


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

class VLT5Tokenizer:
    """Encode/decode with the VL-T5 id space. See module docstring."""

    def __init__(self, vocab_file: Optional[str] = None,
                 extra_ids: int = N_EXTRA, vis_extra_ids: int = N_VIS):
        self._extra_ids = extra_ids
        self._vis_extra_ids = vis_extra_ids
        self._fallback_vocab: Dict[int, str] = {}
        self._tok = None
        if vocab_file is not None:
            self._tok = self._build_unigram(vocab_file)

    # -- ids ---------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return SP_VOCAB + self._extra_ids + self._vis_extra_ids

    @property
    def pad_token_id(self) -> int:
        return PAD_ID

    @property
    def eos_token_id(self) -> int:
        return EOS_ID

    def extra_id(self, i: int) -> int:
        return self.vocab_size - i - 1 - self._vis_extra_ids

    def vis_extra_id(self, i: int) -> int:
        return self.vocab_size - i - 1

    # -- unigram backend ---------------------------------------------------
    def _build_unigram(self, vocab_file: str):
        from tokenizers import Tokenizer, decoders, normalizers, pre_tokenizers
        from tokenizers import processors
        from tokenizers.models import Unigram

        pieces = parse_spiece_model(vocab_file)
        vocab = list(pieces)
        vocab += [(f"<extra_id_{i}>", 0.0)
                  for i in range(self._extra_ids - 1, -1, -1)]
        vocab += [(f"<vis_extra_id_{i}>", 0.0)
                  for i in range(self._vis_extra_ids - 1, -1, -1)]
        tok = Tokenizer(Unigram(vocab, unk_id=UNK_ID, byte_fallback=False))
        # T5's exact normalizer is a precompiled charsmap embedded in the
        # sp model; NFKC + whitespace handling is equivalent for the
        # English VQA questions this pipeline tokenizes.
        tok.normalizer = normalizers.Sequence([
            normalizers.Replace("\n", " "),
            normalizers.NFKC(),
        ])
        tok.pre_tokenizer = pre_tokenizers.Metaspace()
        tok.decoder = decoders.Metaspace()
        # reference post-processor appends </s> (tokenization.py:113-120)
        tok.post_processor = processors.TemplateProcessing(
            single=["$A", "</s>"], pair=["$A", "</s>", "$B", "</s>"],
            special_tokens=[("</s>", EOS_ID)])
        return tok

    # -- fallback ----------------------------------------------------------
    @staticmethod
    def _hash_word(word: str) -> int:
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "little")
        return 3 + h % (SP_VOCAB - 3)

    def _fallback_encode(self, text: str) -> List[int]:
        ids = []
        for w in text.lower().split():
            i = self._hash_word(w)
            self._fallback_vocab[i] = w
            ids.append(i)
        return ids

    # -- public API --------------------------------------------------------
    def encode(self, text: str, max_length: Optional[int] = None,
               truncation: bool = True) -> List[int]:
        """→ ids ending in EOS, truncated to ``max_length`` (HF semantics:
        truncate AFTER appending, keeping the first max_length tokens —
        matches ``tokenizer.encode(..., max_length=20, truncation=True)``
        at vqa_data_memory.py:198)."""
        if self._tok is not None:
            ids = self._tok.encode(text).ids
        else:
            ids = self._fallback_encode(text) + [EOS_ID]
        if truncation and max_length is not None and len(ids) > max_length:
            ids = ids[:max_length]
        return ids

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True
               ) -> str:
        ids = [int(i) for i in ids]
        if skip_special_tokens:
            ids = [i for i in ids
                   if i not in (PAD_ID, EOS_ID, UNK_ID) and i < SP_VOCAB]
        if self._tok is not None:
            return self._tok.decode(ids, skip_special_tokens=False).strip()
        return " ".join(self._fallback_vocab.get(i, "<unk>") for i in ids)

    def batch_decode(self, batch_ids, skip_special_tokens: bool = True
                     ) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch_ids]
