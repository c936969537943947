"""Tokenizer (sp-proto parser + Unigram backend + fallback) and
checkpoint roundtrip."""

import struct

import numpy as np

import jax

from vqacl_tpu.data.tokenizer import (
    EOS_ID, PAD_ID, UNK_ID, VLT5Tokenizer, parse_spiece_model,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(text: str, score: float, ptype: int = 1) -> bytes:
    body = (b"\x0a" + _varint(len(text.encode())) + text.encode()
            + b"\x15" + struct.pack("<f", score)
            + b"\x18" + _varint(ptype))
    return b"\x0a" + _varint(len(body)) + body


def write_tiny_spiece(path: str, words) -> None:
    """Minimal sentencepiece ModelProto: control pieces + word pieces."""
    blob = (_piece("<pad>", 0.0, 3) + _piece("</s>", 0.0, 3)
            + _piece("<unk>", 0.0, 2))
    for i, w in enumerate(words):
        blob += _piece("▁" + w, -float(i + 1))
    # unknown trailing field (simulates normalizer_spec etc.) — parser
    # must skip it
    blob += b"\x22" + _varint(3) + b"abc"
    with open(path, "wb") as f:
        f.write(blob)


def test_spiece_parser_and_unigram(tmp_path):
    path = str(tmp_path / "tiny.model")
    words = ["hello", "world", "cat", "dog"]
    write_tiny_spiece(path, words)
    pieces = parse_spiece_model(path)
    assert pieces[0][0] == "<pad>"
    assert pieces[3][0] == "▁hello"
    assert pieces[4][1] == -2.0

    tok = VLT5Tokenizer(vocab_file=path)
    ids = tok.encode("hello world")
    assert ids[-1] == EOS_ID
    assert len(ids) == 3           # two word pieces + EOS
    assert tok.decode(ids) == "hello world"
    # truncation semantics: keep first max_length ids
    assert tok.encode("hello world cat dog", max_length=2) == ids[:2]


def test_special_id_layout():
    tok = VLT5Tokenizer()
    assert tok.vocab_size == 32200
    assert tok.extra_id(0) == 32099      # tokenization.py:68-76
    assert tok.extra_id(99) == 32000
    assert tok.vis_extra_id(0) == 32199
    assert tok.vis_extra_id(99) == 32100
    assert (tok.pad_token_id, tok.eos_token_id) == (PAD_ID, EOS_ID)


def test_fallback_tokenizer_roundtrip():
    tok = VLT5Tokenizer()
    ids = tok.encode("what color is the cat")
    ids2 = tok.encode("what color is the cat")
    assert ids == ids2 and ids[-1] == EOS_ID
    assert tok.decode(ids) == "what color is the cat"
    # batch decode strips pad/eos
    assert tok.batch_decode([ids + [0, 0]]) == ["what color is the cat"]


def test_checkpoint_roundtrip(tmp_path):
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from vqacl_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    proto = ProtoState.create(10, 80, cfg.d_model)
    proto = proto._replace(q_proto=proto.q_proto + 1.5,
                           task_id=np.asarray(3, np.int32))
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, proto, step=42)
    p2, pr2, step = load_checkpoint(path)
    assert step == 42
    assert int(pr2.task_id) == 3
    np.testing.assert_allclose(np.asarray(pr2.q_proto),
                               np.asarray(proto.q_proto))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # tree structure preserved
    assert jax.tree.structure(params) == jax.tree.structure(p2)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except Exception:
        pytest.skip("orbax not available")
    from vqacl_tpu.models.prototype import ProtoState
    from vqacl_tpu.models.vlt5 import init_vlt5_params
    from vqacl_tpu.train.checkpoint import (load_checkpoint_orbax,
                                            save_checkpoint_orbax)
    from vqacl_tpu.utils.config import tiny_model_config

    cfg = tiny_model_config()
    params = init_vlt5_params(jax.random.PRNGKey(0), cfg)
    proto = ProtoState.create(10, 80, cfg.d_model)
    proto = proto._replace(v_proto=proto.v_proto + 2.0)
    d = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(d, params, proto, step=7)
    p2, pr2, step = load_checkpoint_orbax(d)
    assert step == 7
    np.testing.assert_allclose(np.asarray(pr2.v_proto),
                               np.asarray(proto.v_proto))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
