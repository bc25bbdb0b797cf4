"""Native C++ runtime components vs their pure-Python fallbacks.

The reference's runtime (tokenizers, file IO) is C++ (SURVEY.md §2.5, §2.2);
ours mirrors that with ctypes-loaded C++ built on demand. These tests pin
native == python equality — the same oracle pattern the reference uses for
its fast-vs-naive kernels.
"""

import os

import numpy as np
import pytest

from tinychatengine_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

TEXTS = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog. 1234567890",
    "  leading spaces and\nnewlines\tand tabs  ",
    "naïve café — déjà vu: ünïcödé 日本語のテキスト 🤖🚀",
    "x" * 500,
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "",
    "don't stop believin' — it's 'quoted'",
]


def _mk_bytelevel():
    from tinychatengine_tpu.tokenizers.bytelevel_bpe import (
        _BYTE_ENC, ByteLevelBPE)
    # toy vocab: all byte chars + some merges
    chars = sorted(set(_BYTE_ENC.values()))
    vocab = {c: i for i, c in enumerate(chars)}
    merges = []
    for pair in [("t", "h"), ("th", "e"), ("Ġ", "t"), ("i", "n"),
                 ("o", "u"), ("e", "r"), ("Ġt", "he"), ("in", "g")]:
        if pair[0] in vocab or pair[0] in [a + b for a, b in merges]:
            merges.append(pair)
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    return ByteLevelBPE(vocab, merges)


def test_bytelevel_native_matches_python():
    tok_nat = _mk_bytelevel()
    tok_py = _mk_bytelevel()
    tok_py._native_tried = True  # force python path
    assert tok_nat._native_merger() is not None
    for t in TEXTS:
        ids_n = tok_nat.encode(t)
        ids_p = tok_py.encode(t)
        assert ids_n == ids_p, t
        assert tok_nat.decode(ids_n) == tok_py.decode(ids_p)


def test_bytelevel_native_disabled_on_unrepresentable_merge():
    """A merge rule whose RESULT is missing from the vocab can't live in the
    id-domain table: the Python loop applies it then emits unk_id, so the
    native path must be disabled for such vocabs (ADVICE r1), while rules
    with merely unreachable pieces are dropped and native stays on."""
    from tinychatengine_tpu.tokenizers.bytelevel_bpe import (
        _BYTE_ENC, ByteLevelBPE)
    chars = sorted(set(_BYTE_ENC.values()))
    vocab = {c: i for i, c in enumerate(chars)}
    vocab["th"] = len(vocab)
    # ("th","e") -> "the" NOT in vocab: python merges then emits unk
    tok = ByteLevelBPE(vocab, [("t", "h"), ("th", "e")])
    assert tok._native_merger() is None
    tok_py = ByteLevelBPE(vocab, [("t", "h"), ("th", "e")])
    tok_py._native_tried = True
    assert tok.encode("the") == tok_py.encode("the")
    assert tok.encode("the") == [tok.unk_id]


def _mk_spm():
    from tinychatengine_tpu.tokenizers.sentencepiece_bpe import SentencePieceBPE
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    scores = [0.0] * len(tokens)
    words = ["▁the", "▁a", "▁an", "the", "he", "▁t", "▁th", "in", "ing",
             "▁quick", "qu", "ick", "▁fox", "fo", "x", "▁hello", "hell",
             "o", "▁world", "wor", "ld", "▁", "e", "t", "h", "a", "b", "c",
             "d", "f", "g", "i", "j", "k", "l", "m", "n", "p", "q", "r",
             "s", "u", "v", "w", "y", "z", ",", ".", "!", "'"]
    for i, w in enumerate(words):
        tokens.append(w)
        scores.append(-float(i) * 0.25)
    return SentencePieceBPE(tokens, scores, sp_space=True)


def test_spm_native_matches_python():
    tok_nat = _mk_spm()
    tok_py = _mk_spm()
    tok_py._native_tried = True
    assert tok_nat._native_encoder() is not None
    for t in TEXTS:
        ids_n = tok_nat.encode(t, bos=True)
        ids_p = tok_py.encode(t, bos=True)
        assert ids_n == ids_p, (t, ids_n, ids_p)
        assert tok_nat.decode(ids_n) == tok_py.decode(ids_p)


def test_native_read_file(tmp_path):
    data = np.random.default_rng(0).standard_normal(1 << 16).astype(np.float32)
    p = tmp_path / "t.bin"
    data.tofile(p)
    got = native.read_file(str(p), np.float32, n_threads=4)
    np.testing.assert_array_equal(got, data)
    # offset + count
    got2 = native.read_file(str(p), np.float32, count=100, offset=400)
    np.testing.assert_array_equal(got2, data[100:200])


def test_native_read_missing_file():
    with pytest.raises(FileNotFoundError):
        native.read_file("/nonexistent/file.bin", np.float32)
