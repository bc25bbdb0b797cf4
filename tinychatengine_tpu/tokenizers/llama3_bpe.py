"""LLaMA-3 BPE — rank-based merges with UTF-8 byte fallback.

Re-implementation of the tokenizer embedded in the reference's LLaMA-3 driver
(llm/src/nn_modules/non_cuda/LLaMA3Generate.cc:279-477, llama3.c-style):
vocabulary of 128256 tokens including 256 byte tokens; encoding repeatedly
merges the adjacent pair (or triple — the reference checks triples too,
:425-471) with the best score/rank; unknown bytes fall back to byte tokens.

Special ids (LLaMA3Generate.cc:183-195): bos 128000 <|begin_of_text|>,
eos 128001 <|end_of_text|>, eot 128009 <|eot_id|>.

Loads the reference's vocab+scores bin, a tiktoken .model (base64 ranks), or
HF tokenizer.json.
"""

from __future__ import annotations

import base64
import json
from pathlib import Path

BOS_ID = 128000
EOS_ID = 128001
EOT_ID = 128009


class Llama3BPE:
    def __init__(self, tokens: list[bytes], special: dict[str, int] | None = None):
        self.id_to_token = tokens
        self.token_to_id = {t: i for i, t in enumerate(tokens)}
        self.special = special or {}
        self.bos_id = self.special.get("<|begin_of_text|>", BOS_ID)
        self.eos_id = self.special.get("<|end_of_text|>", EOS_ID)
        self.eot_id = self.special.get("<|eot_id|>", EOT_ID)

    @classmethod
    def load(cls, path: str) -> "Llama3BPE":
        p = Path(path)
        if p.suffix == ".model":  # tiktoken format: base64 token, rank
            tokens: list[bytes] = []
            for line in p.read_text().splitlines():
                if not line.strip():
                    continue
                b64, rank = line.split()
                tok = base64.b64decode(b64)
                rank = int(rank)
                while len(tokens) <= rank:
                    tokens.append(b"")
                tokens[rank] = tok
            special = {f"<|{name}|>": 128000 + i for i, name in enumerate(
                ["begin_of_text", "end_of_text"])}
            special["<|eot_id|>"] = EOT_ID
            return cls(tokens, special)
        if p.name.endswith("tokenizer.json"):
            data = json.loads(p.read_text())
            vocab = data["model"]["vocab"]
            tokens = [b""] * (max(vocab.values()) + 1)
            for t, i in vocab.items():
                tokens[i] = _hf_token_to_bytes(t)
            special = {t["content"]: t["id"] for t in data.get("added_tokens", [])}
            return cls(tokens, special)
        raise ValueError(path)

    def encode(self, text: str, bos: bool = True) -> list[int]:
        bs = text.encode("utf-8")
        # start from single bytes (byte-fallback guarantees coverage)
        parts = [bytes([b]) for b in bs]
        while len(parts) > 1:
            best_rank, best_i = None, None
            for i in range(len(parts) - 1):
                cand = parts[i] + parts[i + 1]
                r = self.token_to_id.get(cand)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            parts = parts[:best_i] + [parts[best_i] + parts[best_i + 1]] + parts[best_i + 2:]
        out = [self.bos_id] if bos else []
        for tok in parts:
            tid = self.token_to_id.get(tok)
            if tid is None:  # single unknown byte → byte token region
                tid = self.token_to_id.get(bytes(tok), 0)
            out.append(tid)
        return out

    def decode(self, ids) -> str:
        specials = set(self.special.values()) | {self.bos_id, self.eos_id, self.eot_id}
        data = b"".join(self.id_to_token[int(i)] for i in ids
                        if int(i) not in specials and int(i) < len(self.id_to_token))
        return data.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return len(self.id_to_token)


def _hf_token_to_bytes(tok: str) -> bytes:
    """HF llama3 tokenizer.json stores tokens in GPT-2 byte-unicode space."""
    from tinychatengine_tpu.tokenizers.bytelevel_bpe import _BYTE_DEC
    try:
        return bytes(_BYTE_DEC[c] for c in tok)
    except KeyError:
        return tok.encode("utf-8")
