"""Generate the golden greedy transcript for tests/test_accuracy.py.

Run ON THE CPU BACKEND (the backend the test suite uses — greedy argmax can
legitimately differ between backends at bf16):

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/make_golden.py
"""

import json
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
PROMPT = "class Foo:\n    def __init__(self"
N_PREDICT = 48


def main():
    import jax
    assert jax.devices()[0].platform == "cpu", \
        "golden must be generated on the CPU backend (JAX_PLATFORMS=cpu)"

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint

    cfg = get_model_config("bytellama_5m")
    params, _ = load_checkpoint(str(REPO / "assets" / "bytellama_5m"), cfg)
    tok = ByteTokenizer()
    eng = Engine(params, cfg, QuantConfig(scheme="fp"), batch=1,
                 max_len=cfg.max_sqlen)
    g = GenerationConfig(temp=0.0, n_predict=N_PREDICT, repeat_penalty=1.0,
                         repeat_last_n=1)
    ids = np.asarray(tok.encode(PROMPT), np.int32)[None, :]
    toks = list(map(int, eng.generate(ids, g).tokens[0]))
    out = {"prompt": PROMPT, "n_predict": N_PREDICT, "token_ids": toks,
           "text": tok.decode(toks)}
    dest = REPO / "tests" / "golden" / "bytellama_greedy.json"
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=1))
    print(f"wrote {dest}")
    print("continuation:", repr(out["text"]))


if __name__ == "__main__":
    main()
