"""Measure AWQ vs plain-RTN W4A16 Δppl on the trained bytellama checkpoint.

Calibration tokens come from the TRAIN corpus (tools/corpus.py build — the
same deterministic local Python source the model was trained on), never the
eval sample. Eval = the committed held-out sample, the same scorer as
ACCURACY.md. Prints one JSON line.

Usage: python scripts/measure_awq.py [--eval-tokens N] [--calib-windows N]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main():
    import os

    import jax

    # CPU by default: the measurement is small-model and must not depend on
    # the TPU tunnel being up (probing the backend would try to init it)
    if os.environ.get("AWQ_ON_TPU", "") != "1":
        jax.config.update("jax_platforms", "cpu")

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.quant import awq
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools import corpus
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint
    from tinychatengine_tpu.tools.convert import requantize_llama
    from tinychatengine_tpu.tools.perplexity import perplexity

    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-tokens", type=int, default=32768)
    ap.add_argument("--calib-windows", type=int, default=16)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--grid", type=int, default=20)
    args = ap.parse_args()

    ckpt = REPO / "assets" / "bytellama_5m"
    cfg = get_model_config("bytellama_5m")
    params, qcfg = load_checkpoint(str(ckpt), cfg)
    assert qcfg.scheme == "fp"

    tok = ByteTokenizer()
    eval_text = (ckpt / "eval_sample.txt").read_text(encoding="utf-8")
    eval_ids = np.asarray(tok.encode(eval_text), np.int32)[:args.eval_tokens]

    # calibration: train-distribution tokens (deterministic corpus build),
    # disjoint from the eval sample by construction (train/eval split)
    blob = corpus.build_corpus(max_bytes=8 << 20)
    train, _ = corpus.train_eval_split(blob)
    rng = np.random.default_rng(0)
    W = args.window
    calib = np.stack([
        np.frombuffer(
            train[o:o + W], np.uint8).astype(np.int32)
        for o in rng.integers(0, len(train) - W, args.calib_windows)])
    print(f"calib {calib.shape}, eval {len(eval_ids)} tokens",
          file=sys.stderr)

    print("awq search...", file=sys.stderr)
    scaled, info = awq.awq_scale_llama(params, cfg, calib, group_size=128,
                                       n_grid=args.grid)
    q = QuantConfig(scheme="w4a16", group_size=128)
    rtn_q = requantize_llama(params, q)
    awq_q = requantize_llama(scaled, q)

    out = {"alpha": {k: (v if isinstance(v, float) else
                         [round(float(a), 3) for a in v])
                     for k, v in info["alpha"].items()}}
    for name, p in (("fp", params), ("rtn_w4a16", rtn_q),
                    ("awq_w4a16", awq_q)):
        print(f"scoring {name}...", file=sys.stderr)
        out[name] = round(perplexity(llama.forward, p, cfg, eval_ids,
                                     args.window, args.stride), 5)
    out["dppl_rtn_pct"] = round(100 * (out["rtn_w4a16"] / out["fp"] - 1), 3)
    out["dppl_awq_pct"] = round(100 * (out["awq_w4a16"] / out["fp"] - 1), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
