"""End-to-end decode A/B: W4A16 vs W4A8 (same packed int4 weights).

The W4A8 kernel quantizes activations per (row, group) in-kernel and runs
s8 x s8 MXU dots — no int→bf16 weight converts on the VPU. If the W4A16
path is VPU-bound on those converts, W4A8 should run closer to the HBM
ceiling (it is the reference's own x86/ARM headline path, and costs +0.96%
relative ppl on real weights — ACCURACY.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_w4a16_vs_w4a8.py
"""

import json
import sys
import time

import numpy as np

ROUNDS = 8
N_DECODE = 256


def main():
    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.ops.linear import Int4A8Linear, Int4Linear

    cfg = get_model_config("llama3_8b")
    print("building params...", file=sys.stderr)
    params16 = llama.init_random_params(
        cfg, QuantConfig(scheme="w4a16", group_size=128), seed=0,
        max_pos=2048, fast=True)

    def to_a8(p):
        if isinstance(p, Int4Linear):
            return Int4A8Linear(packed=p.packed, scales=p.scales, bias=p.bias)
        return p
    params8 = __import__("jax").tree.map(
        to_a8, params16,
        is_leaf=lambda x: isinstance(x, (Int4Linear, Int4A8Linear)))

    g = GenerationConfig(temp=0.0, n_predict=N_DECODE + 1,
                         repeat_penalty=1.1, repeat_last_n=64)
    engines = {
        "w4a16": Engine(params16, cfg, QuantConfig(scheme="w4a16"), batch=1,
                        max_len=2048),
        "w4a8": Engine(params8, cfg, QuantConfig(scheme="w4a8"), batch=1,
                       max_len=2048),
    }
    for name, eng in engines.items():
        print(f"compiling {name}...", file=sys.stderr)
        rng = np.random.default_rng(0)
        ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
        np.asarray(eng.generate_device(ids, g, n_tokens=1))
        np.asarray(eng.generate_device(ids, g, n_tokens=1 + N_DECODE))

    results = {n: {"short": [], "long": []} for n in engines}
    for r in range(ROUNDS):
        for name, eng in engines.items():
            rng = np.random.default_rng(500 + r * 13)
            ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
            t0 = time.perf_counter()
            np.asarray(eng.generate_device(ids, g, n_tokens=1))
            results[name]["short"].append(time.perf_counter() - t0)
            ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
            t0 = time.perf_counter()
            np.asarray(eng.generate_device(ids, g, n_tokens=1 + N_DECODE))
            results[name]["long"].append(time.perf_counter() - t0)
        print(f"round {r} done", file=sys.stderr)

    out = {}
    for name, d in results.items():
        per = (float(np.median(d["long"])) -
               float(np.median(d["short"]))) / N_DECODE
        out[name] = round(1.0 / per, 2)
        print(f"{name:8s} {out[name]:8.2f} tok/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
