"""End-to-end A/B of int4 decode blockings on the FULL llama3-8b decode loop.

The per-op microbench (tune_int4_blocks.py) is ±20% noisy over the
time-shared tunnel chip; this driver instead alternates full bench.py-style
measurements per config within each round, so co-tenant bursts hit every
config equally, and reports per-config medians. Engines are cached per
config (weights shared), so each config compiles once.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_bench_blocks.py
"""

import json
import sys
import time

import numpy as np

ROUNDS = 8
N_DECODE = 256

GU1024 = {(4096, 28672): (1024, 2048)}
LM1024 = {(4096, 129024): (1024, 2048)}
QKVWO4096 = {(4096, 6144): (2048, 4096), (4096, 4096): (2048, 4096)}

# Round 6 (r4, W4A8 headline): the device trace (PERF.md) put qkv at 78%
# and wo at 72% of achievable BW — ramp-dominated small shapes. bk=1024
# halves the un-overlapped first-block DMA; never tried (r3 tested only
# bn variants and bk=4096). Cost side: bk=1024 -> spk=8 forces the f32
# scale upcast (hoisted out of the loop, but doubles scale read bytes).
CONFIGS = {
    "base(no table)": {},
    "qkvwo_bk1024": {(4096, 6144): (2048, 1024),
                     (4096, 4096): (2048, 1024)},
    "qkvwo_1024x1024": {(4096, 6144): (1024, 1024),
                        (4096, 4096): (1024, 1024)},
}


def main():
    import jax  # noqa: F401

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.ops import int4_matmul as im

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    g = GenerationConfig(temp=0.0, n_predict=N_DECODE + 1,
                         repeat_penalty=1.1, repeat_last_n=64)

    engines = {}

    def engine_for(name):
        if name not in engines:
            im.DECODE_BLOCKS.clear()
            im.DECODE_BLOCKS.update(CONFIGS[name])
            engines[name] = Engine(params, cfg, qcfg, batch=1, max_len=2048)
        return engines[name]

    def run(eng, seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
        return np.asarray(eng.generate_device(ids, g, n_tokens=n_tokens))

    # NOTE: DECODE_BLOCKS is read at TRACE time; building/compiling each
    # engine under its own table and reusing it afterwards is safe.
    for name in CONFIGS:
        print(f"compiling {name}...", file=sys.stderr)
        eng = engine_for(name)
        run(eng, 0, 1)
        run(eng, 0, 1 + N_DECODE)

    results = {name: {"short": [], "long": []} for name in CONFIGS}
    for r in range(ROUNDS):
        for name in CONFIGS:
            eng = engines[name]
            t0 = time.perf_counter(); run(eng, 100 + r, 1)
            results[name]["short"].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(eng, 200 + r, 1 + N_DECODE)
            results[name]["long"].append(time.perf_counter() - t0)
        print(f"round {r} done", file=sys.stderr)

    out = {}
    for name, d in results.items():
        per_tok = (float(np.median(d["long"])) -
                   float(np.median(d["short"]))) / N_DECODE
        out[name] = round(1.0 / per_tok, 2)
        print(f"{name:20s} {out[name]:8.2f} tok/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
