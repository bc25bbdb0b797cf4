"""Long-context decode: tokens/s at 4k/8k/16k/32k context (Llama-3-8B W4A8).

At ctx 96 the KV read is noise next to the ~3.9 GB of weights; at 32k it
adds ~4.3 GB/token — this measures whether the flash decode kernel's
length-bounded streaming actually scales (SURVEY §5 long-context audit; the
reference caps every model at 2048 and reads O(S_max) dense, and exports
32768-position rotary caches it never exploits,
llm/tools/model_quantizer.py:313-319).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_longctx.py \
           [--kv int8] [ctx ...]   # default: bf16 KV, 4096 8192 16384 32768

--kv int8: per-position absmax int8 KV (QuantConfig.kv_cache_dtype;
W4A16+int8KV measured +1.21% Δppl vs W4A16's own +1.22% on real weights,
ACCURACY.md — the KV quantization itself adds ~nothing) — halves the KV
stream, the honest long-context lever (at 32k: 4.29 → 2.21 GB/token of
KV+scales on 8B).
"""

import json
import sys
import time

import numpy as np

N_DECODE = 64
HBM_BW = 819e9


def main():
    import jax

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama

    argv = sys.argv[1:]
    kv_int8 = False
    model = "llama3_8b"
    if "--kv" in argv:
        i = argv.index("--kv")
        kv_int8 = argv[i + 1] == "int8"
        del argv[i:i + 2]
    if "--model" in argv:  # e.g. codellama_7b: the BASELINE long-context
        i = argv.index("--model")   # codegen config (llama-2-family shape,
        model = argv[i + 1]         # exercises pack-time K padding on chip)
        del argv[i:i + 2]
    batch = 1
    if "--batch" in argv:  # batched long-context decode stress (BASELINE's
        i = argv.index("--batch")   # Code Llama config): KV reads scale xB,
        batch = int(argv[i + 1])    # weights amortize
        del argv[i:i + 2]
    ctxs = [int(a) for a in argv] or [4096, 8192, 16384, 32768]
    cfg = get_model_config(model)
    qcfg = QuantConfig(scheme="w4a8", group_size=128,
                       kv_cache_dtype="int8" if kv_int8 else "bf16")
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0,
                                      max_pos=max(max(ctxs), 2048), fast=True)
    g = GenerationConfig(temp=0.0, n_predict=N_DECODE + 1,
                         repeat_penalty=1.1, repeat_last_n=64)

    # weights+scales actually streamed per token (matches bench.py)
    w_bytes = sum(leaf.size * leaf.dtype.itemsize
                  for leaf in jax.tree.leaves((params.layers, params.lm_head)))
    out = {}
    for ctx in ctxs:
        eng = Engine(params, cfg, qcfg, batch=batch, max_len=ctx)
        plen = ctx - N_DECODE - 8

        def run(seed, n_tokens):
            rng = np.random.default_rng(seed)
            ids = rng.integers(100, cfg.vocab_size - 100, (batch, plen))
            return np.asarray(eng.generate_device(ids, g, n_tokens=n_tokens))

        print(f"ctx {ctx}: compiling...", file=sys.stderr)
        run(0, 1)
        run(0, 1 + N_DECODE)
        shorts, longs = [], []
        for t in range(4):
            t0 = time.perf_counter(); run(10 + t, 1)
            shorts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(20 + t, 1 + N_DECODE)
            longs.append(time.perf_counter() - t0)
        per = (float(np.median(longs)) - float(np.median(shorts))) / N_DECODE
        # bytes of K+V (+ f32 scales in int8 mode) streamed per SEQUENCE per
        # decode step; weights stream once per step regardless of batch
        kv_row = cfg.num_layers * plen * cfg.num_kv_heads * 2
        kv = kv_row * (cfg.head_dim * 1 + 4 if kv_int8
                       else cfg.head_dim * 2)
        roof = batch * HBM_BW / (w_bytes + batch * kv)
        agg = batch / per
        out[f"ctx{ctx}"] = {
            "tokens_per_s": round(agg, 2),
            "roofline": round(roof, 1),
            "frac": round(agg / roof, 3),
            "kv_gb_per_token": round(kv / 1e9, 2),
            "kv_dtype": "int8" if kv_int8 else "bf16",
            "batch": batch,
        }
        print(f"  ctx {ctx}: {agg:.1f} tok/s (roof {roof:.1f})",
              file=sys.stderr)
    out["model"] = model
    print(json.dumps(out))


if __name__ == "__main__":
    main()
