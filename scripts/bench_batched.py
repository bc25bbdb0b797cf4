"""Batched raw-decode ladder on the real chip (VERDICT r4 item 2): the
B=1/4/8/16 device decode loop under the r4 headline defaults (W4A8, bf16
scales), measured with the ONLY methodology that proved decisive on this
time-shared chip (PERF.md): >=256-token decode runs, configs interleaved
per round, medians over >=6 rounds, short/long trip-count differencing
with fresh prompts per trial (execution caching).

This replaces the README's unreproducible r1-era "B=4: 453; B=8: 838;
B=16: 1140" claims with a scripted recipe. Per-B efficiency is reported
against the weights-amortized roofline: one tick streams the weights ONCE
plus B rows of KV, so

    roofline(B) = B * stream_bw / (weight_bytes + B * kv_bytes_per_row)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_batched.py
       [--rounds 6] [--tokens 256]
"""

import json
import sys
import time

import numpy as np


def _flag(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama

    rounds = _flag("--rounds", 6)
    n_decode = _flag("--tokens", 256)
    batches = [1, 4, 8, 16]
    prompt_len = 64

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    max_len = 2048
    print("building llama3_8b random-packed params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len,
                                      fast=True)
    params = jax.block_until_ready(params)
    g = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.1,
                         repeat_last_n=64)

    engines = {b: Engine(params, cfg, qcfg, batch=b, max_len=max_len)
               for b in batches}

    def run(b, seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, cfg.vocab_size - 100, (b, prompt_len))
        return np.asarray(engines[b].generate_device(ids, g,
                                                     n_tokens=n_tokens))

    print("compiling all shapes...", file=sys.stderr)
    for b in batches:
        t0 = time.perf_counter()
        run(b, 0, 1)
        run(b, 0, 1 + n_decode)
        print(f"  B={b} compiled in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    # measured achievable stream bandwidth (bench.py probe, condensed)
    import functools
    sm = 32768
    sa = jax.random.randint(jax.random.PRNGKey(3), (sm, sm // 2), 0,
                            1 << 30, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def stream(bmat, bias, iters):
        def body(i, acc):
            return acc + (jnp.max(bmat ^ (acc & 1)) & 7) + 1
        return jax.lax.fori_loop(0, iters, body, bias)

    def stream_once(bias, iters):
        return float(np.asarray(stream(sa, jnp.int32(bias), iters)))

    stream_once(1, 1)
    stream_once(1, 17)
    ss, sl = [], []
    for t in range(3):
        t0 = time.perf_counter(); stream_once(2 + t, 1)
        ss.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); stream_once(100 + t, 17)
        sl.append(time.perf_counter() - t0)
    stream_bw = sm * (sm // 2) * 4 / (
        (float(np.median(sl)) - float(np.median(ss))) / 16)
    print(f"measured stream {stream_bw / 1e9:.0f} GB/s", file=sys.stderr)

    # interleaved rounds: every (B, trip-count) cell sampled in each round
    shorts = {b: [] for b in batches}
    longs = {b: [] for b in batches}
    for r in range(rounds):
        for b in batches:
            t0 = time.perf_counter()
            run(b, 1000 + 10 * r + b, 1)
            shorts[b].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run(b, 5000 + 10 * r + b, 1 + n_decode)
            longs[b].append(time.perf_counter() - t0)
        line = "  ".join(
            f"B={b}:{(longs[b][-1] - shorts[b][-1]) / n_decode * 1e3:.2f}ms"
            for b in batches)
        print(f"round {r}: {line}", file=sys.stderr)

    # roofline bytes
    weight_bytes = sum(l.size * l.dtype.itemsize
                       for l in jax.tree.leaves((params.layers,
                                                 params.lm_head)))
    avg_ctx = prompt_len + n_decode // 2
    kv_row = cfg.num_layers * avg_ctx * cfg.num_kv_heads * cfg.head_dim * 2 * 2

    rows = []
    for b in batches:
        per_tick = (float(np.median(longs[b]))
                    - float(np.median(shorts[b]))) / n_decode
        tok_s = b / per_tick
        roof = b * stream_bw / (weight_bytes + b * kv_row)
        rows.append({
            "batch": b,
            "tokens_per_s": round(tok_s, 1),
            "ms_per_tick": round(per_tick * 1e3, 3),
            "per_stream_tokens_per_s": round(tok_s / b, 1),
            "roofline_tokens_per_s": round(roof, 1),
            "vs_stream_roofline": round(tok_s / roof, 3),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps({
        "metric": "llama3_8b_w4a8_batched_decode_ladder",
        "unit": "tokens/s",
        "stream_gbps_measured": round(stream_bw / 1e9, 0),
        "weight_gb_per_tick": round(weight_bytes / 1e9, 2),
        "kv_gb_per_row": round(kv_row / 1e9, 3),
        "n_decode": n_decode, "rounds": rounds,
        "ladder": rows,
    }))


if __name__ == "__main__":
    main()
