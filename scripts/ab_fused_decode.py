"""On-chip A/B: decode-glue levers vs the r2 production path.

Variants (same packed int4 weights; scales cast per variant, so HBM holds
one weight set + two small scale sets):
  base        unfused decode, f32 scales  (the r2 production path)
  fused       TCE_DECODE_FUSED path, f32 scales
  base16      unfused decode + bf16 stored scales (fallback if fused fails)
  fused16     fused path + bf16 stored scales

Correctness first (64-token greedy chain prefix agreement vs base), then the
CLAUDE.md timing methodology: 256-token loop-differenced decode (272 vs 16),
variants interleaved per round, medians over >= 6 rounds, fresh prompts.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_fused_decode.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig, get_model_config
from tinychatengine_tpu.generation import sampling
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops import int4_matmul as int4m
from tinychatengine_tpu.ops.linear import Int4Linear

N_SHORT, N_LONG = 16, 272
ROUNDS = 6
PROMPT = 64


def cast_scales(params, dtype):
    """New param tree with Int4Linear scales cast to ``dtype`` — packed
    buffers are SHARED (same device arrays), so the extra HBM is scales only."""
    def one(p):
        if isinstance(p, Int4Linear):
            return Int4Linear(packed=p.packed,
                              scales=p.scales.astype(dtype), bias=p.bias)
        return p
    return jax.tree.map(one, params,
                        is_leaf=lambda x: isinstance(x, Int4Linear))


def make_runner(eng, gcfg, fused: bool):
    def loop_fn(params, cfg, logits, cache, state, last, pos, n_tokens):
        def step(carry, _):
            logits, cache, state, last, pos = carry
            tok, state = sampling.sample(logits, state, gcfg, last)
            last2 = jnp.roll(last, -1, axis=1).at[:, -1].set(tok)
            logits, cache = llama.forward(params, cfg, tok[:, None], cache, pos)
            return (logits, cache, state, last2, pos + 1), tok

        (_, cache, _, _, _), tokens = jax.lax.scan(
            step, (logits, cache, state, last, pos), None, length=n_tokens)
        return tokens.T, cache

    jitted = jax.jit(loop_fn, static_argnames=("cfg", "n_tokens"),
                     donate_argnames=("cache",))

    def run(seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, eng.cfg.vocab_size - 100, (1, PROMPT))
        cache = eng.new_cache()
        logits, cache = eng.prefill(ids, cache)
        state = sampling.SamplerState.init(gcfg.seed, 1, gcfg.mirostat_tau)
        window = max(gcfg.repeat_last_n, 1)
        last = jnp.full((1, window), -1, jnp.int32)
        saved = int4m.FUSED_DECODE
        int4m.FUSED_DECODE = fused
        try:
            toks, cache = jitted(eng.params, eng.cfg, logits, cache, state,
                                 last, jnp.asarray(PROMPT, jnp.int32),
                                 n_tokens)
        finally:
            int4m.FUSED_DECODE = saved
        return np.asarray(toks)

    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a16", group_size=128, scale_dtype="f32")
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    params = jax.block_until_ready(params)
    p16 = cast_scales(params, jnp.bfloat16)

    runners = {}
    for name, (p, fused) in (("base", (params, False)),
                             ("fused", (params, True)),
                             ("base16", (p16, False)),
                             ("fused16", (p16, True))):
        eng = Engine(p, cfg, qcfg, batch=1, max_len=2048)
        g = GenerationConfig(temp=0.0, n_predict=N_LONG, repeat_penalty=1.1,
                             repeat_last_n=64)
        print(f"compiling {name}...", file=sys.stderr)
        runners[name] = make_runner(eng, g, fused)
        runners[name](0, N_SHORT)
        runners[name](0, N_LONG)

    # correctness: greedy chains from the same prompt (bf16 argmax chains may
    # split after a near-tie on random weights; require a long common prefix)
    chains = {name: run(42, 64) for name, run in runners.items()}
    out = {}
    for name in ("fused", "base16", "fused16"):
        a, b = chains["base"], chains[name]
        prefix = int(np.argmax(a[0] != b[0])) if (a != b).any() else 64
        out[f"prefix_{name}"] = prefix
        print(f"{name} greedy prefix agreement vs base: {prefix}/64",
              file=sys.stderr)

    results = {n: [] for n in runners}
    for r in range(ROUNDS):
        for name, run in runners.items():
            t0 = time.perf_counter()
            run(1000 + 10 * r + hash(name) % 7, N_SHORT)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2000 + 10 * r + hash(name) % 7, N_LONG)
            t_l = time.perf_counter() - t0
            results[name].append((t_l - t_s) / (N_LONG - N_SHORT))
        print(f"round {r} done", file=sys.stderr)

    for name, ts in results.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_tok": round(med * 1e3, 3),
                     "tok_per_s": round(1.0 / med, 1)}
        print(f"{name:8s} {out[name]['ms_per_tok']:7.3f} ms/tok "
              f"({out[name]['tok_per_s']} tok/s)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
