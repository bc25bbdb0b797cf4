"""On-chip A/B: fused decode path (norm/residual inside the int4 kernels,
models/llama.py FUSED_DECODE) vs the unfused production path.

Correctness first (one decode step logits + 64-token greedy chain), then the
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

N_SHORT, N_LONG = 16, 272
ROUNDS = 6
PROMPT = 64


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
        saved = llama.FUSED_DECODE
        llama.FUSED_DECODE = fused
        try:
            toks, cache = jitted(eng.params, eng.cfg, logits, cache, state,
                                 last, jnp.asarray(PROMPT, jnp.int32),
                                 n_tokens)
        finally:
            llama.FUSED_DECODE = saved
        return np.asarray(toks)

    return run


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a16", group_size=128)
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    params = jax.block_until_ready(params)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=2048)
    g = GenerationConfig(temp=0.0, n_predict=N_LONG, repeat_penalty=1.1,
                        repeat_last_n=64)

    runners = {}
    for name, fused in (("unfused", False), ("fused", True)):
        print(f"compiling {name}...", file=sys.stderr)
        runners[name] = make_runner(eng, g, fused)
        runners[name](0, N_SHORT)
        runners[name](0, N_LONG)

    # correctness: identical greedy 64-token chains from the same prompt
    a = runners["unfused"](42, 64)
    b = runners["fused"](42, 64)
    match = int((a == b).sum())
    print(f"greedy chain agreement: {match}/64", file=sys.stderr)
    # bf16 argmax chains may diverge on random weights; require a long
    # common prefix (chains split only AFTER a near-tie)
    prefix = int(np.argmax(a[0] != b[0])) if (a != b).any() else 64

    results = {"unfused": [], "fused": []}
    for r in range(ROUNDS):
        for name, run in runners.items():
            t0 = time.perf_counter()
            run(1000 + 10 * r + (name == "fused"), N_SHORT)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2000 + 10 * r + (name == "fused"), N_LONG)
            t_l = time.perf_counter() - t0
            results[name].append((t_l - t_s) / (N_LONG - N_SHORT))
        print(f"round {r} done", file=sys.stderr)

    out = {"prefix_agreement": prefix}
    for name, ts in results.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_tok": round(med * 1e3, 3),
                     "tok_per_s": round(1.0 / med, 1)}
        print(f"{name:8s} {out[name]['ms_per_tok']:7.3f} ms/tok "
              f"({out[name]['tok_per_s']} tok/s)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
