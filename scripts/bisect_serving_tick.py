"""Attribute the serving decode tick (r5): at B=8 slots the r4 trace put a
16-tick burst at ~147 ms = 9.2 ms/tick while the model's weight+KV stream
bounds it near ~6.5 ms. Which part of the tick is sampler vs model?

Interleaved loop-differenced A/B over the REAL _decode_multi executable
shapes (llama3-8b W4A8, B=8, ctx_cap 512, tick_batch 16):

  model   : forward only, fixed next-token (no sampler at all)
  greedy  : forward + plain argmax
  rowsamp : forward + sample_rows exactly as the 24-req bench runs it
            (top_k=40 sort-free, repeat_penalty=1.1 window 64, top_p mix)

Each variant runs as ONE jit'd scan of n_ticks; per-tick cost is the
difference between trip counts 64 and 16 (differences out dispatch+fetch).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bisect_serving_tick.py
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.generation import sampling
    from tinychatengine_tpu.models import llama

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    slots, max_len, cap = 8, 2048, 512
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len,
                                      fast=True)
    params = jax.block_until_ready(params)

    gcfgs = [GenerationConfig(temp=0.0, repeat_penalty=1.1, repeat_last_n=64),
             GenerationConfig(temp=1.0, top_p=0.9, repeat_penalty=1.1,
                              repeat_last_n=64, seed=11),
             GenerationConfig(temp=0.7, top_k=40, repeat_penalty=1.0,
                              repeat_last_n=1, seed=12)]
    rparams = sampling.RowParams.from_configs(
        [gcfgs[i % 3] for i in range(slots)])
    window = 64

    def body_model(params, rparams, toks, cache, lengths, keys, last, mu):
        logits, cache = llama.forward(params, cfg, toks[:, None], cache,
                                      lengths, ctx_cap=cap)
        # data-depend on logits without any sampler
        tok = (toks + (logits[:, 0] > 0).astype(jnp.int32)) % 1000
        return tok, cache, keys, last, mu

    def body_greedy(params, rparams, toks, cache, lengths, keys, last, mu):
        logits, cache = llama.forward(params, cfg, toks[:, None], cache,
                                      lengths, ctx_cap=cap)
        return (jnp.argmax(logits, -1).astype(jnp.int32) % 1000,
                cache, keys, last, mu)

    def body_rowsamp(params, rparams, toks, cache, lengths, keys, last, mu):
        logits, cache = llama.forward(params, cfg, toks[:, None], cache,
                                      lengths, ctx_cap=cap)
        tok, keys, mu = sampling.sample_rows(
            logits, keys, rparams, last, mu, use_bias=False,
            use_tfs_typical=False, use_mirostat=False, top_k_max=64)
        last = jnp.concatenate([last[:, 1:], tok[:, None]], axis=1)
        return tok % 1000, cache, keys, last, mu

    BODIES = {"model": body_model, "greedy": body_greedy,
              "rowsamp": body_rowsamp}

    # params/rparams MUST be jit arguments: closure constants blow the
    # remote compiler's upload limit (CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("variant", "n_ticks"),
                       donate_argnames=("cache",))
    def burst(params, rparams, toks, cache, lengths, keys, last, mu, *,
              variant, n_ticks):
        body = BODIES[variant]

        def tick(carry, _):
            toks, cache, keys, last, mu = carry
            toks, cache, keys, last, mu = body(params, rparams, toks, cache,
                                               lengths, keys, last, mu)
            return (toks, cache, keys, last, mu), toks

        (_, cache, _, _, _), seq = jax.lax.scan(
            tick, (toks, cache, keys, last, mu), None, length=n_ticks)
        return seq, cache

    def fresh(seed):
        rng = np.random.default_rng(seed)
        cache = kvc.init_cache(cfg.num_layers, slots, max_len,
                               cfg.num_kv_heads, cfg.head_dim)
        toks = jnp.asarray(rng.integers(100, 1000, slots), jnp.int32)
        lengths = jnp.asarray(rng.integers(128, 320, slots), jnp.int32)
        keys = jnp.asarray(
            np.stack([np.asarray(jax.random.PRNGKey(seed * 31 + i))
                      for i in range(slots)]))
        last = jnp.asarray(rng.integers(0, 1000, (slots, window)), jnp.int32)
        mu = jnp.full((slots,), 10.0, jnp.float32)
        return toks, cache, lengths, keys, last, mu

    N_SHORT, N_LONG = 16, 64
    variants = list(BODIES)
    print("compiling...", file=sys.stderr)
    for v in variants:
        for n in (N_SHORT, N_LONG):
            t0 = time.perf_counter()
            toks, cache, lengths, keys, last, mu = fresh(0)
            np.asarray(burst(params, rparams, toks, cache, lengths, keys,
                             last, mu, variant=v, n_ticks=n)[0])
            print(f"  {v}/{n}: {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr)

    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 6
    res = {v: {"s": [], "l": []} for v in variants}
    for r in range(rounds):
        for v in variants:
            toks, cache, lengths, keys, last, mu = fresh(100 + r)
            t0 = time.perf_counter()
            np.asarray(burst(params, rparams, toks, cache, lengths, keys,
                             last, mu, variant=v, n_ticks=N_SHORT)[0])
            res[v]["s"].append(time.perf_counter() - t0)
            toks, cache, lengths, keys, last, mu = fresh(200 + r)
            t0 = time.perf_counter()
            np.asarray(burst(params, rparams, toks, cache, lengths, keys,
                             last, mu, variant=v, n_ticks=N_LONG)[0])
            res[v]["l"].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{v}={(res[v]['l'][-1] - res[v]['s'][-1]) / (N_LONG - N_SHORT) * 1e3:.2f}ms"
            for v in variants), file=sys.stderr)

    out = {"metric": "serving_tick_bisect_ms", "slots": slots,
           "ctx_cap": cap, "rounds": rounds}
    for v in variants:
        per = (float(np.median(res[v]["l"])) - float(np.median(res[v]["s"]))) \
            / (N_LONG - N_SHORT)
        out[v] = round(per * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
