"""Why is paged serving slow on chip? (r5: bench_serving --paged measured
34.7 tok/s vs 576 dense.) Time the pieces in isolation, loop-differenced:

  dense    : llama.forward decode tick, dense slot cache, ctx_cap 512
  paged    : llama.forward decode tick, page pool + page_table
  paged_nw : paged attention only (skip paged_update_layer write) — split
             the read (flash_decode_paged) from the write path

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_paged.py
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.runtime import paged as pg

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    slots, max_len, page_size = 8, 2048, 128
    max_pages = max_len // page_size
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len,
                                      fast=True)
    params = jax.block_until_ready(params)

    n_pages = slots * max_pages
    tables = np.arange(n_pages, dtype=np.int32).reshape(slots, max_pages)

    @functools.partial(jax.jit, static_argnames=("mode", "iters"),
                       donate_argnames=("cache_k", "cache_v", "dense"))
    def loop(params, toks, cache_k, cache_v, dense, lengths, tables, *,
             mode, iters):
        def body(carry, _):
            toks, ck, cv, dn = carry
            if mode == "dense":
                logits, dn = llama.forward(params, cfg, toks[:, None], dn,
                                           lengths, ctx_cap=512)
            else:
                cache = pg.PagedKVCache(k=ck, v=cv)
                logits, cache = llama.forward(params, cfg, toks[:, None],
                                              cache, lengths,
                                              page_table=tables)
                ck, cv = cache.k, cache.v
            toks = (toks + (logits[:, 0] > 0).astype(jnp.int32)) % 1000
            return (toks, ck, cv, dn), ()

        (toks, ck, cv, dn), _ = jax.lax.scan(
            body, (toks, cache_k, cache_v, dense), None, length=iters)
        return toks

    def fresh(seed):
        rng = np.random.default_rng(seed)
        pc = pg.init_paged_cache(cfg.num_layers, n_pages, cfg.num_kv_heads,
                                 page_size, cfg.head_dim)
        dn = kvc.init_cache(cfg.num_layers, slots, max_len,
                            cfg.num_kv_heads, cfg.head_dim)
        toks = jnp.asarray(rng.integers(100, 1000, slots), jnp.int32)
        lengths = jnp.asarray(rng.integers(128, 320, slots), jnp.int32)
        return toks, pc.k, pc.v, dn, lengths, jnp.asarray(tables)

    N_S, N_L = 8, 40
    print("compiling...", file=sys.stderr)
    for mode in ("dense", "paged"):
        for n in (N_S, N_L):
            t0 = time.perf_counter()
            np.asarray(loop(params, *fresh(0), mode=mode, iters=n))
            print(f"  {mode}/{n}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)

    res = {m: {"s": [], "l": []} for m in ("dense", "paged")}
    for r in range(5):
        for m in ("dense", "paged"):
            t0 = time.perf_counter()
            np.asarray(loop(params, *fresh(10 + r), mode=m, iters=N_S))
            res[m]["s"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(loop(params, *fresh(50 + r), mode=m, iters=N_L))
            res[m]["l"].append(time.perf_counter() - t0)
        print(f"round {r}: " + "  ".join(
            f"{m}={(res[m]['l'][-1] - res[m]['s'][-1]) / (N_L - N_S) * 1e3:.2f}ms"
            for m in res), file=sys.stderr)
    out = {"metric": "paged_tick_probe_ms"}
    for m in res:
        out[m] = round((float(np.median(res[m]["l"]))
                        - float(np.median(res[m]["s"]))) / (N_L - N_S) * 1e3,
                       3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
