"""Scaling benchmark: decode throughput across TP x DP mesh shapes.

The reference has nothing to scale (single device). This harness measures the
framework's parallel path: for each (n_data, n_model) split of the available
devices it runs the full device-loop generation through the shard_map TP
forward and reports tokens/s and scaling efficiency vs the single-device run.

    python -m tinychatengine_tpu.tools.scaling --model llama3_8b \
        [--configs 1x1,1x4,2x4] [--n-decode 32]

On a CPU host this exercises the virtual mesh (correctness/compile checks,
not meaningful absolute numbers); on a TPU slice it is the real scaling curve.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_config(params_fn, cfg, qcfg, n_data: int, n_model: int,
               prompt_len: int = 32, n_decode: int = 32, trials: int = 3):
    import jax

    from tinychatengine_tpu.core.config import GenerationConfig
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.parallel.sharding import make_mesh, shard_params
    from tinychatengine_tpu.parallel.tp import make_tp_forward

    params = params_fn(n_model)
    if n_data * n_model > 1:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        params = shard_params(params, mesh)
        fwd = make_tp_forward(mesh)
    else:
        from tinychatengine_tpu.models import llama
        fwd = llama.forward

    eng = Engine(params, cfg, qcfg, batch=n_data, max_len=cfg.max_sqlen,
                 forward_fn=fwd)
    g = GenerationConfig(temp=0.0, n_predict=n_decode, repeat_penalty=1.0,
                         repeat_last_n=1)
    rng = np.random.default_rng(0)

    def run(seed, n):
        ids = rng.integers(10, cfg.vocab_size - 10, (n_data, prompt_len))
        return np.asarray(eng.generate_device(ids, g, n_tokens=n))

    run(0, 1)
    run(0, n_decode)  # compile both trip counts
    times = []
    for t in range(trials):
        t0 = time.perf_counter(); run(t, 1); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); run(t + 100, n_decode); t_l = time.perf_counter() - t0
        times.append((t_l - t_s) / (n_decode - 1))
    per_tok = float(np.median(times))
    return {"mesh": f"{n_data}x{n_model}",
            "tokens_per_s": round(n_data / per_tok, 2),
            "ms_per_token": round(per_tok * 1e3, 3)}


def run_sp_config(params_fn, cfg, qcfg, n_seq: int, n_model: int,
                  prompt_len: int = 512, trials: int = 3):
    """Sequence-parallel PREFILL latency for one (n_seq, n_model) mesh —
    the phase SP exists for (per-chip attention FLOPs and activations scale
    1/n_seq). 1x1 runs the plain single-device prefill as the baseline."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.parallel.sharding import shard_params
    from tinychatengine_tpu.parallel.sp import (
        make_sp_mesh,
        make_sp_prefill,
        shard_sp_cache,
    )

    params = params_fn(n_model)

    def new_cache():
        return kvc.init_cache(cfg.num_layers, 1, prompt_len,
                              cfg.num_kv_heads, cfg.head_dim)

    # cache allocated/resharded OUTSIDE the timed region (its device_put is
    # several dispatches on the real chip and would bias the SP side); the
    # prefill overwrites it fully each run (fresh start=0), and varying ids
    # defeat the tunnel's identical-args execution cache
    if n_seq * n_model > 1:
        mesh = make_sp_mesh(n_seq, n_model)
        params = shard_params(params, mesh)
        fwd = jax.jit(make_sp_prefill(mesh), static_argnames=("cfg",))
        cache = shard_sp_cache(new_cache(), mesh)
    else:
        fwd = jax.jit(llama.forward, static_argnames=("cfg",))
        cache = new_cache()
    rng = np.random.default_rng(0)

    def run(seed):
        ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10,
                                       (1, prompt_len)), jnp.int32)
        if n_seq * n_model > 1:
            logits, _ = fwd(params, cfg, ids, cache)
        else:
            logits, _ = fwd(params, cfg, ids, cache, jnp.int32(0))
        return np.asarray(logits)  # fetch forces execution (CLAUDE.md)

    run(0)  # compile
    times = []
    for t in range(trials):
        t0 = time.perf_counter()
        run(t + 1)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    return {"mesh": f"{n_seq}seq x {n_model}model",
            "prefill_ms": round(ms, 2), "prompt_len": prompt_len,
            "prefill_tokens_per_s": round(prompt_len / (ms / 1e3), 1)}


def run_pp_config(params_fn, cfg, qcfg, n_pipe: int, n_micro: int,
                  batch: int = 8, prompt_len: int = 32, n_decode: int = 16,
                  trials: int = 3):
    """Pipeline-parallel decode throughput for one stage count (layer axis
    over "pipe", GPipe microbatches). 1 pipe = single-device baseline."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.parallel.pp import (
        make_pp_forward,
        make_pp_mesh,
        shard_pp,
    )

    params = params_fn(1)
    cache = kvc.init_cache(cfg.num_layers, batch, cfg.max_sqlen,
                           cfg.num_kv_heads, cfg.head_dim)
    if n_pipe > 1:
        mesh = make_pp_mesh(n_pipe)
        params, cache = shard_pp(params, cache, mesh)
        fwd = jax.jit(make_pp_forward(mesh, n_micro),
                      static_argnames=("cfg",))
    else:
        fwd = jax.jit(llama.forward, static_argnames=("cfg",))
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(10, cfg.vocab_size - 10,
                                   (batch, prompt_len)), jnp.int32)
    logits, cache = fwd(params, cfg, ids, cache, jnp.int32(0))
    times = []
    for t in range(trials + 1):  # first pass compiles the decode step
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        t0 = time.perf_counter()
        for i in range(n_decode):
            logits, cache = fwd(params, cfg, tok[:, None], cache,
                                jnp.int32(prompt_len + i))
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tok)  # fetch forces execution
        if t > 0:
            times.append((time.perf_counter() - t0) / n_decode)
    per_tok = float(np.median(times))
    return {"mesh": f"{n_pipe}pipe (M={n_micro})", "batch": batch,
            "tokens_per_s": round(batch / per_tok, 2),
            "ms_per_token": round(per_tok * 1e3, 3)}


def main(argv=None):
    import os

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama3_8b")
    ap.add_argument("--scheme", default="w4a16")
    ap.add_argument("--mode", default="tp", choices=("tp", "sp", "pp"),
                    help="tp: TPxDP decode scaling; sp: sequence-parallel "
                         "prefill latency; pp: pipeline decode throughput")
    ap.add_argument("--configs", default=None,
                    help="comma list like 1x1,1x4,2x4 (default: powers of 2)")
    ap.add_argument("--prompt-len", type=int, default=512,
                    help="sp mode: prefill length")
    ap.add_argument("--n-micro", type=int, default=0,
                    help="pp mode: microbatches (default = stage count)")
    ap.add_argument("--n-decode", type=int, default=32)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (this "
                         "environment's TPU plugin overrides JAX_PLATFORMS/"
                         "XLA_FLAGS env vars — only jax.config works)")
    args = ap.parse_args(argv)

    if args.cpu_devices:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        except RuntimeError as e:
            ap.error(f"--cpu-devices must be set before backend init: {e}")

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.models import llama

    cfg = get_model_config(args.model)
    qcfg = QuantConfig(scheme=args.scheme)
    n_dev = jax.device_count()
    if args.configs:
        configs = [tuple(int(x) for x in c.split("x"))
                   for c in args.configs.split(",")]
    else:
        configs = [(1, 1)]
        m = 2
        while m <= n_dev:
            configs.append((1, m))
            if n_dev // m > 1:
                configs.append((n_dev // m, m))
            m *= 2

    def params_fn(n_model):
        return llama.init_random_params(cfg, qcfg, seed=0, fast=True,
                                        tp_degree=n_model)

    base = None
    for n_data, n_model in configs:
        if n_data * n_model > n_dev:
            print(json.dumps({"mesh": f"{n_data}x{n_model}",
                              "skipped": f"needs {n_data * n_model} devices,"
                                         f" have {n_dev}"}))
            continue
        if args.mode == "pp":
            # first config axis = pipe stages; second ignored
            if cfg.num_layers % n_data:
                print(json.dumps({"mesh": f"{n_data}pipe", "skipped":
                                  f"{n_data} stages do not divide "
                                  f"{cfg.num_layers} layers"}))
                continue
            n_micro = args.n_micro or max(n_data, 2)
            if 8 % n_micro:  # run_pp_config batch=8
                print(json.dumps({"mesh": f"{n_data}pipe", "skipped":
                                  f"{n_micro} microbatches do not divide "
                                  f"the batch of 8"}))
                continue
            r = run_pp_config(params_fn, cfg, qcfg, n_data, n_micro,
                              n_decode=args.n_decode)
            if base is None:
                base = r["tokens_per_s"]
            r["vs_single_device"] = round(r["tokens_per_s"] / base, 3)
            print(json.dumps(r))
            continue
        if n_model > 1 and cfg.num_kv_heads % n_model:
            print(json.dumps({"mesh": f"{n_data}x{n_model}",
                              "skipped": f"TP {n_model} does not divide "
                                         f"{cfg.num_kv_heads} KV heads"}))
            continue
        if args.mode == "sp":
            if args.prompt_len % max(n_data, 1):
                print(json.dumps({"mesh": f"{n_data}seq", "skipped":
                                  f"prompt {args.prompt_len} not divisible "
                                  f"by {n_data} seq shards"}))
                continue
            r = run_sp_config(params_fn, cfg, qcfg, n_data, n_model,
                              prompt_len=args.prompt_len)
            if base is None:
                base = r["prefill_ms"]
            r["speedup_vs_single"] = round(base / r["prefill_ms"], 3)
            print(json.dumps(r))
            continue
        r = run_config(params_fn, cfg, qcfg, n_data, n_model,
                       n_decode=args.n_decode)
        if base is None:
            base = r["tokens_per_s"]
        r["scaling_efficiency"] = round(
            r["tokens_per_s"] / (base * n_data * n_model), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
