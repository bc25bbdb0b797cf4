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


def main(argv=None):
    import os

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama3_8b")
    ap.add_argument("--scheme", default="w4a16")
    ap.add_argument("--configs", default=None,
                    help="comma list like 1x1,1x4,2x4 (default: powers of 2)")
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
        if n_model > 1 and cfg.num_kv_heads % n_model:
            print(json.dumps({"mesh": f"{n_data}x{n_model}",
                              "skipped": f"TP {n_model} does not divide "
                                         f"{cfg.num_kv_heads} KV heads"}))
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
