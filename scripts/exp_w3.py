"""W3 (int3) bytes-lever experiment (VERDICT r4 item 4) — keep or kill.

Two measurements:
  1. On-chip kernel A/B: int3 vs int4 fused-dequant matmul on the two
     byte-dominant decode shapes (gate_up 4096→28672, down 14336→4096),
     timed as a data-chained lax.scan loop inside ONE jit, differenced
     between trip counts (per-op numbers are ±20% on this chip — a kernel
     that wins/loses >25% is decisive, smaller deltas need the full-model
     methodology).
  2. Δppl on the real trained bytellama (CPU): int3-quantize + dequantize
     the checkpoint, eval perplexity through the fp model — scheme accuracy
     isolated from kernel speed (same decomposition ACCURACY.md uses).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_w3.py [--ppl-only]
"""

import functools
import json
import sys
import time

import numpy as np


def bench_kernels():
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.ops.int3_matmul import int3_matmul, pack_qm_tpu3
    from tinychatengine_tpu.ops.int4_matmul import int4_matmul
    from tinychatengine_tpu.quant.numerics import (quantize_groupwise_int3,
                                                   quantize_groupwise_int4)
    from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales

    G = 128
    shapes = [("gate_up", 4096, 28672), ("down", 14336, 4096)]
    M, N_IT_S, N_IT_L = 8, 4, 36
    rng = np.random.default_rng(0)

    results = {}
    for name, k, n in shapes:
        w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        q4, d4 = quantize_groupwise_int4(w, G)
        p4 = jnp.asarray(pack_qm_tpu(q4, G))
        s4 = jnp.asarray(pack_scales(d4, "f32", G))
        q3, d3 = quantize_groupwise_int3(w, G)
        pa, pb = pack_qm_tpu3(q3)
        pa, pb = jnp.asarray(pa), jnp.asarray(pb)
        s3 = jnp.asarray(np.ascontiguousarray(d3.T))

        @functools.partial(jax.jit, static_argnames=("which", "iters"))
        def loop(x0, p4, s4, pa, pb, s3, *, which, iters):
            def body(carry, _):
                x = carry
                if which == "int4":
                    y = int4_matmul(x, p4, s4, group_size=G)
                else:
                    y = int3_matmul(x, pa, pb, s3, group_size=G)
                # chain: fold y back into an [M, K]-shaped carry
                upd = jnp.tanh(y[:, :128].astype(jnp.bfloat16))
                x = x.at[:, :128].add(upd * 1e-3)
                return x, ()

            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return x

        def run(which, iters, seed):
            x0 = jnp.asarray(
                np.random.default_rng(seed).standard_normal((M, k)) * 0.3,
                jnp.bfloat16)
            return np.asarray(loop(x0, p4, s4, pa, pb, s3, which=which,
                                   iters=iters))

        for which in ("int4", "int3"):
            run(which, N_IT_S, 0)
            run(which, N_IT_L, 0)
        rs = {"int4": {"s": [], "l": []}, "int3": {"s": [], "l": []}}
        for r in range(6):
            for which in ("int4", "int3"):
                t0 = time.perf_counter()
                run(which, N_IT_S, 100 + r)
                rs[which]["s"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                run(which, N_IT_L, 200 + r)
                rs[which]["l"].append(time.perf_counter() - t0)
        out = {}
        for which in ("int4", "int3"):
            per = (float(np.median(rs[which]["l"]))
                   - float(np.median(rs[which]["s"]))) / (N_IT_L - N_IT_S)
            out[which + "_us"] = round(per * 1e6, 1)
        out["ratio_int3_vs_int4"] = round(out["int3_us"] / out["int4_us"], 3)
        out["bytes_ratio"] = round((n * k * 3 / 8 + n * k // G * 4)
                                   / (n * k / 2 + n * k // G * 4), 3)
        results[name] = out
        print(f"{name}: {out}", file=sys.stderr)
    print(json.dumps({"metric": "w3_kernel_ab", **results}))


def ppl():
    import jax
    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.quant.numerics import (
        dequantize_groupwise_int3, dequantize_groupwise_int4,
        quantize_groupwise_int3, quantize_groupwise_int4)
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint
    from tinychatengine_tpu.tools.perplexity import perplexity

    cfg = get_model_config("bytellama_5m")
    params, _ = load_checkpoint("assets/bytellama_5m", cfg)
    text = open("assets/bytellama_5m/eval_sample.txt", encoding="utf-8").read()
    ids = np.asarray(ByteTokenizer().encode(text), np.int32)[:6144]

    def requant(params, bits):
        qf = (quantize_groupwise_int3 if bits == 3
              else quantize_groupwise_int4)
        df = (dequantize_groupwise_int3 if bits == 3
              else dequantize_groupwise_int4)

        def rq(lin):
            w = np.asarray(lin.weight, np.float32).T    # [OC, IC]
            g = min(128, w.shape[1])
            return type(lin)(weight=jnp.asarray(df(*qf(w, g), g).T,
                                                jnp.bfloat16), bias=lin.bias)

        import dataclasses as dc
        lyr = params.layers

        def rq_stacked(lin):
            per = [rq(type(lin)(weight=lin.weight[i], bias=None))
                   for i in range(lin.weight.shape[0])]
            return type(lin)(weight=jnp.stack([p.weight for p in per]),
                             bias=lin.bias)

        return dc.replace(
            params,
            layers=dc.replace(lyr, wqkv=rq_stacked(lyr.wqkv),
                              wo=rq_stacked(lyr.wo),
                              wgate_up=rq_stacked(lyr.wgate_up),
                              down=rq_stacked(lyr.down)),
            lm_head=rq(params.lm_head))

    out = {"metric": "w3_ppl_bytellama"}
    for tag, p in [("fp", params), ("int4_dq", requant(params, 4)),
                   ("int3_dq", requant(params, 3))]:
        out[tag] = round(float(perplexity(llama.forward, p, cfg, ids,
                                          window=512, stride=256)), 4)
        print(f"{tag}: {out[tag]}", file=sys.stderr)
    out["int4_rel"] = round(out["int4_dq"] / out["fp"] - 1, 4)
    out["int3_rel"] = round(out["int3_dq"] / out["fp"] - 1, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--ppl-only" not in sys.argv:
        bench_kernels()
    ppl()
