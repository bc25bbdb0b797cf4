"""Serving-engine throughput on the real chip: continuous batching with a
mixed per-request sampling load (the scheduler + row-sampler + ragged decode
path, not just the raw device loop).

Llama-3-8B W4A8 (headline scheme), 8 slots, 24 requests with varied prompt lengths,
n_predicts, and sampling configs (greedy / hot / top-k), arriving up-front.
Reports aggregate generated tokens/s and per-request TTFT stats.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serving.py
       ... bench_serving.py --http   # same load through the REST layer
                                     # (24 concurrent OpenAI-API clients)
       ... bench_serving.py --slots 16 --requests 48   # slot-scaling point
"""

import json
import sys
import time

import numpy as np


def _flag(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def _enable_compile_cache():
    """Persistent XLA compilation cache (same default as serve.py): repeat
    bench runs skip the 20-240s-per-executable tunnel compiles. Measured
    phases are unaffected (warmup is separated; timed loops re-dispatch
    cached executables either way). TCE_BENCH_NO_CACHE=1 opts out."""
    import os

    import jax
    if os.environ.get("TCE_BENCH_NO_CACHE") == "1":
        return
    try:
        path = os.path.expanduser("~/.cache/tce_tpu/xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as exc:
        print(f"compilation cache disabled: {exc}", file=sys.stderr)


def main():
    _enable_compile_cache()
    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.runtime.serving import ServingEngine

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    gcfg = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.1,
                            repeat_last_n=64, seed=0)
    slots = _flag("--slots", 8)
    n_requests = _flag("--requests", 24)
    paged = "--paged" in sys.argv  # VERDICT r4 weak #3: the page-indirection
    # cost on the SAME 24-req load (slot pool vs page pool, n_pages set to
    # the dense-equivalent capacity so admission/backpressure behavior only
    # differs by the page table itself)
    int8_kv = "--int8-kv" in sys.argv  # bytes-lever sibling (VERDICT #4):
    # int8 KV halves the decode KV stream on the same load
    if int8_kv:
        qcfg = QuantConfig(scheme="w4a8", group_size=128,
                           kv_cache_dtype="int8")
    long_ctx = "--long" in sys.argv  # long-context serving load: ~3-4k-token
    # prompts so the per-tick KV stream rivals the weight stream — the regime
    # where int8-KV's halved bytes should beat its requant VPU cost (the
    # short-context row shows it LOSING at ctx<=512; this row tests the
    # "long-context is its case" disposition at the serving level).
    max_len = 4608 if long_ctx else 2048
    if long_ctx and n_requests == 24 and "--requests" not in sys.argv:
        n_requests = 16
    tb = _flag("--tick-batch", 16)
    srv = ServingEngine(params, cfg, qcfg, slots=slots, max_len=max_len,
                        gcfg=gcfg, admission_chunk=512, tick_batch=tb,
                        paged=paged)

    rng = np.random.default_rng(0)
    variants = [
        None,                                                  # engine cfg
        GenerationConfig(temp=1.0, top_p=0.9, n_predict=128,
                         repeat_penalty=1.1, repeat_last_n=64, seed=11),
        GenerationConfig(temp=0.7, top_k=40, n_predict=128,
                         repeat_penalty=1.0, repeat_last_n=1, seed=12),
    ]

    def submit_all():
        reqs = []
        for i in range(n_requests):
            plen = (int(rng.integers(3072, 3968)) if long_ctx
                    else int(rng.integers(32, 320)))
            ids = rng.integers(100, cfg.vocab_size - 100, plen)
            reqs.append(srv.submit(ids, n_predict=128,
                                   gcfg=variants[i % len(variants)]))
        return reqs

    print("warmup (compiles all shapes)...", file=sys.stderr)
    t0 = time.perf_counter()
    submit_all()
    srv.run()
    print(f"  warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    srv.done.clear()

    for k in srv.tick_stats:
        srv.tick_stats[k] = 0
    t0 = time.perf_counter()
    reqs = submit_all()
    srv.run()
    wall = time.perf_counter() - t0
    print(f"  tick mix: {srv.tick_stats}", file=sys.stderr)
    total = sum(len(r.output_ids) for r in reqs)
    ttfts = sorted(r.first_token_t - r.submit_t for r in reqs)
    tag = "_paged" if paged else ("_int8kv" if int8_kv else "")
    if long_ctx:
        tag += "_long"
    if tb != 16:
        tag += f"_tb{tb}"
    out = {
        "metric": f"llama3_8b_w4a8_serving{tag}_tokens_per_s",
        "value": round(total / wall, 1),
        "unit": "tokens/s",
        "requests": len(reqs), "slots": slots,
        "total_tokens": total, "wall_s": round(wall, 2),
        "ttft_s_p50": round(ttfts[len(ttfts) // 2], 2),
        "ttft_s_p95": round(ttfts[int(len(ttfts) * 0.95)], 2),
    }
    print(json.dumps(out))
    if paged or int8_kv or long_ctx:
        return  # variant rows measure the main load only

    # -- speculative serving on PLD-friendly prompts -------------------------
    # All-greedy batch of repetitive prompts (the prompt-lookup sweet spot:
    # code/doc-style text where continuations repeat). Same engine config
    # ± speculative; identical outputs are asserted, wall clock compared.
    g = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.0,
                         repeat_last_n=1)

    def rep_prompts():
        return [np.tile(rng0.integers(100, 1000, 12), 16)   # 192-tok loops
                for _ in range(8)]

    results = {}
    for spec in (False, True):
        srv2 = ServingEngine(params, cfg, qcfg, slots=4, max_len=2048,
                             gcfg=g, tick_batch=16, speculative=spec)
        rng0 = np.random.default_rng(7)
        print(f"spec={spec} warmup...", file=sys.stderr)
        for p in rep_prompts():
            srv2.submit(p)
        srv2.run()
        srv2.done.clear()
        rng0 = np.random.default_rng(7)
        t0 = time.perf_counter()
        reqs2 = [srv2.submit(p) for p in rep_prompts()]
        srv2.run()
        wall2 = time.perf_counter() - t0
        total2 = sum(len(r.output_ids) for r in reqs2)
        results[spec] = (total2 / wall2, [r.output_ids for r in reqs2])
        if spec:
            print(f"  spec stats: {srv2._spec_stats}", file=sys.stderr)
    assert results[True][1] == results[False][1], "spec output diverged"
    print(json.dumps({
        "metric": "llama3_8b_w4a8_serving_speculative_tokens_per_s",
        "value": round(results[True][0], 1),
        "unit": "tokens/s",
        "plain_tokens_per_s": round(results[False][0], 1),
        "speedup": round(results[True][0] / results[False][0], 2),
    }))


def main_http():
    """The same 24-request mixed workload as main(), but submitted as 24
    concurrent HTTP clients against the OpenAI-compatible server
    (runtime/server.py) with pre-tokenized prompts — measures the REST
    layer's overhead (thread handoff + per-token detok + JSON) on top of the
    continuous-batching engine."""
    _enable_compile_cache()
    import http.client
    import threading

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.runtime.server import InferenceServer
    from tinychatengine_tpu.runtime.serving import ServingEngine
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer

    tiny = "--tiny" in sys.argv  # CPU smoke: the whole REST + engine path
    name = "bytellama_5m" if tiny else "llama3_8b"
    cfg = get_model_config(name)
    qcfg = QuantConfig(scheme="fp" if tiny else "w4a8", group_size=128)
    print("building params...", file=sys.stderr)
    max_len = min(2048, cfg.max_sqlen)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len,
                                      fast=not tiny)
    n_pred = 16 if tiny else 128
    gcfg = GenerationConfig(temp=0.0, n_predict=n_pred, repeat_penalty=1.1,
                            repeat_last_n=64, seed=0)
    srv = ServingEngine(params, cfg, qcfg, slots=8, max_len=max_len,
                        gcfg=gcfg, admission_chunk=512,
                        tick_batch=_flag("--tick-batch", 16))
    # ByteTokenizer is a stand-in detokenizer (random weights → ids >= 256
    # decode to ""); prompts go in PRE-TOKENIZED so vocab ids are exercised
    server = InferenceServer(srv, ByteTokenizer(), model_name=name,
                             request_timeout=3600.0)
    port = server.start(port=0)

    variants = [
        {},
        {"temperature": 1.0, "top_p": 0.9, "seed": 11},
        {"temperature": 0.7, "top_k": 40, "seed": 12,
         "repetition_penalty": 1.0, "repeat_last_n": 1},
    ]

    def run_batch(tag):
        rng = np.random.default_rng(0)
        bodies = []
        for i in range(24):
            plen = int(rng.integers(16, 96 if tiny else 320))
            ids = rng.integers(100, cfg.vocab_size - 100, plen)
            bodies.append({"prompt": [int(t) for t in ids],
                           "max_tokens": n_pred, "ignore_eos": True,
                           **variants[i % len(variants)]})
        usages = [None] * len(bodies)

        def client(i):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=3600)
            conn.request("POST", "/v1/completions", json.dumps(bodies[i]),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            out = json.loads(resp.read())
            conn.close()
            assert resp.status == 200, (tag, i, out)
            usages[i] = out["usage"]["completion_tokens"]

        errors = []

        def guarded(i):
            try:
                client(i)
            except Exception as exc:
                errors.append((i, repr(exc)))

        t0 = time.perf_counter()
        threads = [threading.Thread(target=guarded, args=(i,))
                   for i in range(len(bodies))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errors, errors[:3]
        return sum(usages), wall

    print("warmup (compiles all shapes)...", file=sys.stderr)
    t0 = time.perf_counter()
    run_batch("warmup")
    print(f"  warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # instrument the scheduler thread: how much of the wall is engine.step()
    # (device work + dispatch) vs REST-layer scheduling gaps
    acc = [0.0, 0]
    orig_step = srv.step

    def timed_step():
        t0 = time.perf_counter()
        orig_step()
        acc[0] += time.perf_counter() - t0
        acc[1] += 1
    srv.step = timed_step
    for k in srv.tick_stats:
        srv.tick_stats[k] = 0

    total, wall = run_batch("timed")
    print(f"  tick mix: {srv.tick_stats}", file=sys.stderr)
    print(f"  step() time: {acc[0]:.2f}s over {acc[1]} calls "
          f"(wall {wall:.2f}s)", file=sys.stderr)
    print(json.dumps({
        "metric": name + "_serving_http_tokens_per_s",
        "value": round(total / wall, 1),
        "unit": "tokens/s",
        "requests": 24, "slots": 8,
        "total_tokens": total, "wall_s": round(wall, 2),
        "step_s": round(acc[0], 2), "step_calls": acc[1],
    }))
    server.close()


if __name__ == "__main__":
    main_http() if "--http" in sys.argv else main()
