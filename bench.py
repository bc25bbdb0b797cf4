"""Headline benchmark: Llama-3-8B AWQ-INT4 (W4A8) decode tokens/s, 1 chip.

W4A8 — same packed int4 weights, activations dynamically quantized to int8
per (row, group) in-kernel, s8 x s8 MXU dots — is the REFERENCE'S own
headline CPU path (llm/src/ops/linear.cc:171-236 USE_INT8_INT4_PRODUCT,
kernels/avx/matmul_avx_int8_int4.cc:325-357) and measured faster than
W4A16 here in every >=256-token interleaved A/B (r2: 154.4 vs 151.3;
r4 under bf16 scales: 157.8 vs 156.0 — scripts/ab_w4a16_vs_w4a8.py).
Accuracy: +1.25% vs +1.22% relative Δppl, statistically identical
(ACCURACY.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = measured / roofline where roofline tokens/s is the
HBM-bandwidth bound for streaming the quantized weights + KV cache per token
on one TPU v5e (819 GB/s). BASELINE.json's target is >= 0.80 of roofline.

Methodology (see utils/benchmark.py for why): the whole decode loop runs on
device (lax.scan inside one jit), timed as t(prefill+N tokens) -
t(prefill+1 token) with fresh prompts per trial to defeat the environment's
execution caching; completion is forced by fetching the tokens.
"""

import functools
import json
import sys
import time

import numpy as np


def _probe_device(timeout_s: float = 420.0) -> str | None:
    """Backend init over the tunnel can hang indefinitely when the TPU side
    is down; probe it in a killable subprocess so the bench fails fast with
    an honest JSON line instead of hanging the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return None
        return f"device probe failed: {(r.stderr or '').strip()[-200:]}"
    except subprocess.TimeoutExpired:
        return f"device probe timed out after {timeout_s:.0f}s (tunnel down?)"


def main():
    err = _probe_device()
    if err is not None:
        print(json.dumps({
            "metric": "llama3_8b_w4a8_decode_tokens_per_s_per_chip",
            "value": None, "unit": "tokens/s", "vs_baseline": None,
            "error": err}))
        sys.exit(2)

    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig, get_model_config
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    max_len = 2048  # reference max_sqlen (model.h:68-83)

    print("building llama3_8b random-packed params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len, fast=True)
    params = jax.block_until_ready(params)

    eng = Engine(params, cfg, qcfg, batch=1, max_len=max_len)
    g = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.1,
                         repeat_last_n=64)

    prompt_len = 64
    n_decode = 256  # >=256-token runs: the only decode-timing length that
    # proved stable on this time-shared chip (PERF.md methodology rule;
    # the r2 artifact's 64-token runs drifted ~2% between sessions)
    prefill_len = 2048  # one full-bucket prefill for the TTFT/prefill metric

    def run(seed, n_tokens, plen=prompt_len):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, cfg.vocab_size - 100, (1, plen))
        toks = eng.generate_device(ids, g, n_tokens=n_tokens)
        return np.asarray(toks)  # forces completion

    # compile both trip counts (first compile is slow over the tunnel)
    print("compiling...", file=sys.stderr)
    run(0, 1)
    run(0, 1 + n_decode)
    run(0, 1, plen=prefill_len)

    # dispatch round-trip overhead (tunnel RTT + fetch): timed on a trivial
    # program with fresh inputs, subtracted from TTFT so it reports device
    # work (prefill + 1 decode + sample), not tunnel latency
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0.0)))
    rtts = []
    for t in range(6):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.float32(t + 1.5)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    # The chip is time-shared behind the tunnel: a co-tenant burst during any
    # single run corrupts a paired short/long difference. Take the medians of
    # the short and long runs SEPARATELY across trials, then difference.
    shorts, longs, pfs = [], [], []
    for trial in range(4):
        t0 = time.perf_counter()
        run(10 + trial, 1)
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(20 + trial, 1 + n_decode)
        longs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(30 + trial, 1, plen=prefill_len)
        pfs.append(time.perf_counter() - t0)
        print(f"trial {trial}: short={shorts[-1]:.3f}s long={longs[-1]:.3f}s "
              f"prefill={pfs[-1]:.3f}s", file=sys.stderr)
    per_token = (float(np.median(longs)) - float(np.median(shorts))) / n_decode
    tokens_per_s = 1.0 / per_token

    # TTFT (p50): prefill(64) + 1 decode + sample, net of dispatch RTT
    # (llm/include/profiler.h:38-47 prints the same per-turn latency split)
    ttft_ms = max(float(np.median(shorts)) - rtt, 0.0) * 1e3
    # prefill throughput from the 2048-vs-64 prompt difference
    pf_delta = max(float(np.median(pfs)) - float(np.median(shorts)), 1e-6)
    prefill_tok_s = (prefill_len - prompt_len) / pf_delta

    # achievable-bandwidth calibration: nominal 819 GB/s is a spec number;
    # what the chip actually delivers on a pure read stream measured ~730
    # GB/s (89%) in r2. Probe: xor+max reduce over 2 GiB of int32 lanes —
    # xor with the carry defeats hoisting, max defeats the algebraic
    # simplifier's linearity factoring (which silently hoists any
    # matmul-based probe), and halving the lane count vs bf16 changed
    # nothing (733 vs 724 GB/s), proving it is HBM-bound, not VPU-bound.
    # Both ratios are reported: vs_baseline against the NOMINAL roofline
    # (the BASELINE.json contract), vs_stream_roofline against measured.
    sm = 32768
    sa = jax.random.randint(jax.random.PRNGKey(3), (sm, sm // 2), 0,
                            1 << 30, jnp.int32)  # 2 GiB

    @functools.partial(jax.jit, static_argnames=("iters",))
    def stream(b, bias, iters):
        def body(i, acc):
            return acc + (jnp.max(b ^ (acc & 1)) & 7) + 1
        return jax.lax.fori_loop(0, iters, body, bias)

    def stream_once(bias, iters):
        return float(np.asarray(stream(sa, jnp.int32(bias), iters)))

    stream_once(1, 1)
    stream_once(1, 17)
    s_shorts, s_longs = [], []
    for t in range(3):
        t0 = time.perf_counter(); stream_once(2 + t, 1)
        s_shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); stream_once(100 + t, 17)
        s_longs.append(time.perf_counter() - t0)
    stream_bw = sm * (sm // 2) * 4 / ((float(np.median(s_longs))
                                       - float(np.median(s_shorts))) / 16)

    # roofline: weight+scale bytes streamed per decoded token + avg KV read
    layer_bytes = 0
    for leaf in jax.tree.leaves(params.layers):
        layer_bytes += leaf.size * leaf.dtype.itemsize
    head_bytes = sum(l.size * l.dtype.itemsize
                     for l in jax.tree.leaves(params.lm_head))
    avg_ctx = prompt_len + n_decode // 2
    kv_bytes = cfg.num_layers * avg_ctx * cfg.num_kv_heads * cfg.head_dim * 2 * 2
    bytes_per_token = layer_bytes + head_bytes + kv_bytes
    HBM_BW = 819e9  # TPU v5e
    roofline = HBM_BW / bytes_per_token

    result = {
        "metric": "llama3_8b_w4a8_decode_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / roofline, 3),
        "ttft_ms_p50": round(ttft_ms, 1),
        "prefill_tokens_per_s": round(prefill_tok_s, 0),
        "stream_gbps_measured": round(stream_bw / 1e9, 0),
        "vs_stream_roofline": round(
            tokens_per_s / (stream_bw / bytes_per_token), 3),
    }
    print(f"roofline={roofline:.1f} tok/s ({bytes_per_token / 1e9:.2f} GB/token); "
          f"measured stream {stream_bw / 1e9:.0f} GB/s → achievable "
          f"{stream_bw / bytes_per_token:.1f} tok/s",
          file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
