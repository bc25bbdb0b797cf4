"""VLM (VILA-7B-class) numbers on the real chip: CLIP ViT-L/14-336 encode
latency and image-TTFT through the multimodal splice (VERDICT r3 #6;
BASELINE config "VILA-7B: FP16 CLIP encoder + INT4 LLaMA decoder";
reference path LLaVAGenerate.cc:344-600).

Random-packed weights (shapes/layout are what the chip times, as bench.py).
Methodology per CLAUDE.md: encode is timed as a lax.scan chained through the
carry (embeds perturb the next pixels — defeats the tunnel's execution
cache and XLA hoisting) differenced between two trip counts; TTFT is a
host-path prefill+sample wall time net of the measured dispatch RTT.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_vlm.py
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
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.generation import sampling
    from tinychatengine_tpu.generation.engine import _hashable_gcfg
    from tinychatengine_tpu.models import clip, llama

    ccfg = get_model_config("clip_vit_large")
    vcfg = get_model_config("vila_7b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    print("building CLIP + VILA-7B params...", file=sys.stderr)
    cparams = clip.init_random_params(ccfg, seed=0)
    vparams = llama.init_random_params(vcfg, qcfg, seed=0, max_pos=2048,
                                       fast=True)

    # -- CLIP encode: [1, 336, 336, 3] -> [1, 576, 4096] ---------------------
    # NOTE: params must be jit ARGUMENTS — a ~300 MB closure constant blows
    # the remote compiler's upload limit (broken pipe / HTTP 413; CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def encode_loop(cp, pixels, iters):
        def body(px, _):
            emb = clip.encode_image(cp, ccfg, px)           # [1, 576, 4096]
            px2 = px + jnp.mean(emb).astype(px.dtype) * 1e-6
            return px2, jnp.mean(emb)
        px, means = jax.lax.scan(body, pixels, None, length=iters)
        return means

    def encode_once(seed, iters):
        px = jax.random.normal(jax.random.PRNGKey(seed), (1, 336, 336, 3),
                               jnp.float32)
        return np.asarray(encode_loop(cparams, px, iters))

    print("compiling CLIP encode...", file=sys.stderr)
    encode_once(0, 1)
    encode_once(0, 9)
    es, el = [], []
    for t in range(4):
        t0 = time.perf_counter(); encode_once(10 + t, 1)
        es.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); encode_once(20 + t, 9)
        el.append(time.perf_counter() - t0)
    enc_ms = (float(np.median(el)) - float(np.median(es))) / 8 * 1e3

    # -- image-TTFT: splice 576 image embeds into a 648-token prefill --------
    eng = Engine(vparams, vcfg, qcfg, batch=1, max_len=2048)
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.1,
                         repeat_last_n=64)
    n_pre, n_img, n_post = 8, 576, 24
    S = n_pre + n_img + n_post

    # dispatch RTT to subtract (as bench.py)
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0.0)))
    rtts = []
    for t in range(6):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.float32(t + 1.5)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    jit_encode = jax.jit(lambda cp, px: clip.encode_image(cp, ccfg, px))

    def image_turn(seed):
        """encode image -> build embeds -> prefill -> greedy first token."""
        rng = np.random.default_rng(seed)
        px = jnp.asarray(rng.standard_normal((1, 336, 336, 3)), jnp.float32)
        img = jit_encode(cparams, px)[0]                     # [576, 4096]
        ids = rng.integers(10, vcfg.vocab_size - 10, S).astype(np.int32)
        e_txt = jnp.asarray(vparams.embed)[jnp.asarray(ids)]
        embeds = e_txt.at[n_pre:n_pre + n_img].set(
            img.astype(e_txt.dtype))[None]
        cache = eng.new_cache()
        logits, cache = eng.prefill(ids[None], cache, input_embeds=embeds)
        state = sampling.SamplerState.init(0, 1, g.mirostat_tau)
        tok, _ = eng._jit_sample(logits, state,
                                 jnp.full((1, 64), -1, jnp.int32),
                                 _hashable_gcfg(g))
        return int(np.asarray(tok)[0])

    print("compiling VILA prefill...", file=sys.stderr)
    image_turn(0)
    tts = []
    for t in range(5):
        t0 = time.perf_counter()
        image_turn(30 + t)
        tts.append(time.perf_counter() - t0)
    # image-TTFT = CLIP encode + embed build + prefill + sample; the host
    # path crosses the tunnel ~4x (encode, embed gather, prefill, sample) —
    # subtract those RTTs to report device work, and report raw too
    raw = float(np.median(tts))
    ttft_ms = max(raw - 4 * rtt, 0.0) * 1e3

    out = {
        "metric": "vila7b_image_ttft_ms",
        "value": round(ttft_ms, 1),
        "unit": "ms",
        "clip_encode_ms": round(enc_ms, 2),
        "prefill_tokens": S,
        "raw_wall_ms": round(raw * 1e3, 1),
        "dispatch_rtt_ms": round(rtt * 1e3, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
