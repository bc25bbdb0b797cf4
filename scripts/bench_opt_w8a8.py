"""W8A8 OPT-6.7B decode measurement on the real chip (VERDICT r1 item 8).

Decides whether the XLA int8-einsum W8A8 path needs a Pallas kernel: times
the full device decode loop (Engine.generate_device, same methodology as
bench.py) and reports tokens/s against the int8-weight HBM roofline.
Weights are synthesized ON DEVICE (host->device over the tunnel runs at
~40 MB/s — uploading 6.7 GB of random int8 would take minutes).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_opt_w8a8.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig, get_model_config
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models.opt import OPTLayerParams, OPTParams, POS_OFFSET
from tinychatengine_tpu.ops.linear import DenseLinear, W8A8Linear

HBM_BW = 819e9


def fast_w8a8_params(cfg, seed=0):
    """Layer-stacked random W8A8 OPTParams generated on device (layout-only
    fidelity, like llama.init_random_params(fast=True))."""
    L, e, f, v = cfg.num_layers, cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 20))

    def w8(k, n, alpha):
        return W8A8Linear(
            weight=jax.random.randint(next(keys), (L, k, n), -127, 128,
                                      jnp.int8),
            alpha=jnp.full((L,), alpha, jnp.float32),
            bias=jax.random.uniform(next(keys), (L, n), jnp.float32, -8, 8))

    layers = OPTLayerParams(
        attn_ln_w=jnp.full((L, e), 20.0, jnp.float32),
        attn_ln_b=jnp.zeros((L, e), jnp.float32),
        q_proj=w8(e, e, 0.002), k_proj=w8(e, e, 0.002), v_proj=w8(e, e, 0.002),
        out_proj=w8(e, e, 0.004),
        final_ln_w=jnp.full((L, e), 20.0, jnp.float32),
        final_ln_b=jnp.zeros((L, e), jnp.float32),
        fc1=w8(e, f, 0.002), fc2=w8(f, e, 0.004),
        qk_alpha=jnp.full((L,), 1e-4, jnp.float32),
        pv_alpha=jnp.full((L,), 1e-4, jnp.float32),
    )
    embed = jax.random.normal(next(keys), (v, e), jnp.float32) * 0.02
    return OPTParams(
        embed_tokens=embed,
        embed_positions=jax.random.normal(
            next(keys), (cfg.max_sqlen + POS_OFFSET, e), jnp.float32) * 0.02,
        layers=layers,
        final_ln_w=jnp.ones((e,), jnp.float32),
        final_ln_b=jnp.zeros((e,), jnp.float32),
        lm_head=DenseLinear(weight=embed.T.astype(jnp.bfloat16)),
    )


def main():
    cfg = get_model_config("opt_6.7b")
    qcfg = QuantConfig(scheme="w8a8")
    print("building opt_6.7b w8a8 device-random params...", file=sys.stderr)
    params = fast_w8a8_params(cfg)
    jax.block_until_ready(params.layers.q_proj.weight)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=2048)
    g = GenerationConfig(temp=0.0, n_predict=64, repeat_penalty=1.0,
                         repeat_last_n=1)

    n_decode = 64

    def run(seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
        return np.asarray(eng.generate_device(ids, g, n_tokens=n_tokens))

    print("compiling...", file=sys.stderr)
    run(0, 1)
    run(0, 1 + n_decode)
    shorts, longs = [], []
    for trial in range(4):
        t0 = time.perf_counter(); run(10 + trial, 1)
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(20 + trial, 1 + n_decode)
        longs.append(time.perf_counter() - t0)
        print(f"trial {trial}: short={shorts[-1]:.3f}s long={longs[-1]:.3f}s",
              file=sys.stderr)
    per_tok = (float(np.median(longs)) - float(np.median(shorts))) / n_decode
    tok_s = 1.0 / per_tok

    L, e, f = cfg.num_layers, cfg.embed_dim, cfg.hidden_dim
    w_bytes = L * (4 * e * e + 2 * e * f)                  # int8 weights
    lm_bytes = cfg.embed_dim * 50272 * 2                   # bf16 tied head
    kv_bytes = L * 2 * cfg.num_heads * cfg.head_dim * (64 + 32) * 1  # int8 KV
    roof = HBM_BW / (w_bytes + lm_bytes + kv_bytes)
    out = {"metric": "opt_6.7b_w8a8_decode_tokens_per_s_per_chip",
           "value": round(tok_s, 2), "unit": "tokens/s",
           "roofline": round(roof, 1), "frac_of_roofline": round(tok_s / roof, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
