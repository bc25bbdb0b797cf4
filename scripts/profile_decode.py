"""Per-op breakdown of one llama3-8b W4A16 decode step on the real chip.

VERDICT r1 item 1b: decode is 66% of roofline; find where the other ~34%
goes. Times each component with the device-honest loop-differencing method
(utils/benchmark.py rationale: tunnel RTT ~25ms, execution caching, fetch to
force completion), cycling layer_idx 0..L-1 so stacked-weight reads hit
fresh HBM like the real scan does.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_decode.py
Prints a table: per-op time x calls/step vs the op's HBM roofline.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig, get_model_config
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.generation import sampling
from tinychatengine_tpu.generation.engine import Engine, _hashable_gcfg
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops.attention import flash_decode
from tinychatengine_tpu.ops.int4_matmul import int4_matmul

HBM_BW = 819e9  # v5e

ITERS = 64
TRIALS = 3


def timed_loop(body, init, iters):
    """jit a fori_loop of `body(i, carry)`; return median per-iter seconds."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    def once(carry, n):
        out = run(carry, n)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))
        return out

    once(init, 1)
    once(init, iters)
    results = []
    for t in range(TRIALS):
        # fresh values to defeat the tunnel's execution cache
        carry = jax.tree.map(
            lambda x: x * (1.0 + 1e-3 * (t + 1)) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            init)
        leaf = jax.tree.leaves(carry)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))
        t0 = time.perf_counter(); once(carry, 1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); once(carry, iters); t2 = time.perf_counter() - t0
        results.append(max((t2 - t1) / (iters - 1), 1e-9))
    return float(np.median(results))


def main():
    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a16", group_size=128)
    max_len = 2048
    L = cfg.num_layers
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=max_len, fast=True)
    params = jax.block_until_ready(params)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=max_len)

    rows = []

    def report(name, per_call, calls, bytes_per_call):
        total = per_call * calls
        roof = bytes_per_call / HBM_BW
        rows.append(dict(name=name, us_per_call=per_call * 1e6, calls=calls,
                         ms_per_step=total * 1e3,
                         roof_us=roof * 1e6,
                         frac_of_roof=(roof / per_call if per_call else 0)))
        print(f"{name:24s} {per_call*1e6:9.1f} us x{calls:3d} = "
              f"{total*1e3:7.3f} ms/step   roof {roof*1e6:7.1f} us "
              f"({100*roof/per_call if per_call else 0:5.1f}% of BW)",
              file=sys.stderr)

    def wbytes(lin, stacked=True):
        b = lin.packed.size * lin.packed.dtype.itemsize \
            + lin.scales.size * lin.scales.dtype.itemsize
        return b // L if stacked else b

    ly = params.layers

    # --- the four per-layer int4 matmuls (stacked, layer-cycled) ----------
    def mm_loop(lin, k_dim, iters):
        x0 = jnp.ones((1, k_dim), jnp.bfloat16)

        def body(i, carry):
            x, packed, scales = carry
            y = int4_matmul(x, packed, scales, qcfg.group_size,
                            layer_idx=i % L)
            x = x[:, :1] * 0 + x + jnp.sum(y[..., :1]).astype(x.dtype) * 1e-12
            return (x, packed, scales)

        return timed_loop(body, (x0, lin.packed, lin.scales), iters)

    # small ops need many iterations: the loop total must dwarf the tunnel's
    # per-dispatch jitter (~1 ms) or the short/long difference is noise
    for name, lin, kd, iters in [
            ("qkv (4096->6144)", ly.wqkv, 4096, 512),
            ("wo (4096->4096)", ly.wo, 4096, 512),
            ("gate_up (4096->28672)", ly.wgate_up, 4096, 64),
            ("down (14336->4096)", ly.down, 14336, 128)]:
        t = mm_loop(lin, kd, iters)
        report(name, t, L, wbytes(lin))

    # --- lm_head (unstacked, 1 call/step) ----------------------------------
    lmh = params.lm_head

    def lmh_body(i, carry):
        x, packed, scales = carry
        y = int4_matmul(x, packed, scales, qcfg.group_size)
        return (x + jnp.sum(y[..., :1]).astype(x.dtype) * 1e-12, packed, scales)

    t = timed_loop(lmh_body, (jnp.ones((1, 4096), jnp.bfloat16),
                              lmh.packed, lmh.scales), 64)
    report("lm_head (4096->129024)", t, 1, wbytes(lmh, stacked=False))

    # --- flash decode attention (layer-cycled; ctx ~ 96 like bench) --------
    cache = kvc.init_cache(L, 1, max_len, cfg.num_kv_heads, cfg.head_dim)
    cache = kvc.KVCache(
        k=jax.random.normal(jax.random.PRNGKey(0), cache.k.shape, jnp.bfloat16),
        v=jax.random.normal(jax.random.PRNGKey(1), cache.v.shape, jnp.bfloat16),
        length=jnp.asarray(96, jnp.int32))
    q0 = jax.random.normal(jax.random.PRNGKey(2),
                           (1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)

    def att_body(i, carry):
        q, k, v = carry
        o = flash_decode(q, k, v, i % L, jnp.full((1,), 96, jnp.int32),
                         None, None)
        return (q + jnp.sum(o[..., :1]).astype(q.dtype) * 1e-12, k, v)

    t = timed_loop(att_body, (q0, cache.k, cache.v), 512)
    kv_bytes = 2 * 96 * cfg.num_kv_heads * cfg.head_dim * 2
    report("flash_decode (ctx=96)", t, L, kv_bytes)

    # --- sampling (bench gcfg: greedy + repeat penalty) ---------------------
    g = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.1,
                         repeat_last_n=64)
    hcfg = _hashable_gcfg(g)
    state = sampling.SamplerState.init(0, 1, g.mirostat_tau)
    logits0 = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.vocab_size),
                                jnp.float32)
    last0 = jnp.zeros((1, 64), jnp.int32)

    def samp_body(i, carry):
        logits, state, last = carry
        tok, state = sampling.sample(logits, state, hcfg, last)
        last = jnp.roll(last, -1, axis=1).at[:, -1].set(tok)
        return (logits + tok[0].astype(jnp.float32) * 1e-12, state, last)

    t = timed_loop(samp_body, (logits0, state, last0), 512)
    report("sample (greedy+rep)", t, 1, cfg.vocab_size * 4)

    # --- KV cache update (dynamic_update_slice, layer-cycled) ---------------
    kv_new = jax.random.normal(jax.random.PRNGKey(4),
                               (1, 1, cfg.num_kv_heads, cfg.head_dim),
                               jnp.bfloat16)

    def kvu_body(i, carry):
        c, new = carry
        c2 = kvc.update_layer(c, new, new, i % L, jnp.asarray(96, jnp.int32))
        return (c2, new)

    t = timed_loop(kvu_body, (cache, kv_new), 512)
    report("kv update (k+v dus)", t, L, 2 * cfg.num_kv_heads * cfg.head_dim * 2)

    # --- whole decode step (forward + sample), the real composition --------
    gd = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.1,
                          repeat_last_n=64)

    def run(seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, cfg.vocab_size - 100, (1, 64))
        return np.asarray(eng.generate_device(ids, gd, n_tokens=n_tokens))

    run(0, 1); run(0, 1 + 32)
    shorts, longs = [], []
    for trial in range(3):
        t0 = time.perf_counter(); run(10 + trial, 1)
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(20 + trial, 1 + 32)
        longs.append(time.perf_counter() - t0)
    step = (float(np.median(longs)) - float(np.median(shorts))) / 32
    print(f"\nfull decode step: {step*1e3:.3f} ms  "
          f"({1/step:.1f} tok/s)", file=sys.stderr)
    acct = sum(r["ms_per_step"] for r in rows)
    print(f"sum of parts:     {acct:.3f} ms  "
          f"(unaccounted glue: {step*1e3-acct:.3f} ms)", file=sys.stderr)
    print(json.dumps({"rows": rows, "full_step_ms": step * 1e3,
                      "accounted_ms": acct}))


if __name__ == "__main__":
    main()
