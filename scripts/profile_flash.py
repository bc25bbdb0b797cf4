"""Quantify pallas per-call overhead + flash_decode block_s tradeoffs.

Round-2 follow-up to profile_decode.py: flash_decode measured 65.8us/call at
ctx=96 (roofline 0.5us) -> overhead-bound. Hypotheses to test on-chip:
  (a) fixed per-pallas-call cost (measure a trivial copy kernel),
  (b) per-grid-step cost (flash at block_s 512/1024/2048 x ctx 96/512/1984),
  (c) XLA einsum attention as a decode alternative at short ctx,
  (d) stacked (scalar-prefetch) vs unstacked int4 matmul call cost.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_flash.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinychatengine_tpu.core.config import get_model_config
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.ops.attention import attention_xla, flash_decode
from tinychatengine_tpu.ops.int4_matmul import int4_matmul

ITERS = 256
TRIALS = 5


def timed_loop(body, init, iters=ITERS, trials=TRIALS):
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
    shorts, longs = [], []
    for t in range(trials):
        carry = jax.tree.map(
            lambda x: x * (1.0 + 1e-3 * (t + 1))
            if jnp.issubdtype(x.dtype, jnp.floating) else x, init)
        leaf = jax.tree.leaves(carry)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))
        t0 = time.perf_counter(); once(carry, 1)
        shorts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); once(carry, iters)
        longs.append(time.perf_counter() - t0)
    return max((float(np.median(longs)) - float(np.median(shorts)))
               / (iters - 1), 1e-9)


def trivial_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def trivial_call(x, grid_steps: int):
    """One pallas call with `grid_steps` grid steps over a small block."""
    return pl.pallas_call(
        trivial_kernel,
        grid=(grid_steps,),
        in_specs=[pl.BlockSpec((16, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(x)


def main():
    cfg = get_model_config("llama3_8b")
    L = cfg.num_layers
    results = {}

    # (a) trivial pallas call: fixed cost + per-grid-step cost
    x0 = jnp.ones((16, 128), jnp.float32)
    for steps in (1, 4, 16, 64):
        t = timed_loop(lambda i, c: trivial_call(c, steps) * 1.0 + c * 0.0
                       if False else trivial_call(c, steps),
                       x0)
        results[f"trivial_pallas_{steps}steps_us"] = t * 1e6
        print(f"trivial pallas, {steps:3d} grid steps: {t*1e6:8.2f} us",
              file=sys.stderr)

    # XLA baseline op of similar size
    t = timed_loop(lambda i, c: c * 1.000001 + 1.0, x0)
    results["xla_elementwise_us"] = t * 1e6
    print(f"xla tiny elementwise:          {t*1e6:8.2f} us", file=sys.stderr)

    # (b) flash decode: block_s x ctx
    cache = kvc.init_cache(L, 1, 2048, cfg.num_kv_heads, cfg.head_dim)
    k = jax.random.normal(jax.random.PRNGKey(0), cache.k.shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(1), cache.v.shape, jnp.bfloat16)
    q0 = jax.random.normal(jax.random.PRNGKey(2),
                           (1, cfg.num_heads, cfg.head_dim), jnp.bfloat16)
    for block_s in (512, 1024, 2048):
        for ctx in (96, 512, 1984):
            def body(i, carry, _bs=block_s, _ctx=ctx):
                q, kk, vv = carry
                o = flash_decode(q, kk, vv, i % L,
                                 jnp.full((1,), _ctx, jnp.int32), None, None,
                                 block_s=_bs)
                return (q + jnp.sum(o[..., :1]).astype(q.dtype) * 1e-12,
                        kk, vv)
            t = timed_loop(body, (q0, k, v), iters=128, trials=4)
            results[f"flash_bs{block_s}_ctx{ctx}_us"] = t * 1e6
            print(f"flash block_s={block_s:4d} ctx={ctx:4d}: {t*1e6:8.2f} us",
                  file=sys.stderr)

    # (c) XLA einsum decode attention (full 2048 read, fp32 mask+softmax)
    def xla_body(i, carry):
        q, kk, vv = carry
        ck = jax.lax.dynamic_index_in_dim(kk, i % L, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(vv, i % L, 0, keepdims=False)
        pos = jnp.full((1, 1), 95, jnp.int32)
        o = attention_xla(q[:, None], ck, cv, pos, jnp.int32(96))
        return (q + jnp.sum(o[..., :1]).astype(q.dtype) * 1e-12, kk, vv)

    t = timed_loop(xla_body, (q0, k, v), iters=128, trials=4)
    results["xla_attention_ctx96_us"] = t * 1e6
    print(f"xla attention (full read) ctx=96: {t*1e6:8.2f} us", file=sys.stderr)

    # (d) stacked vs unstacked wo-shaped int4 matmul
    from tinychatengine_tpu.models import llama as llama_mod
    from tinychatengine_tpu.core.config import QuantConfig
    qcfg = QuantConfig(scheme="w4a16", group_size=128)
    params = llama_mod.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                          fast=True)
    wo = params.layers.wo
    x1 = jnp.ones((1, 4096), jnp.bfloat16)

    def stacked_body(i, carry):
        x, p, s = carry
        y = int4_matmul(x, p, s, 128, layer_idx=i % L)
        return (x + jnp.sum(y[..., :1]).astype(x.dtype) * 1e-12, p, s)

    t = timed_loop(stacked_body, (x1, wo.packed, wo.scales), iters=128,
                   trials=4)
    results["wo_stacked_us"] = t * 1e6
    print(f"wo int4 stacked:   {t*1e6:8.2f} us", file=sys.stderr)

    wo0p = wo.packed[0]
    wo0s = wo.scales[0]

    def unstacked_body(i, carry):
        x, p, s = carry
        y = int4_matmul(x, p, s, 128)
        return (x + jnp.sum(y[..., :1]).astype(x.dtype) * 1e-12, p, s)

    t = timed_loop(unstacked_body, (x1, wo0p, wo0s), iters=128, trials=4)
    results["wo_unstacked_us"] = t * 1e6
    print(f"wo int4 unstacked: {t*1e6:8.2f} us", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
