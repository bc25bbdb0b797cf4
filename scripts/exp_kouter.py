"""On-chip experiment: K-outer restructured int4 kernel vs the production
kernel on the gate_up decode shape (4096 -> 28672) — the one op PERF.md puts
below the achievable-BW ceiling (~83%).

Per CLAUDE.md methodology: device-synthesized stacked weights (no host
upload), timing via a lax.scan loop with the data chained through the carry
(defeats execution caching + hoisting), difference of two trip counts, and
everything fetched with np.asarray. Isolated numbers are ±20% on this chip —
this script only FILTERS candidates; winners must be confirmed with the
256-token end-to-end A/B (scripts/ab_bench_blocks.py pattern).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/exp_kouter.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.ops.int4_matmul import (_int4_matmul_kouter,
                                                int4_matmul, int4_matmul_xla)

G = 128
L = 32
K, N = 4096, 28672
PASSES_LONG = 48   # layer sweeps per timed call
PASSES_SHORT = 2
ROUNDS = 6

VARIANTS = {
    "base_2048x2048": dict(kind="std", bn=2048, bk=2048),
    "std_bk4096": dict(kind="std", bn=2048, bk=4096),
    "kouter_bn2048_bk512": dict(kind="kouter", bn=2048, bk=512),
    "kouter_bn2048_bk1024": dict(kind="kouter", bn=2048, bk=1024),
    # rowband bn=N OOMs scoped VMEM (28.5M > 16M: [16, N] f32 acc + [128, N]
    # w blocks); widest feasible is bn=4096
    "kouter_bn4096_bk1024": dict(kind="kouter", bn=4096, bk=1024),
}


def build_weights(key):
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.randint(k1, (L, K // 2, N), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
    scales = (jax.random.uniform(k2, (L, K // G, N), jnp.float32)
              * 0.004 + 0.001)
    x0 = jax.random.normal(k3, (16, K), jnp.bfloat16)
    return packed, scales, x0


def call_variant(v, x, packed, scales, layer_idx):
    if v["kind"] == "std":
        return int4_matmul(x, packed, scales, G, layer_idx=layer_idx,
                           block_n=v["bn"], block_k=v["bk"])
    return _int4_matmul_kouter(x, packed, scales, layer_idx, group_size=G,
                               block_m=16, block_n=v["bn"], block_k=v["bk"])


def make_loop(v):
    @functools.partial(jax.jit, static_argnames=("n_passes",))
    def loop(x0, packed, scales, n_passes):
        def step(x, li):
            y = call_variant(v, x, packed, scales, li)
            # chain: x depends on y so nothing hoists / caches, but the
            # numerics stay ~x0 (eps is tiny and data-dependent)
            eps = (y[0, 0].astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)
            return x0 * (1 + eps), y[0, :8]
        lis = jnp.tile(jnp.arange(L, dtype=jnp.int32), n_passes)
        x, outs = jax.lax.scan(step, x0, lis)
        return outs[-1]
    return loop


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)
    print("building device weights...", file=sys.stderr)
    packed, scales, x0 = build_weights(key)

    # -- on-chip correctness vs the XLA dequant oracle (layer 3) -----------
    li = jnp.int32(3)
    want = np.asarray(jax.jit(int4_matmul_xla, static_argnums=3)(
        x0, packed[3], scales[3], G), np.float32)
    ok = {}
    for name, v in VARIANTS.items():
        got = np.asarray(call_variant(v, x0, packed, scales, li), np.float32)
        err = float(np.max(np.abs(got - want)) /
                    (np.abs(want).std() + 1e-6))
        ok[name] = err
        print(f"correctness {name}: scaled_err={err:.3e} "
              f"{'OK' if err < 0.15 else 'WRONG'}", file=sys.stderr)

    # -- timing: loop-differenced, interleaved rounds ----------------------
    loops = {name: make_loop(v) for name, v in VARIANTS.items()
             if ok[name] < 0.15}
    for name, loop in loops.items():
        print(f"compiling {name}...", file=sys.stderr)
        np.asarray(loop(x0, packed, scales, PASSES_SHORT))
        np.asarray(loop(x0, packed, scales, PASSES_LONG))

    results = {name: [] for name in loops}
    keys = jax.random.split(jax.random.PRNGKey(1), ROUNDS)
    for r in range(ROUNDS):
        xr = jax.random.normal(keys[r], (16, K), jnp.bfloat16)
        for name, loop in loops.items():
            t0 = time.perf_counter()
            np.asarray(loop(xr, packed, scales, PASSES_SHORT))
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(loop(xr, packed, scales, PASSES_LONG))
            t_l = time.perf_counter() - t0
            per_call = (t_l - t_s) / ((PASSES_LONG - PASSES_SHORT) * L)
            results[name].append(per_call)
        print(f"round {r} done", file=sys.stderr)

    bytes_per_call = K * N // 2 + (K // G) * N * 4 + 16 * K * 2 + 16 * N * 2
    out = {}
    for name, ts in results.items():
        med = float(np.median(ts))
        out[name] = {"us_per_call": round(med * 1e6, 2),
                     "gbps": round(bytes_per_call / med / 1e9, 1),
                     "err": round(ok[name], 5)}
        print(f"{name:24s} {out[name]['us_per_call']:8.1f} us "
              f"{out[name]['gbps']:6.1f} GB/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
