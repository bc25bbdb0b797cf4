"""Block-size sweep for the int4 decode GEMV shapes on the real chip.

VERDICT r1 item 1c: gate_up (4096->28672) runs at ~75% of its HBM roofline
while down (14336->4096) hits ~94% with the same kernel — sweep
(block_n, block_k) per shape to see whether the gap is a blocking artifact.
Stacked weights with a cycling layer_idx, fori_loop differencing per
utils/benchmark.py rationale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tune_int4_blocks.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.ops.int4_matmul import int4_matmul

HBM_BW = 819e9
L = 8          # stacked layers (enough that L blocks don't fit in VMEM/cache)
ITERS = 64
G = 128

SHAPES = {
    "gate_up (4096->28672)": (4096, 28672),
    "qkv (4096->6144)": (4096, 6144),
    "wo (4096->4096)": (4096, 4096),
    "down (14336->4096)": (14336, 4096),
}

CANDIDATES = [
    (None, None),          # current heuristic
    (2048, 2048),
    (2048, 4096),
    (4096, 2048),
    (1024, 2048),
    (4096, 4096),
    (7168, 2048),          # gate_up: N/4
    (2048, 1024),
]


def bench_shape(name, k, n):
    key = jax.random.PRNGKey(0)
    packed = jax.random.randint(key, (L, k // 2, n), 0, 255, jnp.int32
                                ).astype(jnp.uint8)
    scales = (jax.random.uniform(key, (L, k // G, n), jnp.float32) * 0.01)
    x0 = jax.random.normal(key, (16, k), jnp.bfloat16)

    roof_us = (n * k // 2 + n * k // G * 4 + 16 * k * 2 + 16 * n * 2) \
        / HBM_BW * 1e6
    print(f"{name}: roofline {roof_us:.1f} us")

    for bn, bk in CANDIDATES:
        if bn is not None and (n % bn or k % bk):
            continue

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(x, packed, scales, iters):   # weights as ARGS (CLAUDE.md:
            def body(i, carry):              # closure constants upload GBs)
                x, acc = carry
                y = int4_matmul(x, packed, scales, G,
                                layer_idx=jnp.mod(i, L),
                                block_n=bn, block_k=bk)
                # feed a slice of y back so iterations are serialized
                return x + y[:, :1] * 1e-6, acc + y[0, 0].astype(jnp.float32)
            x, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
            return acc

        import itertools
        fresh = itertools.count(1)

        def once(iters):
            # EVERY call gets fresh args — identical (executable, args)
            # executions are served from the tunnel's cache and corrupt
            # the differencing (CLAUDE.md measuring rules)
            xt = x0 * (1.0 + 1e-4 * next(fresh))
            return float(np.asarray(run(xt, packed, scales, iters)))

        label = f"bn={bn} bk={bk}" if bn else "heuristic"
        try:
            once(1)
            once(ITERS)
        except Exception as e:
            print(f"  {label:18s} FAILED: {str(e)[:120]}")
            continue
        shorts, longs = [], []
        for t in range(3):
            t0 = time.perf_counter(); once(1)
            shorts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); once(ITERS)
            longs.append(time.perf_counter() - t0)
        us = (float(np.median(longs)) - float(np.median(shorts))) \
            / (ITERS - 1) * 1e6
        print(f"  {label:18s} {us:8.1f} us  ({roof_us / us * 100:5.1f}% of roof)")


def main():
    for name, (k, n) in SHAPES.items():
        bench_shape(name, k, n)


if __name__ == "__main__":
    main()
