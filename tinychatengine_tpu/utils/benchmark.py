"""Device-honest micro-benchmark harness.

The reference ships a singleton wall-clock profiler (llm/include/profiler.h).
On this TPU environment naive wall-clock timing is wrong for three reasons:

1. dispatch goes through a tunnel (~25-500us per call),
2. the tunnel caches execution results keyed on (computation, inputs) —
   repeating a call with identical inputs returns instantly,
3. ``block_until_ready`` can return before device work has drained; only
   fetching bytes to the host forces full completion.

So: run the op in a device-side ``lax.fori_loop`` whose carry makes iteration
i+1 depend on iteration i's output (defeats CSE/caching/overlap), feed fresh
input values per timed call, force completion by fetching a small slice, and
report the per-iteration time net of a 1-iteration calibration run.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _chained_loop(op: Callable, x0: jax.Array, args: tuple, iters: int):
    """Run op(x, *args) -> y `iters` times, perturbing x each iteration with a
    scalar derived from y so iterations are sequentially dependent."""

    def body(i, x):
        y = op(x, *args)
        # fold a data-dependent scalar back into the input (negligible cost)
        delta = jnp.sum(y[..., :1]).astype(x.dtype) * jnp.asarray(1e-12, x.dtype)
        return x + delta

    return jax.lax.fori_loop(0, iters, body, x0)


def bench_op(op: Callable, x0: jax.Array, *args, iters: int = 100,
             trials: int = 3) -> float:
    """Median per-iteration seconds of op(x, *args) on device.

    Pass large operands (weights) through ``*args`` — NOT via closure, which
    would bake them into the program as constants and ship them to the
    compile service on every compile."""
    loop = jax.jit(partial(_chained_loop, op), static_argnames=("iters",))

    def run(x, n):
        r = loop(x, tuple(args), iters=n)
        np.asarray(jax.device_get(r[..., :1]))  # force full completion
        return r

    # compile both trip counts
    run(x0, 1)
    run(x0, iters)

    results = []
    key = jax.random.PRNGKey(0)
    for t in range(trials):
        key, k1 = jax.random.split(key)
        x = x0 * (1.0 + 1e-3 * (t + 1))  # fresh values to defeat result caching
        x = jax.device_put(x)
        np.asarray(jax.device_get(x[..., :1]))
        t0 = time.perf_counter()
        run(x, 1)
        t1 = time.perf_counter() - t0
        x = x * (1.0 + 1e-4)
        np.asarray(jax.device_get(x[..., :1]))
        t0 = time.perf_counter()
        run(x, iters)
        t2 = time.perf_counter() - t0
        results.append(max((t2 - t1) / (iters - 1), 1e-9))
    return float(np.median(results))
