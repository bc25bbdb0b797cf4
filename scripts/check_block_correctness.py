"""Validate candidate int4 decode blockings AGAINST THE XLA ORACLE on the
real chip — a miscompiled blocking can be fast *and wrong*, and the block
sweep times without checking outputs.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/check_block_correctness.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.ops.int4_matmul import int4_matmul, int4_matmul_xla

G = 128
SHAPES = [(4096, 28672), (4096, 6144), (4096, 4096), (14336, 4096)]
CANDIDATES = [(2048, 2048), (1024, 2048), (2048, 4096), (4096, 2048),
              (2048, 1024), (512, 2048)]


def main():
    for k, n in SHAPES:
        key = jax.random.PRNGKey(k + n)
        packed = jax.random.randint(key, (k // 2, n), 0, 255, jnp.int32
                                    ).astype(jnp.uint8)
        scales = jax.random.uniform(key, (k // G, n), jnp.float32) * 0.01 \
            + 0.001
        x = jax.random.normal(key, (1, k), jnp.bfloat16)
        want = np.asarray(jax.jit(int4_matmul_xla, static_argnums=3)(
            x, packed, scales, G), np.float32)
        print(f"shape ({k}->{n}):")
        for bn, bk in CANDIDATES:
            if n % bn or k % bk:
                continue
            try:
                got = np.asarray(
                    int4_matmul(x, packed, scales, G, block_n=bn, block_k=bk),
                    np.float32)
                err = np.max(np.abs(got - want) /
                             np.maximum(np.abs(want), 1e-3))
                ok = "OK " if err < 3e-2 else "WRONG"
                print(f"  bn={bn:5d} bk={bk:5d}  rel_err={err:.2e}  {ok}")
            except Exception as e:
                print(f"  bn={bn:5d} bk={bk:5d}  FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
