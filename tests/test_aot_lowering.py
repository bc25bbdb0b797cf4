"""Mosaic lowering legality in CI (no chip needed).

interpret=True kernels skip Mosaic's block-shape checks entirely (CLAUDE.md:
a spec can pass every CPU test and fail to lower on the chip). The local
libtpu can AOT-compile for a v5e topology via compile-only devices, running
the real Mosaic compiler — so a lowering regression in the hot kernels
fails HERE instead of at bench time. scripts/aot_lowering_check.py is the
exhaustive version; these are the fast load-bearing cases.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.ops.attention import flash_decode
from tinychatengine_tpu.ops.int4_matmul import int4_matmul, int4_matmul_fused

G = 128


@pytest.fixture(scope="module")
def v5e_sharding():
    try:
        from jax.experimental import topologies
        from jax.sharding import SingleDeviceSharding
        topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    except Exception as e:  # no local libtpu topology support
        pytest.skip(f"deviceless TPU topology unavailable: {e}")
    return SingleDeviceSharding(topo.devices[0])


def _lower(fn, *args, static=(), **kwargs):
    jax.jit(fn, static_argnames=static).lower(*args, **kwargs).compile()


def test_int4_matmul_lowers(v5e_sharding):
    def S(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=v5e_sharding)

    k, n, L = 4096, 6144, 2
    _lower(functools.partial(int4_matmul, group_size=G),
           S((1, k), jnp.bfloat16), S((L, k // 2, n), jnp.uint8),
           S((L, k // G, n), jnp.float32), layer_idx=S((), jnp.int32))


def test_fused_decode_kernel_lowers(v5e_sharding):
    def S(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=v5e_sharding)

    k, n, L = 4096, 6144, 2
    # norm prologue + rope epilogue + bf16 scales: the most constrained
    # combination the fused path emits (models/llama.py qkv projection)
    _lower(functools.partial(int4_matmul_fused, group_size=G, norm_eps=1e-5,
                             rope_qk_cols=5120, head_dim=128),
           S((1, k), jnp.bfloat16), S((L, k // 2, n), jnp.uint8),
           S((L, k // G, n), jnp.bfloat16), layer_idx=S((), jnp.int32),
           norm_w=S((L, k), jnp.bfloat16),
           rope_cos=S((1, 128), jnp.float32),
           rope_sin=S((1, 128), jnp.float32))


def test_flash_decode_ctx_cap_lowers(v5e_sharding):
    def S(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=v5e_sharding)

    L, B, HKV, SMAX, D, HQ = 2, 1, 8, 2048, 128, 32
    ck = S((L, B, HKV, SMAX, D), jnp.bfloat16)
    # ctx_cap <= 512 switches to 128-row KV blocks (the engine passes this
    # unconditionally — ops/attention.py flash_decode)
    _lower(functools.partial(flash_decode, ctx_cap=512),
           S((B, HQ, D), jnp.bfloat16), ck, ck, S((), jnp.int32),
           S((B,), jnp.int32))
