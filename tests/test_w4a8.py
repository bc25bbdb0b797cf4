"""W4A8 path: dynamic int8 activation quant fused into the int4 matmul
(reference USE_INT8_INT4_PRODUCT, kernels/avx/matmul_avx_int8_int4.cc)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.ops.int4_matmul import (
    int4_matmul_a8,
    int4_matmul_a8_xla,
    int4_matmul_xla,
)
from tinychatengine_tpu.ops.linear import random_int4_linear


def _mk(k=512, n=256, gs=128, seed=0):
    lin = random_int4_linear(jax.random.PRNGKey(seed), k, n, gs)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.bfloat16)
    return x, lin


def test_a8_kernel_matches_xla_ref():
    x, lin = _mk()
    y = int4_matmul_a8(x, lin.packed, lin.scales, 128, interpret=True)
    want = int4_matmul_a8_xla(x, lin.packed, lin.scales, 128)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


def test_a8_close_to_a16():
    """int8 activation quantization should cost only small relative error
    vs the bf16-activation path (AWQ W4A8 accuracy claim)."""
    x, lin = _mk(k=1024, n=256)
    a16 = np.asarray(int4_matmul_xla(x, lin.packed, lin.scales, 128), np.float32)
    a8 = np.asarray(int4_matmul_a8_xla(x, lin.packed, lin.scales, 128), np.float32)
    denom = np.abs(a16).mean() + 1e-6
    rel = np.abs(a8 - a16).mean() / denom
    assert rel < 0.02, rel


def test_a8_stacked_layer_indexing():
    xs, lins = zip(*[_mk(seed=s) for s in range(3)])
    packed = jnp.stack([l.packed for l in lins])
    scales = jnp.stack([l.scales for l in lins])
    for li in range(3):
        y = int4_matmul_a8(xs[0], packed, scales, 128,
                           layer_idx=jnp.int32(li), interpret=True)
        want = int4_matmul_a8_xla(xs[0], lins[li].packed, lins[li].scales, 128)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.05, atol=0.05)


def test_w4a8_model_generates():
    from tinychatengine_tpu.generation.engine import Engine
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.ops.linear import Int4A8Linear

    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=128, embed_dim=256, hidden_dim=512,
        vocab_size=256, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="w4a8")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    assert isinstance(params.lm_head, Int4A8Linear)
    eng = Engine(params, cfg, qcfg)
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    r = eng.generate(np.asarray([[5, 9, 11]], np.int32), g)
    assert len(r.tokens[0]) == 6
