"""Fused MLP mega-kernel vs the three-op composition."""

import numpy as np
import jax
import jax.numpy as jnp

from tinychatengine_tpu.ops.int4_matmul import int4_matmul_xla
from tinychatengine_tpu.ops.linear import Int4Linear, random_int4_linear
from tinychatengine_tpu.ops.mlp_fused import mlp_fused, mlp_fused_supported


def _stacked(key, k, n, L=2, gs=128):
    lins = [random_int4_linear(k_, k, n, gs)
            for k_ in jax.random.split(key, L)]
    return Int4Linear(packed=jnp.stack([l.packed for l in lins]),
                      scales=jnp.stack([l.scales for l in lins]))


def _oracle(x, wgu, dn, li, gs=128):
    gu = int4_matmul_xla(x, wgu.packed[li], wgu.scales[li], gs)
    f = gu.shape[-1] // 2
    g = gu[..., :f].astype(jnp.float32)
    u = gu[..., f:].astype(jnp.float32)
    act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    return int4_matmul_xla(act, dn.packed[li], dn.scales[li], gs)


def test_mlp_fused_matches_composition():
    E, F = 512, 1024
    assert mlp_fused_supported(E, F, 4, bn=256)
    wgu = _stacked(jax.random.PRNGKey(0), E, 2 * F)
    dn = _stacked(jax.random.PRNGKey(1), F, E)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, E)) * 0.5, jnp.bfloat16)

    for li in (0, 1):
        y = mlp_fused(x, wgu, dn, jnp.int32(li), bn=256, interpret=True)
        want = _oracle(x, wgu, dn, li)
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0.06, atol=0.06)


def test_mlp_fused_supported_gate():
    assert mlp_fused_supported(4096, 14336, 1)         # llama3-8b decode
    assert not mlp_fused_supported(4096, 14336, 64)    # prefill M too big
    assert not mlp_fused_supported(4096, 11008, 1)     # 2F % 2048 != 0
    assert mlp_fused_supported(4096, 11008, 1, bn=512)  # but bn=512 tiles
