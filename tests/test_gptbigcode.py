"""GPTBigCode (StarCoder, MQA) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import gptbigcode

TINY = ModelConfig(
    name="tiny_starcoder", family="gptbigcode", num_heads=4, num_kv_heads=1,
    num_layers=2, max_sqlen=32, embed_dim=128, hidden_dim=512, vocab_size=300,
)


def _cache(batch=1):
    return kvc.init_cache(TINY.num_layers, batch, TINY.max_sqlen, 1,
                          TINY.head_dim)


def test_prefill_decode_equivalence():
    params = gptbigcode.init_random_params(TINY, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 300, (1, 8)), jnp.int32)
    fwd = jax.jit(gptbigcode.forward, static_argnames=("cfg",))
    la, _ = fwd(params, TINY, ids, _cache(), jnp.int32(0))
    lb, cache = fwd(params, TINY, ids[:, :5], _cache(), jnp.int32(0))
    for t in range(5, 8):
        lb, cache = fwd(params, TINY, ids[:, t:t + 1], cache, jnp.int32(t))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)


def test_mqa_single_kv_head():
    params = gptbigcode.init_random_params(TINY, seed=1)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, cache = gptbigcode.forward(params, TINY, ids, _cache(), jnp.int32(0))
    assert cache.k.shape[2] == 1  # one kv head in cache
    assert np.isfinite(np.asarray(logits)).all()


def test_tied_lm_head():
    params = gptbigcode.init_random_params(TINY, seed=2)
    np.testing.assert_array_equal(
        np.asarray(params.lm_head.weight), np.asarray(params.wte.T))
