"""Native OPT W8A8 calibration: quantized model tracks the fp oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import opt
from tinychatengine_tpu.tools.calibrate_opt import quantize_opt_w8a8

CFG = ModelConfig(
    name="opt_tiny", family="opt", num_heads=4, num_kv_heads=4, num_layers=2,
    max_sqlen=64, embed_dim=128, hidden_dim=256, vocab_size=256)


@pytest.mark.parametrize("alpha", [0.0, 0.5])
def test_calibrated_w8a8_tracks_fp(alpha):
    params = opt.init_random_params(CFG, quantized=False, seed=0)
    rng = np.random.default_rng(0)
    calib = rng.integers(5, 250, (1, 48))

    qparams = quantize_opt_w8a8(params, CFG, calib, smooth_alpha=alpha)

    ids = rng.integers(5, 250, (1, 16))
    def logits_of(p):
        cache = kvc.init_cache(CFG.num_layers, 1, CFG.max_sqlen,
                               CFG.num_kv_heads, CFG.head_dim)
        lg, _ = opt.forward(p, CFG, jnp.asarray(ids, jnp.int32), cache,
                            jnp.int32(0), full_logits=True)
        return np.asarray(lg, np.float32)

    fp = logits_of(params)
    q8 = logits_of(qparams)
    denom = np.abs(fp).max() + 1e-6
    rel = np.abs(fp - q8).max() / denom
    assert rel < 0.15, rel
    # greedy continuation agreement on most positions
    agree = np.mean(np.argmax(fp[0], -1) == np.argmax(q8[0], -1))
    assert agree > 0.8, agree


def test_calibrated_model_generates():
    params = opt.init_random_params(CFG, quantized=False, seed=1)
    rng = np.random.default_rng(1)
    qparams = quantize_opt_w8a8(params, CFG, rng.integers(5, 250, (1, 32)))
    eng = Engine(qparams, CFG, QuantConfig(scheme="w8a8"))
    assert eng.kv_dtype == jnp.int8
    g = GenerationConfig(temp=0.0, n_predict=5, repeat_penalty=1.0,
                         repeat_last_n=1)
    r = eng.generate(np.asarray([[3, 7, 11]], np.int32), g)
    assert len(r.tokens[0]) == 5
