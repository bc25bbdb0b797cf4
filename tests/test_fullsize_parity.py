"""FULL-SIZE shape-class parity vs HuggingFace (VERDICT r4 weak #7).

Every silicon surprise so far was a *shape-class* miss invisible at toy
dims: the llama-2 K-padding bug (hidden 11008 → 86 scale rows, not
8-sublane-aligned) lowered fine in CPU interpret mode and failed only on
the chip; Mosaic scale tiling likewise. These tests run ONE decoder layer
at the real llama2-7b / llama3-8b dims (4096 embed; 11008 & 14336 hidden;
MHA & GQA) and the 128k-vocab padded lm_head through the packed-int4
interpret path against an EXACT oracle: the HF layer re-loaded with the
dequantized int4 weights, so any disagreement is a packing/tiling/layout
bug, not quantization error. (The reference tests full-size shapes too:
llm/tests/non_cuda/test_Int4llamaForCausalLM.cc:18-50.)

Marked slow: full-dim fp32 HF forward + interpret-mode Pallas.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops.linear import Int4Linear, fuse_linears
from tinychatengine_tpu.quant.numerics import (dequantize_groupwise_int4,
                                               quantize_groupwise_int4)
from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales

pytestmark = pytest.mark.slow

GROUP = 128

# (name, hidden_dim, num_heads, num_kv_heads) — the two production dim
# classes: llama2-7b (11008 → 86 scale rows, the K-padding class) and
# llama3-8b (14336 → 112 rows, GQA 32/8)
DIMS = [("llama2_7b_dims", 11008, 32, 32),
        ("llama3_8b_dims", 14336, 32, 8)]


def _q(w, scale_dtype="bf16"):
    """HF weight [OC, IC] → (Int4Linear via the production packers,
    dequantized fp32 weight for the HF-side oracle)."""
    w = np.asarray(w, np.float32)
    q, s = quantize_groupwise_int4(w, GROUP)
    lin = Int4Linear(packed=jnp.asarray(pack_qm_tpu(q, GROUP)),
                     scales=jnp.asarray(pack_scales(s, scale_dtype, GROUP)))
    # the oracle must see the SAME effective weights the kernel dequantizes:
    # bf16-stored scales round d before the multiply
    if scale_dtype == "bf16":
        import ml_dtypes
        s = s.astype(ml_dtypes.bfloat16).astype(np.float32)
    return lin, dequantize_groupwise_int4(q, s, GROUP)


@pytest.mark.parametrize("name,hidden,heads,kv_heads", DIMS)
def test_fullsize_decoder_layer_parity(name, hidden, heads, kv_heads):
    from transformers import LlamaConfig, LlamaForCausalLM

    e, vocab, seq = 4096, 1024, 8
    torch.manual_seed(hash(name) % (1 << 31))
    hf_cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=e, intermediate_size=hidden,
        num_hidden_layers=1, num_attention_heads=heads,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
        tie_word_embeddings=False)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = ModelConfig(
        name=name, family="llama", num_heads=heads, num_kv_heads=kv_heads,
        num_layers=1, max_sqlen=64, embed_dim=e, hidden_dim=hidden,
        vocab_size=vocab, rms_norm_eps=1e-5)

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    L = "model.layers.0."
    with torch.no_grad():
        lins = {}
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            key = L + f"self_attn.{proj}.weight"
            lins[proj], wdq = _q(sd[key])
            hf.get_parameter(key).copy_(torch.from_numpy(wdq))
        for proj in ("gate_proj", "up_proj", "down_proj"):
            key = L + f"mlp.{proj}.weight"
            lins[proj], wdq = _q(sd[key])
            hf.get_parameter(key).copy_(torch.from_numpy(wdq))
        head_w = np.concatenate(
            [sd["lm_head.weight"],
             np.zeros((llama.lmhead_padded(vocab) - vocab, e), np.float32)])
        lm_head, wdq = _q(head_w)
        hf.get_parameter("lm_head.weight").copy_(
            torch.from_numpy(wdq[:vocab]))

    from tinychatengine_tpu.ops.ref import make_rope_cache
    cos, sin = make_rope_cache(cfg.head_dim, cfg.max_sqlen, cfg.rope_theta)
    layer = llama.LlamaLayerParams(
        input_norm=jnp.asarray(sd[L + "input_layernorm.weight"],
                               jnp.float32),
        wqkv=fuse_linears([lins["q_proj"], lins["k_proj"], lins["v_proj"]],
                          1),
        wo=lins["o_proj"],
        post_norm=jnp.asarray(sd[L + "post_attention_layernorm.weight"],
                              jnp.float32),
        wgate_up=fuse_linears([lins["gate_proj"], lins["up_proj"]], 1),
        down=lins["down_proj"])
    params = llama.LlamaParams(
        embed=jnp.asarray(sd["model.embed_tokens.weight"], jnp.bfloat16),
        layers=jax.tree.map(lambda x: x[None], layer),
        final_norm=jnp.asarray(sd["model.norm.weight"], jnp.float32),
        lm_head=lm_head, rope_cos=cos, rope_sin=sin)

    ids = np.arange(7, 7 + seq, dtype=np.int64)[None]
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.float().numpy()

    cache = kvc.init_cache(1, 1, cfg.max_sqlen, kv_heads, cfg.head_dim)
    ours, cache = llama.forward(params, cfg, jnp.asarray(ids, jnp.int32),
                                cache, jnp.int32(0), full_logits=True)
    ours = np.asarray(ours, np.float32)

    denom = np.abs(want).max() + 1e-6
    err = np.abs(ours - want).max() / denom
    # identical effective weights; the gap is bf16 activations/accum islands
    assert err < 0.05, f"{name}: rel err {err:.4f}"
    assert (np.argmax(ours[0], -1) == np.argmax(want[0], -1)).all()

    # cached decode at the same dims (the KV/ragged path of the shape class)
    tok = np.argmax(ours[0, -1])[None, None].astype(np.int32)
    with torch.no_grad():
        want2 = hf(torch.from_numpy(
            np.concatenate([ids, tok.astype(np.int64)], 1))
        ).logits[:, -1].float().numpy()
    ours2, _ = llama.forward(params, cfg, jnp.asarray(tok), cache,
                             jnp.int32(seq))
    err2 = np.abs(np.asarray(ours2) - want2).max() / (np.abs(want2).max()
                                                      + 1e-6)
    assert err2 < 0.05, f"{name}: decode rel err {err2:.4f}"


def test_fullsize_lm_head_128k_vocab():
    """The 128k-vocab lm_head (4096 → 128256, N padded to 129024) through
    the packed int4 interpret path vs the dequantized-weights einsum — the
    N-padding and scale-tiling class bench shapes actually use."""
    from tinychatengine_tpu.ops.linear import apply_linear

    rng = np.random.default_rng(5)
    e, vocab = 4096, 128256
    npad = llama.lmhead_padded(vocab)
    assert npad == 129024 and npad % 2048 == 0
    w = np.concatenate([
        (rng.standard_normal((vocab, e)) * 0.02).astype(np.float32),
        np.zeros((npad - vocab, e), np.float32)])
    lin, wdq = _q(w)
    x = jnp.asarray(rng.standard_normal((1, 1, e)) * 0.5, jnp.bfloat16)
    got = np.asarray(apply_linear(lin, x), np.float32)[0, 0]
    want = np.asarray(x[0, 0], np.float32) @ wdq.T
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert err < 0.02, f"lm_head rel err {err:.4f}"
    assert np.abs(got[vocab:]).max() == 0.0  # pad columns exactly zero
    assert np.argmax(got[:vocab]) == np.argmax(want[:vocab])
