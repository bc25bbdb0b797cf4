"""Model conversion: HuggingFace checkpoints → quantized QM_TPU checkpoints.

Replaces the reference's two-step offline pipeline (llm/tools/llama_exporter.py
→ llm/tools/model_quantizer.py with per-device QM_* packers): one step, one
layout. Numerics are the reference's exactly (quant/numerics.py).

Also imports the reference's exported FP32 .bin directory trees directly
(llama_exporter.py:18-98 layout), so existing TinyChatEngine model dirs can be
converted without HF access.

Usage:
    python -m tinychatengine_tpu.tools.convert --model llama2_7b \
        --src /path/to/hf_or_bin_dir --out /path/to/ckpt \
        [--scheme w4a16 --group-size 128]
"""

from __future__ import annotations

import argparse
import gc
from pathlib import Path

import numpy as np

from tinychatengine_tpu.core.config import ModelConfig, QuantConfig, get_model_config
from tinychatengine_tpu.ops.linear import (DenseLinear, Int4A8Linear,
                                            Int4Linear, fuse_linears)
from tinychatengine_tpu.quant.numerics import quantize_groupwise_int4
from tinychatengine_tpu.quant.packing import pack_qm_tpu, pack_scales


def quantize_linear(w_oc_ic: np.ndarray, qcfg: QuantConfig,
                    bias: np.ndarray | None = None):
    """w [OC, IC] float → Int4Linear (QM_TPU) or DenseLinear (fp)."""
    import jax.numpy as jnp
    if qcfg.scheme == "fp":
        return DenseLinear(
            weight=jnp.asarray(np.ascontiguousarray(w_oc_ic.T), jnp.bfloat16),
            bias=None if bias is None else jnp.asarray(bias, jnp.bfloat16))
    q, scales = quantize_groupwise_int4(w_oc_ic, qcfg.group_size)
    cls = Int4A8Linear if qcfg.scheme == "w4a8" else Int4Linear
    return cls(
        packed=jnp.asarray(pack_qm_tpu(q)),
        scales=jnp.asarray(pack_scales(scales)),
        bias=None if bias is None else jnp.asarray(bias, jnp.float32))


# ---------------------------------------------------------------------------
# HuggingFace source
# ---------------------------------------------------------------------------

def convert_hf_llama(src: str, cfg: ModelConfig, qcfg: QuantConfig,
                     tp_degree: int = 1):
    """HF LlamaForCausalLM/MistralForCausalLM state dict → LlamaParams.

    Loads tensors lazily from safetensors/pytorch shards (torch CPU), so an
    8B model converts within host RAM.
    """
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.ops import ref as opsref

    sd = _hf_state_dict_loader(src)

    def lin(name):
        w = sd(name)  # [OC, IC]
        return quantize_linear(w, qcfg)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append(llama.LlamaLayerParams(
            input_norm=jnp.asarray(sd(p + "input_layernorm.weight"), jnp.bfloat16),
            wqkv=fuse_linears([lin(p + "self_attn.q_proj.weight"),
                               lin(p + "self_attn.k_proj.weight"),
                               lin(p + "self_attn.v_proj.weight")], tp_degree),
            wo=lin(p + "self_attn.o_proj.weight"),
            post_norm=jnp.asarray(sd(p + "post_attention_layernorm.weight"),
                                  jnp.bfloat16),
            wgate_up=fuse_linears([lin(p + "mlp.gate_proj.weight"),
                                   lin(p + "mlp.up_proj.weight")], tp_degree),
            down=lin(p + "mlp.down_proj.weight"),
        ))
        gc.collect()
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    del layers
    gc.collect()

    cos, sin = opsref.make_rope_cache(cfg.head_dim, max(cfg.max_sqlen, 8192),
                                      cfg.rope_theta)
    try:
        lm_head_w = sd("lm_head.weight")
    except KeyError:  # tied embeddings
        lm_head_w = sd("model.embed_tokens.weight")
    vp = llama.lmhead_padded(lm_head_w.shape[0])
    if vp != lm_head_w.shape[0]:  # tile-friendly N; forward slices logits back
        lm_head_w = np.concatenate(
            [lm_head_w, np.zeros((vp - lm_head_w.shape[0],
                                  lm_head_w.shape[1]), lm_head_w.dtype)])
    return llama.LlamaParams(
        embed=jnp.asarray(sd("model.embed_tokens.weight"), jnp.bfloat16),
        layers=stacked,
        final_norm=jnp.asarray(sd("model.norm.weight"), jnp.bfloat16),
        lm_head=quantize_linear(lm_head_w, qcfg),
        rope_cos=cos, rope_sin=sin,
    )


def _hf_state_dict_loader(src: str):
    """Returns name → np.ndarray(float32) over safetensors/bin shards."""
    p = Path(src)
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        import json as _json
        try:
            from safetensors import safe_open
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("safetensors unavailable") from e
        handles = [safe_open(str(f), framework="np") for f in st_files]
        key_to_h = {k: h for h in handles for k in h.keys()}

        def get(name):
            if name not in key_to_h:
                raise KeyError(name)
            t = key_to_h[name].get_tensor(name)
            if t.dtype == np.dtype("V2") or str(t.dtype) == "bfloat16":
                t = t.view(np.uint16).astype(np.uint32) << 16
                t = t.view(np.float32) if False else np.frombuffer(
                    t.tobytes(), np.float32)
            return np.asarray(t, np.float32)
        return get

    bins = sorted(p.glob("pytorch_model*.bin"))
    if bins:
        import torch
        maps = [torch.load(str(f), map_location="cpu", weights_only=True)
                for f in bins]

        def get(name):
            for m in maps:
                if name in m:
                    return m[name].float().numpy()
            raise KeyError(name)
        return get
    raise FileNotFoundError(f"no safetensors/bin shards under {src}")


# ---------------------------------------------------------------------------
# Reference exported-.bin source (llm/tools/llama_exporter.py layout)
# ---------------------------------------------------------------------------

def convert_reference_llama(src: str, cfg: ModelConfig, qcfg: QuantConfig,
                            tp_degree: int = 1):
    """TinyChatEngine FP32 export dir → LlamaParams.

    Layout (llama_exporter.py:18-98): lm_head.bin,
    decoder/embed_tokens/weight.bin, decoder/norm/weight.bin,
    decoder/layer{i}/{q,k,v,o}_proj|gate_proj|up_proj|down_proj/weight.bin,
    decoder/layer{i}/{input,post_attention}_layernorm/weight.bin,
    decoder/layer{i}/rotary_emb/{cos,sin}_cached.bin.
    """
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.models import llama

    root = Path(src)

    def raw(rel, shape):
        # threaded C++ pread when built (native/src/loader.cc, the analog of
        # the reference's read_to_array, llm/src/utils.cc); else np.fromfile
        from tinychatengine_tpu import native
        data = native.read_file(str(root / rel), np.float32)
        return data.reshape(shape)

    e, f, v = cfg.embed_dim, cfg.hidden_dim, cfg.vocab_size
    kvdim = cfg.num_kv_heads * cfg.head_dim

    layers = []
    for i in range(cfg.num_layers):
        d = f"decoder/layer{i}"
        layers.append(llama.LlamaLayerParams(
            input_norm=jnp.asarray(raw(f"{d}/input_layernorm/weight.bin", (e,)),
                                   jnp.bfloat16),
            wqkv=fuse_linears(
                [quantize_linear(raw(f"{d}/self_attn/q_proj/weight.bin", (e, e)), qcfg),
                 quantize_linear(raw(f"{d}/self_attn/k_proj/weight.bin", (kvdim, e)), qcfg),
                 quantize_linear(raw(f"{d}/self_attn/v_proj/weight.bin", (kvdim, e)), qcfg)],
                tp_degree),
            wo=quantize_linear(raw(f"{d}/self_attn/o_proj/weight.bin", (e, e)), qcfg),
            post_norm=jnp.asarray(
                raw(f"{d}/post_attention_layernorm/weight.bin", (e,)), jnp.bfloat16),
            wgate_up=fuse_linears(
                [quantize_linear(raw(f"{d}/mlp/gate_proj/weight.bin", (f, e)), qcfg),
                 quantize_linear(raw(f"{d}/mlp/up_proj/weight.bin", (f, e)), qcfg)],
                tp_degree),
            down=quantize_linear(raw(f"{d}/mlp/down_proj/weight.bin", (e, f)), qcfg),
        ))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    # rotary caches: prefer the exporter's own (rotary_emb_exporter.py), else
    # regenerate from config
    rope_dir = root / "decoder/layer0/self_attn/rotary_emb"
    if (rope_dir / "cos_cached.bin").exists():
        cos_raw = np.fromfile(rope_dir / "cos_cached.bin", np.float32)
        n_pos = cos_raw.size // cfg.head_dim
        cos = jnp.asarray(cos_raw.reshape(n_pos, cfg.head_dim))
        sin = jnp.asarray(np.fromfile(rope_dir / "sin_cached.bin",
                                      np.float32).reshape(n_pos, cfg.head_dim))
    else:
        from tinychatengine_tpu.ops import ref as opsref
        cos, sin = opsref.make_rope_cache(cfg.head_dim, cfg.max_sqlen,
                                          cfg.rope_theta)

    return llama.LlamaParams(
        embed=jnp.asarray(raw("decoder/embed_tokens/weight.bin", (v, e)),
                          jnp.bfloat16),
        layers=stacked,
        final_norm=jnp.asarray(raw("decoder/norm/weight.bin", (e,)), jnp.bfloat16),
        lm_head=quantize_linear(
            np.concatenate([raw("lm_head.bin", (v, e)),
                            np.zeros((llama.lmhead_padded(v) - v, e),
                                     np.float32)]), qcfg),
        rope_cos=cos, rope_sin=sin,
    )


def main(argv=None):
    from tinychatengine_tpu.tools.checkpoint import save_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--src", required=True, help="HF dir or reference .bin export dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scheme", default="w4a16", choices=["w4a16", "fp"])
    ap.add_argument("--group-size", type=int, default=128)
    args = ap.parse_args(argv)

    cfg = get_model_config(args.model)
    qcfg = QuantConfig(scheme=args.scheme, group_size=args.group_size)
    src = Path(args.src)
    if (src / "decoder").exists():
        params = convert_reference_llama(args.src, cfg, qcfg)
    else:
        params = convert_hf_llama(args.src, cfg, qcfg)
    save_checkpoint(args.out, params, cfg, qcfg, extra_meta={"family": cfg.family})
    print(f"converted {args.model} ({args.scheme}, g={args.group_size}) -> {args.out}")


if __name__ == "__main__":
    main()
