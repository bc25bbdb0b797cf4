"""OPT W8A8 static quantization with activation calibration.

The reference imports SmoothQuant'd OPT weights from a pre-quantized torch
model (opt_smooth_exporter.py) — calibration happened upstream. This tool
closes the loop natively: given fp OPT params and calibration token ids, it

1. runs the fp model and records per-linear input absmax (the static
   activation scales SmoothQuant needs),
2. optionally migrates quantization difficulty from activations to weights
   (the SmoothQuant trick: per-channel factor s_j = act_max_j^alpha /
   w_max_j^(1-alpha), folded into the preceding LayerNorm),
3. emits W8A8Linear params with the requant alphas composed exactly as the
   reference kernels expect (ref/matmul_ref_int8.cc semantics):
       y_s8 = clip(round(acc_i32 * A), ...),  A = a_in * a_w / a_out.

Per-tensor scales, symmetric, like the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import ModelConfig
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.models import opt
from tinychatengine_tpu.ops import ref
from tinychatengine_tpu.ops.linear import DenseLinear, W8A8Linear


def _absmax(x) -> float:
    return float(jnp.max(jnp.abs(x)))


def collect_activation_stats(params: opt.OPTParams, cfg: ModelConfig,
                             calib_ids: np.ndarray, per_channel: bool = False):
    """Run the fp model over calibration ids and record input ranges for
    every linear. Returns stats[layer_idx][name] -> absmax (scalar or [K])."""
    b, s = np.atleast_2d(calib_ids).shape
    ids = jnp.asarray(np.atleast_2d(calib_ids), jnp.int32)
    x = params.embed_tokens[ids].astype(jnp.float32)
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    x = x + params.embed_positions[pos + opt.POS_OFFSET].astype(jnp.float32)

    def take(v):
        return (np.asarray(jnp.max(jnp.abs(v), axis=(0, 1))) if per_channel
                else _absmax(v))

    stats = []
    L = cfg.num_layers
    layers = [jax.tree.map(lambda a: a[i], params.layers) for i in range(L)]
    d = cfg.head_dim
    cache = kvc.init_cache(L, b, s, cfg.num_kv_heads, d)
    for i, layer in enumerate(layers):
        rec = {}
        h = ref.layer_norm_ref(x, layer.attn_ln_w, layer.attn_ln_b)
        rec["qkv_in"] = take(h)
        from tinychatengine_tpu.ops.linear import apply_linear
        q = apply_linear(layer.q_proj, h).reshape(b, s, -1, d)
        k = apply_linear(layer.k_proj, h).reshape(b, s, -1, d)
        v = apply_linear(layer.v_proj, h).reshape(b, s, -1, d)
        rec["q_out"] = _absmax(q)
        rec["k_out"] = _absmax(k)
        rec["v_out"] = _absmax(v)
        cache = kvc.update_layer(cache, k, v, i, jnp.int32(0))
        ck, cv = kvc.read_layer(cache, i)
        logits = jnp.einsum("bshd,bhtd->bhst", q.astype(jnp.float32),
                            ck.astype(jnp.float32)) / (d ** 0.5)
        col = jnp.arange(s)
        mask = col[None, None, :] <= col[None, :, None]
        logits = jnp.where(mask[:, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhst,bhtd->bshd", probs, cv.astype(jnp.float32))
        attn = attn.reshape(b, s, -1)
        rec["attn_out"] = _absmax(attn)
        o = apply_linear(layer.out_proj, attn)
        x = x + o.astype(jnp.float32)
        h2 = ref.layer_norm_ref(x, layer.final_ln_w, layer.final_ln_b)
        rec["fc1_in"] = take(h2)
        f = jnp.maximum(apply_linear(layer.fc1, h2), 0.0)
        rec["fc1_out"] = _absmax(f)
        x = x + apply_linear(layer.fc2, f).astype(jnp.float32)
        stats.append(rec)
    return stats


def _quant_w(w: np.ndarray):
    """Per-tensor symmetric int8 weight quant: returns (w_s8 [K,N], scale)."""
    s = max(float(np.abs(w).max()) / 127.0, 1e-8)
    return np.clip(np.round(w / s), -127, 127).astype(np.int8), s


def quantize_opt_w8a8(params: opt.OPTParams, cfg: ModelConfig,
                      calib_ids: np.ndarray,
                      smooth_alpha: float = 0.5) -> opt.OPTParams:
    """fp OPTParams + calibration ids → W8A8 OPTParams (reference Int8OPT
    dataflow: LayerNormQ → s8 q/k/v → s8 BMMs → fp32 out_proj/fc2).

    smooth_alpha: SmoothQuant migration strength (0 disables)."""
    stats = collect_activation_stats(params, cfg, calib_ids,
                                     per_channel=smooth_alpha > 0)
    L = cfg.num_layers
    new_layers = []
    for i in range(L):
        layer = jax.tree.map(lambda a: np.asarray(a[i], np.float32),
                             params.layers)
        rec = stats[i]

        # --- smoothing: fold per-channel s into LN weights and q/k/v cols
        ln_w, ln_b = layer.attn_ln_w.copy(), layer.attn_ln_b.copy()
        qw = layer.q_proj.weight.copy()   # [K, N]
        kw = layer.k_proj.weight.copy()
        vw = layer.v_proj.weight.copy()
        if smooth_alpha > 0:
            act_max = np.maximum(np.asarray(rec["qkv_in"], np.float32), 1e-5)
            w_max = np.maximum(
                np.max(np.abs(np.concatenate([qw, kw, vw], axis=1)), axis=1),
                1e-5)
            s_ch = np.clip(act_max ** smooth_alpha / w_max ** (1 - smooth_alpha),
                           1e-3, 1e3)
            ln_w /= s_ch
            ln_b /= s_ch
            for w in (qw, kw, vw):
                w *= s_ch[:, None]
            a_in = float((act_max / s_ch).max()) / 127.0
        else:
            a_in = float(np.asarray(rec["qkv_in"])) / 127.0
        # activation scale for the LayerNormQ output: the LN output is
        # divided by (127 * a_in) ... reference folds it INTO the LN weights
        ln_w /= a_in
        ln_b /= a_in

        def w8_s8out(w, bias, a_out, a_in_op):
            w8, a_w = _quant_w(w)
            alpha = a_in_op * a_w / a_out
            return W8A8Linear(
                weight=jnp.asarray(w8),
                alpha=jnp.asarray(alpha, jnp.float32),
                bias=None if bias is None else jnp.asarray(bias / a_out,
                                                           jnp.float32))
            # forward: y = clip(round(acc*alpha + bias/a_out)) in s8 domain

        a_q = max(rec["q_out"], 1e-5) / 127.0
        a_k = max(rec["k_out"], 1e-5) / 127.0
        a_v = max(rec["v_out"], 1e-5) / 127.0
        a_attn = max(rec["attn_out"], 1e-5) / 127.0

        def w8_f32out(w, bias, a_in_op):
            w8, a_w = _quant_w(w)
            return W8A8Linear(
                weight=jnp.asarray(w8),
                alpha=jnp.asarray(a_in_op * a_w, jnp.float32),
                bias=None if bias is None else jnp.asarray(bias, jnp.float32))

        # fc path
        ln2_w, ln2_b = layer.final_ln_w.copy(), layer.final_ln_b.copy()
        a_fc1_in = float(np.max(np.asarray(rec["fc1_in"]))) / 127.0
        ln2_w /= a_fc1_in
        ln2_b /= a_fc1_in
        a_fc1_out = max(rec["fc1_out"], 1e-5) / 127.0

        new_layers.append(opt.OPTLayerParams(
            attn_ln_w=jnp.asarray(ln_w), attn_ln_b=jnp.asarray(ln_b),
            q_proj=w8_s8out(qw, layer.q_proj.bias, a_q, a_in),
            k_proj=w8_s8out(kw, layer.k_proj.bias, a_k, a_in),
            v_proj=w8_s8out(vw, layer.v_proj.bias, a_v, a_in),
            out_proj=w8_f32out(layer.out_proj.weight, layer.out_proj.bias,
                               a_attn),
            final_ln_w=jnp.asarray(ln2_w), final_ln_b=jnp.asarray(ln2_b),
            fc1=w8_s8out(layer.fc1.weight, layer.fc1.bias, a_fc1_out,
                         a_fc1_in),
            fc2=w8_f32out(layer.fc2.weight, layer.fc2.bias, a_fc1_out),
            # BMM alphas (Int8OPTAttention): qk logits = q_s8 k_s8 * a_q a_k / sqrt(d)
            qk_alpha=jnp.asarray(a_q * a_k / (cfg.head_dim ** 0.5), jnp.float32),
            # pv: probs requantized x127 upstream; v in a_v units; out to a_attn s8
            pv_alpha=jnp.asarray((1.0 / 127.0) * a_v / a_attn, jnp.float32),
        ))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new_layers)
    return dataclasses.replace(params, layers=stacked)


def main(argv=None):
    import argparse

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.tools.checkpoint import (load_checkpoint,
                                                     load_tokenizer,
                                                     save_checkpoint)

    ap = argparse.ArgumentParser(
        description="calibrate + quantize an fp OPT checkpoint to W8A8")
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", required=True, help="fp checkpoint dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--calib-text", required=True,
                    help="text file for activation calibration")
    ap.add_argument("--calib-tokens", type=int, default=512)
    ap.add_argument("--smooth-alpha", type=float, default=0.5)
    args = ap.parse_args(argv)

    cfg = get_model_config(args.model)
    params, _ = load_checkpoint(args.checkpoint, cfg)
    tok = load_tokenizer(args.checkpoint, cfg)
    ids = np.asarray(tok.encode(open(args.calib_text).read(), bos=False),
                     np.int32)[: args.calib_tokens][None, :]
    qparams = quantize_opt_w8a8(params, cfg, ids,
                                smooth_alpha=args.smooth_alpha)
    save_checkpoint(args.out, qparams, cfg, QuantConfig(scheme="w8a8"),
                    extra_meta={"family": "opt"})
    print(f"W8A8 checkpoint at {args.out}")


if __name__ == "__main__":
    main()
