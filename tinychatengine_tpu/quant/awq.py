"""AWQ — activation-aware weight-quantization scale search.

The reference CONSUMES AWQ checkpoints produced outside its repo (the
llm-awq project; README.md links and the model zoo ship pre-searched
weights) — it never runs the search itself. This module implements the
search framework-native, from the AWQ paper's math (Lin et al., MLSys'24
§3): salient input channels get per-channel scales s = E[|x|]^alpha, alpha
grid-searched per linear to minimize the int4-quantized output MSE on
calibration activations, and the winning scales are folded EXACTLY into
the op that produces each linear's input:

    qkv      <- input RMSNorm weight      (norm_w / s, W rows * s)
    gate_up  <- post RMSNorm weight
    wo       <- v-projection columns      (GQA: one scale per v channel,
                shared across the query heads that read it)
    down     <- up-projection columns     (down input = silu(g) * u is
                linear in u)
    lm_head  <- final RMSNorm weight

so the runtime kernels, layouts and checkpoints are untouched — AWQ is a
pure conversion-time transform, exactly like the reference's pipeline
(llm/tools/model_quantizer.py quantizes already-AWQ-scaled exports).

The folded fp model is mathematically identical to the original (modulo
re-rounding folded weights to their storage dtype); only the group-wise
int4 rounding sees the scaled weights, which is the entire trick.
"""

from __future__ import annotations

import numpy as np

from tinychatengine_tpu.quant.numerics import (
    dequantize_groupwise_int4,
    quantize_groupwise_int4,
)

DEFAULT_GRID = 20


# ---------------------------------------------------------------------------
# calibration: collect each linear's INPUT activations from the fp model
# ---------------------------------------------------------------------------

def collect_calibration_inputs(params, cfg, ids):
    """Run the fp LLaMA-family model on ``ids`` [B, S] (full prefill, no
    cache) and return per-site input activations:

        {"qkv": [L] of [N, E], "wo": [L] of [N, Hq*D],
         "gate_up": [L] of [N, E], "down": [L] of [N, F],
         "lm_head": [N, E]}    (N = B*S rows, numpy f32)

    Mirrors models/llama.forward's fp math (rms_norm_ref / apply_rotary /
    attention_xla on the same weights) — a tools-layer instrumented forward,
    like the reference's calibration exporters (opt_smooth_exporter.py)."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.ops import ref
    from tinychatengine_tpu.ops.attention import attention_xla

    ids = np.atleast_2d(np.asarray(ids, np.int32))
    b, s = ids.shape
    d = cfg.head_dim
    x = jnp.asarray(params.embed)[jnp.asarray(ids)].astype(jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos = jnp.asarray(params.rope_cos)[positions].astype(jnp.float32)
    sin = jnp.asarray(params.rope_sin)[positions].astype(jnp.float32)

    def rows(a):  # [B, S, C] -> [B*S, C] numpy f32
        return np.asarray(a, np.float32).reshape(-1, a.shape[-1])

    lyr = params.layers
    n_layers = lyr.wqkv.weight.shape[0]
    acts = {"qkv": [], "wo": [], "gate_up": [], "down": []}
    for i in range(n_layers):
        h = ref.rms_norm_ref(x, lyr.input_norm[i], cfg.rms_norm_eps)
        acts["qkv"].append(rows(h))
        qkv = (h @ lyr.wqkv.weight[i].astype(h.dtype))
        ratio = cfg.num_heads // cfg.num_kv_heads
        hkv = qkv.shape[-1] // (d * (ratio + 2))
        hq = ratio * hkv
        q = qkv[..., :hq * d].reshape(b, s, hq, d)
        k = qkv[..., hq * d:(hq + hkv) * d].reshape(b, s, hkv, d)
        v = qkv[..., (hq + hkv) * d:].reshape(b, s, hkv, d)
        q, k = ref.apply_rotary(q, k, cos, sin)
        attn = attention_xla(q, k.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
                             v.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
                             positions, jnp.int32(s),
                             window=cfg.sliding_window)
        acts["wo"].append(rows(attn))
        x = x + (attn.astype(x.dtype) @ lyr.wo.weight[i].astype(x.dtype))
        h2 = ref.rms_norm_ref(x, lyr.post_norm[i], cfg.rms_norm_eps)
        acts["gate_up"].append(rows(h2))
        gu = h2 @ lyr.wgate_up.weight[i].astype(h2.dtype)
        f = gu.shape[-1] // 2
        act = (jax.nn.silu(gu[..., :f].astype(jnp.float32))
               * gu[..., f:].astype(jnp.float32)).astype(x.dtype)
        acts["down"].append(rows(act))
        x = x + (act @ lyr.down.weight[i].astype(x.dtype))

    xf = ref.rms_norm_ref(x, params.final_norm, cfg.rms_norm_eps)
    acts["lm_head"] = rows(xf)
    return acts


# ---------------------------------------------------------------------------
# the search
# ---------------------------------------------------------------------------

def _rtn(w_kn: np.ndarray, group_size: int) -> np.ndarray:
    """Group-wise int4 round-trip of a [K, N] weight (numerics.py layout is
    [OC, IC] = [N, K], groups along IC=K — identical to conversion time)."""
    q, sc = quantize_groupwise_int4(w_kn.T.astype(np.float32), group_size)
    return dequantize_groupwise_int4(q, sc, group_size).T


def search_scale(x_rows: np.ndarray, w_kn: np.ndarray, group_size: int,
                 n_grid: int = DEFAULT_GRID,
                 s_base: np.ndarray | None = None):
    """Grid-search alpha for one linear. x_rows [N, K] f32 calibration
    inputs; w_kn [K, N] f32. Returns (s [K] f32, best_alpha, losses).

    s_base defaults to per-channel mean |x| (the paper's activation
    salience); callers with channel-sharing constraints (GQA wo) pass a
    constrained s_base. alpha=0 (s=1) is in the grid, so AWQ can never do
    worse than plain RTN on the calibration objective."""
    x = x_rows.astype(np.float32)
    w = w_kn.astype(np.float32)
    if s_base is None:
        s_base = np.mean(np.abs(x), axis=0)
    s_base = np.maximum(s_base.astype(np.float32), 1e-8)
    y_ref = x @ w
    best = (np.inf, 1.0, np.ones_like(s_base))
    losses = []
    for g in range(n_grid):
        alpha = g / n_grid
        s = s_base ** alpha
        # normalize so the scale range is centered (llm-awq's trick keeps
        # the folded weights in a healthy dynamic range)
        s = s / np.sqrt(float(s.max()) * float(s.min()) + 1e-20)
        s = np.clip(s, 1e-4, 1e4)
        wq = _rtn(w * s[:, None], group_size) / s[:, None]
        loss = float(np.mean((x @ wq - y_ref) ** 2))
        losses.append(loss)
        if loss < best[0]:
            best = (loss, alpha, s)
    return best[2], best[1], losses


# ---------------------------------------------------------------------------
# folding
# ---------------------------------------------------------------------------

def awq_scale_llama(params, cfg, calib_ids, group_size: int = 128,
                    n_grid: int = DEFAULT_GRID):
    """fp LlamaParams -> (scaled fp LlamaParams, info dict).

    The returned tree computes the SAME function as ``params`` (scales are
    folded exactly; only the storage-dtype re-rounding of folded weights
    differs) but its weights are conditioned so that group-wise int4
    quantization (tools.convert.requantize_llama) loses less: quantize the
    RETURNED tree. ``calib_ids`` [B, S] int tokens drive the statistics."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.models.llama import LlamaLayerParams, LlamaParams
    from tinychatengine_tpu.ops.linear import DenseLinear

    assert isinstance(params.layers.wqkv, DenseLinear), \
        "awq_scale_llama expects an fp (DenseLinear) tree"
    acts = collect_calibration_inputs(params, cfg, calib_ids)

    lyr = params.layers
    n_layers = lyr.wqkv.weight.shape[0]
    d = cfg.head_dim
    info = {"alpha": {k: [] for k in ("qkv", "wo", "gate_up", "down")}}

    def fold_rows(w, s):  # w [K, N] jnp; s [K] np
        return (w.astype(jnp.float32) * jnp.asarray(s)[:, None]).astype(w.dtype)

    def fold_cols(w, s, lo, hi):  # divide w[:, lo:hi] columns by s
        wf = w.astype(jnp.float32)
        sliced = wf[:, lo:hi] / jnp.asarray(s)[None, :]
        return jnp.concatenate([wf[:, :lo], sliced, wf[:, hi:]],
                               axis=1).astype(w.dtype)

    in_norm, post_norm = [], []
    wqkv, wo, wgu, down = [], [], [], []
    for i in range(n_layers):
        w_qkv = lyr.wqkv.weight[i]
        w_wo = lyr.wo.weight[i]
        w_gu = lyr.wgate_up.weight[i]
        w_dn = lyr.down.weight[i]
        e = w_qkv.shape[0]
        ratio = cfg.num_heads // cfg.num_kv_heads
        hkv = w_qkv.shape[1] // (d * (ratio + 2))
        hq = ratio * hkv
        f = w_dn.shape[0]

        # qkv <- input_norm
        s_qkv, a, _ = search_scale(acts["qkv"][i], np.asarray(w_qkv, np.float32),
                                   group_size, n_grid)
        info["alpha"]["qkv"].append(a)
        in_norm.append((lyr.input_norm[i].astype(jnp.float32)
                        / jnp.asarray(s_qkv)).astype(lyr.input_norm.dtype))
        w_qkv = fold_rows(w_qkv, s_qkv)

        # wo <- v columns (GQA: the ratio query heads reading one v head
        # must share its scale — constrain s_base by group-averaging)
        x_wo = acts["wo"][i]                                 # [N, hq*d]
        mag = np.mean(np.abs(x_wo), axis=0).reshape(hkv, ratio, d).mean(1)
        s_wo, a, _ = search_scale(
            x_wo, np.asarray(w_wo, np.float32), group_size, n_grid,
            s_base=np.repeat(mag[:, None, :], ratio, 1).reshape(-1))
        info["alpha"]["wo"].append(a)
        # s_wo is group-constant by construction of s_base (monotone map of
        # a group-constant vector stays group-constant)
        s_v = s_wo.reshape(hkv, ratio, d)[:, 0, :].reshape(-1)
        w_qkv = fold_cols(w_qkv, s_v, (hq + hkv) * d, (hq + 2 * hkv) * d)
        w_wo = fold_rows(w_wo, s_wo)

        # gate_up <- post_norm
        s_gu, a, _ = search_scale(acts["gate_up"][i],
                                  np.asarray(w_gu, np.float32),
                                  group_size, n_grid)
        info["alpha"]["gate_up"].append(a)
        post_norm.append((lyr.post_norm[i].astype(jnp.float32)
                          / jnp.asarray(s_gu)).astype(lyr.post_norm.dtype))
        w_gu = fold_rows(w_gu, s_gu)

        # down <- up columns (silu(g) * u is linear in u)
        s_dn, a, _ = search_scale(acts["down"][i], np.asarray(w_dn, np.float32),
                                  group_size, n_grid)
        info["alpha"]["down"].append(a)
        w_gu = fold_cols(w_gu, s_dn, f, 2 * f)
        w_dn = fold_rows(w_dn, s_dn)

        wqkv.append(w_qkv); wo.append(w_wo); wgu.append(w_gu); down.append(w_dn)

    # lm_head <- final_norm
    s_lm, a_lm, _ = search_scale(acts["lm_head"],
                                 np.asarray(params.lm_head.weight, np.float32),
                                 group_size, n_grid)
    info["alpha"]["lm_head"] = a_lm
    final_norm = (params.final_norm.astype(jnp.float32)
                  / jnp.asarray(s_lm)).astype(params.final_norm.dtype)
    lm_head = DenseLinear(weight=fold_rows(params.lm_head.weight, s_lm),
                          bias=params.lm_head.bias)

    def stack(xs):
        return jnp.stack(xs)

    scaled = LlamaParams(
        embed=params.embed,
        layers=LlamaLayerParams(
            input_norm=stack(in_norm),
            wqkv=DenseLinear(weight=stack(wqkv), bias=lyr.wqkv.bias),
            wo=DenseLinear(weight=stack(wo), bias=lyr.wo.bias),
            post_norm=stack(post_norm),
            wgate_up=DenseLinear(weight=stack(wgu), bias=lyr.wgate_up.bias),
            down=DenseLinear(weight=stack(down), bias=lyr.down.bias)),
        final_norm=final_norm,
        lm_head=lm_head,
        rope_cos=params.rope_cos, rope_sin=params.rope_sin,
    )
    return scaled, info
