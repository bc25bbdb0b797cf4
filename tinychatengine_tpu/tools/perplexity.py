"""Perplexity evaluation — the quantization-accuracy harness.

The reference measures nothing in-repo (SURVEY.md §6: accuracy anchored to
the AWQ/SmoothQuant papers' WikiText-2 numbers). This harness closes that
gap: stride-windowed perplexity over a raw text file (WikiText-2 test split
or any corpus), so Δppl(fp vs w4a16 vs w4a8) is measurable directly.

    python -m tinychatengine_tpu.tools.perplexity --checkpoint ckpt/ \
        --model llama3_8b --text wikitext2_test.txt [--stride 512]

Method (standard sliding-window ppl): the text is tokenized once; windows of
``window`` tokens advance by ``stride``; only the last ``stride`` positions
of each window contribute their log-likelihood (earlier ones are context).
"""

from __future__ import annotations

import argparse
import math

import numpy as np


def perplexity(forward_fn, params, cfg, token_ids, window: int = 1024,
               stride: int = 512, progress=None,
               quantized_kv: bool = False) -> float:
    """token_ids: 1-D int array. Returns ppl = exp(mean nll).
    quantized_kv=True scores through an int8 KV cache, so KV-quantization
    loss shows up in the Δppl table alongside the weight schemes."""
    import jax
    import jax.numpy as jnp

    from tinychatengine_tpu.generation import kv_cache as kvc

    ids = np.asarray(token_ids, np.int32)
    n = len(ids)
    assert n >= 2, "need at least two tokens"
    window = min(window, cfg.max_sqlen, n)
    stride = min(stride, window)

    @jax.jit
    def window_nll(chunk, n_ctx, valid_len):
        """chunk [1, window]; target positions in [n_ctx, valid_len)
        contribute -log p(token_t | tokens_<t) (the first n_ctx tokens are
        context; tail padding is excluded)."""
        cache = kvc.init_cache(cfg.num_layers, 1, window, cfg.num_kv_heads,
                               cfg.head_dim, quantized=quantized_kv)
        logits, _ = forward_fn(params, cfg, chunk, cache,
                               jnp.int32(0), full_logits=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = chunk[0, 1:]                                    # [window-1]
        tok_lp = jnp.take_along_axis(logp[0, :-1], tgt[:, None],
                                     axis=-1)[:, 0]
        idx = jnp.arange(window - 1)                          # target = idx+1
        mask = (idx + 1 >= n_ctx) & (idx + 1 < valid_len)
        return jnp.sum(jnp.where(mask, -tok_lp, 0.0)), jnp.sum(mask)

    total_nll, total_cnt = 0.0, 0
    start = 0
    while start + 1 < n:
        end = min(start + window, n)
        chunk = np.zeros((1, window), np.int32)
        chunk[0, :end - start] = ids[start:end]
        # first window: everything counts; later: only the fresh stride
        n_ctx = 1 if start == 0 else window - stride
        nll, cnt = window_nll(jnp.asarray(chunk), n_ctx, end - start)
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            progress(end, n, math.exp(total_nll / max(total_cnt, 1)))
        if end == n:
            break
        start += stride
    return math.exp(total_nll / max(total_cnt, 1))


def main(argv=None):
    from tinychatengine_tpu.core.config import get_model_config
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint, load_tokenizer

    ap = argparse.ArgumentParser(description="sliding-window perplexity")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", required=True, help="raw text file (e.g. "
                    "wikitext-2 test split concatenated)")
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--stride", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = get_model_config(args.model)
    params, qcfg = load_checkpoint(args.checkpoint, cfg)
    tok = load_tokenizer(args.checkpoint, cfg)
    text = open(args.text, encoding="utf-8").read()
    ids = tok.encode(text, bos=True)
    if args.max_tokens:
        ids = ids[:args.max_tokens]
    print(f"{len(ids)} tokens, window {args.window}, stride {args.stride}")
    ppl = perplexity(
        llama.forward, params, cfg, ids, args.window, args.stride,
        progress=lambda done, n, p: print(f"  {done}/{n} ppl={p:.4f}"))
    print(f"perplexity: {ppl:.4f}  (scheme {qcfg.scheme})")


if __name__ == "__main__":
    main()
