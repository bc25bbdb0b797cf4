"""Train the in-repo accuracy model (``bytellama_5m``) on local Python source.

Closes the "no real weights were ever run" gap (SURVEY.md §4/§6): this
environment has zero egress, so no reference checkpoint can be downloaded —
instead we *make* real weights. A 4-layer byte-level LLaMA (~4.6 M params)
is trained on ~47 MB of local Python source (tools/corpus.py), saved in the
framework's own checkpoint format, and evaluated fp vs w4a16 vs w4a8 vs
int8-KV with tools/perplexity.py — giving the Δppl table the reference
anchors to the AWQ/SmoothQuant papers.

The training loop is TPU-shaped (CLAUDE.md tunnel rules):
  - the whole corpus lives in HBM as uint8; every optimizer step samples its
    batch ON DEVICE with jax.random — zero per-step host traffic;
  - N optimizer steps run inside ONE jit'd lax.scan (per-dispatch RTT over
    the tunnel is ~30 ms, so host-stepped training would be RTT-bound);
  - mixed precision: f32 master weights + Adam moments, bf16 compute
    (weights cast inside the loss so matmuls hit the MXU in bf16);
  - the trained model's head_dim is 64, so forward takes the differentiable
    XLA attention path automatically (models/llama.py:192).

    python -m tinychatengine_tpu.tools.train_tiny --out assets/bytellama_5m \
        [--steps 3000] [--batch 16] [--window 512]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def _hooks(family: str):
    """Per-family training hooks: (init, forward, protected field names).

    ``protected`` are param fields that are constants, not trained (the
    llama RoPE cos/sin caches): they are kept f32, masked out of weight
    decay AND grad-zeroed (see wd_mask below for why both)."""
    if family == "opt":
        from tinychatengine_tpu.models import opt

        def init(cfg, qcfg, seed):
            return opt.init_random_params(cfg, quantized=False, seed=seed)

        return init, opt.forward, ()
    from tinychatengine_tpu.models import llama
    return llama.init_random_params, llama.forward, ("rope_cos", "rope_sin")


def _cast_bf16(params, jnp, protected=("rope_cos", "rope_sin")):
    """f32 master → bf16 compute view; protected constants (RoPE caches)
    stay f32 (they are not trained, and cos/sin precision matters)."""
    import jax

    bf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    return dataclasses.replace(
        bf, **{f: getattr(params, f) for f in protected})


def train(cfg, corpus_train: bytes, steps: int = 3000, batch: int = 16,
          window: int = 512, peak_lr: float = 3e-3, seed: int = 0,
          scan_chunk: int = 250, log=print):
    """Returns trained params as the standard bf16 inference tree."""
    import jax
    import jax.numpy as jnp
    import optax

    from tinychatengine_tpu.core.config import QuantConfig
    from tinychatengine_tpu.generation import kv_cache as kvc

    init_params, forward_fn, protected = _hooks(cfg.family)
    params = init_params(cfg, QuantConfig(scheme="fp"), seed=seed)
    # f32 masters (bf16 masters lose ~8 mantissa bits of update signal)
    params = dataclasses.replace(
        jax.tree.map(lambda x: x.astype(jnp.float32)
                     if x.dtype == jnp.bfloat16 else x, params),
        **{f: getattr(params, f) for f in protected})

    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(100, steps // 10),
        decay_steps=steps, end_value=peak_lr * 0.01)

    def wd_mask(p):
        # decoupled weight decay applies REGARDLESS of gradients — the RoPE
        # cos/sin tables must be masked out, not just grad-zeroed, or they
        # decay off the unit circle (r2 review finding: the first trained
        # checkpoint shipped shrunken rope tables)
        mask = jax.tree.map(lambda _: True, p)
        return dataclasses.replace(mask, **{f: jax.tree.map(
            lambda _: False, getattr(mask, f)) for f in protected})

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=0.05,
                                  mask=wd_mask))
    opt_state = opt.init(params)

    data = jnp.asarray(np.frombuffer(corpus_train, np.uint8))
    n = int(data.shape[0])
    bos = jnp.full((batch, 1), 256, jnp.int32)

    def loss_fn(p32, ids):
        p = _cast_bf16(p32, jnp, protected)
        cache = kvc.init_cache(cfg.num_layers, batch, window + 1,
                               cfg.num_kv_heads, cfg.head_dim)
        logits, _ = forward_fn(p, cfg, ids[:, :-1], cache,
                               jnp.int32(0), full_logits=True)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    def step_fn(carry, _):
        p32, ostate, key = carry
        key, k1 = jax.random.split(key)
        offs = jax.random.randint(k1, (batch,), 0, n - window - 1)
        ids = jnp.concatenate(
            [bos, data[offs[:, None] + jnp.arange(window)[None, :]]
             .astype(jnp.int32)], axis=1)            # [B, W+1], BOS-led
        loss, grads = jax.value_and_grad(loss_fn)(p32, ids)
        grads = dataclasses.replace(
            grads, **{f: jax.tree.map(jnp.zeros_like, getattr(grads, f))
                      for f in protected})
        updates, ostate = opt.update(grads, ostate, p32)
        return (optax.apply_updates(p32, updates), ostate, key), loss

    from functools import partial

    @partial(jax.jit, static_argnums=3, donate_argnums=(0, 1))
    def train_chunk(p32, ostate, key, n_steps):
        (p32, ostate, key), losses = jax.lax.scan(
            step_fn, (p32, ostate, key), None, length=n_steps)
        return p32, ostate, key, losses

    key = jax.random.PRNGKey(seed + 1)
    done = 0
    t0 = time.time()
    while done < steps:
        take = min(scan_chunk, steps - done)
        # fixed-length chunks reuse one executable; a short tail recompiles
        # once — acceptable (two shapes total)
        params, opt_state, key, losses = train_chunk(params, opt_state, key,
                                                     take)
        losses = np.asarray(losses)  # forces completion (tunnel rule)
        done += take
        tok_s = done * batch * window / max(time.time() - t0, 1e-9)
        log(f"  step {done}/{steps}  loss {losses[-16:].mean():.4f}  "
            f"({tok_s / 1e3:.0f}k tok/s)")
    return _cast_bf16(params, jnp, protected)


def main(argv=None):
    import jax.numpy as jnp  # noqa: F401  (backend init before corpus IO)

    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools import corpus as corpus_mod
    from tinychatengine_tpu.tools.checkpoint import save_checkpoint
    from tinychatengine_tpu.tools.convert import requantize_llama
    from tinychatengine_tpu.tools.perplexity import perplexity

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="assets/bytellama_5m")
    ap.add_argument("--model", default="bytellama_5m",
                    help="bytellama_5m (llama Δppl pyramid) or byteopt_4m "
                         "(the SmoothQuant W8A8 row via native calibration)")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--corpus-mb", type=int, default=48)
    ap.add_argument("--eval-tokens", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args(argv)

    cfg = get_model_config(args.model)
    print("building corpus...")
    corpus = corpus_mod.build_corpus(max_bytes=args.corpus_mb << 20)
    train_b, eval_b = corpus_mod.train_eval_split(corpus)
    print(f"  train {len(train_b) / 1e6:.1f} MB, eval {len(eval_b) / 1e6:.1f} MB")

    params = train(cfg, train_b, steps=args.steps, batch=args.batch,
                   window=args.window, seed=args.seed)

    out = Path(args.out)
    save_checkpoint(str(out), params, cfg, QuantConfig(scheme="fp"),
                    extra_meta={"family": cfg.family,
                                "trained_on": "local python source "
                                f"({len(train_b)} bytes)", "steps": args.steps})
    # committed eval sample: the first 128 KB of the held-out split, so the
    # regression test scores the exact text this table was measured on
    sample = eval_b[:128 << 10].decode("utf-8", errors="ignore")
    (out / "eval_sample.txt").write_text(sample, encoding="utf-8")
    print(f"saved {out}")

    if args.skip_eval:
        return
    tok = ByteTokenizer()
    ids = np.asarray(tok.encode(eval_b.decode("utf-8", errors="ignore")),
                     np.int32)[:args.eval_tokens]
    rows = []
    if cfg.family == "opt":
        from tinychatengine_tpu.models import opt
        from tinychatengine_tpu.tools.calibrate_opt import quantize_opt_w8a8

        # calibration sample from the TRAIN split (never the eval text)
        calib = np.asarray(tok.encode(
            train_b[: 64 << 10].decode("utf-8", errors="ignore")),
            np.int32)[:512][None, :]
        schemes = [("fp (bf16)", lambda: params),
                   ("w8a8 (SmoothQuant a=0.5)",
                    lambda: quantize_opt_w8a8(params, cfg, calib,
                                              smooth_alpha=0.5)),
                   ("w8a8 (no smoothing)",
                    lambda: quantize_opt_w8a8(params, cfg, calib,
                                              smooth_alpha=0.0))]
        for label, mk in schemes:
            qp = mk()
            t0 = time.time()
            ppl = perplexity(opt.forward, qp, cfg, ids, window=512,
                             stride=256)
            rows.append((label, ppl))
            print(f"  {label:26s} ppl {ppl:.4f}   ({time.time() - t0:.0f}s)")
    else:
        for label, qcfg, qkv in [
                ("fp (bf16)", QuantConfig(scheme="fp"), False),
                ("w4a16", QuantConfig(scheme="w4a16", group_size=128), False),
                ("w4a8", QuantConfig(scheme="w4a8", group_size=128), False),
                ("w4a16 + int8 KV", QuantConfig(scheme="w4a16", group_size=128,
                                                kv_cache_dtype="int8"), True)]:
            qp = requantize_llama(params, qcfg)
            t0 = time.time()
            ppl = perplexity(llama.forward, qp, cfg, ids, window=512,
                             stride=256, quantized_kv=qkv)
            rows.append((label, ppl))
            print(f"  {label:18s} ppl {ppl:.4f}   ({time.time() - t0:.0f}s)")
    fp_ppl = rows[0][1]
    report = {"model": cfg.name, "eval_tokens": int(len(ids)),
              "window": 512, "stride": 256,
              "rows": [{"scheme": l, "ppl": round(p, 4),
                        "delta_vs_fp": round(p - fp_ppl, 4)} for l, p in rows]}
    (out / "ppl.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
