"""Serve a model over the OpenAI-compatible REST API.

Usage:
    python -m tinychatengine_tpu.serve --demo --port 8000
    python -m tinychatengine_tpu.serve --model llama3_8b \
        --checkpoint ckpt_dir --port 8000 --slots 8 --paged

The reference ships only a terminal REPL (llm/application/chat.cc); this is
the network-serving surface above the continuous-batching ServingEngine
(runtime/serving.py) + HTTP front-end (runtime/server.py).

Try it:
    curl localhost:8000/v1/chat/completions -d '{
      "messages": [{"role": "user", "content": "hi"}], "max_tokens": 16}'
"""

from __future__ import annotations

import argparse
import time

from tinychatengine_tpu.core.config import (GenerationConfig, ModelConfig,
                                            QuantConfig, get_model_config)
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.runtime.server import InferenceServer
from tinychatengine_tpu.runtime.serving import ServingEngine


def build_demo_clip(embed_dim: int):
    """Tiny random CLIP encoder for --demo --vision (mirrors chat.py's
    --demo --image wiring)."""
    from tinychatengine_tpu.models import clip
    ccfg = ModelConfig(
        name="clip_demo", family="clip", num_heads=4, num_kv_heads=4,
        num_layers=2, max_sqlen=0, embed_dim=64, hidden_dim=128,
        vocab_size=0, image_size=56, patch_size=14, mmproj_dim=embed_dim)
    return clip.init_random_params(ccfg), ccfg


def build_demo_serving(slots: int = 4, **kw):
    """Tiny random-weight model + byte tokenizer: full serving path, no
    checkpoint (mirrors chat.py --demo)."""
    cfg = ModelConfig(
        name="demo", family="llama", num_heads=8, num_kv_heads=4, num_layers=4,
        max_sqlen=512, embed_dim=512, hidden_dim=1024, vocab_size=384,
        rms_norm_eps=1e-5)
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    qcfg = QuantConfig(scheme="w4a16")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    tok = ByteTokenizer()
    # NOTE: vocab-padding ids (258-383) are NOT masked here — a logit_bias
    # of 126 entries would exceed RowParams.MAX_BIAS and force the
    # engine-global sampler, rejecting per-request sampling params. Padding
    # ids decode to "" (byte_fallback.decode drops ids >= 256), so they are
    # cosmetic only in a random-weight demo.
    gcfg = GenerationConfig(n_ctx=512)
    engine = ServingEngine(params, cfg, qcfg, slots=slots, gcfg=gcfg, **kw)
    return engine, tok


def build_serving(model: str, precision: str, checkpoint: str,
                  tokenizer_path: str | None, slots: int, **kw):
    from tinychatengine_tpu.tools.checkpoint import (load_checkpoint,
                                                     load_tokenizer)
    cfg = get_model_config(model)
    params, qcfg = load_checkpoint(checkpoint, cfg, precision)
    tok = load_tokenizer(tokenizer_path or checkpoint, cfg)
    engine = ServingEngine(params, cfg, qcfg, slots=slots, **kw)
    return engine, tok


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="TinyChatEngine-TPU OpenAI-compatible server")
    ap.add_argument("--model", default="llama3_8b")
    ap.add_argument("--precision", default="INT4",
                    choices=["INT4", "INT8", "FP32", "BF16"])
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--demo", action="store_true",
                    help="tiny random model + byte tokenizer (no checkpoint)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=8,
                    help="continuous-batching slots")
    ap.add_argument("--max-len", type=int, default=None)
    ap.add_argument("--paged", action="store_true",
                    help="paged KV cache (page pool instead of slot-reserved)")
    ap.add_argument("--prefix-cache", type=int, default=0, metavar="N",
                    help="KV prefix-cache entries (0 = off)")
    ap.add_argument("--speculative", action="store_true",
                    help="prompt-lookup speculative decoding in tick bursts")
    ap.add_argument("--tick-batch", type=int, default=16, metavar="K",
                    help="decode ticks fused into one device dispatch when "
                    "the queue is idle (throughput knob: 64 measured best "
                    "on the 24-req bench; streamed tokens arrive in bursts "
                    "of up to K; 1 = latency-first)")
    ap.add_argument("--vision", action="store_true",
                    help="enable image_url chat content parts (VLM): loads "
                    "the checkpoint's CLIP encoder (or a tiny random one "
                    "with --demo) and splices image embeddings into prompts")
    ap.add_argument("--compilation-cache", default="~/.cache/tce_tpu/xla",
                    metavar="DIR", help="persistent XLA compilation cache "
                    "(server restarts skip the 20-240s cold compiles; "
                    "'' disables)")
    return ap


def main(argv=None):
    ap = build_parser()
    args = ap.parse_args(argv)

    if args.compilation_cache:
        import os

        import jax
        try:
            path = os.path.expanduser(args.compilation_cache)
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception as exc:  # cache is an optimization, never fatal
            print(f"compilation cache disabled: {exc}")

    kw = dict(paged=args.paged, max_len=args.max_len,
              speculative=args.speculative, tick_batch=args.tick_batch,
              prefix_cache_entries=args.prefix_cache)
    clip_params = clip_cfg = None
    if args.demo:
        engine, tok = build_demo_serving(slots=args.slots, **kw)
        if args.vision:
            clip_params, clip_cfg = build_demo_clip(engine.cfg.embed_dim)
    else:
        if not args.checkpoint:
            ap.error("--checkpoint required (or use --demo)")
        engine, tok = build_serving(args.model, args.precision,
                                    args.checkpoint, args.tokenizer,
                                    args.slots, **kw)
        if args.vision:
            from tinychatengine_tpu.tools.checkpoint import load_clip
            clip_params, clip_cfg = load_clip(args.checkpoint)

    server = InferenceServer(engine, tok, clip_params=clip_params,
                             clip_cfg=clip_cfg)
    port = server.start(host=args.host, port=args.port)
    print(f"serving {server.model_name} on http://{args.host}:{port} "
          f"({args.slots} slots{', paged' if args.paged else ''})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        print("\nshutting down")
        server.close()


if __name__ == "__main__":
    main()
