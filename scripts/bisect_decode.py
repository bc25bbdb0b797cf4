"""Decode-step glue bisection (VERDICT r2 item 1b): where do the ~0.9 ms
between the matmul floor and the measured 6.6 ms/step go?

Method: the PRODUCTION forward (models/llama.py) is re-traced with individual
components knocked out by monkeypatching the exact ops it calls — weight
streaming (the dominant, bandwidth-bound term) is identical across variants,
so loop-differenced full-decode deltas attribute the non-matmul time:

  full        production step (forward + sampling.sample, bench gcfg)
  no_norm     rms_norm_ref -> identity
  no_rope     apply_rotary -> identity
  no_attn     flash_decode -> q passthrough, update_layer -> no write
  raw_argmax  sampling.sample -> plain argmax (drops penalty scatter)
  no_sample   sampling.sample -> scalar compare (drops the vocab reduce too)
  floor       all of the above (matmul chain + embed + logits only)

Per CLAUDE.md methodology: 256-token decode deltas (long 272 vs short 16),
variants interleaved per round, >= 6 rounds, medians; fresh prompts per run;
np.asarray fetch forces completion. Each variant gets a FRESH jit (the
production _device_decode_loop caches on static args only — a patched
component would silently reuse the unpatched executable).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bisect_decode.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import GenerationConfig, QuantConfig, get_model_config
from tinychatengine_tpu.generation import kv_cache as kvc
from tinychatengine_tpu.generation import sampling
from tinychatengine_tpu.generation.engine import Engine, _hashable_gcfg
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.ops import ref

N_SHORT, N_LONG = 16, 272
ROUNDS = 6
PROMPT = 64


def _patches(knobs):
    """(module, attr, replacement) triples for a knob set."""
    out = []
    if "no_norm" in knobs:
        out.append((ref, "rms_norm_ref", lambda x, w, eps: x))
    if "no_rope" in knobs:
        out.append((ref, "apply_rotary", lambda q, k, c, s: (q, k)))
    if "no_attn" in knobs:
        out.append((llama, "flash_decode",
                    lambda q, *a, **kw: q.reshape(q.shape[0], -1)))
        out.append((kvc, "update_layer",
                    lambda cache, k, v, li, start: cache))
    if "raw_argmax" in knobs:
        out.append((sampling, "sample",
                    lambda logits, state, gcfg, last=None:
                    (jnp.argmax(logits, axis=-1).astype(jnp.int32), state)))
    if "no_sample" in knobs:
        out.append((sampling, "sample",
                    lambda logits, state, gcfg, last=None:
                    ((logits[:, 0] > 0).astype(jnp.int32), state)))
    return out


VARIANTS = {
    "full": (),
    "no_norm": ("no_norm",),
    "no_rope": ("no_rope",),
    "no_attn": ("no_attn",),
    "raw_argmax": ("raw_argmax",),
    "no_sample": ("no_sample",),
    "floor": ("no_norm", "no_rope", "no_attn", "no_sample"),
}


def make_runner(eng, gcfg, knobs):
    """Fresh jit per variant; patches active only during trace (compile)."""
    hcfg = _hashable_gcfg(gcfg)

    def loop_fn(params, cfg, logits, cache, state, last, pos, n_tokens):
        def step(carry, _):
            logits, cache, state, last, pos = carry
            tok, state = sampling.sample(logits, state, hcfg, last)
            last2 = jnp.roll(last, -1, axis=1).at[:, -1].set(tok)
            logits, cache = llama.forward(params, cfg, tok[:, None], cache,
                                          pos)
            return (logits, cache, state, last2, pos + 1), tok

        (_, cache, _, _, _), tokens = jax.lax.scan(
            step, (logits, cache, state, last, pos), None, length=n_tokens)
        return tokens.T, cache

    jitted = jax.jit(loop_fn, static_argnames=("cfg", "n_tokens"),
                     donate_argnames=("cache",))

    def run(seed, n_tokens):
        rng = np.random.default_rng(seed)
        ids = rng.integers(100, eng.cfg.vocab_size - 100, (1, PROMPT))
        cache = eng.new_cache()
        logits, cache = eng.prefill(ids, cache)
        state = sampling.SamplerState.init(gcfg.seed, 1, gcfg.mirostat_tau)
        window = max(gcfg.repeat_last_n, 1)
        last = jnp.full((1, window), -1, jnp.int32)
        toks, cache = jitted(eng.params, eng.cfg, logits, cache, state, last,
                             jnp.asarray(PROMPT, jnp.int32), n_tokens)
        return np.asarray(toks)

    def compile_with_patches():
        saved = []
        for mod, name, repl in _patches(knobs):
            saved.append((mod, name, getattr(mod, name)))
            setattr(mod, name, repl)
        try:
            run(0, N_SHORT)
            run(0, N_LONG)
        finally:
            for mod, name, orig in saved:
                setattr(mod, name, orig)

    return run, compile_with_patches


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a16", group_size=128)
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    params = jax.block_until_ready(params)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=2048)
    g = GenerationConfig(temp=0.0, n_predict=N_LONG, repeat_penalty=1.1,
                         repeat_last_n=64)

    runners = {}
    for name, knobs in VARIANTS.items():
        print(f"compiling {name}...", file=sys.stderr)
        run, compile_fn = make_runner(eng, g, knobs)
        compile_fn()
        runners[name] = run

    results = {name: [] for name in runners}
    for r in range(ROUNDS):
        for name, run in runners.items():
            t0 = time.perf_counter()
            run(1000 + 10 * r, N_SHORT)
            t_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2000 + 10 * r, N_LONG)
            t_l = time.perf_counter() - t0
            results[name].append((t_l - t_s) / (N_LONG - N_SHORT))
        print(f"round {r} done", file=sys.stderr)

    full = float(np.median(results["full"]))
    out = {}
    for name, ts in results.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_tok": round(med * 1e3, 3),
                     "delta_vs_full_us": round((full - med) * 1e6, 1)}
        print(f"{name:12s} {out[name]['ms_per_tok']:7.3f} ms/tok  "
              f"saves {out[name]['delta_vs_full_us']:7.1f} us", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
