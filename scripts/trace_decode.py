"""Capture a jax.profiler device trace of the decode step (if the backend
supports it — the axon tunnel may not export profiling; this script probes
and degrades gracefully).

The loop-differenced per-op numbers in PERF.md carry ±20% co-tenant noise;
a real trace is the only way to attribute the remaining "unaccounted glue"
(PERF.md per-op table). Runs a short decode burst under
utils.profiler.device_trace and reports whether trace files appeared.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/trace_decode.py \
      [logdir] [scheme]        # scheme: w4a16 (default) | w4a8
  (on CPU for a smoke test: TCE_TRACE_CPU=1 python scripts/trace_decode.py)
"""

import os
import pathlib
import sys

if os.environ.get("TCE_TRACE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.core.config import (
    GenerationConfig,
    QuantConfig,
    get_model_config,
)
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.utils.profiler import device_trace


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tce_trace"
    scheme = sys.argv[2] if len(sys.argv) > 2 else "w4a16"
    on_cpu = jax.default_backend() != "tpu"
    cfg = get_model_config("bytellama_5m" if on_cpu else "llama3_8b")
    qcfg = QuantConfig(scheme=scheme)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=1024,
                                      fast=not on_cpu)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=1024)
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.vocab_size - 10, (1, 64))

    # warm: compile prefill + device decode loop outside the trace window
    eng.generate_device(ids, GenerationConfig(temp=0.0), n_tokens=8)
    try:
        with device_trace(logdir):
            out = eng.generate_device(
                rng.integers(10, cfg.vocab_size - 10, (1, 64)),
                GenerationConfig(temp=0.0), n_tokens=32)
            np.asarray(out)  # fetch: force execution inside the window
    except Exception as e:  # tunnel backends may reject profiling outright
        print(f"TRACE FAILED: {type(e).__name__}: {e}")
        sys.exit(2)

    files = [p for p in pathlib.Path(logdir).rglob("*") if p.is_file()]
    size = sum(p.stat().st_size for p in files)
    print(f"trace dir {logdir}: {len(files)} files, {size} bytes")
    # device traces produce .xplane.pb files; host-only traces lack them
    xplanes = [p for p in files if p.name.endswith(".xplane.pb")]
    print(f"xplane files: {len(xplanes)}"
          + (" — open with tensorboard/xprof for per-op timing" if xplanes
             else " — NO device plane captured (tunnel likely doesn't "
                  "export device profiling)"))
    sys.exit(0 if xplanes else 1)


if __name__ == "__main__":
    main()
