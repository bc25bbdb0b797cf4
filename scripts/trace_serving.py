"""Device-trace the serving engine under the bench_serving mixed load:
what does a 16-tick burst actually cost on chip, and where does the wall
time between dispatches go? (r4: tick-mix counters say ~57 dispatches for
a 25 s run — the per-tick device cost must be ~9x a single-stream decode
step, which the trace attributes.)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/trace_serving.py [logdir]
"""

import sys
import time

import numpy as np

from tinychatengine_tpu.utils.profiler import device_trace


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tce_trace_serving"

    from tinychatengine_tpu.core.config import (GenerationConfig, QuantConfig,
                                                get_model_config)
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.runtime.serving import ServingEngine

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a8", group_size=128)
    print("building params...", file=sys.stderr)
    params = llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                      fast=True)
    gcfg = GenerationConfig(temp=0.0, n_predict=128, repeat_penalty=1.1,
                            repeat_last_n=64, seed=0)
    srv = ServingEngine(params, cfg, qcfg, slots=8, max_len=2048, gcfg=gcfg,
                        admission_chunk=512, tick_batch=16)
    rng = np.random.default_rng(0)

    def submit_all():
        return [srv.submit(rng.integers(100, cfg.vocab_size - 100,
                                        int(rng.integers(32, 320))),
                           n_predict=128) for _ in range(24)]

    print("warmup...", file=sys.stderr)
    submit_all()
    srv.run()
    srv.done.clear()
    for k in srv.tick_stats:
        srv.tick_stats[k] = 0

    t0 = time.perf_counter()
    with device_trace(logdir):
        reqs = submit_all()
        srv.run()
    wall = time.perf_counter() - t0
    total = sum(len(r.output_ids) for r in reqs)
    print(f"wall {wall:.2f}s  tokens {total}  agg {total / wall:.1f} tok/s")
    print(f"tick mix: {srv.tick_stats}")


if __name__ == "__main__":
    main()
