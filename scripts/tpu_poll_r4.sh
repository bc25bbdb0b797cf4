#!/bin/bash
# Round-4 resume poller: waits for the axon TPU tunnel to come back, then
# runs the remaining on-chip jobs serially with generous timeouts.
# Single instance; logs to /tmp/tpu_poll_r4.log. Safe to re-run: skips
# jobs whose done-markers exist.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/tmp/tpu_poll_r4.log
probe() {
  timeout 300 python -u -c "
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128,128)); print('probe-ok', float(np.asarray(jnp.dot(x,x).sum())))
" >> "$LOG" 2>&1
}
echo "=== poller start $(date)" >> "$LOG"
until probe; do
  echo "tunnel down $(date)" >> "$LOG"
  sleep 120
done
echo "=== tunnel UP $(date)" >> "$LOG"

if [ ! -f /tmp/vlm_r4.done ]; then
  echo "--- bench_vlm $(date)" >> "$LOG"
  timeout 3600 python -u scripts/bench_vlm.py > /tmp/vlm_r4b.log 2>&1 \
    && touch /tmp/vlm_r4.done
  tail -2 /tmp/vlm_r4b.log >> "$LOG"
fi

if [ ! -f /tmp/longctx_r4.done ]; then
  echo "--- bench_longctx 16k/32k $(date)" >> "$LOG"
  timeout 7200 python -u scripts/bench_longctx.py 16384 32768 \
    > /tmp/longctx_r4.log 2>&1 && touch /tmp/longctx_r4.done
  tail -4 /tmp/longctx_r4.log >> "$LOG"
fi

if [ ! -f /tmp/bench_r4_final.done ]; then
  echo "--- bench.py final $(date)" >> "$LOG"
  timeout 3600 python -u bench.py > /tmp/bench_r4_final.log 2>&1 \
    && touch /tmp/bench_r4_final.done
  tail -2 /tmp/bench_r4_final.log >> "$LOG"
fi
echo "=== poller done $(date)" >> "$LOG"
