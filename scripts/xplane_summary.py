"""Summarize a jax.profiler trace directory (from scripts/trace_decode.py)
without tensorboard: aggregate the Chrome-trace events by op name and print
total/avg time, split per process (device planes show up as their own pid,
e.g. "/device:TPU:0" — those rows are the real per-op decode attribution).

Usage:
  python scripts/xplane_summary.py /tmp/tce_trace [top_n]
"""

import collections
import glob
import gzip
import json
import sys


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tce_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(f"no trace.json.gz under {logdir}")
        sys.exit(1)
    path = paths[-1]  # newest capture
    d = json.load(gzip.open(path))
    ev = d.get("traceEvents", [])

    proc_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", str(e["pid"]))

    dur = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("name"))
        dur[key] += e.get("dur", 0.0)  # microseconds
        cnt[key] += 1

    print(f"trace: {path}  ({len(ev)} events)")
    by_pid = collections.defaultdict(list)
    for (pid, name), total in dur.items():
        by_pid[pid].append((total, name))
    # device planes first (anything that isn't the host process)
    order = sorted(by_pid, key=lambda p: ("host" in proc_names.get(p, "").lower(), p))
    for pid in order:
        pname = proc_names.get(pid, str(pid))
        rows = sorted(by_pid[pid], reverse=True)[:top_n]
        print(f"\n== {pname} (pid {pid}) ==")
        print(f"{'total_ms':>10} {'avg_us':>9} {'count':>7}  name")
        for total, name in rows:
            n = cnt[(pid, name)]
            print(f"{total / 1e3:>10.2f} {total / n:>9.1f} {n:>7}  {name[:100]}")


if __name__ == "__main__":
    main()
