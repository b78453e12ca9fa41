#!/usr/bin/env python
"""Aggregate device-op durations from a jax.profiler trace directory.

``python bench.py --trace DIR`` (or any `jax.profiler.trace(DIR)` block)
writes a TensorBoard-format trace; this tool reads the Chrome-trace JSON it
contains and prints per-op and per-category device time — an authoritative
decomposition of where a program's time goes, immune to the early-exit /
contention artifacts that plague wall-clock micro-timing on this
remote-attached device (see docs/PERFORMANCE.md "Measurement discipline").

Usage: python tools/parse_trace.py TRACE_DIR [--top N] [--pid-filter TPU]
"""

from __future__ import annotations

import argparse
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def find_trace_files(root: Path):
    return sorted(root.rglob("*.trace.json.gz")) + sorted(root.rglob("*.trace.json"))


def load_events(path: Path):
    if path.suffix == ".gz":
        with gzip.open(path, "rt") as f:
            data = json.load(f)
    else:
        with open(path, "rt") as f:
            data = json.load(f)
    return data.get("traceEvents", [])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--pid-filter", default=None,
                    help="substring of the process (device) name to keep, "
                         "e.g. 'TPU'; default: keep all non-host tracks")
    args = ap.parse_args()

    files = find_trace_files(args.trace_dir)
    if not files:
        raise SystemExit(f"no *.trace.json(.gz) under {args.trace_dir}")
    events = []
    for f in files:
        events.extend(load_events(f))

    # map pid -> process name; tid -> thread name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    def keep(pid):
        name = pid_names.get(pid, "")
        if args.pid_filter:
            return args.pid_filter.lower() in name.lower()
        # default: device tracks only (skip python/host threads)
        return any(k in name.lower() for k in ("tpu", "xla", "device", "/device"))

    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    per_cat = defaultdict(float)
    total = 0.0
    spans = []
    for e in events:
        if e.get("ph") != "X" or not keep(e.get("pid")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        per_op_n[name] += 1
        total += dur
        spans.append((e.get("ts", 0), dur))
        cat = re.split(r"[.\d]", name, 1)[0]
        per_cat[cat] += dur

    print(f"devices: {sorted(set(v for v in pid_names.values() if v))}")
    print(f"total device-op time: {total:.2f} ms "
          f"across {len(spans)} events\n")
    print(f"{'ms':>10}  {'%':>5}  {'n':>5}  {'mean_us':>8}  op")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        n = per_op_n[name]
        print(f"{ms:10.2f}  {100 * ms / max(total, 1e-9):5.1f}  {n:5d}  "
              f"{1e3 * ms / n:8.1f}  {name[:100]}")
    print(f"\n{'ms':>10}  {'%':>5}  category")
    for name, ms in sorted(per_cat.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:10.2f}  {100 * ms / max(total, 1e-9):5.1f}  {name[:60]}")


if __name__ == "__main__":
    main()
