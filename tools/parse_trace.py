"""Aggregate an XPOINT_PROFILE_DIR Chrome-trace (vm.trace.json.gz) by
hlo_category, printing ms/batch for the steady-state bench iterations.

Usage: python tools/parse_trace.py /tmp/xp [n_batches]
"""
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

root = Path(sys.argv[1])
n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else None
traces = list(root.glob("**/*.trace.json.gz"))
assert traces, f"no trace under {root}"
t = json.load(gzip.open(traces[0], "rt"))

by_cat = defaultdict(float)
by_name = defaultdict(float)
total = 0.0
for ev in t["traceEvents"]:
    if ev.get("ph") != "X":
        continue
    args = ev.get("args") or {}
    cat = args.get("hlo_category")
    if cat is None:
        continue
    dur_ms = ev.get("dur", 0) / 1000.0
    by_cat[cat] += dur_ms
    by_name[(cat, ev.get("name", "?")[:60])] += dur_ms
    total += dur_ms

print(f"trace: {traces[0]}")
print(f"total device op time: {total:.1f} ms"
      + (f" ({total / n_batches:.2f} ms/batch over {n_batches})"
         if n_batches else ""))
for cat, ms in sorted(by_cat.items(), key=lambda x: -x[1]):
    frac = 100 * ms / max(total, 1e-9)
    per_b = f"  {ms / n_batches:6.2f} ms/b" if n_batches else ""
    print(f"{cat:32s} {ms:8.1f} ms  {frac:5.1f}%{per_b}")

print("\ntop 25 ops:")
for (cat, name), ms in sorted(by_name.items(), key=lambda x: -x[1])[:25]:
    per_b = f"  {ms / n_batches:6.2f} ms/b" if n_batches else ""
    print(f"{ms:8.1f} ms{per_b}  [{cat}] {name}")
