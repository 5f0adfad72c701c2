"""Aggregate a jax.profiler perfetto trace into a device-time roofline table.

Round-4/5 methodology (PERFORMANCE.md "Training-step roofline", round-5
VERDICT #3 batch-128 decode roofline): take the device timeline's "XLA Ops"
rows (leaf ops — no nesting, so summed durations are exclusive time),
aggregate by op, and bucket into architectural categories so a step's wall
time is attributed to matmuls / attention kernels / DUS stash traffic /
copies / glue.

Usage:
  python benchmarks/trace_analysis.py <logdir> [--steps N] [--top 25]

``<logdir>`` is the ``--trace`` dir passed to decode_bench/train_bench;
the newest ``*.trace.json.gz`` under it is analyzed.  ``--steps`` divides
totals into per-step ms.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(logdir: str) -> list[dict]:
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {logdir}")
    path = max(paths, key=os.path.getmtime)
    print(f"trace: {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def xla_ops_events(events: list[dict]) -> list[dict]:
    """Complete events on any thread named 'XLA Ops*' of a TPU device pid."""
    tpu_pids = set()
    ops_tids = set()  # (pid, tid)
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                name = e.get("args", {}).get("name", "")
                if re.search(r"TPU|/device:", name, re.I):
                    tpu_pids.add(e["pid"])
            elif e.get("name") == "thread_name":
                if str(e.get("args", {}).get("name", "")).startswith("XLA Ops"):
                    ops_tids.add((e["pid"], e.get("tid")))
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key in ops_tids and (not tpu_pids or e["pid"] in tpu_pids):
            out.append(e)
    return out


_CATEGORIES = (
    # (label, regex over the op name)
    ("while/cond loop overhead", r"^while|^conditional"),
    ("pallas (flash attention)", r"pallas|flash|custom-call"),
    ("dynamic-update-slice stash", r"dynamic-update-slice|dynamic_update_slice"),
    ("dynamic-slice reads", r"dynamic-slice|dynamic_slice"),
    ("copies / transposes", r"^copy|transpose|bitcast(?!.*dynamic)"),
    ("convolutions (vocoder)", r"convolution|conv"),
    ("matmul fusions / dots", r"dot|fusion"),
    ("reduces", r"reduce"),
    ("all-to-all / collectives", r"all-reduce|all-gather|collective|permute"),
)


def categorize(name: str) -> str:
    for label, pat in _CATEGORIES:
        if re.search(pat, name):
            return label
    return "other glue"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps", type=int, default=1,
                    help="decode/train steps covered by the trace -> per-step ms")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    events = xla_ops_events(load_events(args.logdir))
    if not events:
        raise SystemExit("no XLA Ops events found (wrong logdir? CPU-only trace?)")

    # EXCLUSIVE durations: the ops row contains wrapper events (while.N,
    # conditionals) that enclose their body's fusions — summing raw `dur`
    # triple-counts.  Per thread, sweep events in (ts, -dur) order with an
    # interval stack and subtract each child's span from its parent.
    by_thread: dict[tuple, list[dict]] = collections.defaultdict(list)
    for e in events:
        by_thread[(e.get("pid"), e.get("tid"))].append(e)
    by_name: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0.0)))
        stack: list[list] = []  # [end_ts, name, exclusive_us]
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0.0)
            while stack and stack[-1][0] <= ts:
                _, nm, excl = stack.pop()
                by_name[nm] += excl
            if stack:
                stack[-1][2] -= dur  # child's span is not parent-exclusive
            stack.append([ts + dur, e["name"], dur])
            counts[e["name"]] += 1
        while stack:
            _, nm, excl = stack.pop()
            by_name[nm] += excl

    total_us = sum(by_name.values())
    by_cat: dict[str, float] = collections.defaultdict(float)
    for name, us in by_name.items():
        by_cat[categorize(name)] += us

    steps = max(1, args.steps)
    print(f"\ndevice busy time: {total_us/1e3:.1f} ms total, "
          f"{total_us/1e3/steps:.3f} ms/step over {steps} steps, "
          f"{len(by_name)} distinct ops, {sum(counts.values())} events "
          f"({sum(counts.values())/steps:.0f} events/step)")

    print("\n== by category (ms/step | % of busy) ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3/steps:9.3f}  {100*us/total_us:5.1f}%  {cat}")

    print(f"\n== top {args.top} ops (ms/step | % | events/step | name) ==")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{us/1e3/steps:9.3f}  {100*us/total_us:5.1f}%  "
              f"{counts[name]/steps:7.1f}  {name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
