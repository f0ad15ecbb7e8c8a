#!/usr/bin/env python
"""Per-query bench regression diff: compare two bench JSON records
(e.g. BENCH_r03.json vs a fresh bench.py line) and flag queries whose
wall changed more than --threshold (default 1.3x), separating new and
removed queries.  Absolute walls are only comparable at similar host
steal (BASELINE.md) — this is a triage screen, not a verdict.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """A raw bench.py line, or the driver's BENCH_r{N}.json wrapper
    (whose `tail` holds a truncated stdout fragment — per-query pairs
    are regex-recovered from it)."""
    import re

    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict) \
            and "queries" in d["parsed"]:
        return d["parsed"]
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    HEADLINE = {"value", "sf", "num_cpus", "join_rows", "join_sec",
                "join_rows_per_s", "tile_rows", "tiles", "tile_sec",
                "tiles_per_s", "rows_per_s", "sec", "repeat"}
    qs = {m.group(1): float(m.group(2)) for m in
          re.finditer(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', text)
          if m.group(1) not in HEADLINE}
    return {"queries": qs, "value": sum(qs.values())}


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    ns = ap.parse_args()
    thr = ns.threshold
    old, new = load(ns.old), load(ns.new)
    oq, nq = old["queries"], new["queries"]
    slower, faster = [], []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0:
            continue
        r = b / a
        if r > thr:
            slower.append((r, k, a, b))
        elif r < 1 / thr:
            faster.append((r, k, a, b))
    for r, k, a, b in sorted(slower, reverse=True):
        print(f"SLOWER {r:5.2f}x {k:28s} {a:.2f}s -> {b:.2f}s")
    for r, k, a, b in sorted(faster):
        print(f"faster {r:5.2f}x {k:28s} {a:.2f}s -> {b:.2f}s")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {' '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {' '.join(removed)}")
    tot_o = sum(oq[k] for k in set(oq) & set(nq))
    tot_n = sum(nq[k] for k in set(oq) & set(nq))
    print(f"shared-query total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / max(tot_o, 1e-9):.2f}x); "
          f"suite {old.get('value') or 0:.1f}s -> "
          f"{new.get('value') or 0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
