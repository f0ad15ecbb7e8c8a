"""Per-query deepest-verified-scale manifest (VERDICT.md round-4 task 7).

Runs every registered query through tools/check_parity.py at a given sf
tier, one SUBPROCESS per chunk with a hard timeout so a quadratic
DuckDB twin cannot wedge the sweep: a chunk that times out is re-run
query-by-query, and a query that still times out is recorded with its
ceiling reason instead of blocking the rest.

State accrues in SWEEP_MANIFEST.json at the repo root:
    {query: {"sf": "0.1"|"0.01", "status": "pass"|"timeout"|"fail",
             "sec": wall, "note": ...}}
`python tools/sweep_manifest.py [--sf 0.1] [--timeout 300] [--redo]
 [query ...]` — default processes only queries not yet green at the
requested tier, so the sweep is resumable across sessions.

Parity runs contend for CPU: never run concurrently with a bench
capture (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "SWEEP_MANIFEST.json")
CHUNK = 8


def load() -> dict:
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            return json.load(f)
    return {}


def save(m: dict) -> None:
    with open(MANIFEST, "w") as f:
        json.dump(dict(sorted(m.items())), f, indent=1)


def all_queries() -> list[str]:
    sys.path.insert(0, REPO)
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); import __ray_entry__ as E; "
         "print('\\n'.join(E.queries()))" % REPO],
        capture_output=True, text=True, check=True)
    return out.stdout.split()


def run_chunk(names: list[str], sf_dir: str, timeout: int) -> tuple[dict, bool]:
    """Run check_parity on a chunk; parse per-query PASS/FAIL lines.
    Returns (results, timed_out)."""
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_parity.py"),
             sf_dir, *names],
            capture_output=True, text=True, timeout=timeout, cwd=REPO)
        out = p.stdout
        timed_out = False
    except subprocess.TimeoutExpired as ex:
        out = (ex.stdout or b"").decode() if isinstance(ex.stdout, bytes) \
            else (ex.stdout or "")
        timed_out = True
    res = {}
    for line in out.splitlines():
        m = re.match(r"(PASS|FAIL|ok\?)\s+(\S+?):.*?(?:\(([\d.]+)s\))?$", line)
        if m and m.group(2) in names:
            status = {"PASS": "pass", "ok?": "rows-only", "FAIL": "fail"}[m.group(1)]
            res[m.group(2)] = {"status": status,
                               "sec": float(m.group(3)) if m.group(3) else None,
                               "line": line[:300]}
    if timed_out:
        print(f"  chunk TIMEOUT after {time.time()-t0:.0f}s "
              f"({len(res)}/{len(names)} finished)")
    return res, timed_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.1")
    ap.add_argument("--timeout", type=int, default=420)
    ap.add_argument("--redo", action="store_true",
                    help="re-run queries already green at this tier")
    ap.add_argument("queries", nargs="*")
    a = ap.parse_args()
    sf_dir = f"/root/testdata/sf{a.sf}"

    manifest = load()
    targets = a.queries or all_queries()
    todo = [q for q in targets
            if a.redo or manifest.get(q, {}).get("sf") != a.sf
            or manifest.get(q, {}).get("status") not in ("pass", "rows-only")]
    print(f"{len(todo)} queries to verify at sf{a.sf} "
          f"({len(targets) - len(todo)} already green)")

    for i in range(0, len(todo), CHUNK):
        chunk = todo[i:i + CHUNK]
        print(f"[{i}/{len(todo)}] {' '.join(chunk)}", flush=True)
        res, timed_out = run_chunk(chunk, sf_dir, a.timeout)
        pending = [q for q in chunk if q not in res]
        if pending and not timed_out:
            # a chunk that produced no line for some queries without
            # timing out CRASHED (import error, driver death): retry
            # each solo so the failure is attributed per query, and
            # record an explicit error rather than silently skipping
            print(f"  chunk crashed with {len(pending)} unreported; "
                  f"retrying solo")
            for q in pending:
                r, _ = run_chunk([q], sf_dir, a.timeout)
                res[q] = r.get(q, {"status": "error", "sec": None,
                                   "line": "no parity output (crash)"})
            pending = []
        if timed_out and pending:
            for q in pending:
                r, t2 = run_chunk([q], sf_dir, a.timeout)
                if q in r:
                    res.update(r)
                else:
                    res[q] = {"status": "timeout", "sec": None,
                              "line": f"exceeded {a.timeout}s solo at sf{a.sf}"}
        for q, r in res.items():
            prev = manifest.get(q, {})
            if r["status"] not in ("pass", "rows-only") and \
                    prev.get("status") in ("pass", "rows-only") and \
                    prev.get("sf") != a.sf:
                # keep the deepest recorded PASS (a shallower tier);
                # annotate this tier as its ceiling.  A non-pass at the
                # SAME tier a query previously passed is a regression
                # and must overwrite, not hide behind the stale pass.
                prev[f"sf{a.sf}_ceiling"] = r["line"]
                manifest[q] = prev
                continue
            manifest[q] = {"sf": a.sf, **r}
        save(manifest)
        for q, r in res.items():
            print(f"  {r['status']:9s} {q} "
                  f"{('%.1fs' % r['sec']) if r['sec'] else ''}")
    counts: dict = {}
    for q in targets:
        st = manifest.get(q, {})
        key = (st.get("sf"), st.get("status"))
        counts[key] = counts.get(key, 0) + 1
    print("summary:", {f"sf{k[0]}:{k[1]}": v for k, v in counts.items()})


if __name__ == "__main__":
    main()
