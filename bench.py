#!/usr/bin/env python
"""Headline benchmark for the Ray-Data engine.

Default: run every __ray_entry__ query over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "headline": {"join_rows_per_s": ..., "tiles_per_s": ...}}

--scaling: run the headline job (spatial-join + tiling, the
BASELINE.json metric) twice in FRESH processes at num_cpus=2 and
num_cpus=8 (the N-vs-4N pair below this VM's DRAM ceiling — see
run_scaling) on the same input and report both throughputs plus
scaling efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo).

--headline-only [--cpus N]: internal child mode for --scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _init_ray(num_cpus: int):
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _consume(res) -> int:
    """Stream a result to completion; return row count."""
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_headline(sf_dir: str, repeat: int = 1) -> dict:
    """The BASELINE.json metric: spatial-join rows/sec + tiles/sec.

    Job = PIP join of the geotagged corpus against the zone polygons
    (join rows) + the single-pass flagship 6-table tiling pipeline
    (rows routed/projected into quadtree tiles).  ``repeat`` scales the
    input stream (same file read N times as independent tasks) so the
    job is compute-bound at sandbox scale for the scaling criterion."""
    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union
    from osmquadtreepostgis_ray.queries import pip_zones_ds

    import numpy as np
    import pyarrow as pa

    t0 = time.time()
    join_rows = pip_zones_ds(sf_dir, repeat=repeat).count()
    t_join = time.time() - t0

    # documents is ~20x smaller than events; scale its stream so both
    # stages are comparably compute-bound in scaling mode
    tile_repeat = repeat * 20 if repeat > 1 else 1
    t1 = time.time()
    tile_rows = 0
    tile_chunks: list[np.ndarray] = []

    # consume distributedly: the driver sees only per-batch summaries
    # (row count + unique tiles), never the projected rows.  The driver
    # accumulation must stay VECTORIZED — a per-batch Python set.update
    # was a serial Amdahl term that capped tile-stage scaling at ~0.71
    # (same absolute cost is 4% of the 4-CPU run but 12% of the 16-CPU
    # run); appending arrays + one final np.unique removes it.
    def summarize(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("tile").to_numpy())
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                         "tiles": pa.array([u], pa.list_(pa.int64()))})

    # repeat-mode lists the same small file tile_repeat times; without an
    # override Ray makes one tiny read task per listing and per-task
    # overhead dominates BOTH levels (22s -> 16s at 4 CPUs, 8.3s -> 5.0s
    # at 16 CPUs packing ~3-4 listings per task).  Pack ~4 listings per
    # block — a pure function of the input plan, so both scaling levels
    # see identical blocks; over-packing hurts (128 blocks at
    # repeat=2000 measured 71.6s vs 24.4s at 512).
    from osmquadtreepostgis_ray.config import EngineParams
    tile_params = EngineParams(
        read_parallelism=min(tile_repeat, max(128, tile_repeat // 4))
        if tile_repeat > 1 else None)
    for b in all_tables_union(sf_dir, params=tile_params,
                              repeat=tile_repeat).map_batches(
            summarize, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=1 << 10):
        tile_rows += int(pa.compute.sum(b.column("n")).as_py())
        tile_chunks.append(b.column("tiles").combine_chunks().flatten().to_numpy())
    tile_ids = np.unique(np.concatenate(tile_chunks)) if tile_chunks else []
    t_tile = time.time() - t1

    return {
        "repeat": repeat,
        "join_rows": join_rows,
        "join_sec": round(t_join, 3),
        "join_rows_per_s": round(join_rows / max(t_join, 1e-9), 1),
        "tile_rows": tile_rows,
        "tiles": len(tile_ids),
        "tile_sec": round(t_tile, 3),
        "tiles_per_s": round(len(tile_ids) / max(t_tile, 1e-9), 1),
        "rows_per_s": round((join_rows + tile_rows) / max(t_join + t_tile, 1e-9), 1),
        "sec": round(t_join + t_tile, 3),
    }


def _steal_jiffies() -> int:
    """Cumulative host-steal jiffies (field 8 of /proc/stat cpu line).
    This firecracker VM sees documented steal bursts that inflate
    individual queries 2-6x (BASELINE.md); reporting the delta alongside
    every bench run makes contaminated runs identifiable after the
    fact."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:  # pragma: no cover - non-linux
        return -1


def run_all(sf_dir: str, num_cpus: int) -> dict:
    steal0 = _steal_jiffies()
    _init_ray(num_cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    # warmup: spin up workers so the first timed query isn't charged for it
    import ray.data
    ray.data.range(1000).map_batches(lambda b: b).count()

    per_query: dict[str, float] = {}
    total0 = time.time()

    # a driver-side timeout (SIGTERM) must not lose the whole run: dump
    # whatever finished as the one JSON line and exit cleanly.  The dump
    # must be ASYNC-SIGNAL-SAFE w.r.t. the final print: round 2's BENCH
    # capture ended mid-JSON (n=2 lines, parsed=None) because SIGTERM
    # landed while the final buffered print was flushing — the handler's
    # own print interleaved and os._exit dropped the rest of the buffer.
    # Fix: the handler writes raw bytes to fd 1 (bypassing the Python
    # buffer), prefixed with a newline so any half-flushed line is
    # terminated and the LAST stdout line is always complete JSON.
    import signal

    def _dump_partial(signum, frame):  # pragma: no cover - timeout path
        payload = ("\n" + json.dumps({
            "metric": "all-queries wall time (PARTIAL: terminated)",
            "value": round(time.time() - total0, 3), "unit": "sec",
            "queries": per_query, "sf": _sf_of(sf_dir), "num_cpus": num_cpus,
            "headline": {"partial": True},
        }) + "\n").encode()
        while payload:  # os.write may be partial on a full pipe
            payload = payload[os.write(1, payload):]
        os._exit(0)

    signal.signal(signal.SIGTERM, _dump_partial)
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            _consume(fn(sf_dir))
            per_query[name] = round(time.time() - t0, 3)
        except Exception as ex:  # pragma: no cover - bench must not die
            per_query[name] = -1.0
            print(f"# bench error {name}: {type(ex).__name__}: {ex}", file=sys.stderr)

    headline = run_headline(sf_dir)
    total = time.time() - total0

    import ray
    ray.shutdown()
    return {
        "metric": "all-queries + headline spatial-join/tiling wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "steal_jiffies": _steal_jiffies() - steal0,
        "headline": headline,
    }


def run_headline_child(sf_dir: str, num_cpus: int, repeat: int = 1) -> dict:
    _init_ray(num_cpus)
    import ray.data
    ray.data.range(1000).map_batches(lambda b: b).count()  # warmup
    h = run_headline(sf_dir, repeat=repeat)
    import ray
    ray.shutdown()
    return {"num_cpus": num_cpus, **h}


SCALING_REPEAT = int(os.environ.get("GRAFT_SCALING_REPEAT", "20"))


def run_scaling(sf_dir: str, lo: int = 2, hi: int = 8) -> dict:
    """Fresh process per parallelism level (the sandbox stand-in for the
    N vs 4N node cluster criterion).  The input stream is scaled
    (repeat) so the job is compute-bound, as the real 10^12-row job
    would be — efficiency on a 10-second overhead-dominated toy run
    measures Ray startup, not the engine.  Both levels must sit below
    this VM's memory-bandwidth ceiling, which a multi-node cluster
    (per-node bandwidth) would not share.  Round 1 used 4 vs 16; the
    round-2 kernel speedups (~2x per core) moved the ceiling down — the
    string-heavy tile projection now saturates DRAM at 16 workers
    (tile-stage ratio pinned at ~0.74 from 4->16 regardless of work
    size, while 2->8 gives 0.88) — so the in-ceiling N-vs-4N pair on
    this box is 2 vs 8.  Raw trials for BOTH pairs live in
    BASELINE.md."""
    def run_pair(plo: int, phi: int, ntrials: int):
        out = {}
        trials: dict[int, list[float]] = {}
        for cpus in (plo, phi):
            best = None
            trials[cpus] = []
            for _trial in range(ntrials):  # best-of-N: host CPU-steal bursts
                # (4% of guest jiffies historically) hit individual trials hard
                env = dict(os.environ)
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--headline-only",
                     "--cpus", str(cpus), "--sf-dir", sf_dir,
                     "--repeat", str(SCALING_REPEAT)],
                    capture_output=True, text=True, env=env, timeout=3600)
                lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
                if r.returncode != 0 or not lines:
                    print(f"# scaling trial failed (cpus={cpus}, rc={r.returncode}): "
                          f"{r.stderr[-500:]}", file=sys.stderr)
                    continue
                res = json.loads(lines[-1])
                trials[cpus].append(res["rows_per_s"])
                if best is None or res["rows_per_s"] > best["rows_per_s"]:
                    best = res
            if best is None:
                raise RuntimeError(f"all scaling trials failed at cpus={cpus}")
            out[cpus] = best
        eff = (out[phi]["rows_per_s"] / out[plo]["rows_per_s"]) / (phi / plo)
        return out, trials, eff

    out, trials, eff = run_pair(lo, hi, ntrials=3)
    # host scaling ceiling measured in the same window: on this shared VM
    # even cache-resident int64 ALU work does not scale 4->16 when the
    # host is oversubscribed (tools/host_probe.py) — the engine cannot
    # exceed that ceiling, so report the normalized efficiency too
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import host_probe
    ceiling = host_probe.probe(lo=lo, hi=hi, alu_only=True)["alu_eff"]
    # secondary pair 4v16 always reported alongside (ADVICE r2): the
    # DRAM-ceiling rationale for the 2v8 primary stays independently
    # checkable — the 4v16 stage breakdown (join_sec/tile_sec per level)
    # shows WHERE the ceiling binds
    s_out, s_trials, s_eff = run_pair(2 * lo, 2 * hi, ntrials=2)
    s_ceiling = host_probe.probe(lo=2 * lo, hi=2 * hi, alu_only=True)["alu_eff"]
    return {
        "metric": "scaling efficiency (headline rows/s, fresh procs)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "lo": out[lo],
        "hi": out[hi],
        "trials": {str(c): trials[c] for c in trials},  # raw, for BASELINE.md
        "host_alu_ceiling": ceiling,
        "normalized_efficiency": round(eff / max(ceiling, 1e-9), 3),
        "secondary_pair": {
            "pair": [2 * lo, 2 * hi],
            "efficiency": round(s_eff, 3),
            "lo": s_out[2 * lo],
            "hi": s_out[2 * hi],
            "trials": {str(c): s_trials[c] for c in s_trials},
            "host_alu_ceiling": s_ceiling,
            "normalized_efficiency": round(s_eff / max(s_ceiling, 1e-9), 3),
        },
        "queries": {},
        "num_cpus": hi,
    }


def main():
    args = sys.argv[1:]
    sf_dir = SF_DIR
    cpus = CPUS
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--cpus" in args:
        cpus = int(args[args.index("--cpus") + 1])
    repeat = int(args[args.index("--repeat") + 1]) if "--repeat" in args else 1
    if "--headline-only" in args:
        res = run_headline_child(sf_dir, cpus, repeat)
    elif "--scaling" in args:
        res = run_scaling(sf_dir)
    elif "--stats" in args:
        # per-stage Ray Data stats for one query (profiling hook: read
        # wall/cpu/rows per operator, then iterate on the slow stage)
        name = args[args.index("--stats") + 1]
        _init_ray(cpus)
        import __ray_entry__ as E
        ds = E.queries()[name](sf_dir)
        import ray.data
        if isinstance(ds, ray.data.Dataset):
            ds = ds.materialize()
            print(ds.stats())
        else:
            print(f"{name} returns {type(ds).__name__}; no Dataset stats")
        import ray
        ray.shutdown()
        return
    else:
        res = run_all(sf_dir, cpus)
    # the one-line contract: ignore late SIGTERM once results exist, then
    # emit the line as one unbuffered fd-1 write so no timeout/flush race
    # can truncate it (BENCH_r02 arrived cut mid-JSON)
    import signal
    signal.signal(signal.SIGTERM, signal.SIG_IGN)
    payload = (json.dumps(res) + "\n").encode()
    while payload:
        payload = payload[os.write(1, payload):]


if __name__ == "__main__":
    main()
