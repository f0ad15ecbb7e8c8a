"""Above-floor engagement probe — the round-5 scale-evidence harness.

Every data-aware sizing knob in the engine (util.scaled_shards floor
256, sources/tables.SMALL_READ_BYTES, util.SOLVE_SMALL_BYTES, the graph
broadcast/bucket plan guards) sits at its floor / small branch at sf0.1
— the 100-TB branches had unit tests but no measured runs (VERDICT.md
round-4 task 1).  This harness pushes real pipelines past each
threshold using repeat-mode streams / synthetic large inputs, records
WHICH branch engaged (by instrumenting the sizing helpers), and proves
OUTPUT INVARIANCE between the floor-forced and data-scaled plans on
identical input (shard/plan choice is a blocks knob, never a semantics
knob).

Usage:  python tools/scale_probe.py [probe ...]
Probes: dedup_shards window_shards reduce_cap graph_plan big_read
Results print as one JSON line per probe; paste into BASELINE.md.

Run in a quiet window (no concurrent Ray work — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from contextlib import contextmanager

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmquadtreepostgis_ray import util
from osmquadtreepostgis_ray.sources.tables import read_table
from osmquadtreepostgis_ray.stages.dedup import dedup_exact

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/scale_probe"


@contextmanager
def record_shards():
    """Instrument util.scaled_shards to log every chosen shard count
    (shard_apply resolves the default through the module global, so
    patching the attribute is visible to every caller)."""
    seen: list[int] = []
    real = util.scaled_shards

    def wrapped(ds, floor=util.SHARD_FLOOR, target_bytes=util.SHARD_TARGET_BYTES):
        n = real(ds, floor, target_bytes)
        seen.append(n)
        return n

    util.scaled_shards = wrapped
    try:
        yield seen
    finally:
        util.scaled_shards = real


@contextmanager
def force_floor_shards():
    """Pin every shard_apply/sharded_agg to the floor plan (what the
    engine would choose for a small input) for the invariance leg."""
    real = util.scaled_shards
    util.scaled_shards = lambda ds, floor=util.SHARD_FLOOR, target_bytes=0: floor
    try:
        yield
    finally:
        util.scaled_shards = real


def sorted_frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def repeat_to_cross(name: str, threshold_bytes: int, columns) -> int:
    """Repeat count so the metadata-only source estimate crosses the
    threshold (estimate_bytes walks to the parquet source, which scales
    linearly with the listing length)."""
    one = util.estimate_bytes(read_table(SF_DIR, name, columns=columns))
    assert one, f"no metadata estimate for {name}"
    return int(-(-int(threshold_bytes * 1.05) // one)), one


def probe_dedup_shards() -> dict:
    """dedup_exact (the heaviest sharded_agg user) with the source
    estimate pushed past floor*64MiB=16GiB: scaled_shards must leave
    the 256 floor; the full pipeline must complete and match the
    floor-forced plan bit-for-bit on the same repeated input."""
    thresh = util.SHARD_FLOOR * util.SHARD_TARGET_BYTES
    rep, one = repeat_to_cross("documents", thresh, ["doc_id", "text"])

    def run(forced_floor: bool):
        ds = read_table(SF_DIR, "documents", columns=["doc_id", "text"], repeat=rep)
        t0 = time.perf_counter()
        with record_shards() as seen:
            if forced_floor:
                with force_floor_shards():
                    out = sorted_frame(dedup_exact(ds))
            else:
                out = sorted_frame(dedup_exact(ds))
        return out, time.perf_counter() - t0, seen

    scaled, t_scaled, seen = run(False)
    floor, t_floor, _ = run(True)
    assert seen and max(seen) > util.SHARD_FLOOR, f"floor branch still engaged: {seen}"
    assert scaled.equals(floor), "scaled vs floor plan outputs differ"
    return {"probe": "dedup_shards", "repeat": rep, "est_one_bytes": one,
            "est_total_bytes": one * rep, "threshold_bytes": thresh,
            "shards_chosen": max(seen), "floor": util.SHARD_FLOOR,
            "rows": len(scaled), "sec_scaled": round(t_scaled, 2),
            "sec_floor": round(t_floor, 2), "invariant": True}


def probe_window_shards() -> dict:
    """A shard_apply WINDOW op (q_moving_window: per-user row-frame
    moving sum) past the shard floor.  Repeat-mode duplicates event
    rows, so the window semantics see R copies per (user, ts) — both
    plans see the identical stream, which is all invariance needs."""
    from osmquadtreepostgis_ray.queries import q_moving_window
    thresh = util.SHARD_FLOOR * util.SHARD_TARGET_BYTES
    rep, one = repeat_to_cross(
        "events", thresh, ["event_id", "user_id", "ts", "value"])

    import osmquadtreepostgis_ray.sources.tables as tables
    real_read = tables.read_table

    def repeat_read(sf_dir, name, columns=None, repeat=1, **kw):
        return real_read(sf_dir, name, columns=columns, repeat=rep, **kw)

    def run(forced_floor: bool):
        import osmquadtreepostgis_ray.queries as Q
        Q.read_table = repeat_read
        try:
            t0 = time.perf_counter()
            with record_shards() as seen:
                if forced_floor:
                    with force_floor_shards():
                        out = q_moving_window(SF_DIR)
                        agg = _window_checksum(out)
                else:
                    out = q_moving_window(SF_DIR)
                    agg = _window_checksum(out)
            return agg, time.perf_counter() - t0, seen
        finally:
            Q.read_table = real_read

    scaled, t_scaled, seen = run(False)
    floor, t_floor, _ = run(True)
    assert seen and max(seen) > util.SHARD_FLOOR, f"floor branch still engaged: {seen}"
    assert scaled == floor, f"window outputs differ: {scaled} vs {floor}"
    return {"probe": "window_shards", "repeat": rep,
            "est_total_bytes": one * rep, "shards_chosen": max(seen),
            "floor": util.SHARD_FLOOR, "checksum": scaled,
            "sec_scaled": round(t_scaled, 2), "sec_floor": round(t_floor, 2),
            "invariant": True}


def _window_checksum(ds) -> tuple:
    """Order-invariant exact summary of a large window output without
    driver materialization: per-block folded sums at a width whose
    SUMS stay inside int64 (CLAUDE.md: 2^31 fold)."""
    def fold(t: pa.Table) -> pa.Table:
        if not t.num_rows or "event_id" not in t.column_names:
            z = pa.array([0], pa.int64())
            return pa.table({"n": z, "s1": z, "s2": z})
        e = t.column("event_id").to_numpy().astype(np.int64)
        s = t.column("w3_sum_cents").to_numpy().astype(np.int64)
        n = t.column("w3_n").to_numpy().astype(np.int64)
        mix = ((e % (1 << 31)) * 31 + s % (1 << 31) + n) % (1 << 31)
        return pa.table({"n": pa.array([len(e)], pa.int64()),
                         "s1": pa.array([int(mix.sum())], pa.int64()),
                         "s2": pa.array([int((mix % 9973).sum())], pa.int64())})
    parts = ds.map_batches(fold, batch_format="pyarrow").to_pandas()
    return (int(parts["n"].sum()), int(parts["s1"].sum()), int(parts["s2"].sum()))


def probe_reduce_cap() -> dict:
    """reduce_small_or_shard's 1-GiB one-task-solve cap (q_bpe_pairs):
    past the cap the guarded plan must switch to the sort-shard
    fallback; outputs must match the forced one-task solve (partials
    are alphabet^2-bounded, so the single task stays tiny even at big
    repeat — exactly why the invariance leg is affordable)."""
    from osmquadtreepostgis_ray.queries import q_bpe_pairs
    rep, one = repeat_to_cross("documents", util.SOLVE_SMALL_BYTES, ["text"])

    import osmquadtreepostgis_ray.queries as Q
    real_read = Q.read_table

    def repeat_read(sf_dir, name, columns=None, repeat=1, **kw):
        return real_read(sf_dir, name, columns=columns, repeat=rep, **kw)

    branch: list[str] = []
    real_reduce = util.reduce_small_or_shard

    def recording_reduce(ds, keys, fn, max_small_bytes=util.SOLVE_SMALL_BYTES,
                         shards=None):
        est = util.estimate_bytes(ds)
        branch.append("one-task" if est is not None and est <= max_small_bytes
                      else "sort-shard")
        return real_reduce(ds, keys, fn, max_small_bytes=max_small_bytes,
                           shards=shards)

    def forced_small_reduce(ds, keys, fn, max_small_bytes=None, shards=None):
        return real_reduce(ds, keys, fn, max_small_bytes=1 << 62)

    Q.read_table = repeat_read
    try:
        for mod in (util, Q):
            mod.reduce_small_or_shard = recording_reduce
        t0 = time.perf_counter()
        scaled = sorted_frame(q_bpe_pairs(SF_DIR))
        t_scaled = time.perf_counter() - t0
        for mod in (util, Q):
            mod.reduce_small_or_shard = forced_small_reduce
        t0 = time.perf_counter()
        small = sorted_frame(q_bpe_pairs(SF_DIR))
        t_small = time.perf_counter() - t0
    finally:
        for mod in (util, Q):
            mod.reduce_small_or_shard = real_reduce
        Q.read_table = real_read
    assert branch == ["sort-shard"], f"cap did not flip the plan: {branch}"
    assert scaled.equals(small), "sort-shard vs one-task outputs differ"
    return {"probe": "reduce_cap", "repeat": rep, "est_total_bytes": one * rep,
            "cap_bytes": util.SOLVE_SMALL_BYTES, "branch": branch[0],
            "rows": len(scaled), "sec_sharded": round(t_scaled, 2),
            "sec_one_task": round(t_small, 2), "invariant": True}


def _chain_edges(n_nodes: int):
    """The q_kcore gapped-chain + chord graph over 0..n_nodes-1 (same
    structural peel-depth bound, so KCORE_ROUNDS stays an invariant)."""
    def edges(t: pa.Table) -> pa.Table:
        if not t.num_rows or "id" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"src": z, "dst": z})
        ids = t.column("id").to_numpy().astype(np.int64)
        d1 = ids[(ids >= 1) & (ids % 5 != 0)]
        d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
        a = np.concatenate([d1 - 1, d2 - 2])
        b = np.concatenate([d1, d2])
        return pa.table({"src": pa.array(np.r_[a, b], pa.int64()),
                         "dst": pa.array(np.r_[b, a], pa.int64())})
    return ray.data.range(n_nodes).map_batches(edges, batch_format="pyarrow")


def probe_graph_plan() -> dict:
    """kcore_peel past broadcast_nodes_max on a REAL >1M-node graph
    (1.5M nodes, ~3.4M directed edge rows of the q_kcore chain+chord
    shape): the bucketed plan must engage through the default guard,
    complete, and match the broadcast plan forced via a raised bound."""
    from osmquadtreepostgis_ray.queries import KCORE_K, KCORE_ROUNDS
    from osmquadtreepostgis_ray.stages.graph import kcore_peel
    n = 1_500_000

    t0 = time.perf_counter()
    bucketed = sorted_frame(kcore_peel(_chain_edges(n), k=KCORE_K,
                                       max_rounds=KCORE_ROUNDS))
    t_bucket = time.perf_counter() - t0
    t0 = time.perf_counter()
    broadcast = sorted_frame(kcore_peel(_chain_edges(n), k=KCORE_K,
                                        max_rounds=KCORE_ROUNDS,
                                        broadcast_nodes_max=10_000_000))
    t_broad = time.perf_counter() - t0
    assert bucketed.equals(broadcast), "bucketed vs broadcast plans differ"
    return {"probe": "graph_plan", "nodes": n, "guard": 1_000_000,
            "survivors": len(bucketed), "sec_bucketed": round(t_bucket, 2),
            "sec_broadcast": round(t_broad, 2), "invariant": True}


def probe_graph_pr() -> dict:
    """pagerank past broadcast_nodes_max on the same real 1.5M-node
    graph: the bucketed power-iteration plan must engage through the
    default guard and match the broadcast plan exactly."""
    from osmquadtreepostgis_ray.stages.graph import pagerank
    n = 1_500_000
    t0 = time.perf_counter()
    bucketed = sorted_frame(pagerank(_chain_edges(n), iters=2))
    t_bucket = time.perf_counter() - t0
    t0 = time.perf_counter()
    broadcast = sorted_frame(pagerank(_chain_edges(n), iters=2,
                                      broadcast_nodes_max=10_000_000))
    t_broad = time.perf_counter() - t0
    assert bucketed.equals(broadcast), "pagerank plans differ"
    return {"probe": "graph_pr", "nodes": n, "guard": 1_000_000,
            "rows": len(bucketed), "sec_bucketed": round(t_bucket, 2),
            "sec_broadcast": round(t_broad, 2), "invariant": True}


def probe_graph_bfs() -> dict:
    """bfs_hops past broadcast_nodes_max on the same real 1.5M-node
    graph (sources every 4 ids, so the hop radius is a local
    structural bound independent of n): bucketed plan through the
    default guard vs broadcast plan forced via a raised bound."""
    from osmquadtreepostgis_ray.stages.graph import bfs_hops
    n = 1_500_000
    t0 = time.perf_counter()
    bucketed = sorted_frame(bfs_hops(_chain_edges(n), src_mod=4,
                                     max_rounds=12))
    t_bucket = time.perf_counter() - t0
    t0 = time.perf_counter()
    broadcast = sorted_frame(bfs_hops(_chain_edges(n), src_mod=4,
                                      max_rounds=12,
                                      broadcast_nodes_max=10_000_000))
    t_broad = time.perf_counter() - t0
    assert bucketed.equals(broadcast), "bfs plans differ"
    return {"probe": "graph_bfs", "nodes": n, "guard": 1_000_000,
            "rows": len(bucketed), "sec_bucketed": round(t_bucket, 2),
            "sec_broadcast": round(t_broad, 2), "invariant": True}


def probe_dim_cap() -> dict:
    """dim_join's 256 MiB broadcast cap: a REAL >256 MiB dimension
    side (4.5M unique keys x 64-byte payload, built deterministically)
    must take the bucket_hash_join fallback through the default guard,
    and match the broadcast plan forced via a raised cap on the same
    input — the last size-guarded plan choice without a measured
    above-cap run."""
    from osmquadtreepostgis_ray.stages.joins import DIM_BROADCAST_CAP, dim_join

    n_dim = 4_500_000

    def mk_dim(t: pa.Table) -> pa.Table:
        if not t.num_rows or "id" not in t.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "pad": pa.array([], pa.string())})
        ids = t.column("id").to_numpy().astype(np.int64)
        pad = pd.Series(ids % 997).astype(str).str.zfill(64)
        return pa.table({"o_custkey": pa.array(ids, pa.int64()),
                         "pad": pa.array(pad.to_numpy(), pa.string())})

    def run(cap: int):
        dim = ray.data.range(n_dim).map_batches(mk_dim, batch_format="pyarrow")
        big = read_table(SF_DIR, "orders", columns=["o_orderkey", "o_custkey"])
        t0 = time.perf_counter()
        out = dim_join(big, dim, on="o_custkey", max_broadcast_bytes=cap)
        got = sorted_frame(out.select_columns(["o_orderkey", "o_custkey", "pad"]))
        return got, time.perf_counter() - t0

    # measure the materialized dim size once for the record
    dim_sz = ray.data.range(n_dim).map_batches(
        mk_dim, batch_format="pyarrow").materialize().size_bytes()
    assert dim_sz > DIM_BROADCAST_CAP, f"dim side only {dim_sz}B"
    bucket, t_bucket = run(DIM_BROADCAST_CAP)      # default guard: bucket
    broadcast, t_broad = run(1 << 40)              # forced broadcast
    assert bucket.equals(broadcast), "bucket vs broadcast join outputs differ"
    return {"probe": "dim_cap", "dim_rows": n_dim, "dim_bytes": dim_sz,
            "cap_bytes": DIM_BROADCAST_CAP, "rows": len(bucket),
            "sec_bucket": round(t_bucket, 2),
            "sec_broadcast": round(t_broad, 2), "invariant": True}


def probe_big_read() -> dict:
    """SMALL_READ_BYTES: a single >256MiB parquet file must take the
    Ray-sizing branch (block count scales with the DATA, not the CPU
    count) and still stream a full dedup_exact to completion."""
    from osmquadtreepostgis_ray.sources import tables as tables_mod
    os.makedirs(SCRATCH, exist_ok=True)
    big = os.path.join(SCRATCH, "bigdocs", "documents.parquet")
    os.makedirs(os.path.dirname(big), exist_ok=True)
    if not os.path.exists(big) or os.path.getsize(big) <= tables_mod.SMALL_READ_BYTES:
        src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                            columns=["doc_id", "text"])
        reps = []
        i = 0
        # unique doc_ids per copy; raw text duplicated (exact-dup heavy,
        # which is dedup_exact's worst case for partial cardinality)
        while True:
            t = pa.table({
                "doc_id": pa.array(src.column("doc_id").to_numpy() + i * 10_000_000,
                                   pa.int64()),
                "text": src.column("text")})
            reps.append(t)
            i += 1
            if i >= 600:
                break
        pq.write_table(pa.concat_tables(reps), big, compression="snappy")
    fsize = os.path.getsize(big)
    assert fsize > tables_mod.SMALL_READ_BYTES, f"file only {fsize}B"
    blocks = tables_mod._small_read_blocks(big, 1)
    assert blocks is None, "small-read branch engaged on a big file"
    sf = os.path.dirname(big)
    ds = read_table(sf, "documents", columns=["doc_id", "text"])
    t0 = time.perf_counter()
    out = dedup_exact(ds)
    n_groups = out.count()
    sec = time.perf_counter() - t0
    return {"probe": "big_read", "file_bytes": fsize,
            "small_read_cap": tables_mod.SMALL_READ_BYTES,
            "branch": "ray-sizing", "distinct_hashes": n_groups,
            "sec": round(sec, 2)}


PROBES = {
    "dedup_shards": probe_dedup_shards,
    "window_shards": probe_window_shards,
    "reduce_cap": probe_reduce_cap,
    "graph_plan": probe_graph_plan,
    "graph_pr": probe_graph_pr,
    "graph_bfs": probe_graph_bfs,
    "dim_cap": probe_dim_cap,
    "big_read": probe_big_read,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    results = []
    for name in names:
        res = PROBES[name]()
        results.append(res)
        print(json.dumps(res))
    ray.shutdown()
    if os.path.isdir(SCRATCH) and "--keep" not in sys.argv:
        shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
