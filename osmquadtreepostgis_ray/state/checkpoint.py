"""Checkpointed, resumable partitioned output — the engine's answer to
the reference's lack of any resume path (a failed 6h planet run restarts
from scratch; SURVEY.md §4 'checkpoint/resume: none').

Layout of a checkpointed output::

    out_dir/
      data/part=<pid>/part-<pid>.parquet   one file per partition (idempotent name)
      _manifest/<pid>.json                 lineage+metrics record, written
                                           atomically AFTER the partition's data

A partition is "done" iff its manifest record exists; the data file is
written first and the manifest renamed into place second, so a kill at
any instant leaves either (a) nothing, (b) data without manifest — both
recomputed on resume (the deterministic file name makes the rewrite
idempotent).  Completed partitions are filtered out BEFORE any compute,
so a resumed run skips their work entirely (north-rule resumability).

The write itself is a `groupby(part).map_groups` — the partition is
co-located once (one shuffle) and each group's worker writes its own
file + manifest, returning a metrics row.  The resulting lineage+metrics
table (one row per partition: rows, bytes, key range, wall, run id) is
both the checkpoint state and the per-partition metrics feed.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from osmquadtreepostgis_ray.functions import quadtree

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"
SETTINGS_FILE = "_settings.json"


def read_settings(out_dir: str) -> dict | None:
    """The write settings (part_depth, max_rows_per_part, ...) persisted
    by the first resumable_write — incremental updates MUST reuse them so
    skew-subdivided partition ids line up with the original export."""
    p = os.path.join(out_dir, MANIFEST_DIR, SETTINGS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_settings(out_dir: str, settings: dict) -> None:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f"_tmp-settings-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(settings, fh)
    os.replace(tmp, os.path.join(mdir, SETTINGS_FILE))

METRICS_SCHEMA = pa.schema([
    ("part", pa.int64()),
    ("rows", pa.int64()),
    ("bytes", pa.int64()),
    ("files", pa.int64()),
    ("key_min", pa.int64()),
    ("key_max", pa.int64()),
    ("wall_s", pa.float64()),
    ("status", pa.string()),
    ("run_id", pa.string()),
])


def completed_partitions(out_dir: str) -> dict[int, dict]:
    """part id -> manifest record for every completed partition."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for f in os.listdir(mdir):
        if f.endswith(".json") and not f.startswith("_") and f != SETTINGS_FILE:
            with open(os.path.join(mdir, f)) as fh:
                rec = json.load(fh)
            done[int(rec["part"])] = rec
    return done


def read_manifest(out_dir: str) -> pa.Table:
    """The checkpoint/lineage table as Arrow (one row per done partition)."""
    recs = sorted(completed_partitions(out_dir).values(), key=lambda r: r["part"])
    if not recs:
        return METRICS_SCHEMA.empty_table()
    return pa.Table.from_pylist(
        [{k: r.get(k) for k in METRICS_SCHEMA.names} for r in recs], schema=METRICS_SCHEMA)


def read_data(out_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(out_dir, DATA_DIR))


QUARANTINE_DIR = "_quarantine"


def _quarantine_dump(out_dir: str, pid: int, body: pa.Table,
                     prev: tuple[int, pa.Table] | None, err: Exception) -> None:
    """S6 crash forensics (the reference serializes the failing CsvBlock
    AND its predecessor on writer exception,
    /root/reference/src/postgiswriter.cpp:1159-1191, used :1236-1240):
    always write a JSON error record (part id, rows, schema, exception)
    so the failure is identified even when the payload itself cannot be
    serialized, then best-effort dump the offending block and its
    predecessor as Arrow IPC streams — IPC round-trips types parquet
    rejects, so 'parquet cannot encode this block' failures still leave
    a byte-exact repro."""
    qdir = os.path.join(out_dir, QUARANTINE_DIR)
    os.makedirs(qdir, exist_ok=True)
    base = os.path.join(qdir, f"part-{pid}-{uuid.uuid4().hex}")
    rec = {"part": pid, "rows": int(body.num_rows),
           "schema": str(body.schema), "error": repr(err),
           "prev_part": None if prev is None else int(prev[0])}
    with open(base + ".json", "w") as fh:
        json.dump(rec, fh)

    def ipc_dump(tab: pa.Table, path: str) -> None:
        try:
            with pa.OSFile(path, "wb") as f, \
                    pa.ipc.new_stream(f, tab.schema) as w:
                w.write_table(tab)
        except Exception:
            pass  # payload dump is best-effort; the JSON record stands

    ipc_dump(body, base + ".arrow")
    if prev is not None:
        ipc_dump(prev[1], base + "-pred.arrow")


def _partition_writer(out_dir: str, key_col: str, run_id: str,
                      write_fn=None):
    """map_groups UDF: write one partition's data + manifest, emit
    metrics.  ``write_fn(table, path)`` defaults to pq.write_table —
    injectable for the crash-forensics fault test."""
    write_fn = write_fn or pq.write_table
    prev_cell: list = [None]  # last successfully written (pid, body)

    def write_partition(group: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = int(group.column("__part")[0].as_py())
        body = group.drop_columns(["__part"])
        ddir = os.path.join(out_dir, DATA_DIR, f"part={pid}")
        os.makedirs(ddir, exist_ok=True)
        fpath = os.path.join(ddir, f"part-{pid}.parquet")
        try:
            write_fn(body, fpath)
        except Exception as err:
            _quarantine_dump(out_dir, pid, body, prev_cell[0], err)
            raise
        prev_cell[0] = (pid, body)
        keys = group.column(key_col).to_numpy()
        rec = {
            "part": pid,
            "rows": int(body.num_rows),
            "bytes": int(os.path.getsize(fpath)),
            "files": 1,
            "key_min": int(keys.min()) if len(keys) else None,
            "key_max": int(keys.max()) if len(keys) else None,
            "wall_s": round(time.time() - t0, 6),
            "status": "done",
            "run_id": run_id,
        }
        mdir = os.path.join(out_dir, MANIFEST_DIR)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f"_tmp-{pid}-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(mdir, f"{pid}.json"))  # atomic commit
        return pa.Table.from_pylist([rec], schema=METRICS_SCHEMA)

    return write_partition


def resumable_write(ds: ray.data.Dataset, out_dir: str, key_col: str = "tile",
                    part_depth: int = 4, run_id: str | None = None,
                    max_rows_per_part: int | None = None,
                    skew_depth_delta: int = 2,
                    _write_fn=None) -> pa.Table:
    """Write `ds` partitioned by quadtree ancestor of `key_col` at
    `part_depth`, skipping partitions already checkpointed in `out_dir`.

    With `max_rows_per_part`, hot partitions are subdivided to
    `part_depth + skew_depth_delta` (quadtree child cells) BEFORE the
    shuffle — the skew-aware repartitioning of the north rule: the
    partition id stays a pure function of the row's key, so resume and
    bit-stability are unaffected, and no single writer group exceeds
    ~max_rows (the reference's serial-MultiPolygons failure mode,
    /root/reference/docs/output.txt:75).

    Returns the full lineage+metrics table: freshly written partitions
    with this run's id plus previously-done ones marked 'skipped'.

    RESUME ADOPTS the persisted write settings (including the hot-
    partition set): partition ids must be the same pure function of
    the row across run and resume, so caller args that differ from a
    prior run's are overridden (a changed max_rows_per_part would
    otherwise re-route hot rows to ids absent from the done set and
    duplicate them) — a mismatched key_col raises, since that is a
    different export, not a resume.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    persisted = read_settings(out_dir)
    if persisted is not None:
        if persisted.get("key_col", key_col) != key_col:
            raise ValueError(
                f"resume key_col {key_col!r} != persisted "
                f"{persisted['key_col']!r}: this directory holds a "
                f"different export")
        part_depth = persisted.get("part_depth", part_depth)
        max_rows_per_part = persisted.get("max_rows_per_part",
                                          max_rows_per_part)
        skew_depth_delta = persisted.get("skew_depth_delta",
                                         skew_depth_delta)
    done = completed_partitions(out_dir)

    hot: np.ndarray = np.empty(0, dtype=np.int64)
    if persisted is not None and "hot" in persisted:
        # resume: the hot set is part of the partitioning function —
        # reuse it verbatim (no corpus rescan; also immune to input
        # drift near the hot threshold between run and resume)
        hot = np.sort(np.asarray(persisted["hot"], dtype=np.int64))
    elif max_rows_per_part is not None:
        from osmquadtreepostgis_ray.util import reduce_small_or_shard

        # the input feeds BOTH this counting pass and the write pass —
        # materialize the fork or the whole upstream chain re-executes
        ds = ds.materialize()

        def pcount(batch: pa.Table) -> pa.Table:
            part = quadtree.at_depth(batch.column(key_col).to_numpy(), part_depth)
            u, c = np.unique(part, return_counts=True)
            return pa.table({"p": pa.array(u, pa.int64()),
                             "n": pa.array(c.astype(np.int64), pa.int64())})

        def total(g):
            return g.groupby("p", as_index=False)["n"].sum()

        # partial cardinality is bounded by 4^part_depth — the guarded
        # small reduce, not an unconditional sort shuffle
        counts = reduce_small_or_shard(
            ds.map_batches(pcount, batch_format="pyarrow"), ["p"],
            total).to_pandas()
        hot = np.sort(counts.loc[counts["n"] > max_rows_per_part, "p"]
                      .to_numpy(np.int64))
    if persisted is None:
        _write_settings(out_dir, {"key_col": key_col, "part_depth": part_depth,
                                  "max_rows_per_part": max_rows_per_part,
                                  "skew_depth_delta": skew_depth_delta,
                                  "hot": [int(p) for p in hot]})

    def addpart(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy()
        part = quadtree.at_depth(keys, part_depth)
        if len(hot):
            m = np.isin(part, hot)
            if m.any():
                # per-row depth clamp (a single first-row depth would
                # rewrite mixed-depth keys at the wrong level — the
                # stages/skew.py round-5 bit-stability fix)
                km = keys[m]
                deep = np.minimum(part_depth + skew_depth_delta,
                                  (km & 63).astype(np.int64))
                sub = np.empty(len(km), dtype=np.int64)
                for d in np.unique(deep):
                    dm = deep == d
                    sub[dm] = quadtree.at_depth(km[dm], int(d))
                part = part.copy()
                part[m] = sub
        return batch.append_column("__part", pa.array(part, pa.int64()))

    ds2 = ds.map_batches(addpart, batch_format="pyarrow")
    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(batch: pa.Table) -> pa.Table:
            mask = ~np.isin(batch.column("__part").to_numpy(), done_arr)
            return batch.filter(pa.array(mask))

        ds2 = ds2.map_batches(drop_done, batch_format="pyarrow")

    metrics = ds2.groupby("__part").map_groups(
        _partition_writer(out_dir, key_col, run_id, write_fn=_write_fn),
        batch_format="pyarrow")
    fresh = pa.concat_tables(
        list(metrics.iter_batches(batch_format="pyarrow", batch_size=1 << 16))
        or [METRICS_SCHEMA.empty_table()])

    skipped = [dict(r, status="skipped") for r in done.values()]
    if skipped:
        skipped_t = pa.Table.from_pylist(
            [{k: r.get(k) for k in METRICS_SCHEMA.names} for r in skipped],
            schema=METRICS_SCHEMA)
        fresh = pa.concat_tables([fresh, skipped_t])
    return fresh.sort_by("part")
