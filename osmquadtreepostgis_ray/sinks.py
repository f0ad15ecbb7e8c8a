"""Compat sinks — the reference's CSV surfaces re-expressed.

S3 gz-CSV file sink (CsvWriter, /root/reference
osmquadtreepostgis/__init__.py:518-557 and the C++ twin
src/postgis_python.cpp:168-203): one ``<prefix><table>.csv.gz`` per
output table, header row once, rows rendered with the reference's COPY
framing — quote ``\\x01``, delimiter ``\\x02`` (consts at
src/postgiswriter.cpp:49-50), geometry as lowercase hex EWKB (as_hex,
src/postgiswriter.cpp:232-240), doubles fixed 1-dp (double_string,
src/postgiswriter.cpp:84-100).

S4 null sink / counter (CsvBlockCount, src/postgiswriter.cpp:1338-1360):
row+byte totals per table without writing.

These are single-writer streaming consumers by design (so was the
reference's); the scale sink is parquet via state/checkpoint.py.
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import ray.data

QUOTE = "\x01"
DELIM = "\x02"


def _render_cell(val, typ: pa.DataType) -> str:
    if val is None:
        return ""
    if pa.types.is_binary(typ):
        return val.hex()
    if pa.types.is_floating(typ):
        return f"{val:.1f}"
    if pa.types.is_string(typ):
        return QUOTE + str(val).replace("\n", "\\n") + QUOTE
    return str(val)


def render_csv_rows(batch: pa.Table) -> list[str]:
    cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
    types = [f.type for f in batch.schema]
    return [DELIM.join(_render_cell(c[r], t) for c, t in zip(cols, types))
            for r in range(batch.num_rows)]


_PART_TOUCHED: set = set()  # per-worker-process: paths this attempt wrote


def _sharded_gz_dump(ds: "ray.data.Dataset", out_dir: str, render_fn,
                     ext: str) -> int:
    """Parallel gz part-file writer shared by the sharded CSV/JSONL
    modes: one ``part-<taskid>.<ext>.gz`` per map_batches task, row
    counts reduced from the tiny per-part count table — the scale path
    with no single-writer bottleneck.

    Retry discipline: the FIRST touch of a part path in this worker
    process TRUNCATES it, so a task retried after its worker died (the
    common OOM/preemption case — retries land in a fresh process, and
    the task id is stable across attempts) overwrites the partial file
    instead of appending duplicates.  A retry inside the SAME process
    cannot be distinguished (task id unchanged) — exactly-once file
    output under arbitrary retries needs a manifest, which is what
    state/checkpoint.resumable_write provides; these sinks are the
    compat/interchange surface."""
    import os

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        tid = ray.get_runtime_context().get_task_id()
        path = os.path.join(out_dir, f"part-{tid[:16]}.{ext}.gz")
        mode = "at" if path in _PART_TOUCHED else "wt"
        _PART_TOUCHED.add(path)
        with gzip.open(path, mode, encoding="utf-8") as fh:
            for line in render_fn(batch):
                fh.write(line + "\n")
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    parts = ds.map_batches(dump, batch_format="pyarrow")
    return sum(int(pc.sum(b.column("n")).as_py() or 0)
               for b in parts.iter_batches(batch_format="pyarrow"))


def write_csv_gz(tables: dict[str, ray.data.Dataset], out_prefix: str,
                 header: bool = True, sharded: bool = False) -> dict[str, int]:
    """One .csv.gz per table; returns per-table row counts.

    ``sharded=True`` writes ``<prefix><table>/part-<i>.csv.gz`` one
    file per task IN PARALLEL (headerless parts — reassemble by
    concatenation); the default single-file stream is the byte-compat
    surface matching the reference's CsvWriter."""
    counts: dict[str, int] = {}
    for name, ds in tables.items():
        if sharded:
            counts[name] = _sharded_gz_dump(ds, f"{out_prefix}{name}",
                                            render_csv_rows, "csv")
            continue
        n = 0
        with gzip.open(f"{out_prefix}{name}.csv.gz", "wt", encoding="utf-8") as fh:
            first = True
            for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
                if first and header:
                    fh.write(DELIM.join(batch.schema.names) + "\n")
                first = False
                for row in render_csv_rows(batch):
                    fh.write(row + "\n")
                n += batch.num_rows
        counts[name] = n
    return counts


def write_jsonl_gz(tables: dict[str, "ray.data.Dataset"], out_prefix: str,
                   sharded: bool = True) -> dict[str, int]:
    """Gz-JSONL export (the interchange format modern training-data
    consumers ingest): binary columns as lowercase hex, floats 1-dp
    (the CSV sink's F4/F5 rendering discipline so both compat sinks
    agree byte-for-byte on shared cells), NaN-free canonical JSON.

    ``sharded=True`` writes ``<prefix><table>/part-<i>.jsonl.gz`` one
    file per input block IN PARALLEL via map_batches (the scale path —
    no single-writer bottleneck, resumable per part); ``False`` keeps
    the single-file compat stream like write_csv_gz."""
    counts: dict[str, int] = {}
    for name, ds in tables.items():
        if sharded:
            counts[name] = _sharded_gz_dump(ds, f"{out_prefix}{name}",
                                            render_jsonl_lines, "jsonl")
        else:
            n = 0
            with gzip.open(f"{out_prefix}{name}.jsonl.gz", "wt",
                           encoding="utf-8") as fh:
                for batch in ds.iter_batches(batch_format="pyarrow",
                                             batch_size=8192):
                    for line in render_jsonl_lines(batch):
                        fh.write(line + "\n")
                    n += batch.num_rows
            counts[name] = n
    return counts


# printable ASCII minus the two JSON specials (0x22 ", 0x5C \) — cells
# matching this need no escaping, so the '"' + s + '"' fast path is
# byte-identical to json.dumps(s) with its default ensure_ascii=True
_JSON_CLEAN = r"^[ !#-\[\]-~]*$"


def render_jsonl_lines(batch: pa.Table) -> "np.ndarray":
    """Column-at-a-time JSONL render, byte-identical to the previous
    per-row ``json.dumps(rec, separators=(',', ':'))`` loop: null-free
    int columns format via one C-level ``np.char.mod``; clean-ASCII
    string cells quote-wrap without touching json.dumps (a vectorized
    regex picks the rare cells that need real escaping); binary cells
    hex via the C ``bytes.hex``; floats keep the exact round(., 1) +
    dumps rendering.  Fragments stitch with the fixed per-column key
    prefixes — no per-row dict is ever built."""
    import json
    import re

    n = batch.num_rows
    frags: list[tuple[str, "np.ndarray"]] = []
    for i, name in enumerate(batch.schema.names):
        col = batch.column(i)
        t = batch.schema.field(i).type
        key = json.dumps(name) + ":"
        if pa.types.is_integer(t) and col.null_count == 0:
            frag = np.char.mod(
                "%d", col.to_numpy(zero_copy_only=False)).astype(object)
        elif pa.types.is_string(t) and col.null_count == 0:
            vals = np.asarray(col.to_pylist(), dtype=object)
            pat = re.compile(_JSON_CLEAN)
            # fullmatch, not match: '$' matches BEFORE a trailing
            # newline, which would send 'abc\n' down the raw fast path
            # and emit a corrupt two-line JSONL record
            clean = np.fromiter((pat.fullmatch(v) is not None
                                 for v in vals), bool, len(vals))
            frag = '"' + vals + '"'
            bad = np.nonzero(~clean)[0]
            for j in bad:
                frag[j] = json.dumps(vals[j])
        elif pa.types.is_binary(t):
            frag = np.asarray(
                ["null" if v is None else '"' + v.hex() + '"'
                 for v in col.to_pylist()], dtype=object)
        elif pa.types.is_floating(t):
            frag = np.asarray(
                ["null" if v is None
                 else json.dumps(round(float(v), 1), allow_nan=False)
                 for v in col.to_pylist()], dtype=object)
        else:
            frag = np.asarray(
                [json.dumps(v, allow_nan=False)
                 for v in col.to_pylist()], dtype=object)
        frags.append((key, frag))

    out = np.full(n, "{", dtype=object)
    for i, (key, frag) in enumerate(frags):
        out = out + (("," if i else "") + key) + frag
    return out + "}"


# ------------------------------------------------------------- PGCOPY binary

PGCOPY_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"


def _pg_field(val, typ: pa.DataType, jsonb: bool = False) -> bytes:
    """One field in PostgreSQL binary COPY framing: int32 length +
    big-endian payload (-1 for NULL) — the reference's use_binary path
    (populate_* binary writers, /root/reference/src/postgiswriter.cpp:
    860-1000).  ``jsonb`` frames a string cell as PostgreSQL ``jsonb``
    binary (jsonb_send): version byte 1 before the UTF-8 text — the
    reference emits json via its TEXT path (pack_jsontags,
    /root/reference/src/postgiswriter.cpp:111-146), so this is the
    binary-COPY completion of that surface, opt-in per column."""
    import struct
    if val is None:
        return struct.pack("!i", -1)
    if pa.types.is_int64(typ) or pa.types.is_int32(typ):
        width = 8 if pa.types.is_int64(typ) else 4
        return struct.pack("!i", width) + int(val).to_bytes(width, "big", signed=True)
    if pa.types.is_floating(typ):
        return struct.pack("!id", 8, float(val))
    if pa.types.is_string(typ):
        b = str(val).encode("utf-8")
        if jsonb:
            return struct.pack("!i", len(b) + 1) + b"\x01" + b
        return struct.pack("!i", len(b)) + b
    if pa.types.is_binary(typ):
        return struct.pack("!i", len(val)) + bytes(val)
    if pa.types.is_map(typ):
        # PostgreSQL hstore binary wire format (hstore_send/hstore_recv):
        # int32 pair count, then per pair int32 key length + key bytes
        # (keys are never NULL) and int32 value length (-1 for NULL) +
        # value bytes, all big-endian — the reference's use_binary path
        # emits othertags this way (pack_hstoretags_binary, used at
        # /root/reference/src/postgiswriter.cpp:225,:823).  Arrow map
        # cells arrive from to_pylist as [(k, v), ...].
        parts = [struct.pack("!i", len(val))]
        for k, v in val:
            kb = str(k).encode("utf-8")
            parts.append(struct.pack("!i", len(kb)) + kb)
            if v is None:
                parts.append(struct.pack("!i", -1))
            else:
                vb = str(v).encode("utf-8")
                parts.append(struct.pack("!i", len(vb)) + vb)
        payload = b"".join(parts)
        return struct.pack("!i", len(payload)) + payload
    raise TypeError(f"no PGCOPY encoding for {typ}")


def _pg_ragged(col, typ: pa.DataType, jsonb: bool = False):
    """One column as a ragged payload: (plen, payload) where ``plen``
    is the per-row int32 length-prefix VALUE (-1 for NULL) and
    ``payload`` is every row's field bytes concatenated in row order
    (NULL rows contribute nothing).  Fixed-width and varlen columns
    build through numpy casts / Arrow buffers — zero per-row Python;
    map (hstore) cells keep the _pg_field loop (nested framing on a
    compat surface whose scale path is parquet)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    null = arr.is_null().to_numpy(zero_copy_only=False)
    if pa.types.is_int64(typ) or pa.types.is_int32(typ):
        w = 8 if pa.types.is_int64(typ) else 4
        vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
        plen = np.where(null, np.int32(-1), np.int32(w)).astype(np.int32)
        pay = vals[~null].astype(f">i{w}").tobytes()
        return plen, pay
    if pa.types.is_floating(typ):
        vals = arr.fill_null(0.0).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        plen = np.where(null, np.int32(-1), np.int32(8)).astype(np.int32)
        return plen, vals[~null].astype(">f8").tobytes()
    if pa.types.is_string(typ) or pa.types.is_binary(typ):
        filled = arr.fill_null("" if pa.types.is_string(typ) else b"")
        # offsets/data buffers: per-row byte extents, already row-order
        off = np.frombuffer(filled.buffers()[1], np.int32)[
            filled.offset: filled.offset + n + 1].astype(np.int64)
        lens = np.diff(off)
        dbuf = filled.buffers()[2]
        data = np.frombuffer(dbuf, np.uint8)[off[0]:off[-1]] \
            if dbuf is not None else np.empty(0, np.uint8)
        if not jsonb:
            plen = np.where(null, -1, lens).astype(np.int32)
            return plen, data.tobytes()
        # jsonb: version byte 1 precedes each non-null row's text
        plen = np.where(null, -1, lens + 1).astype(np.int32)
        kl = lens[~null]
        starts = np.concatenate(([0], np.cumsum(kl + 1)[:-1])) \
            if kl.size else np.empty(0, np.int64)
        out = np.empty(int((kl + 1).sum()), np.uint8)
        out[starts] = 1
        if kl.sum():
            so = off[:-1][~null] - off[0]
            intra = np.arange(int(kl.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(kl)[:-1])), kl)
            out[np.repeat(starts + 1, kl) + intra] = \
                data[np.repeat(so, kl) + intra]
        return plen, out.tobytes()
    # nested (hstore map) / anything else: per-row framing, re-split
    fields = [_pg_field(v, typ, jsonb) for v in arr.to_pylist()]
    plen = np.array([len(f) - 4 if not nl else -1
                     for f, nl in zip(fields, null)], np.int32)
    return plen, b"".join(f[4:] for f in fields)


def render_pgcopy_batch(batch: pa.Table,
                        json_cols: frozenset = frozenset()) -> bytes:
    """Rows of an Arrow batch as PGCOPY binary tuples (no header).

    Columnar assembly (the JSONL-sink vectorization pattern): each
    column renders ONCE into (length-prefix values, concatenated
    payload); one pass then scatters prefixes (big-endian int32 view)
    and payload segments (ragged gather: repeat + intra-offset index)
    into a single preallocated buffer — no per-row, per-field Python.
    ``json_cols`` names string columns to frame as binary ``jsonb``
    (version byte 1 + text)."""
    n, c = batch.num_rows, batch.num_columns
    if n == 0:
        return b""
    ragged = [_pg_ragged(batch.column(i), f.type, f.name in json_cols)
              for i, f in enumerate(batch.schema)]
    field_sizes = [4 + np.maximum(pl.astype(np.int64), 0)
                   for pl, _ in ragged]
    row_len = np.full(n, 2, np.int64)
    for fs in field_sizes:
        row_len += fs
    out = np.empty(int(row_len.sum()), np.uint8)
    row_start = np.concatenate(([0], np.cumsum(row_len)[:-1]))
    nf = np.array([c], dtype=">i2").view(np.uint8)
    out[row_start] = nf[0]
    out[row_start + 1] = nf[1]
    off = row_start + 2
    for (plen, pay), fs in zip(ragged, field_sizes):
        out[off[:, None] + np.arange(4)] = \
            plen.astype(">i4").view(np.uint8).reshape(n, 4)
        seg = np.maximum(plen.astype(np.int64), 0)
        total = int(seg.sum())
        if total:
            m = seg > 0
            sl = seg[m]
            intra = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(sl)[:-1])), sl)
            out[np.repeat(off[m] + 4, sl) + intra] = \
                np.frombuffer(pay, np.uint8)
        off = off + fs
    return out.tobytes()


def write_pgcopy(tables: dict[str, ray.data.Dataset], out_prefix: str,
                 sharded: bool = False,
                 json_cols: frozenset = frozenset()) -> dict[str, int]:
    """M5/S2 bit-compat surface: one ``<prefix><table>.copy`` per table in
    PostgreSQL binary COPY format (signature + flags + extension header,
    int16 field count + int32-length-framed big-endian fields per row,
    -1 trailer) — byte-diffable against a real ``COPY ... WITH BINARY``
    dump of the reference's output tables.

    ``sharded=True`` writes ``<prefix><table>/part-<i>.copy`` IN
    PARALLEL, each part a complete standalone COPY file (own signature
    + trailer — PostgreSQL ingests parts as independent COPY commands),
    the scale path mirroring the CSV/JSONL sharded modes."""
    import struct
    counts: dict[str, int] = {}
    for name, ds in tables.items():
        if sharded:
            import os

            import pyarrow.compute as pc
            d = f"{out_prefix}{name}"
            os.makedirs(d, exist_ok=True)

            def dump(batch: pa.Table, d=d, _jc=json_cols) -> pa.Table:
                tid = ray.get_runtime_context().get_task_id()
                path = os.path.join(d, f"part-{tid[:16]}.copy")
                # first touch in this process truncates (the
                # _sharded_gz_dump retry discipline)
                fresh = path not in _PART_TOUCHED
                _PART_TOUCHED.add(path)
                with open(path, "wb" if fresh else "r+b") as fh:
                    if fresh:
                        fh.write(PGCOPY_SIGNATURE + struct.pack("!ii", 0, 0))
                    else:
                        fh.seek(-2, 2)  # overwrite this part's trailer
                    fh.write(render_pgcopy_batch(batch, _jc))
                    fh.write(struct.pack("!h", -1))
                return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

            parts = ds.map_batches(dump, batch_format="pyarrow")
            counts[name] = sum(
                int(pc.sum(b.column("n")).as_py() or 0)
                for b in parts.iter_batches(batch_format="pyarrow"))
            continue
        n = 0
        with open(f"{out_prefix}{name}.copy", "wb") as fh:
            fh.write(PGCOPY_SIGNATURE + struct.pack("!ii", 0, 0))
            for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
                fh.write(render_pgcopy_batch(batch, json_cols))
                n += batch.num_rows
            fh.write(struct.pack("!h", -1))
        counts[name] = n
    return counts


def null_sink_counts(tables: dict[str, ray.data.Dataset]) -> dict[str, tuple[int, int]]:
    """S4 dry-run: (rows, approx bytes) per table, nothing written."""
    out: dict[str, tuple[int, int]] = {}
    for name, ds in tables.items():
        rows = 0
        nbytes = 0
        for batch in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
            rows += batch.num_rows
            nbytes += batch.nbytes
        out[name] = (rows, nbytes)
    return out
