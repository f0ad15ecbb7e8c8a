"""Tests for the compat CSV sink (S3), null sink (S4), pluggable
routing (M3), JSON property view (V3), and way simplify (V1/F10)."""

import gzip

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray import sinks


def test_csv_gz_sink_roundtrip(tmp_path):
    ds = ray.data.from_arrow(pa.table({
        "osm_id": pa.array([1, 2], pa.int64()),
        "name": pa.array(["a b", "line\nbreak"], pa.string()),
        "length": pa.array([1.25, 3.0], pa.float64()),
        "way": pa.array([b"\x01\x02", b"\xff"], pa.binary()),
    }))
    counts = sinks.write_csv_gz({"line": ds}, str(tmp_path) + "/t_")
    assert counts == {"line": 2}
    with gzip.open(str(tmp_path) + "/t_line.csv.gz", "rt", encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    assert lines[0] == sinks.DELIM.join(["osm_id", "name", "length", "way"])
    r1 = lines[1].split(sinks.DELIM)
    assert r1[0] == "1"
    assert r1[1] == sinks.QUOTE + "a b" + sinks.QUOTE      # F1 quoting
    assert r1[2] == "1.2" or r1[2] == "1.2"                # F5 1-dp
    assert r1[3] == "0102"                                  # F4 hex
    assert lines[2].split(sinks.DELIM)[1] == sinks.QUOTE + "line\\nbreak" + sinks.QUOTE


def test_null_sink_counts():
    ds = ray.data.range(100).map_batches(
        lambda t: pa.table({"x": t.column("id")}), batch_format="pyarrow")
    out = sinks.null_sink_counts({"t": ds})
    assert out["t"][0] == 100 and out["t"][1] > 0


def test_pluggable_alloc(sf_dir):
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables

    def every_third(name, batch: pa.Table) -> np.ndarray:
        # user routing: table gets rows whose doc_id % 3 == fixed index
        idx = {"point": 0, "line": 1, "polygon": 2, "highway": 1,
               "building": 2, "boundary": 2}[name]
        return (batch.column("doc_id").to_numpy() % 3) == idx

    tabs = output_tables(sf_dir, alloc=every_third)
    n_point = tabs["point"].count()
    import duckdb
    expect = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' WHERE doc_id % 3 = 0"
    ).fetchone()[0]
    assert n_point == expect


def test_json_props_deterministic(sf_dir):
    from osmquadtreepostgis_ray.sources.tables import read_table
    from osmquadtreepostgis_ray.stages.jsonview import json_props
    out = json_props(read_table(sf_dir, "documents", columns=["doc_id", "text"])).to_pandas()
    assert len(out) > 0
    import json as J
    for s in out["props_json"].head(20):
        obj = J.loads(s)  # valid JSON, int values, no zero counts
        assert all(isinstance(v, int) and v > 0 for v in obj.values())


def test_simplify_ways(sf_dir):
    from osmquadtreepostgis_ray.queries import q_simplify_ways
    df = q_simplify_ways(sf_dir).to_pandas()
    assert len(df) > 0
    assert (df["n_after"] <= df["n_before"]).all()
    assert (df["n_after"] >= 2).all()


def test_frame_sample(sf_dir):
    import pyarrow.compute as pc
    from osmquadtreepostgis_ray.functions import codecs, geotag
    from osmquadtreepostgis_ray.queries import q_frame_sample
    out = q_frame_sample(sf_dir, stride=2).to_pandas()
    assert len(out) > 0
    # frame structure: video doc_id has (doc_id % 4) + 2 frames, stride 2
    for vid, sub in out.groupby("video_id"):
        nf = int(vid) % 4 + 2
        assert sorted(sub["frame_idx"]) == list(range(0, nf, 2))
    # feature value: recompute one frame's mean independently
    row = out[(out["video_id"] == 0) & (out["frame_idx"] == 2)]
    if len(row):
        ph = int(geotag.phash_of(np.array([0]))[0])
        ref = codecs.synth_pixels(ph + 2, 16, 16)
        assert int(row["mean_pixel"].iloc[0]) == int(ref.mean())


def test_merge_latest_diff_semantics():
    """S1 diff-merge: union of base + change sets, latest version wins."""
    from osmquadtreepostgis_ray.sources.tables import merge_latest
    base = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "ver": pa.array([1, 1, 1], pa.int64()),
        "val": pa.array(["a", "b", "c"], pa.string()),
    }))
    changes = ray.data.from_arrow(pa.table({
        "id": pa.array([2, 4], pa.int64()),
        "ver": pa.array([2, 1], pa.int64()),
        "val": pa.array(["B", "d"], pa.string()),
    }))
    out = merge_latest(base, changes, key="id", version="ver").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == [1, 2, 3, 4]
    assert out["val"].tolist() == ["a", "B", "c", "d"]


def test_api_surface(tmp_path, sf_dir):
    """Reference-parity entry points (write_to_postgis/write_to_csvfile
    analogs, /root/reference osmquadtreepostgis/__init__.py:465-591)."""
    from osmquadtreepostgis_ray import api

    # dry-run counting sink (connstring='null' analog)
    counts = api.write_to_table_dir(sf_dir, None)
    assert set(counts) == {"point", "line", "polygon", "highway", "building", "boundary"}
    assert all(isinstance(v, tuple) for v in counts.values())

    # full export with lineage
    metrics = api.write_to_table_dir(sf_dir, str(tmp_path / "pg"))
    assert pa.compute.sum(metrics.column("rows")).as_py() > 0

    # csv.gz sink
    out = api.write_to_csvfile(sf_dir, str(tmp_path) + "/csv_")
    assert out["point"] > 0
    import glob
    assert len(glob.glob(str(tmp_path) + "/csv_*.csv.gz")) == 6

    # block-capture mode
    cap = api.write_to_csvfile(sf_dir, None)
    assert len(cap["point"]) == out["point"]


def test_validate_geometry_helper():
    from osmquadtreepostgis_ray import api
    from osmquadtreepostgis_ray.functions import ewkb
    # open, duplicated-vertex, CW-wound ring -> repaired closed CCW
    ring = [[0, 0], [0, 4], [0, 4], [4, 4], [4, 0]]
    wkb, pt = api.validate_geometry([ring])
    gtype, srid, rings = ewkb.parse(wkb)
    assert gtype == ewkb.WKB_POLYGON and srid == 3857
    r = rings[0]
    assert (r[0] == r[-1]).all()          # closed
    from osmquadtreepostgis_ray.functions.geometry import ring_signed_area
    assert ring_signed_area(r) > 0        # outer CCW
    ptype, _, p = ewkb.parse(pt)
    assert ptype == ewkb.WKB_POINT
    assert 0 < p[0] < 4 and 0 < p[1] < 4  # interior
    # degenerate input -> (None, None)
    assert api.validate_geometry([[[0, 0], [1, 1]]]) == (None, None)


def test_custom_style_flows_to_schema_and_projection(sf_dir):
    from osmquadtreepostgis_ray.config import EngineParams, Style
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    style = Style(feature_keys=("spark", "vector"))
    p = EngineParams(style=style)
    tabs = output_tables(sf_dir, p)
    names = tabs["point"].schema().names
    assert "kv_spark" in names and "kv_vector" in names and "kv_the" not in names
    df = tabs["point"].to_pandas()
    assert (df["kv_spark"] >= 0).all()


def test_salted_join_matches_plain():
    """Salted skew join must produce exactly the plain join's rows."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join, salted_bucket_join
    rng = np.random.RandomState(11)
    # heavy skew: 80% of left rows hit key 7
    lk = np.where(rng.rand(5000) < 0.8, 7, rng.randint(0, 50, 5000)).astype(np.int64)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "lv": pa.array(np.arange(5000), pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
        "rv": pa.array(np.arange(50) * 10, pa.int64()),
    }))
    plain = bucket_hash_join(left, right, on="k").to_pandas() \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    salted = salted_bucket_join(left, right, on="k",
                                hot_keys=np.array([7]), salt_mod=8).to_pandas() \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(plain[["k", "lv", "rv"]], salted[["k", "lv", "rv"]])


def test_pgcopy_binary_sink_roundtrip(tmp_path, sf_dir):
    """M5 byte-compat: the PGCOPY binary file parses back to the exact
    table (signature, flags, int16 field counts, int32-framed big-endian
    fields, -1 trailer)."""
    import struct

    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    from osmquadtreepostgis_ray.sinks import PGCOPY_SIGNATURE, write_pgcopy

    pt = output_tables(sf_dir)["point"]
    prefix = str(tmp_path / "pg_")
    counts = write_pgcopy({"point": pt}, prefix)
    ref = pt.to_pandas()
    assert counts["point"] == len(ref)

    raw = open(prefix + "point.copy", "rb").read()
    assert raw.startswith(PGCOPY_SIGNATURE)
    off = len(PGCOPY_SIGNATURE) + 8
    schema = pt.schema()
    rows = []
    while True:
        (nf,) = struct.unpack_from("!h", raw, off); off += 2
        if nf == -1:
            break
        fields = []
        for _ in range(nf):
            (ln,) = struct.unpack_from("!i", raw, off); off += 4
            fields.append(None if ln == -1 else raw[off:off + ln])
            off = off + max(ln, 0)
        rows.append(fields)
    assert off == len(raw)
    assert len(rows) == len(ref)
    # spot-check first row against the dataframe, per declared type
    import pyarrow as _pa
    r0 = rows[0]
    for j, (name, typ) in enumerate(zip(schema.names, schema.types)):
        got = r0[j]
        want = ref.iloc[0][name]
        if _pa.types.is_int64(typ):
            assert int.from_bytes(got, "big", signed=True) == int(want)
        elif _pa.types.is_string(typ):
            assert got.decode() == str(want)
        elif _pa.types.is_binary(typ):
            assert got == bytes(want)


def test_jsonl_gz_sink_roundtrip(tmp_path, sf_dir):
    """write_jsonl_gz: sharded and single-file outputs decode to the
    same records as the source Dataset (hex binary, 1-dp floats), and
    the sharded path writes one part per block."""
    import glob
    import gzip
    import json

    import ray.data
    from osmquadtreepostgis_ray.sinks import write_jsonl_gz

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet") \
        .select_columns(["event_id", "event_type", "value"])
    rows = {r["event_id"]: r for r in ds.take_all()}

    out = str(tmp_path) + "/"
    counts = write_jsonl_gz({"events": ds}, out, sharded=True)
    assert counts["events"] == len(rows)
    got = {}
    for f in glob.glob(f"{out}events/part-*.jsonl.gz"):
        with gzip.open(f, "rt", encoding="utf-8") as fh:
            for line in fh:
                rec = json.loads(line)
                got[rec["event_id"]] = rec
    assert len(got) == len(rows)
    for eid, rec in got.items():
        assert rec["event_type"] == rows[eid]["event_type"]
        assert rec["value"] == round(float(rows[eid]["value"]), 1)

    counts1 = write_jsonl_gz({"events": ds}, out + "single_",
                             sharded=False)
    assert counts1["events"] == len(rows)
    with gzip.open(f"{out}single_events.jsonl.gz", "rt",
                   encoding="utf-8") as fh:
        single = [json.loads(l) for l in fh]
    assert {r["event_id"] for r in single} == set(rows)


def test_jsonl_render_vectorized_byte_equal():
    """render_jsonl_lines is byte-identical to the per-row
    json.dumps(rec, separators=(',', ':')) reference on a batch mixing
    nulls, escapes, non-ASCII, binary, floats, ints, and bools."""
    import json

    batch = pa.table({
        "i": pa.array([1, -7, None, 2**40], pa.int64()),
        "s": pa.array(['plain', 'quo"te\\back\n', 'unïcodé', ''], pa.string()),
        "f": pa.array([1.25, None, -0.04, 3.0], pa.float64()),
        "b": pa.array([b"\x01\xff", None, b"", b"\x00"], pa.binary()),
        "t": pa.array([True, False, None, True], pa.bool_()),
    })

    def ref_render(batch):
        cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
        types = [f.type for f in batch.schema]
        names = batch.schema.names
        out = []
        for r in range(batch.num_rows):
            rec = {}
            for name, col, t in zip(names, cols, types):
                v = col[r]
                if v is not None and pa.types.is_binary(t):
                    v = v.hex()
                elif v is not None and pa.types.is_floating(t):
                    v = round(float(v), 1)
                rec[name] = v
            out.append(json.dumps(rec, separators=(",", ":"),
                                  allow_nan=False, sort_keys=False))
        return out

    got = list(sinks.render_jsonl_lines(batch))
    assert got == ref_render(batch)

    # trailing newline must NOT take the raw fast path ('$' matches
    # before a final newline; fullmatch does not)
    tricky = pa.table({"s": pa.array(["abc\n", "\n", "tab\there"],
                                     pa.string())})
    got_t = list(sinks.render_jsonl_lines(tricky))
    assert got_t == ref_render(tricky)
    import json as _json
    for line in got_t:
        _json.loads(line)
        assert "\n" not in line

    # NaN floats raise loudly (allow_nan=False discipline)
    import pytest as _pytest
    bad = pa.table({"f": pa.array([float("nan")], pa.float64())})
    with _pytest.raises(ValueError):
        sinks.render_jsonl_lines(bad)

    # null-free all-int fast path too
    fast = pa.table({"a": pa.array([0, 5], pa.int64()),
                     "s": pa.array(["x", "y"], pa.string())})
    assert list(sinks.render_jsonl_lines(fast)) == ref_render(fast)


def test_csv_gz_sharded_roundtrip(tmp_path):
    """Sharded CSV parts concatenate to the same rows as the
    single-file mode (headerless parts, same rendering)."""
    df = pd.DataFrame({
        "osm_id": np.arange(500, dtype=np.int64),
        "name": [f"n{i}" for i in range(500)],
        "z": np.arange(500, dtype=np.float64) / 4,
    })
    ds = ray.data.from_pandas(df).repartition(6)
    counts = sinks.write_csv_gz({"pt": ds}, str(tmp_path) + "/sh_",
                                sharded=True)
    assert counts == {"pt": 500}
    import glob
    rows = []
    for p in sorted(glob.glob(str(tmp_path) + "/sh_pt/part-*.csv.gz")):
        with gzip.open(p, "rt", encoding="utf-8") as fh:
            rows += fh.read().splitlines()
    assert len(rows) == 500
    got = sorted(int(r.split(sinks.DELIM)[0]) for r in rows)
    assert got == list(range(500))
    # cell rendering identical to the single-file surface
    sample = [r for r in rows if r.startswith("7" + sinks.DELIM)][0]
    assert sample.split(sinks.DELIM)[1] == sinks.QUOTE + "n7" + sinks.QUOTE
    assert sample.split(sinks.DELIM)[2] == "1.8"


def test_pgcopy_hstore_binary_cell():
    """Map-typed columns encode as PostgreSQL binary hstore: int32
    pair count + length-framed k/v (NULL value = -1), matching the
    reference's pack_hstoretags_binary framing
    (/root/reference/src/postgiswriter.cpp:812-826)."""
    import struct

    typ = pa.map_(pa.string(), pa.string())
    cell = [("highway", "primary"), ("oneway", None)]
    got = sinks._pg_field(cell, typ)
    want_payload = (
        struct.pack("!i", 2)
        + struct.pack("!i", 7) + b"highway"
        + struct.pack("!i", 7) + b"primary"
        + struct.pack("!i", 6) + b"oneway"
        + struct.pack("!i", -1))
    assert got == struct.pack("!i", len(want_payload)) + want_payload
    # empty hstore: zero pairs, 4-byte payload
    assert sinks._pg_field([], typ) == struct.pack("!ii", 4, 0)
    # NULL column value: -1 field length, no payload
    assert sinks._pg_field(None, typ) == struct.pack("!i", -1)


def test_pgcopy_roundtrip_with_hstore(tmp_path):
    """PGCOPY file with an hstore column parses back: signature, per
    row int16 field count, framed fields, -1 trailer."""
    import struct

    tags = pa.array([[("a", "1"), ("b", None)], [], None],
                    pa.map_(pa.string(), pa.string()))
    ds = ray.data.from_arrow(pa.table({
        "osm_id": pa.array([10, 11, 12], pa.int64()),
        "tags": tags}))
    counts = sinks.write_pgcopy({"pt": ds}, str(tmp_path) + "/h_")
    assert counts == {"pt": 3}
    raw = open(str(tmp_path) + "/h_pt.copy", "rb").read()
    assert raw.startswith(sinks.PGCOPY_SIGNATURE)
    off = len(sinks.PGCOPY_SIGNATURE) + 8
    rows = []
    while True:
        (nf,) = struct.unpack_from("!h", raw, off)
        off += 2
        if nf == -1:
            break
        fields = []
        for _ in range(nf):
            (ln,) = struct.unpack_from("!i", raw, off)
            off += 4
            if ln == -1:
                fields.append(None)
            else:
                fields.append(raw[off:off + ln])
                off += ln
        rows.append(fields)
    assert off == len(raw)
    assert len(rows) == 3
    assert int.from_bytes(rows[0][0], "big") == 10
    # row 0 hstore: 2 pairs, second value NULL
    h = rows[0][1]
    assert struct.unpack_from("!i", h, 0)[0] == 2
    assert h[8:9] == b"a"
    assert rows[1][1] == struct.pack("!i", 0)  # empty map -> 0 pairs
    assert rows[2][1] is None                  # NULL hstore


def test_pgcopy_sharded_parts_parse(tmp_path):
    """Sharded PGCOPY parts are each complete standalone COPY files
    (signature + rows + trailer) and together hold every row."""
    import glob
    import struct

    df = pd.DataFrame({"osm_id": np.arange(300, dtype=np.int64),
                       "name": [f"n{i}" for i in range(300)]})
    ds = ray.data.from_pandas(df).repartition(5)
    counts = sinks.write_pgcopy({"pt": ds}, str(tmp_path) + "/sp_",
                                sharded=True)
    assert counts == {"pt": 300}
    total = []
    parts = glob.glob(str(tmp_path) + "/sp_pt/part-*.copy")
    assert len(parts) > 1  # actually parallel
    for p in parts:
        raw = open(p, "rb").read()
        assert raw.startswith(sinks.PGCOPY_SIGNATURE)
        off = len(sinks.PGCOPY_SIGNATURE) + 8
        while True:
            (nf,) = struct.unpack_from("!h", raw, off)
            off += 2
            if nf == -1:
                break
            assert nf == 2
            for _ in range(nf):
                (ln,) = struct.unpack_from("!i", raw, off)
                off += 4
                if ln == -1:
                    continue
                if _ == 0:
                    total.append(int.from_bytes(raw[off:off + ln], "big"))
                off += ln
        assert off == len(raw)  # exactly one trailer, at the end
    assert sorted(total) == list(range(300))


def test_pgcopy_jsonb_binary_cell():
    """String cells framed as binary jsonb carry version byte 1 before
    the UTF-8 text (jsonb_send) — the binary-COPY completion of the
    reference's text json path (pack_jsontags,
    /root/reference/src/postgiswriter.cpp:111-146)."""
    import struct

    got = sinks._pg_field('{"a": 1}', pa.string(), jsonb=True)
    assert got == struct.pack("!i", 9) + b"\x01" + b'{"a": 1}'
    # NULL json: plain -1 framing, no version byte
    assert sinks._pg_field(None, pa.string(), jsonb=True) == \
        struct.pack("!i", -1)
    # non-json strings are unaffected
    assert sinks._pg_field("x", pa.string()) == struct.pack("!i", 1) + b"x"


def test_pgcopy_render_vectorized_byte_identity():
    """The columnar renderer is byte-identical to a per-row _pg_field
    loop across every supported type, null patterns and jsonb cols."""
    import struct

    def slow(batch, json_cols=frozenset()):
        types = [f.type for f in batch.schema]
        names = [f.name for f in batch.schema]
        cols = [batch.column(i).to_pylist()
                for i in range(batch.num_columns)]
        nf = struct.pack("!h", batch.num_columns)
        return b"".join(
            nf + b"".join(sinks._pg_field(c[r], t, nm in json_cols)
                          for c, t, nm in zip(cols, types, names))
            for r in range(batch.num_rows))

    rng = np.random.default_rng(5)
    n = 500
    tab = pa.table({
        "i64": pa.array([None if i % 11 == 0 else int(v) for i, v in
                         enumerate(rng.integers(-2**40, 2**40, n))],
                        pa.int64()),
        "i32": pa.array(np.arange(n, dtype=np.int32) - 250, pa.int32()),
        "x": pa.array([None if i % 13 == 0 else float(v) for i, v in
                       enumerate(rng.standard_normal(n))], pa.float64()),
        "s": pa.array([None if i % 7 == 0 else f"né{i}"
                       for i in range(n)]),
        "j": pa.array([None if i % 5 == 0 else '{"k": %d}' % i
                       for i in range(n)]),
        "b": pa.array([None if i % 3 == 0 else bytes([i % 256])
                       for i in range(n)], pa.binary()),
        "h": pa.array([None if i % 4 == 0 else [("k", str(i))]
                       for i in range(n)],
                      pa.map_(pa.string(), pa.string())),
    })
    jc = frozenset({"j"})
    assert sinks.render_pgcopy_batch(tab, jc) == slow(tab, jc)
    assert sinks.render_pgcopy_batch(tab.slice(0, 0)) == b""
    # sliced (non-zero offset) batches hit the Arrow buffer-offset path
    sl = tab.slice(101, 57)
    assert sinks.render_pgcopy_batch(sl, jc) == slow(sl, jc)
