"""Tests for geometry assembly (A1-A4), checkpoint/resume lineage, and
skew-aware repartitioning."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from osmquadtreepostgis_ray.functions.geometry import stitch_chains
from osmquadtreepostgis_ray.stages.assembly import _assemble_group


# ------------------------------------------------------------- stitching

def test_stitch_open_chain_any_order():
    # path 0-1-2-3 given as shuffled undirected edges
    edges = [(11, 2, 3), (7, 1, 0), (5, 2, 1)]
    chains = stitch_chains(edges)
    assert len(chains) == 1
    closed, path = chains[0]
    assert not closed
    assert path in ([0, 1, 2, 3], [3, 2, 1, 0])
    assert path[0] == 0  # starts at smallest degree-1 node


def test_stitch_two_rings_mixed():
    # ring A: 0-1-2-0, ring B: 5-6-7-8-5, shuffled together
    edges = [(9, 6, 5), (1, 1, 0), (4, 2, 1), (3, 8, 5), (2, 0, 2),
             (8, 7, 6), (6, 8, 7)]
    chains = stitch_chains(edges)
    rings = [set(p[:-1]) for c, p in chains if c]
    assert len(chains) == 2 and all(c for c, _ in chains)
    assert {frozenset(r) for r in rings} == {frozenset({0, 1, 2}), frozenset({5, 6, 7, 8})}
    # rings start at their smallest node and close
    for c, p in chains:
        assert p[0] == min(p) and p[0] == p[-1]


def test_stitch_ring_plus_tail():
    # ring 0-1-2-0 with a dangling tail 2-9
    edges = [(1, 0, 1), (2, 1, 2), (3, 2, 0), (4, 2, 9)]
    chains = stitch_chains(edges)
    kinds = sorted((c, len(p)) for c, p in chains)
    assert len(chains) == 2
    assert any(not c for c, _ in chains) and any(c for c, _ in chains)


# -------------------------------------------------------------- assembly

def _group_df(ids, texts):
    from osmquadtreepostgis_ray.functions import geotag
    ids = np.asarray(ids, dtype=np.int64)
    ph = geotag.phash_of(ids)
    lon, lat = geotag.lonlat_milli_from_phash(ph)
    return pd.DataFrame({
        "doc_id": ids, "group_id": ids // 8, "lon_milli": lon, "lat_milli": lat,
        "close_hit": [t.count("merge") for t in texts], "phash": ph,
    })


def test_assemble_open_line_order_invariant():
    g = _group_df([16, 17, 18, 19], ["a", "b", "c", "d"])
    out1 = _assemble_group(g)
    out2 = _assemble_group(g.sample(frac=1, random_state=7))
    assert out1.iloc[0]["kind"] == "line"
    assert out1.iloc[0]["n_points"] == 4
    pd.testing.assert_frame_equal(out1.reset_index(drop=True), out2.reset_index(drop=True))


def test_assemble_closed_two_rings():
    ids = list(range(24, 32))  # k=8 -> two rings of 4
    g = _group_df(ids, ["merge"] + ["x"] * 7)
    out = _assemble_group(g)
    assert list(out["kind"]) == ["polygon", "polygon"]
    assert list(out["part"]) == [1, 2]
    assert list(out["n_points"]) == [5, 5]
    assert (out["osm_id"] == -3).all()  # M9 negation
    assert (out["measure2"] >= 0).all()


def test_assemble_small_closed_single_ring():
    ids = [40, 41, 42]
    g = _group_df(ids, ["merge", "y", "z"])
    out = _assemble_group(g)
    assert list(out["kind"]) == ["polygon"]
    assert out.iloc[0]["n_points"] == 4


def test_assemble_singleton_point():
    out = _assemble_group(_group_df([80], ["solo"]))
    assert out.iloc[0]["kind"] == "point" and out.iloc[0]["measure2"] == 0


# ------------------------------------------------------------ checkpoint

def test_resumable_write_and_resume(tmp_path):
    from osmquadtreepostgis_ray.state import checkpoint as C

    n = 400
    rng = np.random.RandomState(3)
    tile = ((rng.randint(0, 4 ** 8, n).astype(np.int64)) << 6) | 8
    ds = ray.data.from_arrow(pa.table({
        "tile": pa.array(tile, pa.int64()),
        "val": pa.array(np.arange(n), pa.int64()),
    }))
    out = str(tmp_path / "ck")
    m1 = C.resumable_write(ds, out, key_col="tile", part_depth=2, run_id="r1")
    assert (pa.compute.sum(m1.column("rows")).as_py()) == n
    assert set(m1.column("status").to_pylist()) == {"done"}
    parts = m1.column("part").to_pylist()
    assert len(parts) == len(set(parts))

    # data on disk matches
    back = C.read_data(out)
    assert back.count() == n

    # simulate a killed run: delete one manifest (its data dir survives)
    victim = parts[0]
    os.remove(os.path.join(out, "_manifest", f"{victim}.json"))
    m2 = C.resumable_write(ds, out, key_col="tile", part_depth=2, run_id="r2")
    st = {r["part"]: r["status"] for r in m2.to_pylist()}
    assert st[victim] == "done"  # recomputed
    assert all(s == "skipped" for p, s in st.items() if p != victim)
    rid = {r["part"]: r["run_id"] for r in m2.to_pylist()}
    assert rid[victim] == "r2"
    # total rows unchanged after resume (idempotent rewrite)
    assert C.read_data(out).count() == n
    man = C.read_manifest(out)
    assert pa.compute.sum(man.column("rows")).as_py() == n


# ------------------------------------------------------------------ skew

def test_split_hot_cells_bounds_groups():
    from osmquadtreepostgis_ray.functions import geotag, quadtree
    from osmquadtreepostgis_ray.stages.skew import split_hot_cells

    # 900 rows in one cell's area, 50 spread out
    rng = np.random.RandomState(1)
    lon_hot = 180_000 + rng.randint(0, 40, 900)   # tight cluster
    lat_hot = 80_000 + rng.randint(0, 40, 900)
    lon_cold = rng.randint(0, 360_000, 50)
    lat_cold = rng.randint(0, 170_000, 50)
    lon = np.r_[lon_hot, lon_cold].astype(np.int64)
    lat = np.r_[lat_hot, lat_cold].astype(np.int64)
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, 10)
    cell = quadtree.encode_ixy(ix, iy, 10)
    ds = ray.data.from_arrow(pa.table({
        "lon_milli": pa.array(lon), "lat_milli": pa.array(lat),
        "cell": pa.array(cell, pa.int64()),
    }))
    out = split_hot_cells(ds, max_rows=100, depth_delta=3, cell_col="cell")
    df = out.to_pandas()
    # cold rows keep their cell; hot rows get deeper cells
    hot_cells_in = set(cell[:900].tolist())
    got = df["group_cell"].to_numpy()
    depths = got & 63
    assert (depths[df["cell"].isin(hot_cells_in)] == 13).all()
    # group_cell is a pure function of the row: recompute independently
    fx2, fy2 = geotag.milli_to_fixed(df["lon_milli"].to_numpy(), df["lat_milli"].to_numpy())
    mask = depths == 13
    ix2, iy2 = quadtree.fixed_to_ixy(fx2[mask], fy2[mask], 13)
    assert (quadtree.encode_ixy(ix2, iy2, 13) == got[mask]).all()


def test_salt_keys_deterministic():
    from osmquadtreepostgis_ray.stages.skew import salt_keys
    keys = np.array([5, 5, 5, 9, 9], dtype=np.int64)
    ids = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    hot = np.array([5], dtype=np.int64)
    out = salt_keys(keys, ids, hot, salt_mod=4)
    assert out.tolist() == [20, 21, 22, 36, 36]


def test_export_resumable_roundtrip(tmp_path, sf_dir):
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.pipelines.flagship import export_resumable
    from osmquadtreepostgis_ray.state import checkpoint as C

    out = str(tmp_path / "exp")
    metrics = export_resumable(sf_dir, out)
    total = pa.compute.sum(metrics.column("rows")).as_py()
    assert total > 0
    # read back: per-table counts match the lazy flagship branches
    back = C.read_data(out)
    from osmquadtreepostgis_ray.queries import q_flagship_counts
    expect = {r["tbl"]: r["n"] for r in q_flagship_counts(sf_dir).to_pylist()}
    got = {}
    for b in back.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        for t in b.column("tbl").to_pylist():
            got[t] = got.get(t, 0) + 1
    assert {k: v for k, v in expect.items() if v} == got
    # resume is a no-op
    m2 = export_resumable(sf_dir, out)
    assert set(m2.column("status").to_pylist()) == {"skipped"}


def test_resumable_write_skew_split(tmp_path):
    from osmquadtreepostgis_ray.functions import quadtree
    from osmquadtreepostgis_ray.state import checkpoint as C

    # 900 rows in ONE deep tile (hot), 100 spread over others
    rng = np.random.RandomState(5)
    hot_ix, hot_iy = 37, 22
    hot_child = rng.randint(0, 4, (900, 2))  # children of the hot depth-2 part
    ix = hot_ix * 64 + hot_child[:, 0] * 16 + rng.randint(0, 16, 900)
    iy = hot_iy * 64 + hot_child[:, 1] * 16 + rng.randint(0, 16, 900)
    cold_ix = rng.randint(0, 256, 100)
    cold_iy = rng.randint(0, 256, 100)
    tiles = np.r_[quadtree.encode_ixy(ix, iy, 8),
                  quadtree.encode_ixy(cold_ix, cold_iy, 8)]
    ds = ray.data.from_arrow(pa.table({
        "tile": pa.array(tiles, pa.int64()),
        "v": pa.array(np.arange(1000), pa.int64()),
    }))
    out = str(tmp_path / "skew")
    m = C.resumable_write(ds, out, key_col="tile", part_depth=2,
                          max_rows_per_part=200, skew_depth_delta=2)
    rows = {r["part"]: r["rows"] for r in m.to_pylist()}
    assert sum(rows.values()) == 1000
    depths = {p & 63 for p in rows}
    assert 4 in depths          # hot part subdivided to depth 4
    assert max(rows.values()) <= 200 + 900 // 4  # bounded groups
    # resume: identical partitioning, everything skipped
    m2 = C.resumable_write(ds, out, key_col="tile", part_depth=2,
                           max_rows_per_part=200, skew_depth_delta=2)
    assert set(m2.column("status").to_pylist()) == {"skipped"}
    assert sorted(m2.column("part").to_pylist()) == sorted(rows)


def test_assemble_no_split_merges_parts():
    ids = list(range(24, 32))  # k=8 closed -> two rings
    g = _group_df(ids, ["merge"] + ["x"] * 7)
    split = _assemble_group(g, split_parts=True)
    merged = _assemble_group(g, split_parts=False)
    assert len(split) == 2 and len(merged) == 1
    assert merged.iloc[0]["part"] == 1
    assert merged.iloc[0]["n_points"] == split["n_points"].sum()
    assert merged.iloc[0]["measure2"] == split["measure2"].sum()


def test_round_geometry_flag():
    import pyarrow.parquet as pq

    from osmquadtreepostgis_ray.config import EngineParams
    from osmquadtreepostgis_ray.sources.images import _synth_meta_batch
    from osmquadtreepostgis_ray.spec import build_table_specs
    from osmquadtreepostgis_ray.stages.cells import encode_cells_batch
    from osmquadtreepostgis_ray.stages.project import ProjectTable
    from osmquadtreepostgis_ray.stages.routing import route_batch, table_filter
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    p = EngineParams(round_geometry=True)
    r = route_batch(encode_cells_batch(_synth_meta_batch(t), p), p)
    spec = build_table_specs(p.style, extended=True)["line"]
    sel = table_filter("line")(r)
    out = ProjectTable(spec, params=p)(sel)
    lengths = out.column("length").to_numpy()
    assert np.allclose(lengths, np.round(lengths, 1))


def test_quarantine_on_write_failure(tmp_path):
    """S6 crash forensics, writer UDF level: the failing block AND its
    predecessor dump to _quarantine as Arrow IPC + a JSON record that
    identifies partition, rows, schema, and error; no manifest commits."""
    import glob
    import json as _json

    from osmquadtreepostgis_ray.state import checkpoint as C
    out = str(tmp_path / "qr")

    def mkgroup(pid, vals):
        return pa.table({
            "tile": pa.array([(pid << 6) | 8] * len(vals), pa.int64()),
            "v": pa.array(vals, pa.int64()),
            "__part": pa.array([pid] * len(vals), pa.int64()),
        })

    def poisoned(table, path, **kw):
        if table.num_rows == 3:
            raise OSError("disk full (simulated)")
        return C.pq.write_table(table, path, **kw)

    fn = C._partition_writer(out, "tile", "r1", write_fn=poisoned)
    fn(mkgroup(5, [9, 9]))  # predecessor: succeeds
    with pytest.raises(OSError):
        fn(mkgroup(7, [1, 2, 3]))

    recs = glob.glob(out + "/_quarantine/part-7-*.json")
    assert len(recs) == 1
    rec = _json.load(open(recs[0]))
    assert rec["part"] == 7 and rec["rows"] == 3
    assert "disk full" in rec["error"] and rec["prev_part"] == 5

    # the failing block round-trips byte-exact from the IPC dump
    dump = recs[0][:-5] + ".arrow"
    got = pa.ipc.open_stream(pa.OSFile(dump, "rb")).read_all()
    assert got.equals(mkgroup(7, [1, 2, 3]).drop_columns(["__part"]))
    pred = recs[0][:-5] + "-pred.arrow"
    gotp = pa.ipc.open_stream(pa.OSFile(pred, "rb")).read_all()
    assert gotp.equals(mkgroup(5, [9, 9]).drop_columns(["__part"]))

    assert 7 not in C.completed_partitions(out)  # manifest gap names it
    assert 5 in C.completed_partitions(out)


def test_quarantine_end_to_end_and_resume(tmp_path):
    """S6 through the real resumable_write surface: a poisoned batch
    fails the run, the quarantine dump + manifest gap both identify the
    partition, and a resumed run recomputes ONLY that partition."""
    import glob
    import json as _json

    from osmquadtreepostgis_ray.state import checkpoint as C
    out = str(tmp_path / "qe2e")
    n = 200
    rng = np.random.RandomState(5)
    tile = ((rng.randint(0, 4 ** 6, n).astype(np.int64)) << 6) | 8
    ds = ray.data.from_arrow(pa.table({
        "tile": pa.array(tile, pa.int64()),
        "val": pa.array(np.arange(n), pa.int64()),
    }))
    from osmquadtreepostgis_ray.functions import quadtree
    victim = int(quadtree.at_depth(tile, 2)[0])

    def poison(table, path, **kw):
        if f"part={victim}" in str(path).replace(os.sep, "/"):
            raise ValueError("poisoned batch (simulated)")
        return C.pq.write_table(table, path, **kw)

    with pytest.raises(Exception):
        C.resumable_write(ds, out, key_col="tile", part_depth=2,
                          run_id="r1", _write_fn=poison)
    recs = glob.glob(out + f"/_quarantine/part-{victim}-*.json")
    assert recs, "quarantine record missing"
    assert _json.load(open(recs[0]))["part"] == victim
    assert victim not in C.completed_partitions(out)

    # resume with a healthy writer: victim recomputed, rest skipped or
    # already done; data complete and exact
    m2 = C.resumable_write(ds, out, key_col="tile", part_depth=2,
                           run_id="r2")
    st = {r["part"]: (r["status"], r["run_id"]) for r in m2.to_pylist()}
    assert st[victim] == ("done", "r2")
    assert C.read_data(out).count() == n
    got = sorted(C.read_data(out).to_pandas()["val"])
    assert got == list(range(n))


def test_incremental_update_matches_fresh_export(tmp_path, sf_dir):
    """Upsert 3 docs -> only their partitions recompute; result equals a
    from-scratch export of the merged corpus."""
    import duckdb
    import pyarrow.parquet as pqt

    from osmquadtreepostgis_ray.pipelines.flagship import tables_union_of
    from osmquadtreepostgis_ray.sources.images import _synth_meta_batch
    from osmquadtreepostgis_ray.sources.tables import read_table
    from osmquadtreepostgis_ray.state import checkpoint as C
    from osmquadtreepostgis_ray.state.incremental import partitions_of_docs, update_export

    base_out = str(tmp_path / "base")
    from osmquadtreepostgis_ray.pipelines.flagship import export_resumable
    export_resumable(sf_dir, base_out)
    n_parts_before = len(C.completed_partitions(base_out))

    # change 3 docs' captions (changes routing words for them)
    changes = pa.table({
        "doc_id": pa.array([1, 5, 9], pa.int64()),
        "text": pa.array(["merge merge row fast the", "slow slow", "data data data"], pa.string()),
    })
    metrics = update_export(base_out, sf_dir, changes)
    written = [r for r in metrics.to_pylist() if r["status"] == "done"]
    affected = set(partitions_of_docs(np.array([1, 5, 9])).tolist())
    assert {r["part"] for r in written} == affected  # ONLY affected parts ran
    assert len(C.completed_partitions(base_out)) == n_parts_before

    # ground truth: fresh export over merged corpus
    def merged_docs():
        base = read_table(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
        base = base[~base["doc_id"].isin([1, 5, 9])]
        merged = pd.concat([base, changes.to_pandas()], ignore_index=True)
        return ray.data.from_arrow(pa.Table.from_pandas(merged, preserve_index=False)) \
            .map_batches(_synth_meta_batch, batch_format="pyarrow")

    fresh_out = str(tmp_path / "fresh")
    C.resumable_write(tables_union_of(merged_docs()), fresh_out, key_col="tile", part_depth=4)

    def snapshot(d):
        import glob
        t = pa.concat_tables([pqt.read_table(f) for f in
                              sorted(glob.glob(d + "/data/part=*/*.parquet"))])
        df = t.to_pandas().drop(columns=["way", "way_point", "way_exterior"], errors="ignore")
        return df.sort_values(["tbl", "osm_id", "part"]).reset_index(drop=True)

    a, b = snapshot(base_out), snapshot(fresh_out)
    pd.testing.assert_frame_equal(a, b)


def test_incremental_update_with_skew_subdivision(tmp_path, sf_dir):
    """An export written with max_rows_per_part stores hot partitions
    under DEEPER skew-subdivided ids; an update must invalidate those
    descendants too (else the same rows exist under both the shallow and
    deep ids — duplicated on read)."""
    import glob

    import pyarrow.parquet as pqt

    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union
    from osmquadtreepostgis_ray.state import checkpoint as C
    from osmquadtreepostgis_ray.state.incremental import update_export

    base_out = str(tmp_path / "skewed")
    # tiny cap -> hot partitions subdivide to depth-6 ids
    C.resumable_write(all_tables_union(sf_dir), base_out, key_col="tile",
                      part_depth=4, max_rows_per_part=3, skew_depth_delta=2)
    deep_parts = {p for p in C.completed_partitions(base_out) if (p & 63) > 4}
    assert deep_parts, "cap must force skew subdivision for this test"
    assert C.read_settings(base_out)["max_rows_per_part"] == 3

    n_before = sum(pqt.read_metadata(f).num_rows
                   for f in glob.glob(base_out + "/data/part=*/*.parquet"))

    changes = pa.table({
        "doc_id": pa.array([1, 5, 9], pa.int64()),
        "text": pa.array(["merge merge row fast the", "slow slow", "data x"], pa.string()),
    })
    update_export(base_out, sf_dir, changes)

    n_after = sum(pqt.read_metadata(f).num_rows
                  for f in glob.glob(base_out + "/data/part=*/*.parquet"))
    # upserting existing docs must not change the total row count (same
    # docs, same kinds routed at most differently between tables) — and
    # NEVER duplicate rows across shallow/deep partition ids
    ids = pa.concat_tables([pqt.read_table(f, columns=["tbl", "osm_id"])
                            for f in glob.glob(base_out + "/data/part=*/*.parquet")])
    df = ids.to_pandas()
    assert df.duplicated(["tbl", "osm_id"]).sum() == 0
    assert abs(n_after - n_before) <= 6  # routing changes for the 3 docs only


def _mk_group(gid, coords, close=True):
    k = len(coords)
    return pd.DataFrame({
        "doc_id": np.arange(gid * 8, gid * 8 + k, dtype=np.int64),
        "group_id": np.full(k, gid, dtype=np.int64),
        "lon_milli": np.array([c[0] for c in coords], dtype=np.int64),
        "lat_milli": np.array([c[1] for c in coords], dtype=np.int64),
        "close_hit": np.array([1] + [0] * (k - 1), dtype=np.int64) * (1 if close else 0),
        "phash": np.arange(k, dtype=np.int64) * 977 % 131,  # stitch shuffle order
    })


def test_assemble_hole_assignment_even_group():
    """A2 PolygonPart semantics (reference src/validategeoms.cpp:173-200,
    area minus holes src/postgiswriter.cpp:561-602): an even-group_id
    6-member closed group emits ONE part whose doubled area is
    outer - hole and whose n_points spans both ring closures."""
    # outer ring = unit-ish box scaled: (0,0),(100,0),(100,100),(0,100)... use 6 members: first 3 = ring A, last 3 = ring B
    coords = [(0, 0), (400, 0), (0, 400),          # ring A: right triangle, 2*area = 160000
              (40, 40), (360, 40), (40, 360)]      # ring B (pre-shrink)
    g = _mk_group(2, coords)                        # gid=2 (even -> hole)
    out = _assemble_group(g).sort_values("part")
    polys = out[out["kind"] == "polygon"]
    assert len(polys) == 1
    row = polys.iloc[0]
    assert row["part"] == 1 and row["n_points"] == 3 + 3 + 2
    # hole ring: centroid of A = (133, 133); shrink (3c+v)//4 then clip
    ax = np.array([0, 400, 0]); ay = np.array([0, 0, 400])
    cx, cy = int(ax.sum()) // 3, int(ay.sum()) // 3
    hx = np.clip((3 * cx + np.array([40, 360, 40])) // 4, 0, 400)
    hy = np.clip((3 * cy + np.array([40, 40, 360])) // 4, 0, 400)
    area_a = 400 * 400  # doubled shoelace of the right triangle
    x2, y2 = np.roll(hx, -1), np.roll(hy, -1)
    area_b = int(abs(np.sum(hx * y2 - x2 * hy)))
    assert row["measure2"] == area_a - area_b
    assert row["osm_id"] == -2


def test_assemble_two_parts_odd_group():
    """Odd group_id keeps the two-ring ComplicatedPolygon (M8 split)."""
    coords = [(0, 0), (400, 0), (0, 400), (1000, 1000), (1400, 1000), (1000, 1400)]
    g = _mk_group(3, coords)
    out = _assemble_group(g)
    polys = out[out["kind"] == "polygon"]
    assert sorted(polys["part"]) == [1, 2]
    assert (polys["n_points"] == 4).all()


def test_stage_metrics_prog_analog(sf_dir):
    """G3: per-stage wait/exec/rows records (the reference Prog's
    per-stage lines, docs/output.txt:16-23) collected by the metrics
    sink during an instrumented flagship run."""
    from osmquadtreepostgis_ray.config import EngineParams
    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union
    from osmquadtreepostgis_ray.state import metrics as M

    import time

    ray.get(M.get_sink().drain.remote())  # clean slate
    p = EngineParams(collect_metrics=True, metrics_flush_every=1)
    n = all_tables_union(sf_dir, p).count()
    assert n > 0
    # flushes are fire-and-forget: poll until both stages' records land
    deadline = time.time() + 15
    while time.time() < deadline:
        t = M.stage_metrics_table().to_pandas()
        if set(t["stage"]) == {"cells+route", "project_all"}:
            break
        time.sleep(0.2)
    t = M.stage_metrics_table(drain=True).to_pandas()
    assert set(t["stage"]) == {"cells+route", "project_all"}
    for _, r in t.iterrows():
        assert r["batches"] > 0 and r["exec_s"] > 0 and r["rows"] > 0
    # project_all fans every routed row out across the 6 tables
    pr = t.set_index("stage")
    assert pr.loc["project_all", "rows"] >= pr.loc["cells+route", "rows"]


def test_assemble_documents_api_flags(sf_dir):
    """api.assemble_documents consumes split_multipolygons /
    validate_geometry (the reference flags write_to_postgis honors)."""
    from osmquadtreepostgis_ray import api

    split = api.assemble_documents(sf_dir).to_pandas()
    merged = api.assemble_documents(sf_dir, split_multipolygons=False).to_pandas()
    # off-mode merges each group's polygon parts into one row
    sp = split[split["kind"] == "polygon"].groupby("group_id").size()
    mp = merged[merged["kind"] == "polygon"].groupby("group_id").size()
    assert (mp == 1).all()
    assert set(sp.index) == set(mp.index)
    multi = sp[sp > 1].index
    assert len(multi) > 0  # odd big groups keep 2 parts in split mode
    # measure2 is conserved by the merge (sum of parts)
    for gid in list(multi)[:5]:
        a = split[(split["group_id"] == gid) & (split["kind"] == "polygon")]["measure2"].sum()
        b = merged[(merged["group_id"] == gid) & (merged["kind"] == "polygon")]["measure2"].iloc[0]
        assert a == b
    assert (split["kind"] != "error").all()  # validate_geometry=True filters


def test_admin_levels_min_max_and_nulls():
    """A3 detail (docs/output.txt:6): min/max parent boundary admin_level
    as text; docs outside every boundary relation get NULL."""
    from osmquadtreepostgis_ray.stages.assembly import (ADMIN_STEP,
                                                        N_BOUNDARY,
                                                        admin_levels)

    ids = list(range(40))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = admin_levels(ds).to_pandas().set_index("doc_id")
    for d in ids:
        lv = [2 + (b % 10) for b in range(N_BOUNDARY)
              if (d + b * b) % ADMIN_STEP == 0]
        if lv:
            assert out.loc[d, "min_admin_level"] == str(min(lv))
            assert out.loc[d, "max_admin_level"] == str(max(lv))
        else:
            assert out.loc[d, "min_admin_level"] is None
            assert out.loc[d, "max_admin_level"] is None


def test_admin_levels_null_branch_exercised():
    """The quadratic membership leaves a real fraction of docs with no
    boundary parent — the NULL path must actually occur."""
    from osmquadtreepostgis_ray.stages.assembly import admin_levels

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(100)), pa.int64())}))
    out = admin_levels(ds).to_pandas()
    assert out["min_admin_level"].isna().sum() > 20
    assert out["min_admin_level"].notna().sum() > 20
