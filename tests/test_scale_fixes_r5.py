"""Round-5 scale fixes (VERDICT r4 'Next round' items 2-3 + ADVICE).

- split_hot_cells handles hot cells at MIXED depths inside one batch
  (per-row depth, not first-row depth — the bit-stability hazard)
- topk_per_key output is bit-identical at any shard count (default is
  now data-aware via shard_apply/scaled_shards)
- sql_bpe_encode twin survives a degenerate corpus whose pair supply
  exhausts before BPE_MERGE_ROUNDS (pass-through fallback levels)
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data


def test_split_hot_cells_mixed_depths():
    """Hot cells at depth 10 AND depth 12 co-occurring in one block:
    each row must be rewritten at ITS OWN depth + delta, recomputable
    from the row alone."""
    from osmquadtreepostgis_ray.functions import geotag, quadtree
    from osmquadtreepostgis_ray.stages.skew import split_hot_cells

    rng = np.random.RandomState(7)
    # cluster A: 300 rows in one depth-10 cell
    lon_a = 180_000 + rng.randint(0, 40, 300)
    lat_a = 80_000 + rng.randint(0, 40, 300)
    # cluster B: 300 rows in one depth-12 cell (distinct area)
    lon_b = 90_000 + rng.randint(0, 10, 300)
    lat_b = 40_000 + rng.randint(0, 10, 300)
    # cold rows at both depths
    lon_c = rng.randint(0, 360_000, 40)
    lat_c = rng.randint(0, 170_000, 40)
    lon = np.r_[lon_a, lon_b, lon_c].astype(np.int64)
    lat = np.r_[lat_a, lat_b, lat_c].astype(np.int64)
    fx, fy = geotag.milli_to_fixed(lon, lat)
    cell = np.empty(len(lon), np.int64)
    ix, iy = quadtree.fixed_to_ixy(fx[:300], fy[:300], 10)
    cell[:300] = quadtree.encode_ixy(ix, iy, 10)
    ix, iy = quadtree.fixed_to_ixy(fx[300:620], fy[300:620], 12)
    cell[300:620] = quadtree.encode_ixy(ix, iy, 12)
    ix, iy = quadtree.fixed_to_ixy(fx[620:], fy[620:], 11)
    cell[620:] = quadtree.encode_ixy(ix, iy, 11)

    # ONE block so both hot depths land in the same batch
    ds = ray.data.from_arrow(pa.table({
        "lon_milli": pa.array(lon), "lat_milli": pa.array(lat),
        "cell": pa.array(cell, pa.int64())}))
    out = split_hot_cells(ds, max_rows=100, depth_delta=2,
                          cell_col="cell").to_pandas()
    got = out["group_cell"].to_numpy()
    in_depth = out["cell"].to_numpy() & 63
    depths = got & 63
    hot = np.zeros(len(out), bool)
    for c in (cell[0], cell[300]):
        hot |= out["cell"].to_numpy() == c
    # every hot row deepened by exactly 2 FROM ITS OWN depth
    assert (depths[hot] == in_depth[hot] + 2).all()
    assert set(depths[hot].tolist()) == {12, 14}
    # cold rows untouched
    assert (got[~hot] == out["cell"].to_numpy()[~hot]).all()
    # pure function of the row: recompute independently per depth
    fx2, fy2 = geotag.milli_to_fixed(out["lon_milli"].to_numpy(),
                                     out["lat_milli"].to_numpy())
    for d in (12, 14):
        m = hot & (depths == d)
        ix2, iy2 = quadtree.fixed_to_ixy(fx2[m], fy2[m], d)
        assert (quadtree.encode_ixy(ix2, iy2, d) == got[m]).all()


def test_topk_per_key_shard_count_invariant():
    """Shard ids never reach results: scaled default, a tiny forced
    count and a large forced count all give the identical table."""
    from osmquadtreepostgis_ray.util import topk_per_key

    rng = np.random.default_rng(11)
    n = 5000
    tab = pa.table({
        "query_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "d": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "neighbor_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
    })
    outs = []
    for shards in (None, 7, 512):
        ds = ray.data.from_arrow(tab).repartition(8)
        t = topk_per_key(ds, "query_id", ["d", "neighbor_id"],
                         [True, True], 5,
                         ["query_id", "neighbor_id", "d"], shards=shards)
        outs.append(t.to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    assert len(outs[0]) == 40 * 5


def test_bpe_degenerate_corpus_parity(tmp_path):
    """Corpus of 2-char words: pair supply dries up after 2 merges
    (< BPE_MERGE_ROUNDS).  The Ray side breaks out early; the SQL
    twin's pass-through fallback must keep w{r} populated so encode
    still prices the corpus — previously it returned ZERO rows."""
    import duckdb

    from osmquadtreepostgis_ray.oracle import sql_bpe_encode, sql_bpe_merges
    from osmquadtreepostgis_ray.queries import q_bpe_encode, q_bpe_merges

    docs = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64), pa.int64()),
        "source": pa.array(["web", "web", "web", "book", "book", "book"]),
        "text": pa.array(["ab ab ab", "ab cd", "cd cd",
                          "ab ab", "cd", "ab"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")

    m_ray = q_bpe_merges(sf).to_pandas()
    m_sql = con.execute(sql_bpe_merges()).df()
    # both engines emit exactly the 2 possible merges, same order
    assert len(m_ray) == 2 and len(m_sql) == 2
    for c in ("round", "a", "b", "n"):
        assert m_ray[c].tolist() == m_sql[c].tolist()

    e_ray = q_bpe_encode(sf).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    e_sql = con.execute(sql_bpe_encode()).df() \
        .sort_values("source").reset_index(drop=True)
    assert len(e_sql) == 2, "twin zeroed out on pair exhaustion"
    for c in ("source", "n_words", "n_tokens"):
        assert e_ray[c].tolist() == e_sql[c].tolist()
    # fully merged vocab: every word is ONE token
    assert (e_ray["n_words"] == e_ray["n_tokens"]).all()
    con.close()


def test_semantic_dedup_brute(tmp_path):
    """Planted near-duplicate groups: q_semantic_dedup must drop every
    higher-id member of a same-cluster near-dup pair and keep all
    others — checked against an independent O(n^2) integer brute force
    using the same centered-quantized rational-cosine rule."""
    import pyarrow.parquet as pq

    from osmquadtreepostgis_ray.queries import (SEM_TAU_DEN, SEM_TAU_NUM,
                                                q_semantic_dedup)
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE

    rng = np.random.default_rng(17)
    n_base, d = 60, 16
    base = rng.uniform(-0.9, 0.9, (n_base, d))
    rows = [base]
    # plant a near-copy of every 5th base vector (tiny perturbation ->
    # cosine ~1 >> tau)
    dup_src = np.arange(0, n_base, 5)
    rows.append(base[dup_src] + rng.uniform(-0.005, 0.005,
                                            (len(dup_src), d)))
    M = np.clip(np.vstack(rows), -0.999, 0.999)
    n = len(M)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float64()))})
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    got = q_semantic_dedup(str(tmp_path)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(got) == n

    # independent brute force on the SAME integer rule
    Q = np.floor(M * KM_SCALE).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)
    cl = got.set_index("vec_id")["cluster"]
    num2, den2 = SEM_TAU_NUM ** 2, SEM_TAU_DEN ** 2
    expect_kept = np.ones(n, np.int64)
    for v in range(n):
        for u in range(v):
            if cl[u] != cl[v] or n2[u] == 0 or n2[v] == 0:
                continue
            dot = int(Q[u] @ Q[v])
            if dot >= 0 and den2 * dot * dot >= num2 * int(n2[u]) * int(n2[v]):
                expect_kept[v] = 0
                break
    assert got["kept"].tolist() == expect_kept.tolist()
    # every planted copy shares its source's cluster and is dropped
    planted = np.arange(n_base, n)
    same = cl[planted].to_numpy() == cl[dup_src].to_numpy()
    assert same.all()
    assert (got["kept"].to_numpy()[planted] == 0).all()
    # and the base corpus is genuinely split (dups exist, keeps exist)
    base_kept = int(got["kept"].to_numpy()[:n_base].sum())
    assert 0 < base_kept < n_base


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def test_pipeline_shard_plan_invariance(sf_dir, monkeypatch):
    """End-to-end pin of the shard_apply contract on REAL pipelines:
    the data-scaled shard count (what a 100-TB input would choose) and
    the floor plan must produce bit-identical rows — shards is a blocks
    knob, never a semantics knob.  (The measured above-floor engagement
    evidence at repeat-scaled volume lives in tools/scale_probe.py +
    BASELINE.md; this test keeps the invariance pinned in CI.)"""
    from osmquadtreepostgis_ray import util
    from osmquadtreepostgis_ray.queries import q_dedup_exact, q_moving_window

    floor = [_sorted_df(q(sf_dir))
             for q in (q_dedup_exact, q_moving_window)]
    monkeypatch.setattr(util, "scaled_shards",
                        lambda ds, floor=0, target_bytes=0: 1024)
    scaled = [_sorted_df(q(sf_dir))
              for q in (q_dedup_exact, q_moving_window)]
    for f, s in zip(floor, scaled):
        pd.testing.assert_frame_equal(f, s)
    assert len(floor[0]) > 0 and len(floor[1]) > 0


def test_shard_apply_empty_and_null_keys():
    """Round-5 review fixes: (a) a fully-filtered input (zero-row,
    possibly empty-schema blocks) flows through shard_apply as an
    empty result instead of a KeyError; (b) a null in an integer key
    column raises loudly — batch-dependent dtype would silently hash
    the same key differently across batches."""
    import ray.data

    from osmquadtreepostgis_ray.util import shard_apply

    ds = ray.data.from_items([{"k": 1, "v": 2}, {"k": 3, "v": 4}]) \
        .filter(lambda r: r["v"] > 99)
    out = shard_apply(ds, ["k"], lambda g: g).to_pandas()
    assert len(out) == 0

    tab = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                    "v": pa.array([1, 2, 3], pa.int64())})
    bad = ray.data.from_arrow(tab)
    with pytest.raises(Exception, match="null in integer key"):
        shard_apply(bad, ["k"], lambda g: g).to_pandas()


def test_merge_latest_tie_change_wins():
    """Equal (key, version) between base and changes must pick the
    CHANGE row deterministically (side marker, not arrival order)."""
    import ray.data

    from osmquadtreepostgis_ray.sources.tables import merge_latest

    base = ray.data.from_items(
        [{"k": 1, "ver": 5, "payload": 100},
         {"k": 2, "ver": 1, "payload": 200}])
    chg = ray.data.from_items(
        [{"k": 1, "ver": 5, "payload": 999},   # tie -> change wins
         {"k": 2, "ver": 0, "payload": 888}])  # older -> base wins
    for _ in range(3):  # deterministic across repeated executions
        out = merge_latest(base, chg, key="k", version="ver") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert out["payload"].tolist() == [999, 200]


def test_payload_batch_rows_subbyte():
    from osmquadtreepostgis_ray.util import payload_batch_rows
    assert payload_batch_rows(0.5) == 4096      # hi clamp, no crash
    assert payload_batch_rows(0) == 4096
    assert payload_batch_rows(1 << 30) == 16    # lo clamp


def test_worker_cached_lru_bound():
    from osmquadtreepostgis_ray import util

    built = []
    fns = []
    for i in range(util._STAGE_CACHE_MAX + 8):
        fns.append(util.worker_cached(
            lambda i=i: built.append(i) or (lambda b: b)))
    for f in fns:
        f(None)
    assert len(built) == len(fns)
    assert len(util._STAGE_CACHE) <= util._STAGE_CACHE_MAX
    # most-recently-used entry still cached: calling again builds nothing
    n = len(built)
    fns[-1](None)
    assert len(built) == n


def test_pip_empty_zone_side():
    """Round-5 review fixes: an EMPTY zone table must mean zero
    polygons — not silently fall back to the default zone set (the
    `or` falsy-table trap): PipAnti then keeps every point, PipJoin
    emits nothing, ZoneDistance raises (nearest-of-nothing)."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import (PipAnti, PipJoin,
                                                        ZoneDistance,
                                                        build_zone_index)

    empty = zones_table().slice(0, 0)
    assert len(build_zone_index(empty).polys) == 0
    eref = ray.put(empty)

    batch = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "lon": pa.array([10.0, 20.0]), "lat": pa.array([5.0, 6.0]),
        "lon_milli": pa.array([10000, 20000], pa.int64()),
        "lat_milli": pa.array([5000, 6000], pa.int64())})
    assert PipAnti(eref)(batch).num_rows == 2       # nothing covers them
    assert PipJoin(eref)(batch).num_rows == 0       # no containments
    with pytest.raises(ValueError, match="ZoneDistance needs"):
        ZoneDistance(eref)


def test_pip_copartitioned_string_id(tmp_path):
    """pip_join_copartitioned must carry a NON-int64 id column: the
    zone-side pad follows the point schema's type (was hardcoded
    int64, which forked block schemas)."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import (
        PipJoin, pip_join_copartitioned)

    from osmquadtreepostgis_ray.functions import geotag

    zt = zones_table()
    n = 40
    rng = np.random.default_rng(7)
    lon_m = rng.integers(0, 170_000, n)
    lat_m = rng.integers(0, 80_000, n)
    # degree columns must be the geotag projection of the milli columns
    # (lon = m/1000 - 180 etc.) — the copartitioned path routes by
    # milli-derived cells and tests containment in degree space
    lon_d, lat_d = geotag.milli_to_degrees(lon_m, lat_m)
    pts = pa.table({
        "doc_key": pa.array([f"d{i:04d}" for i in range(n)], pa.string()),
        "lon": pa.array(lon_d), "lat": pa.array(lat_d),
        "lon_milli": pa.array(lon_m, pa.int64()),
        "lat_milli": pa.array(lat_m, pa.int64())})
    ds = ray.data.from_arrow(pts)

    got = pip_join_copartitioned(ds, zt, id_col="doc_key") \
        .to_pandas().sort_values(["doc_key", "zone_id"]).reset_index(drop=True)
    want_t = PipJoin(ray.put(zt), id_col="doc_key")(pts).to_pandas() \
        .sort_values(["doc_key", "zone_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_key", "zone_id", "kind"]],
                                  want_t[["doc_key", "zone_id", "kind"]])
    assert len(got) > 0


def test_resume_adopts_persisted_settings(tmp_path):
    """Round-5 review fix: a resume with DIFFERENT caller args must
    adopt the persisted write settings (incl. the hot set) so the
    partition function is identical across run and resume — a changed
    max_rows_per_part would re-route hot rows to ids absent from the
    done set and silently duplicate them."""
    from osmquadtreepostgis_ray.state import checkpoint as C

    n = 600
    rng = np.random.RandomState(5)
    # heavy skew: 500 rows in one deep cell region, 100 spread
    from osmquadtreepostgis_ray.functions import geotag, quadtree
    lon = np.r_[180_000 + rng.randint(0, 30, 500),
                rng.randint(0, 360_000, 100)].astype(np.int64)
    lat = np.r_[80_000 + rng.randint(0, 30, 500),
                rng.randint(0, 170_000, 100)].astype(np.int64)
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, 8)
    tile = quadtree.encode_ixy(ix, iy, 8)
    ds = ray.data.from_arrow(pa.table({
        "tile": pa.array(tile, pa.int64()),
        "val": pa.array(np.arange(n), pa.int64())}))
    out = str(tmp_path / "ck")
    m1 = C.resumable_write(ds, out, key_col="tile", part_depth=2,
                           max_rows_per_part=200, run_id="r1")
    assert int(pa.compute.sum(m1.column("rows")).as_py()) == n
    settings = C.read_settings(out)
    assert settings["hot"], "skewed input must persist a hot set"

    # kill one partition, then resume WITHOUT the skew args — the
    # persisted settings must be adopted, ids line up, rows not duped
    victim = m1.column("part").to_pylist()[0]
    os.remove(os.path.join(out, "_manifest", f"{victim}.json"))
    m2 = C.resumable_write(ds, out, key_col="tile", part_depth=4,
                           run_id="r2")  # wrong depth + no skew args
    assert C.read_data(out).count() == n
    assert int(pa.compute.sum(C.read_manifest(out).column("rows")).as_py()) == n
    st = {r["part"]: r["status"] for r in m2.to_pylist()}
    assert st[victim] == "done"

    with pytest.raises(ValueError, match="different export"):
        C.resumable_write(ds, out, key_col="val")


def test_addpart_mixed_depth_hot(tmp_path):
    """Hot keys at two different depths in ONE batch must each clamp
    from their own depth (per-row), not the first row's — partition
    ids are pure functions of the row (CLAUDE.md bit-stability)."""
    from osmquadtreepostgis_ray.functions import quadtree
    from osmquadtreepostgis_ray.state import checkpoint as C

    # two keys under the same depth-1 ancestor but stored at different
    # native depths (depth byte = low 6 bits)
    k_deep = (np.int64(0b1101) << np.int64(58)) >> np.int64(0) | np.int64(8)
    k_shallow = (k_deep & ~np.int64(63)) | np.int64(3)
    keys = np.array([k_deep, k_shallow] * 50, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "tile": pa.array(keys, pa.int64()),
        "val": pa.array(np.arange(len(keys)), pa.int64())}))
    out = str(tmp_path / "ck2")
    C.resumable_write(ds, out, key_col="tile", part_depth=1,
                      max_rows_per_part=10, run_id="r1")
    # expected ids: per-row min(1+2, own depth)
    exp = set()
    for k in (k_deep, k_shallow):
        d = min(1 + 2, int(k & 63))
        exp.add(int(quadtree.at_depth(np.array([k]), d)[0]))
    got = set(int(p) for p in C.read_manifest(out).column("part").to_pylist())
    assert exp <= got
    assert C.read_data(out).count() == len(keys)
