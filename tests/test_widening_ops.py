"""Round-2 widening operators: cube grouping sets, per-key mode,
weighted sampling, corr components, all-rows 1-NN join, and the
distributed running-total prefix sum.

Each test pins the Ray result against a local pandas/numpy reference on
sf0.001 (the DuckDB twin is exercised by tools/check_parity.py); the
prefix-sum test additionally pins block-boundary independence.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.queries import SAMPLE_MOD, SAMPLE_MULT


def test_cube_counts_grouping_sets(sf_dir):
    out = Q.q_cube_counts(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["lang", "source", "n_chars"]).to_pandas()
    # grand total row (both NULL)
    g = out[out["lang"].isna() & out["source"].isna()]
    assert len(g) == 1
    assert int(g["n_docs"].iloc[0]) == len(docs)
    assert int(g["sum_chars"].iloc[0]) == int(docs["n_chars"].sum())
    # per-lang rollup matches pandas
    bylang = out[out["lang"].notna() & out["source"].isna()] \
        .set_index("lang")["n_docs"].to_dict()
    ref = docs.groupby("lang").size().to_dict()
    assert bylang == ref
    # 4 grouping sets = full + lang + source + grand
    nl, ns = docs["lang"].nunique(), docs["source"].nunique()
    nfull = docs.groupby(["lang", "source"]).ngroups
    assert len(out) == nfull + nl + ns + 1


def test_mode_user_type_matches_pandas(sf_dir):
    out = Q.q_mode_user_type(sf_dir).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    c = ev.groupby(["user_id", "event_type"], as_index=False).size()
    c = c.sort_values(["user_id", "size", "event_type"],
                      ascending=[True, False, True], kind="stable")
    ref = c.drop_duplicates("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["mode_type"].tolist() == ref["event_type"].tolist()
    assert out["mode_n"].tolist() == ref["size"].tolist()


def test_sample_weighted_exact_membership(sf_dir):
    out = Q.q_sample_weighted(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    ids = docs["doc_id"].to_numpy(np.int64)
    nc = docs["n_chars"].to_numpy(np.int64)
    w = np.minimum(nc // 5, SAMPLE_MOD)
    keep = (ids * SAMPLE_MULT) % SAMPLE_MOD < w
    assert sorted(out["doc_id"].tolist()) == sorted(ids[keep].tolist())
    # longer docs are sampled at a higher rate by construction
    assert nc[keep].mean() > nc.mean()


def test_corr_components_exact(sf_dir):
    out = Q.q_corr_components(sf_dir).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "value"]).to_pandas()
    x = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    _, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                       ev["event_id"].to_numpy())
    b = (ev["event_id"].to_numpy() % 5).astype(np.int64)
    ref = pd.DataFrame({"bucket": b, "x": x, "y": lat}) \
        .groupby("bucket").apply(
            lambda g: pd.Series({
                "n": len(g), "sum_x": g["x"].sum(), "sum_y": g["y"].sum(),
                "sum_xy": (g["x"] * g["y"]).sum(),
                "sum_x2": (g["x"] ** 2).sum(), "sum_y2": (g["y"] ** 2).sum()}),
            include_groups=False).reset_index()
    for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"):
        assert out[c].tolist() == ref[c].astype(np.int64).tolist(), c


def test_nn_join_exact_argmin(sf_dir):
    from osmquadtreepostgis_ray.sources import zones as Z
    out = Q.q_nn_join(sf_dir).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    gz = Z.grid_zone_ids()
    cx = (gz % Z.GX) * Z.GRID_W + Z.GRID_W // 2
    cy = (gz // Z.GX) * Z.GRID_H + Z.GRID_H // 2
    d2 = (lon[:, None] - cx) ** 2 + (lat[:, None] - cy) ** 2
    j = np.argmin(d2, axis=1)
    assert len(out) == len(ev)
    assert out["nn_zone"].to_numpy(np.int64).tolist() == gz[j].tolist()
    assert out["d2"].to_numpy(np.int64).tolist() == \
        d2[np.arange(len(ev)), j].tolist()


def test_running_total_matches_pandas(sf_dir):
    out = Q.q_running_total(sf_dir).to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_orderdate",
                                    "o_totalprice"]).to_pandas()
    orders["cents"] = np.rint(orders["o_totalprice"].to_numpy() * 100) \
        .astype(np.int64)
    ref = orders.sort_values(["o_orderdate", "o_orderkey"], kind="stable")
    ref["run_cents"] = ref["cents"].cumsum()
    merged = out.merge(ref[["o_orderkey", "run_cents"]], on="o_orderkey",
                       suffixes=("", "_ref"))
    assert len(merged) == len(orders)
    assert (merged["run_cents"] == merged["run_cents_ref"]).all()


def test_keyed_prefix_sum_block_boundary_independent():
    # same rows, different block layouts -> identical running sums
    from osmquadtreepostgis_ray.stages.window import keyed_prefix_sum
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 4, 600).astype(np.int64),
        "o": np.arange(600, dtype=np.int64),
        "v": rng.integers(-9, 10, 600).astype(np.int64)})
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        r = keyed_prefix_sum(ds, ["g"], ["o"], "v").to_pandas() \
            .sort_values(["g", "o"]).reset_index(drop=True)
        outs.append(r["run_sum"].tolist())
    assert outs[0] == outs[1]
    ref = df.sort_values(["g", "o"]).groupby("g")["v"].cumsum()
    assert outs[0] == df.sort_values(["g", "o"]).assign(rs=ref.values) \
        .sort_values(["g", "o"])["rs"].tolist()


def _brute_segments(sf_dir):
    import pyarrow.parquet as _pq
    from osmquadtreepostgis_ray.stages.assembly import GROUP_SIZE
    docs = _pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ids = docs["doc_id"].to_numpy(np.int64)
    ph = geotag.phash_of(ids)
    x, y = geotag.lonlat_milli_from_phash(ph)
    g = ids // GROUP_SIZE
    i = np.flatnonzero(g[1:] == g[:-1])
    keep = (x[i] != x[i + 1]) | (y[i] != y[i + 1])
    i = i[keep]
    return ids[i], g[i], x[i], y[i], x[i + 1], y[i + 1]


def test_segment_intersections_matches_brute_force(sf_dir):
    out = Q.q_segment_intersections(sf_dir).to_pandas()
    got = set(zip(out["a_seg"], out["b_seg"]))
    sid, gid, x1, y1, x2, y2 = _brute_segments(sf_dir)
    ref = set()
    for i in range(len(sid)):
        for j in range(i + 1, len(sid)):
            if gid[i] == gid[j]:
                continue
            s1 = np.sign((x2[i]-x1[i])*(y1[j]-y1[i]) - (y2[i]-y1[i])*(x1[j]-x1[i]))
            s2 = np.sign((x2[i]-x1[i])*(y2[j]-y1[i]) - (y2[i]-y1[i])*(x2[j]-x1[i]))
            s3 = np.sign((x2[j]-x1[j])*(y1[i]-y1[j]) - (y2[j]-y1[j])*(x1[i]-x1[j]))
            s4 = np.sign((x2[j]-x1[j])*(y2[i]-y1[j]) - (y2[j]-y1[j])*(x2[i]-x1[j]))
            if s1 * s2 < 0 and s3 * s4 < 0:
                a, b = sorted((int(sid[i]), int(sid[j])))
                ref.add((a, b))
    assert got == ref
    assert len(ref) > 0          # fixture produces real crossings


def test_triangles_matches_brute_force(sf_dir):
    out = Q.q_triangles(sf_dir).to_pandas().sort_values("node") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    ids = docs["doc_id"].to_numpy(np.int64)
    E = set()
    for i in ids:
        if i >= 1:
            E.add((i - 1, i))
        if i >= 2 and (i - 2) % 3 == 0:
            E.add((i - 2, i))
    from collections import Counter
    cnt = Counter()
    EL = sorted(E)
    ES = set(EL)
    for (a, b) in EL:
        for (c, d) in EL:
            if c != b:
                continue
            if (a, d) in ES:        # a<b<d triangle
                cnt[a] += 1; cnt[b] += 1; cnt[d] += 1
    assert dict(zip(out["node"], out["n_tri"])) == dict(cnt)
    assert sum(cnt.values()) > 0


def test_hex_bin_two_row_candidates_are_nearest():
    # the kernel only examines rows y//R and y//R + 1; verify against a
    # 5-row brute force on a dense integer sweep incl. boundary values
    from osmquadtreepostgis_ray.queries import HEX_C as C, HEX_R as R
    rng = np.random.default_rng(11)
    x = np.r_[rng.integers(0, 360000, 4000), np.arange(0, 30000, 7)]
    y = np.r_[rng.integers(0, 170000, 4000), np.tile([0, R - 1, R, R + 1], 4286)[:4286]]
    x = x[:len(y)]

    def kernel(x, y):
        j0 = y // R
        best = None
        for dj in (0, 1):
            j = j0 + dj
            o = (j % 2) * (C // 2)
            i = (2 * (x - o) + C) // (2 * C)
            d2 = (x - (i * C + o)) ** 2 + (y - j * R) ** 2
            if best is None:
                best = (d2, j.copy(), i.copy())
            else:
                b = d2 < best[0]
                best = (np.where(b, d2, best[0]), np.where(b, j, best[1]),
                        np.where(b, i, best[2]))
        return best

    d2k, jk, ik = kernel(x, y)
    # brute force over rows j0-2 .. j0+2 and columns i-1 .. i+1
    bd = np.full(len(x), np.iinfo(np.int64).max)
    for dj in (-2, -1, 0, 1, 2):
        j = y // R + dj
        o = (j % 2) * (C // 2)
        ic = (2 * (x - o) + C) // (2 * C)
        for di in (-1, 0, 1):
            i = ic + di
            d2 = (x - (i * C + o)) ** 2 + (y - j * R) ** 2
            bd = np.minimum(bd, d2)
    assert (d2k == bd).all()


def test_hex_bin_counts_match_local(sf_dir):
    from osmquadtreepostgis_ray.queries import HEX_C as C, HEX_NCOLS, HEX_R as R
    out = Q.q_hex_bin(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    j0 = y // R
    best = None
    for dj in (0, 1):
        j = j0 + dj
        o = (j % 2) * (C // 2)
        i = (2 * (x - o) + C) // (2 * C)
        d2 = (x - (i * C + o)) ** 2 + (y - j * R) ** 2
        if best is None:
            best = [d2, j.copy(), i.copy()]
        else:
            b = d2 < best[0]
            best = [np.where(b, d2, best[0]), np.where(b, j, best[1]),
                    np.where(b, i, best[2])]
    hid = best[1] * HEX_NCOLS + best[2]
    ref = pd.Series(hid).value_counts().sort_index()
    got = out.set_index("hex_id")["n"].sort_index()
    assert got.to_dict() == ref.to_dict()


def _even_odd_inside(px, py, rings):
    c = 0
    for rx, ry in rings:
        n = len(rx)
        for i in range(n):
            x1, y1, x2, y2 = rx[i], ry[i], rx[(i + 1) % n], ry[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                t = (x1 - px) * (y2 - y1) + (py - y1) * (x2 - x1)
                if (y2 - y1 > 0 and t > 0) or (y2 - y1 < 0 and t < 0):
                    c += 1
    return c % 2 == 1


def test_even_odd_hole_semantics_unit():
    # square outer + square hole: hole interior is OUTSIDE
    outer = (np.array([0, 100, 100, 0]), np.array([0, 0, 100, 100]))
    hole = (np.array([40, 60, 60, 40]), np.array([40, 40, 60, 60]))
    rings = [outer, hole]
    assert _even_odd_inside(20, 20, rings)          # annulus
    assert not _even_odd_inside(50, 50, rings)      # inside the hole
    assert not _even_odd_inside(150, 50, rings)     # outside entirely
    assert _even_odd_inside(50, 50, [outer])        # no hole -> inside


def test_pip_holes_matches_brute_force(sf_dir):
    from osmquadtreepostgis_ray.queries import PIP_HOLES_GROUPS
    from osmquadtreepostgis_ray.stages.assembly import GROUP_SIZE
    out = Q.q_pip_holes(sf_dir).to_pandas()
    got = set(zip(out["event_id"], out["group_id"]))

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"] < PIP_HOLES_GROUPS * GROUP_SIZE] \
        .sort_values("doc_id")
    ph = geotag.phash_of(docs["doc_id"].to_numpy(np.int64))
    x, y = geotag.lonlat_milli_from_phash(ph)
    docs = docs.assign(x=x, y=y, gid=docs["doc_id"].to_numpy() // GROUP_SIZE)
    from osmquadtreepostgis_ray.functions.tags import count_word
    docs["hit"] = count_word(docs["text"], "merge")

    group_rings = {}
    for gid, g in docs.groupby("gid"):
        k = len(g)
        if not ((g["hit"] > 0).any() and k >= 3):
            continue
        xs = g["x"].to_numpy(np.int64); ys = g["y"].to_numpy(np.int64)
        m = k // 2 if k >= 6 else k
        rings = [(xs[:m], ys[:m])]
        if m != k:
            hx, hy = xs[m:], ys[m:]
            if gid % 2 == 0:
                cx, cy = int(xs[:m].sum()) // m, int(ys[:m].sum()) // m
                hx = np.clip((3 * cx + hx) // 4, xs[:m].min(), xs[:m].max())
                hy = np.clip((3 * cy + hy) // 4, ys[:m].min(), ys[:m].max())
            rings.append((hx, hy))
        group_rings[gid] = rings

    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    ref = set()
    for eid, px, py in zip(ev["event_id"], lon, lat):
        for gid, rings in group_rings.items():
            if _even_odd_inside(int(px), int(py), rings):
                ref.add((int(eid), int(gid)))
    assert got == ref
    assert len(ref) > 0


def test_dense_rank_matches_pandas(sf_dir):
    out = Q.q_dense_rank(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    ref = pd.Series(cents).groupby(ev["event_type"]).rank(method="dense") \
        .astype(np.int64)
    assert out["drank"].tolist() == ref.tolist()
    assert out["cents"].tolist() == cents.tolist()


def test_lag_delta_matches_pandas(sf_dir):
    out = Q.q_lag_delta(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    prev = ev.groupby("user_id")["ts_us"].shift()
    keep = prev.notna()
    ref = ev[keep].assign(delta_us=(ev["ts_us"] - prev)[keep].astype(np.int64)) \
        .sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == ref["event_id"].tolist()
    assert out["delta_us"].tolist() == ref["delta_us"].tolist()


def test_outer_join_matches_pandas(sf_dir):
    out = Q.q_outer_join(sf_dir).to_pandas() \
        .sort_values("custkey").reset_index(drop=True)
    o = pq.read_table(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey",
                               "o_totalprice"]).to_pandas()
    cents = np.rint(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    l = o[o["o_orderkey"] % 2 == 1].groupby("o_custkey").size()
    r = pd.Series(cents[(o["o_orderkey"] % 3 == 0).to_numpy()]) \
        .groupby(o.loc[(o["o_orderkey"] % 3 == 0).to_numpy(),
                       "o_custkey"].to_numpy()).sum()
    keys = sorted(set(l.index) | set(r.index))
    assert out["custkey"].tolist() == keys
    assert out["n_odd"].tolist() == [int(l.get(k, 0)) for k in keys]
    assert out["cents3"].tolist() == [int(r.get(k, 0)) for k in keys]
    # genuinely full outer: both sides contribute exclusive keys
    assert any(k not in r.index for k in l.index)
    assert any(k not in l.index for k in r.index)


def test_triangles_plans_identical(sf_dir):
    a = Q.q_triangles(sf_dir, force_plan="id").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    b = Q.q_triangles(sf_dir, force_plan="degree").to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_laplacian_blur_exact_and_flag():
    """LaplacianBlur: constant image has zero Laplacian variance
    (is_sharp False); a checkerboard maximizes it; moments match an
    independent per-pixel reference computation."""
    import numpy as np
    import pyarrow as pa
    from osmquadtreepostgis_ray.stages.images import (LAP_SHARP_MILLI,
                                                      LaplacianBlur)

    flat = np.full((8, 8), 77, np.uint8)
    board = ((np.add.outer(np.arange(8), np.arange(8)) % 2) * 255).astype(np.uint8)
    rng = np.random.RandomState(5)
    noisy = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    imgs = [flat, board, noisy]
    batch = pa.table({
        "image_id": pa.array([f"t{i}" for i in range(3)], pa.string()),
        "bytes": pa.array([im.tobytes() for im in imgs], pa.binary()),
        "w": pa.array([8] * 3, pa.int32()),
        "h": pa.array([8] * 3, pa.int32()),
        "fmt": pa.array(["raw"] * 3, pa.string()),
    })
    out = LaplacianBlur()(batch).to_pandas().set_index("image_id")

    for i, im in enumerate(imgs):
        a = im.astype(np.int64)
        lap = (a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:]
               - 4 * a[1:-1, 1:-1])
        n = lap.size
        s1, s2 = int(lap.sum()), int((lap * lap).sum())
        row = out.loc[f"t{i}"]
        assert row["n_int"] == n and row["lap_s1"] == s1 and row["lap_s2"] == s2
        assert row["var_milli"] == (n * s2 - s1 * s1) * 1000 // (n * n)
    assert not out.loc["t0", "is_sharp"]          # flat: var == 0
    assert out.loc["t1", "is_sharp"]              # checkerboard: huge var
    assert out.loc["t1", "var_milli"] > LAP_SHARP_MILLI


def test_crossmodal_knn_matches_local_brute(sf_dir):
    """Cross-modal retrieval equals a single-process brute force: for
    each query image's ahash, the k captions with smallest simhash
    hamming (tie -> doc_id), regardless of partitioning."""
    import numpy as np
    from osmquadtreepostgis_ray import queries as Q
    from osmquadtreepostgis_ray.sources.tables import read_table
    from osmquadtreepostgis_ray.stages.dedup import simhash_buckets

    k, nq = 5, 8
    out = Q.q_crossmodal_knn(sf_dir, k=k, nq=nq).to_pandas()
    sh = simhash_buckets(read_table(sf_dir, "documents",
                                    columns=["doc_id", "text"])).to_pandas()
    d = sh["doc_id"].to_numpy(np.int64)
    s = sh["simhash"].to_numpy(np.int64).view(np.uint64)
    pop8 = np.array([bin(i).count("1") for i in range(256)], np.int64)

    import duckdb
    qdf = duckdb.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
                     f"WHERE doc_id < {nq} ORDER BY doc_id").df()
    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.images import AHash
    import pyarrow as pa
    qb = synth_images_batch(pa.table({
        "doc_id": pa.array(qdf["doc_id"].to_numpy(np.int64), pa.int64()),
        "text": pa.array(qdf["text"].tolist(), pa.string())}))
    qh = AHash()(qb).column("ahash").to_numpy().view(np.uint64)

    for j, qid in enumerate(qdf["doc_id"].to_numpy(np.int64)):
        ham = pop8[(s ^ qh[j]).view(np.uint8)].reshape(len(s), 8).sum(axis=1)
        order = np.lexsort((d, ham))[:k]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert got["doc_id"].tolist() == d[order].tolist()
        assert got["hamming"].tolist() == ham[order].tolist()


def test_quantiles_cont_matches_numpy_linear(sf_dir):
    """Interpolated quantile equals numpy's percentile(method='linear')
    x1000 on the expanded multiset (same (n-1)*q position convention)."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray import queries as Q

    out = Q.q_quantiles_cont(sf_dir).to_pandas()
    ev = duckdb.sql(f"SELECT event_type, CAST(round(value*100) AS BIGINT) "
                    f"AS cents FROM '{sf_dir}/events.parquet'").df()
    for (et, qpm), grp in out.groupby(["event_type", "qpm"]):
        vals = ev[ev["event_type"] == et]["cents"].to_numpy(np.int64)
        want = round(float(np.percentile(vals, qpm / 10.0,
                                         method="linear")) * 1000)
        assert int(grp["interp_milli"].iloc[0]) == want, (et, qpm)


def test_payload_batch_rows_memory_aware():
    """Batch sizing scales inversely with payload width and clamps."""
    from osmquadtreepostgis_ray.util import payload_batch_rows

    assert payload_batch_rows(1 << 20) == 32          # 1 MB images
    assert payload_batch_rows(10 << 20) == 16         # clamp lo
    assert payload_batch_rows(100.0) == 4096          # clamp hi
    assert payload_batch_rows(0) == 4096
    assert payload_batch_rows((32 << 20) / 100) == 100


def test_augment_crop_matches_per_row_reference():
    """AugmentCrop: the vectorized per-(fmt,dims)-group flip+crop gather
    equals a per-image Python reference (explicit flip then window
    slice), across both codecs, mixed dims, and both flip parities."""
    import numpy as np
    import pyarrow as pa
    from osmquadtreepostgis_ray.functions import codecs
    from osmquadtreepostgis_ray.stages.images import AugmentCrop

    rng = np.random.RandomState(11)
    rows = []
    # phash values chosen to hit flip on/off and varied offsets
    for i, (w, h, fmt, ph) in enumerate([
            (16, 16, "raw", 2), (16, 16, "raw", 3), (32, 32, "qlossy", 101),
            (64, 48, "raw", 9007199254740990), (32, 32, "raw", 40),
            (64, 48, "qlossy", 7)]):
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        rows.append((f"t{i}", codecs.encode(img, fmt), w, h, fmt, ph, img))
    batch = pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "w": pa.array([r[2] for r in rows], pa.int32()),
        "h": pa.array([r[3] for r in rows], pa.int32()),
        "fmt": pa.array([r[4] for r in rows], pa.string()),
        "phash": pa.array([r[5] for r in rows], pa.int64()),
    })
    out = AugmentCrop()(batch).to_pandas().set_index("image_id")

    for rid, _data, w, h, fmt, ph, img in rows:
        dec = codecs.decode(codecs.encode(img, fmt), w, h, fmt).astype(np.int64)
        cw, ch = w // 2, h // 2
        flip = bool(ph % 2)
        ox = (ph // 2) % (w - cw + 1)
        oy = (ph // 8) % (h - ch + 1)
        src = dec[:, ::-1] if flip else dec
        # flipped source x-window starts at w-1-(ox+cw-1) in source
        # coords == ox in flipped coords; reference crops the FLIPPED
        # image at the same (ox, oy) the kernel maps back to the source
        crop = src[oy:oy + ch, (w - 1 - ox - (cw - 1)) if flip else ox:][:, :cw] \
            if flip else src[oy:oy + ch, ox:ox + cw]
        if flip:
            crop = dec[oy:oy + ch, :][:, [w - 1 - ox - x for x in range(cw)]]
        wt = np.arange(ch)[:, None] * cw + np.arange(cw)[None, :] + 1
        row = out.loc[rid]
        assert row["flipped"] == flip and row["ox"] == ox and row["oy"] == oy
        assert row["aug_w"] == cw and row["aug_h"] == ch
        assert row["aug_sum"] == int(crop.sum())
        assert row["aug_wsum"] == int((crop * wt).sum())
        assert row["aug_mean"] == int(crop.sum()) // (cw * ch)


def test_crossmodal_align_matches_independent_kernels():
    """CrossmodalAlign fused pass == running AHash and simhash
    separately then XOR-popcounting; aligned flag splits both ways at
    the default threshold on the synthetic corpus."""
    import numpy as np
    import pyarrow.parquet as pq
    from osmquadtreepostgis_ray.functions import text as T
    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.images import (ALIGN_MAX_HAMMING,
                                                      AHash, CrossmodalAlign)

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    batch = synth_images_batch(docs)
    out = CrossmodalAlign()(batch)

    ah = AHash()(batch).column("ahash").to_numpy().view(np.uint64)
    sh0, seg = T.char_shingles_batch(batch.column("caption").to_pylist(), 9)
    sh = T.simhash_batch(sh0, seg, batch.num_rows).view(np.uint64)
    pop8 = np.array([bin(i).count("1") for i in range(256)], np.int64)
    x = ah ^ sh
    ham = pop8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1)

    assert (out.column("ahash").to_numpy().view(np.uint64) == ah).all()
    assert (out.column("simhash").to_numpy().view(np.uint64) == sh).all()
    assert (out.column("hamming").to_numpy() == ham).all()
    flags = out.column("aligned").to_numpy(zero_copy_only=False)
    assert (flags == (ham <= ALIGN_MAX_HAMMING)).all()
    assert flags.any() and not flags.all()   # threshold splits the corpus


def test_norm_stats_partial_matches_direct_moments():
    """NormStatsPartial over the whole synthetic corpus batch equals
    direct decoded-pixel moments computed per format."""
    import numpy as np
    import pyarrow.parquet as pq
    from osmquadtreepostgis_ray.functions import codecs
    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.images import NormStatsPartial

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    batch = synth_images_batch(docs)
    out = NormStatsPartial()(batch).to_pandas().set_index("fmt")

    ref = {}
    for i in range(batch.num_rows):
        f = batch.column("fmt")[i].as_py()
        p = codecs.decode(batch.column("bytes")[i].as_py(),
                          batch.column("w")[i].as_py(),
                          batch.column("h")[i].as_py(), f).astype(np.int64)
        n, s1, s2 = ref.get(f, (0, 0, 0))
        ref[f] = (n + p.size, s1 + int(p.sum()), s2 + int((p * p).sum()))
    assert set(out.index) == set(ref)
    for f, (n, s1, s2) in ref.items():
        assert out.loc[f, "n_px"] == n
        assert out.loc[f, "sum_p"] == s1
        assert out.loc[f, "sum_p2"] == s2


def test_rleq_codec_roundtrip_and_transcode_stage():
    """encode_rleq/decode_rleq: decoded pixels equal the qlossy
    mid-bucket dequant of the same source (PSNR >= 40 dB invariant),
    run counts match the vectorized rle_runs_q, and TranscodeRLE's
    telemetry matches a per-image reference."""
    import numpy as np
    import pyarrow as pa
    from osmquadtreepostgis_ray.functions import codecs
    from osmquadtreepostgis_ray.stages.images import TranscodeRLE

    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (16, 16)).astype(np.uint8),
            np.full((32, 32), 77, np.uint8),                 # one long run
            codecs.synth_pixels(12345, 64, 48)]
    for img in imgs:
        h, w = img.shape
        data = codecs.encode_rleq(img)
        dec = codecs.decode_rleq(data, w, h)
        ref = codecs.decode_qlossy(codecs.encode_qlossy(img), w, h)
        assert (dec == ref).all()
        assert codecs.psnr(img, dec) >= 40.0
        q = (img // codecs._STEP).ravel()
        n_runs = 1 + int((q[1:] != q[:-1]).sum())
        assert len(data) == 3 * n_runs
        assert codecs.rle_runs_q(img.reshape(1, -1))[0] == n_runs

    batch = pa.table({
        "image_id": pa.array([f"t{i}" for i in range(3)], pa.string()),
        "bytes": pa.array([im.tobytes() for im in imgs], pa.binary()),
        "w": pa.array([im.shape[1] for im in imgs], pa.int32()),
        "h": pa.array([im.shape[0] for im in imgs], pa.int32()),
        "fmt": pa.array(["raw"] * 3, pa.string()),
    })
    out = TranscodeRLE()(batch).to_pandas().set_index("image_id")
    for i, img in enumerate(imgs):
        q = (img // codecs._STEP).ravel()
        n_runs = 1 + int((q[1:] != q[:-1]).sum())
        row = out.loc[f"t{i}"]
        assert row["n_px"] == img.size and row["n_runs"] == n_runs
        assert row["enc_bytes"] == 3 * n_runs
        assert row["ratio_permille"] == 1000 * 3 * n_runs // img.size
        assert row["psnr_ok"]


def test_snapshot_diff_matches_pandas_reference(sf_dir):
    """snapshot_diff == a pandas full-outer reference over the same
    snapshot predicates; all four statuses present."""
    import duckdb
    import numpy as np
    import pandas as pd
    from osmquadtreepostgis_ray.queries import q_snapshot_diff

    out = q_snapshot_diff(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    ev = duckdb.sql(
        f"SELECT event_id, value FROM '{sf_dir}/events.parquet'").df()
    e = ev["event_id"].to_numpy(np.int64)
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    old = pd.DataFrame({"event_id": e, "old_cents": cents})[
        (e * 2654435761) % 10 < 8]
    new = pd.DataFrame({"event_id": e,
                        "new_cents": cents + np.where(e % 7 == 0, 100, 0)})[
        (e * 7919) % 10 < 9]
    ref = old.merge(new, on="event_id", how="outer").sort_values("event_id") \
        .reset_index(drop=True)
    o_abs = ref["old_cents"].isna().to_numpy()
    n_abs = ref["new_cents"].isna().to_numpy()
    status = np.where(o_abs, "added", np.where(n_abs, "removed", np.where(
        ref["old_cents"].to_numpy() == ref["new_cents"].to_numpy(),
        "same", "changed")))
    assert (out["event_id"].to_numpy() == ref["event_id"].to_numpy(np.int64)).all()
    assert (out["status"].to_numpy() == status).all()
    assert (out["old_cents"].to_numpy() ==
            np.where(o_abs, -1, ref["old_cents"].fillna(-1)).astype(np.int64)).all()
    assert (out["new_cents"].to_numpy() ==
            np.where(n_abs, -1, ref["new_cents"].fillna(-1)).astype(np.int64)).all()
    assert set(np.unique(status)) == {"added", "removed", "changed", "same"}


def test_embed_calibration_matches_numpy(sf_dir):
    """embed_calibration per-dim stats == direct numpy over the whole
    embeddings table in the same floor-1024 fixed point."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.queries import q_embed_calibration
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT

    out = q_embed_calibration(sf_dir).to_pandas() \
        .sort_values("dim").reset_index(drop=True)
    emb = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'").df()["embedding"]
    m = np.stack([np.asarray(v, np.float64) for v in emb])
    q = np.floor(m * KM_SCALE).astype(np.int64) + KM_SHIFT
    assert (out["dim"].to_numpy() == np.arange(q.shape[1])).all()
    assert (out["n"].to_numpy() == q.shape[0]).all()
    assert (out["min_q"].to_numpy() == q.min(axis=0)).all()
    assert (out["max_q"].to_numpy() == q.max(axis=0)).all()
    assert (out["sum_q"].to_numpy() == q.sum(axis=0)).all()
    assert (out["mean_milli_q"].to_numpy() == 1000 * q.sum(axis=0) // q.shape[0]).all()


def test_geo_dup_groups_matches_local_counter(sf_dir):
    """geo_dup_groups == a local Counter over (ahash, depth-2 cell) of
    the whole synthetic corpus, kept at n >= 2."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq
    from osmquadtreepostgis_ray.functions import geotag, quadtree
    from osmquadtreepostgis_ray.queries import GEO_DUP_DEPTH, q_geo_dup_groups
    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.images import AHash

    out = q_geo_dup_groups(sf_dir).to_pandas() \
        .sort_values(["ahash", "cell"]).reset_index(drop=True)

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    b = synth_images_batch(docs)
    ah = AHash()(b).column("ahash").to_numpy()
    ph = b.column("phash").to_numpy()
    lon, lat = geotag.lonlat_milli_from_phash(ph)
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, GEO_DUP_DEPTH)
    cell = quadtree.encode_ixy(ix, iy, GEO_DUP_DEPTH)
    doc = b.column("doc_id").to_numpy()
    groups: dict = collections.defaultdict(list)
    for a, c, d in zip(ah.tolist(), cell.tolist(), doc.tolist()):
        groups[(a, c)].append(d)
    ref = sorted((a, c, len(ds_), min(ds_))
                 for (a, c), ds_ in groups.items() if len(ds_) >= 2)
    got = list(out.itertuples(index=False, name=None))
    assert got == ref


def test_histogram_quantiles_bounds_exact_quantile(sf_dir):
    """histogram_quantiles: the bucket upper bound is >= the exact
    quantile value and within one bucket width of it (the sketch's
    rank-error contract), per event_type."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.queries import (HIST_BUCKET_CENTS,
                                                q_histogram_quantiles)

    out = q_histogram_quantiles(sf_dir).to_pandas().set_index("event_type")
    ev = duckdb.sql(f"SELECT event_type, value FROM "
                    f"'{sf_dir}/events.parquet'").df()
    for et, grp in ev.groupby("event_type"):
        cents = np.sort(np.rint(grp["value"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        for col, p in (("p50_cents_ub", 500), ("p95_cents_ub", 950)):
            exact = int(cents[(n * p + 999) // 1000 - 1])
            ub = int(out.loc[et, col])
            assert ub >= exact
            assert ub - exact <= HIST_BUCKET_CENTS
        assert out.loc[et, "n"] == n


def test_caption_stats_by_zone_partitions_corpus(sf_dir):
    """caption_stats_by_zone: zone counts partition the corpus exactly
    (admin zones tile the domain) and sums match a local reference."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.functions import geotag
    from osmquadtreepostgis_ray.queries import q_caption_stats_by_zone
    from osmquadtreepostgis_ray.sources import zones as Z

    out = q_caption_stats_by_zone(sf_dir).to_pandas().set_index("zone_id")
    docs = duckdb.sql(f"SELECT doc_id, n_chars FROM "
                      f"'{sf_dir}/documents.parquet'").df()
    ph = geotag.phash_of(docs["doc_id"].to_numpy())
    lon, lat = geotag.lonlat_milli_from_phash(ph)
    zone = (lat // Z.ADMIN_H) * Z.AX + (lon // Z.ADMIN_W) + Z.ADMIN_ID_BASE
    assert out["n"].sum() == len(docs)
    for z in np.unique(zone):
        m = zone == z
        assert out.loc[z, "n"] == int(m.sum())
        assert out.loc[z, "sum_chars"] == int(docs["n_chars"].to_numpy()[m].sum())


def test_embed_pq_matches_numpy_lloyd(sf_dir):
    """embed_pq: each subspace's codes equal an independent in-memory
    Lloyd run (same floor-1024 quantization, argmin tie -> smallest j,
    integer-mean update, empty-cluster carry-over)."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.queries import q_embed_pq
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT

    m, k, iters = 4, 4, 3
    out = q_embed_pq(sf_dir, m=m, k=k, iters=iters).to_pandas()
    emb = duckdb.sql(f"SELECT vec_id, embedding FROM "
                     f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id").df()
    ids = emb["vec_id"].to_numpy(np.int64)
    M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    Q = np.floor(M * KM_SCALE).astype(np.int64) + KM_SHIFT
    d = Q.shape[1]
    sd = d // m
    assert len(out) == m * len(ids)
    for s in range(m):
        Qs = Q[:, s * sd:(s + 1) * sd]
        cents = Qs[np.argsort(ids)[:k]].copy()  # vec_id < k init
        for it in range(iters):
            d2 = ((Qs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            if it < iters - 1:
                for j in range(k):
                    if (a == j).any():
                        cents[j] = Qs[a == j].sum(axis=0) // (a == j).sum()
        sub = out[out["subspace"] == s].sort_values("vec_id")
        assert (sub["vec_id"].to_numpy() == np.sort(ids)).all()
        order = np.argsort(ids)
        assert (sub["cluster"].to_numpy() == a[order]).all()
        assert (sub["d2"].to_numpy()
                == d2[np.arange(len(ids)), a][order]).all()


def test_embed_knn_pq_matches_local_adc(sf_dir):
    """embed_knn_pq == a local numpy ADC scan using codebooks trained
    by the same per-subspace Lloyd (shared kmeans_assign path)."""
    import duckdb
    import numpy as np
    import pyarrow.compute as pc
    from osmquadtreepostgis_ray.queries import q_embed_knn_pq, read_table
    from osmquadtreepostgis_ray.stages.cluster import (KM_SCALE, KM_SHIFT,
                                                       kmeans_assign)
    import pyarrow as pa

    k, nq, m, kc, iters = 5, 5, 4, 4, 3
    out = q_embed_knn_pq(sf_dir, k=k, nq=nq, m=m, kc=kc, iters=iters) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)

    emb = duckdb.sql(f"SELECT vec_id, embedding FROM "
                     f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id").df()
    ids = emb["vec_id"].to_numpy(np.int64)
    Q = np.floor(np.stack([np.asarray(v, np.float64)
                           for v in emb["embedding"]])
                 * KM_SCALE).astype(np.int64) + KM_SHIFT
    d = Q.shape[1]
    sd = d // m
    approx = np.zeros((nq, len(ids)), np.int64)
    for s in range(m):
        def slice_s(t, s=s):
            e = t.column("embedding")
            dd = len(e[0])
            return pa.table({"vec_id": t.column("vec_id"),
                             "embedding": pc.list_slice(e, s * (dd // m),
                                                        (s + 1) * (dd // m))})
        sub = read_table(sf_dir, "embeddings",
                         columns=["vec_id", "embedding"]) \
            .map_batches(slice_s, batch_format="pyarrow")
        _, C = kmeans_assign(sub, k=kc, iters=iters, return_centroids=True)
        Qs = Q[:, s * sd:(s + 1) * sd]
        code = ((Qs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        lut = ((Qs[:nq, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (nq, kc)
        approx += lut[:, code]
    for qi in range(nq):
        row = approx[qi].copy()
        row[ids == qi] = np.iinfo(np.int64).max
        order = np.lexsort((ids, row))[:k]
        got = out[out["query_id"] == qi]
        assert (got["neighbor_id"].to_numpy() == ids[order]).all()
        assert (got["approx_d2"].to_numpy() == row[order]).all()


def test_pq_recall_bounds_and_exact_self_consistency(sf_dir):
    """pq_recall: one row per query, recall in [0, 1000]; and the exact
    quantized-euclid brute (the ground-truth side) agrees with a local
    numpy scan."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.queries import q_embed_knn_quant, q_pq_recall
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT

    nq, k = 5, 5
    rec = q_pq_recall(sf_dir, k=k, nq=nq).to_pandas()
    assert len(rec) == nq
    assert rec["recall_permille"].between(0, 1000).all()
    assert (rec["recall_permille"] == 1000 * rec["n_hit"] // k).all()

    exact = q_embed_knn_quant(sf_dir, k=k, nq=nq).to_pandas()
    emb = duckdb.sql(f"SELECT vec_id, embedding FROM "
                     f"'{sf_dir}/embeddings.parquet' ORDER BY vec_id").df()
    ids = emb["vec_id"].to_numpy(np.int64)
    Q = np.floor(np.stack([np.asarray(v, np.float64)
                           for v in emb["embedding"]])
                 * KM_SCALE).astype(np.int64) + KM_SHIFT
    for qi in range(nq):
        d = ((Q - Q[ids == qi][0]) ** 2).sum(axis=1)
        d[ids == qi] = np.iinfo(np.int64).max
        order = np.lexsort((ids, d))[:k]
        got = exact[exact["query_id"] == qi].sort_values("rank")
        assert (got["neighbor_id"].to_numpy() == ids[order]).all()
        assert (got["d2"].to_numpy() == d[order]).all()


def _dbscan_ref(eid, x, y, eps, minp):
    """Brute-force DBSCAN with the engine's deterministic rules (label =
    min core event_id per component; border takes MIN over reachable
    cores; noise -1)."""
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    m = (dx * dx + dy * dy <= eps * eps) & (eid[None, :] != eid[:, None])
    core = m.sum(1) + 1 >= minp
    n = len(eid)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ai, bi = np.nonzero(m)
    for a, b in zip(ai, bi):
        if core[a] and core[b]:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, eid[i]), eid[i])
    label = np.full(n, -1, np.int64)
    for i in range(n):  # pass 1: cores only (border min must see final core labels)
        if core[i]:
            label[i] = comp_min[find(i)]
    for i in range(n):  # pass 2: borders
        if not core[i]:
            nb = np.nonzero(m[i] & core)[0]
            if len(nb):
                label[i] = min(label[j] for j in nb)
    return pd.DataFrame({"event_id": eid, "label": label}) \
        .sort_values("event_id").reset_index(drop=True)


def test_dbscan_matches_numpy_reference(sf_dir):
    from osmquadtreepostgis_ray.stages.cluster import dbscan
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    eid = ev["event_id"].to_numpy(np.int64)
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(), eid)

    # registered parameters (sparse at sf0.001: exercises the all-noise
    # / empty-core degenerate paths end-to-end)
    out = Q.q_dbscan(sf_dir).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, _dbscan_ref(eid, x, y, Q.DBSCAN_EPS, Q.DBSCAN_MIN_PTS))

    # denser radius at coarser grid: real clusters, borders and noise
    pts = Q.prep_events(sf_dir).select_columns(
        ["event_id", "lon_milli", "lat_milli"])
    out2 = dbscan(pts, eps_milli=5000, min_pts=4, depth=5).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref2 = _dbscan_ref(eid, x, y, 5000, 4)
    pd.testing.assert_frame_equal(out2, ref2)
    assert (out2["label"] >= 0).any() and (out2["label"] == -1).any()
    assert (ref2["label"] >= 0).sum() > 20  # non-degenerate structure


def test_idw_matches_numpy_reference(sf_dir):
    out = Q.q_idw(sf_dir).to_pandas().sort_values(["ix", "iy"]) \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "value"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    x4, y4 = 4 * x, 4 * (y + 5000)
    ix, iy = x4 // 22500, y4 // 11250
    r4 = 4 * Q.IDW_RADIUS
    r2 = r4 * r4
    rows = []
    for cix, ciy in sorted(set(zip(ix, iy))):
        cx4, cy4 = cix * 22500 + 11250, ciy * 11250 + 5625
        d2 = (x4 - cx4) ** 2 + (y4 - cy4) ** 2
        k = d2 < r2
        w = r2 - d2[k]
        rows.append((cix, ciy, int(k.sum()), int((cents[k] * w).sum()),
                     int(w.sum())))
    ref = pd.DataFrame(rows, columns=["ix", "iy", "n_src", "num", "den"])
    pd.testing.assert_frame_equal(out, ref)
    assert (out["n_src"] == 0).any()  # corner-only occupied cells exist


def test_moran_matches_numpy_reference(sf_dir):
    out = Q.q_moran(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ix, iy = x * 64 // 360000, (y + 5000) * 64 // 180000
    key = ix * (1 << 32) + iy
    u, n = np.unique(key, return_counts=True)
    nc = len(u)
    d = nc * n.astype(np.int64) - int(n.sum())
    dev = dict(zip(u, d))
    num = w = 0
    for k, dk in dev.items():
        kx, ky = k >> 32, k & 0xFFFFFFFF
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = dev.get((kx + dx) * (1 << 32) + (ky + dy))
            if nb is not None:
                num += dk * nb
                w += 1
    assert out.shape == (1, 4)
    r = out.iloc[0]
    assert (int(r["n_cells"]), int(r["w_pairs"]), int(r["num"]),
            int(r["den"])) == (nc, w, int(num), int((d * d).sum()))
    assert w > 0


def test_seq_pack_matches_pandas_reference(sf_dir):
    from osmquadtreepostgis_ray.functions.text import token_count
    out = Q.q_seq_pack(sf_dir).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs["n_tokens"] = token_count(docs["text"])
    docs["shard"] = docs["doc_id"] % Q.PACK_SHARDS
    excl = (docs.groupby("shard", sort=False)["n_tokens"].cumsum()
            - docs["n_tokens"])
    ref = pd.DataFrame({"shard": docs["shard"], "doc_id": docs["doc_id"],
                        "n_tokens": docs["n_tokens"],
                        "chunk": excl // Q.PACK_BUDGET,
                        "tok_offset": excl % Q.PACK_BUDGET})
    pd.testing.assert_frame_equal(out, ref)
    # packing invariants: chunk ids are dense-monotone per shard in doc
    # order; offsets stay inside the budget
    assert (out["tok_offset"] < Q.PACK_BUDGET).all()
    assert (out.sort_values(["shard", "doc_id"])
               .groupby("shard")["chunk"].diff().dropna() >= 0).all()


def test_zonal_mode_matches_pandas_reference(sf_dir):
    out = Q.q_zonal_mode(sf_dir).to_pandas() \
        .sort_values(["zone_id", "kind"]).reset_index(drop=True)
    pairs = Q.q_pip_zones(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "event_type"]).to_pandas()
    m = pairs.merge(ev, on="event_id")
    cnt = m.groupby(["zone_id", "kind", "event_type"], as_index=False) \
           .size().rename(columns={"size": "n"})
    cnt = cnt.sort_values(["zone_id", "kind", "n", "event_type"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
    top = cnt.groupby(["zone_id", "kind"], sort=False).head(1) \
        .rename(columns={"event_type": "mode_type", "n": "n_mode"}) \
        .sort_values(["zone_id", "kind"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out, top[["zone_id", "kind", "mode_type", "n_mode"]],
        check_dtype=False)


def test_hotspot_matches_numpy_reference(sf_dir):
    out = Q.q_hotspot(sf_dir).to_pandas().sort_values(["ix", "iy"]) \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ix, iy = x * 64 // 360000, (y + 5000) * 64 // 180000
    cnt = {}
    for a, b in zip(ix, iy):
        cnt[(a, b)] = cnt.get((a, b), 0) + 1
    rows = []
    for (a, b), n in sorted(cnt.items()):
        s = c = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                v = cnt.get((a + dx, b + dy))
                if v is not None:
                    s += v
                    c += 1
        rows.append((a, b, n, s, c))
    ref = pd.DataFrame(rows, columns=["ix", "iy", "n", "nbr_sum", "nbr_cnt"])
    pd.testing.assert_frame_equal(out, ref)
    assert (out["nbr_cnt"] > 1).any()


def test_od_flows_matches_pandas_reference(sf_dir):
    out = Q.q_od_flows(sf_dir).to_pandas() \
        .sort_values(["from_tile", "to_tile"]).reset_index(drop=True)
    ev = Q.prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"],
                                 kind="mergesort")
    u = ev["user_id"].to_numpy()
    tile = ev["tile"].to_numpy(np.int64)
    same = u[1:] == u[:-1]
    ref = pd.DataFrame({"from_tile": tile[:-1][same],
                        "to_tile": tile[1:][same]}) \
        .groupby(["from_tile", "to_tile"], as_index=False).size() \
        .rename(columns={"size": "n"}) \
        .sort_values(["from_tile", "to_tile"]).reset_index(drop=True)
    ref["n"] = ref["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)
    # flow conservation: total transitions = total events - #users
    assert out["n"].sum() == len(ev) - ev["user_id"].nunique()


def test_staypoints_matches_numpy_reference(sf_dir):
    out = Q.q_staypoints(sf_dir).to_pandas() \
        .sort_values(["user_id", "start_event_id"]).reset_index(drop=True)
    ev = Q.prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"],
                                 kind="mergesort").reset_index(drop=True)
    u = ev["user_id"].to_numpy(np.int64)
    x = ev["lon_milli"].to_numpy(np.int64)
    y = ev["lat_milli"].to_numpy(np.int64)
    e = ev["event_id"].to_numpy(np.int64)
    t = ev["ts"].astype("int64").to_numpy()
    d2 = (x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2
    brk = np.r_[True, (u[1:] != u[:-1]) | (d2 > Q.STAY_D * Q.STAY_D)]
    firsts = np.flatnonzero(brk)
    lens = np.diff(np.r_[firsts, len(u)])
    rows = []
    for f, ln in zip(firsts, lens):
        if ln >= Q.STAY_MIN:
            rows.append((u[f], e[f], ln, t[f + ln - 1] - t[f],
                         x[f:f + ln].sum(), y[f:f + ln].sum()))
    ref = pd.DataFrame(rows, columns=["user_id", "start_event_id", "n_pts",
                                      "dur_us", "sum_x", "sum_y"]) \
        .sort_values(["user_id", "start_event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0 and (out["n_pts"] >= Q.STAY_MIN).all()


def test_hilbert_matches_reference_and_curve_properties(sf_dir):
    from osmquadtreepostgis_ray.functions.hilbert import xy2d
    out = Q.q_hilbert(sf_dir).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ix, iy = x * 256 // 360000, (y + 5000) * 256 // 180000
    d = xy2d(ix, iy, 8)
    assert out["hilbert"].to_numpy(np.int64).tolist() == d.tolist()
    assert (out["bucket"].to_numpy(np.int64) == d // 256).all()
    # curve properties at depth 4: bijective and unit-step continuous
    n = 16
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    full = xy2d(gx.ravel(), gy.ravel(), 4)
    assert sorted(full.tolist()) == list(range(n * n))
    order = np.argsort(full)
    steps = (np.abs(np.diff(gx.ravel()[order]))
             + np.abs(np.diff(gy.ravel()[order])))
    assert (steps == 1).all()


def test_bpe_pairs_matches_python_reference(sf_dir):
    import re
    out = Q.q_bpe_pairs(sf_dir).to_pandas().sort_values(["a", "b"]) \
        .reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).to_pandas()
    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")
    cnt: dict[tuple, int] = {}
    for txt in docs["text"]:
        for w in rx.findall(txt):
            for i in range(len(w) - 1):
                k = (w[i], w[i + 1])
                cnt[k] = cnt.get(k, 0) + 1
    ref = pd.DataFrame([(a, b, n) for (a, b), n in sorted(cnt.items())],
                       columns=["a", "b", "n"])
    ref["n"] = ref["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 50  # non-trivial alphabet coverage


def test_spacetime_cube_matches_pandas_reference(sf_dir):
    out = Q.q_spacetime_cube(sf_dir).to_pandas() \
        .sort_values(["tile", "hour"]).reset_index(drop=True)
    ev = Q.prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .to_pandas()
    hour = (ev["ts"].astype("int64") // 3_600_000_000) % 24
    c = ev.assign(hour=hour).groupby(["tile", "hour"], as_index=False) \
        .size().rename(columns={"size": "n"})
    c["n"] = c["n"].astype(np.int64)
    tot = c.groupby("tile")["n"].transform("sum")
    c["permille"] = (1000 * c["n"]) // tot
    pd.testing.assert_frame_equal(
        out, c.sort_values(["tile", "hour"]).reset_index(drop=True))
    # shares within a tile sum to <= 1000 (floor division)
    s = out.groupby("tile")["permille"].sum()
    assert (s <= 1000).all() and (s > 900).all()


def test_colocation_matches_numpy_reference(sf_dir):
    out = Q.q_colocation(sf_dir).to_pandas().sort_values(["ua", "ub"]) \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ix, iy = x * 64 // 360000, (y + 5000) * 64 // 180000
    t = ev["ts"].astype("int64").to_numpy()
    e = ev["event_id"].to_numpy(np.int64)
    u = ev["user_id"].to_numpy(np.int64)
    cnt = {}
    n = len(e)
    for i in range(n):
        for j in range(n):
            if (ix[i] == ix[j] and iy[i] == iy[j] and u[i] != u[j]
                    and (t[j] > t[i] or (t[j] == t[i] and e[j] > e[i]))
                    and t[j] - t[i] <= Q.COLOC_T_US):
                k = (min(u[i], u[j]), max(u[i], u[j]))
                cnt[k] = cnt.get(k, 0) + 1
    ref = pd.DataFrame([(a, b, c) for (a, b), c in sorted(cnt.items())],
                       columns=["ua", "ub", "n"])
    ref["n"] = ref["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)
    assert len(out) > 0


def test_headings_matches_pandas_reference(sf_dir):
    out = Q.q_headings(sf_dir).to_pandas() \
        .sort_values(["user_id", "octant"]).reset_index(drop=True)
    ev = Q.prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"],
                                 kind="mergesort")
    u = ev["user_id"].to_numpy(np.int64)
    x = ev["lon_milli"].to_numpy(np.int64)
    y = ev["lat_milli"].to_numpy(np.int64)
    same = u[1:] == u[:-1]
    dx, dy, uu = (x[1:] - x[:-1])[same], (y[1:] - y[:-1])[same], u[1:][same]

    def octant(dx, dy):
        ax, ay = abs(dx), abs(dy)
        if dx > 0 and dy >= 0 and ax > ay:
            return 0
        if dy > 0 and dx > 0 and ay >= ax:
            return 1
        if dy > 0 and dx <= 0 and ay > ax:
            return 2
        if dx < 0 and dy > 0 and ax >= ay:
            return 3
        if dx < 0 and dy <= 0 and ax > ay:
            return 4
        if dy < 0 and dx < 0 and ay >= ax:
            return 5
        if dy < 0 and dx >= 0 and ay > ax:
            return 6
        if dx > 0 and dy < 0 and ax >= ay:
            return 7
        return -1

    ref = pd.DataFrame({"user_id": uu,
                        "octant": [octant(a, b) for a, b in zip(dx, dy)]}) \
        .groupby(["user_id", "octant"], as_index=False).size() \
        .rename(columns={"size": "n"}) \
        .sort_values(["user_id", "octant"]).reset_index(drop=True)
    ref["n"] = ref["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)
    # octant kernel unit cases: axes and diagonals
    assert [octant(*p) for p in
            [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
             (0, -1), (1, -1), (0, 0)]] == [0, 1, 2, 3, 4, 5, 6, 7, -1]


def test_thin_matches_pandas_reference(sf_dir):
    out = Q.q_thin(sf_dir).to_pandas().sort_values(["ix", "iy", "event_id"]) \
        .reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ref = pd.DataFrame({"ix": x * 64 // 360000,
                        "iy": (y + 5000) * 64 // 180000,
                        "event_id": ev["event_id"].to_numpy(np.int64)}) \
        .sort_values(["ix", "iy", "event_id"], kind="mergesort") \
        .groupby(["ix", "iy"], sort=False).head(Q.THIN_K) \
        .sort_values(["ix", "iy", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    assert out.groupby(["ix", "iy"]).size().max() <= Q.THIN_K
    assert len(out) < len(ev)  # it actually thinned something
