"""Tests for the sketch (HLL) and radius-join / tile-pyramid operators."""

import numpy as np
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import geotag, quadtree, sketch


def test_bitlen_matches_python():
    rs = np.random.RandomState(7)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, 4, (1 << 58) - 1, 1 << 58, (1 << 63), (1 << 64) - 1],
                 dtype=np.uint64),
        rs.randint(0, 1 << 62, size=200).astype(np.uint64),
        # the float-log2 hazard zone: just below powers of two
        (np.uint64(1) << rs.randint(40, 63, size=50).astype(np.uint64)) - np.uint64(1),
    ])
    got = sketch.bitlen_u64(vals)
    exp = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert np.array_equal(got, exp)


def test_hll_register_rho_bounds_and_estimate():
    keys = np.arange(20000, dtype=np.int64)
    reg, rho = sketch.hll_register_rho(keys)
    assert reg.min() >= 0 and reg.max() < sketch.HLL_M
    assert rho.min() >= 1 and rho.max() <= sketch.HLL_WBITS + 1
    full = np.zeros(sketch.HLL_M, dtype=np.int64)
    np.maximum.at(full, reg, rho)
    est = sketch.hll_estimate(full)
    # HLL with m=64 has ~13% std error; allow 3 sigma
    assert 0.6 * 20000 < est < 1.4 * 20000
    # registers are a pure function of the key set (order-invariant)
    reg2, rho2 = sketch.hll_register_rho(keys[::-1].copy())
    full2 = np.zeros(sketch.HLL_M, dtype=np.int64)
    np.maximum.at(full2, reg2, rho2)
    assert np.array_equal(full, full2)


def test_radius_join_matches_brute():
    from osmquadtreepostgis_ray.stages.pip_join import radius_join
    R = 2000
    # clustered synthetic points straddling several depth-6 cell borders
    rs = np.random.RandomState(11)
    n = 400
    eid = np.arange(n, dtype=np.int64)
    x = (rs.randint(0, 30000, n) + 340000 - 15000).astype(np.int64)  # near lon edge
    y = rs.randint(0, 20000, n).astype(np.int64)                      # at lat 0 edge
    ev = ray.data.from_arrow(pa.table({"event_id": eid, "lon_milli": x,
                                       "lat_milli": y})).repartition(5)
    got = radius_join(ev, radius_milli=R).to_pandas()
    got_pairs = set(zip(got["query_id"], got["event_id"]))
    qm = eid % 101 == 0
    exp = set()
    for qe, qx, qy in zip(eid[qm], x[qm], y[qm]):
        d2 = (x - qx) ** 2 + (y - qy) ** 2
        m = (d2 <= R * R) & (eid != qe)
        for e in eid[m]:
            exp.add((qe, e))
    assert got_pairs == exp
    # dist2 values exact
    for _, row in got.iterrows():
        i = np.flatnonzero(eid == row["event_id"])[0]
        q = np.flatnonzero(eid == row["query_id"])[0]
        assert row["dist2"] == (x[i] - x[q]) ** 2 + (y[i] - y[q]) ** 2


def test_tile_pyramid_levels_consistent(sf_dir):
    from osmquadtreepostgis_ray.queries import PYRAMID_DEPTHS, q_tile_pyramid
    pyr = q_tile_pyramid(sf_dir).to_pandas()
    lv = {d: g.set_index("cell")["n"] for d, g in pyr.groupby("depth")}
    totals = {d: int(s.sum()) for d, s in lv.items()}
    assert len(set(totals.values())) == 1  # every level preserves mass
    # each level equals the rollup of the level below it
    for hi, lo in zip(PYRAMID_DEPTHS, PYRAMID_DEPTHS[1:]):
        cells = lv[hi].index.to_numpy()
        rolled = quadtree.at_depth(cells, lo)
        agg = {}
        for c, n in zip(rolled, lv[hi].to_numpy()):
            agg[c] = agg.get(c, 0) + int(n)
        assert agg == {int(c): int(n) for c, n in lv[lo].items()}


def test_kmeans_partition_invariant(sf_dir):
    from osmquadtreepostgis_ray.sources.tables import read_table
    from osmquadtreepostgis_ray.stages.cluster import kmeans_assign
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    a = kmeans_assign(ds, k=4, iters=3).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = kmeans_assign(ds.repartition(7), k=4, iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)  # integer partial sums are associative -> invariant
    assert set(a["cluster"]) <= set(range(4))
    assert a["cluster"].nunique() > 1  # did actually split the corpus


def test_fuzzy_join_matches_brute():
    from osmquadtreepostgis_ray.stages.joins import (_deletion_variant_hashes,
                                                     _dist_le1, fuzzy_join_dist1)
    # deletion-hash identity: variant hash == hash of the variant string
    from osmquadtreepostgis_ray.stages.joins import _FNV_P

    def H(s):
        h = np.uint64(0)
        for c in s.encode():
            h = h * _FNV_P + np.uint64(c)
        return h

    for s in ["abc", "aab", "x", "", "Customer#000000042"]:
        hs, rs = _deletion_variant_hashes([s])
        want = {int(H(s))} | {int(H(s[:j] + s[j + 1:])) for j in range(len(s))}
        assert set(int(v) for v in hs) == want, s

    rs_ = np.random.RandomState(3)
    alph = "ab1"
    names = ["".join(rs_.choice(list(alph), rs_.randint(1, 5))) for _ in range(120)]
    names = [f"u{n}" for n in names]
    ids = np.arange(len(names), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": ids, "s": names})).repartition(4)
    got = fuzzy_join_dist1(ds, "k", "s").to_pandas()
    got_set = {(a, b, d) for a, b, d in zip(got["a_key"], got["b_key"], got["dist"])}

    def lev(a, b):
        import itertools
        la, lb = len(a), len(b)
        D = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, D[0] = D[0], i
            for j in range(1, lb + 1):
                prev, D[j] = D[j], min(D[j] + 1, D[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return D[lb]

    exp = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            d = lev(names[i], names[j])
            if d <= 1:
                exp.add((i, j, d))
    assert got_set == exp
    assert exp  # fixture actually produces pairs (incl. duplicates, dist 0)


def test_rasterize_mass_and_tile_consistency(sf_dir):
    import duckdb
    from osmquadtreepostgis_ray.queries import q_rasterize
    r = q_rasterize(sf_dir).to_pandas()
    con = duckdb.connect()
    n_events = con.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert int(r["n"].sum()) == n_events       # every event lands in one pixel
    assert r["px"].between(0, 15).all() and r["py"].between(0, 15).all()
    assert (r["n"] > 0).all()                  # nonzero pixels only


def test_patch_means_cover_image(sf_dir):
    from osmquadtreepostgis_ray.queries import q_image_patches
    p = q_image_patches(sf_dir).to_pandas()
    g = p.groupby("image_id").size()
    # dims are (16,16)/(32,32)/(64,48) -> 4/16/48 patches
    assert set(g.unique()) == {4, 16, 48}
    assert p["patch_mean"].between(0, 255).all()


def test_pip_join_carry_columns(sf_dir):
    """PipJoin carry columns gather point measures through the join:
    same pairs as the bare join, and each pair's carried value equals
    the source row's value (so zonal stats need no join back)."""
    import ray

    from osmquadtreepostgis_ray.queries import prep_events
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_fn

    ev = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def cents(batch):
        import numpy as np
        import pyarrow as pa
        return batch.append_column(
            "cents", pa.array(np.rint(batch.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64()))

    zref = ray.put(zones_table())
    bare = ev.map_batches(pip_join_fn(zref), batch_format="pyarrow").to_pandas()
    carried = ev.map_batches(cents, batch_format="pyarrow").map_batches(
        pip_join_fn(zref, carry=("cents",)), batch_format="pyarrow").to_pandas()
    assert len(bare) == len(carried)
    a = bare.sort_values(["event_id", "zone_id"]).reset_index(drop=True)
    b = carried.sort_values(["event_id", "zone_id"]).reset_index(drop=True)
    assert (a["event_id"] == b["event_id"]).all()
    assert (a["zone_id"] == b["zone_id"]).all()
    src = ev.to_pandas()
    import numpy as np
    want = dict(zip(src["event_id"],
                    np.rint(src["value"] * 100).astype(np.int64)))
    got = b.drop_duplicates("event_id")
    assert all(want[e] == c for e, c in zip(got["event_id"], got["cents"]))


def test_rect_overlap_join_matches_brute():
    """Pairs exactly once (canonical-cell dedup) and exact inter_area,
    vs an O(n*m) numpy brute force; rects sized to straddle many cells."""
    from osmquadtreepostgis_ray.stages.rect_join import rect_overlap_join
    rs = np.random.RandomState(23)
    CW, CH = 1000, 700
    nl, nr = 120, 80
    lx0 = rs.randint(0, 20000, nl).astype(np.int64)
    ly0 = rs.randint(0, 14000, nl).astype(np.int64)
    lx1 = lx0 + rs.randint(1, 3 * CW, nl)       # up to 3 cells wide
    ly1 = ly0 + rs.randint(1, 3 * CH, nl)
    rx0 = rs.randint(0, 20000, nr).astype(np.int64)
    ry0 = rs.randint(0, 14000, nr).astype(np.int64)
    rx1 = rx0 + rs.randint(1, 5 * CW, nr)
    ry1 = ry0 + rs.randint(1, 5 * CH, nr)
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(np.arange(nl), pa.int64()),
        "lx0": lx0, "ly0": ly0, "lx1": lx1, "ly1": ly1}))
    right = ray.data.from_arrow(pa.table({
        "rid": pa.array(np.arange(nr), pa.int64()),
        "rx0": rx0, "ry0": ry0, "rx1": rx1, "ry1": ry1}))
    got = rect_overlap_join(
        left, right, lbox=("lx0", "ly0", "lx1", "ly1"),
        rbox=("rx0", "ry0", "rx1", "ry1"), cell_w=CW, cell_h=CH,
        int_cols=["lid", "rid"]).to_pandas()
    # brute force
    ov = ((lx0[:, None] < rx1[None, :]) & (rx0[None, :] < lx1[:, None])
          & (ly0[:, None] < ry1[None, :]) & (ry0[None, :] < ly1[:, None]))
    li, ri = np.nonzero(ov)
    area = ((np.minimum(lx1[li], rx1[ri]) - np.maximum(lx0[li], rx0[ri]))
            * (np.minimum(ly1[li], ry1[ri]) - np.maximum(ly0[li], ry0[ri])))
    exp = sorted(zip(li.tolist(), ri.tolist(), area.tolist()))
    assert len(got) == len(exp)                      # exactly-once per pair
    got_t = sorted(zip(got["lid"].tolist(), got["rid"].tolist(),
                       got["inter_area"].tolist()))
    assert got_t == exp


def test_tile_mosaic_mass_conservation(sf_dir):
    """Per-tile pixel sums must equal the sum of the per-image 8x8
    thumbnails computed independently (resize path), and n_images must
    match the per-tile image counts — mass conservation across the
    combiner + shuffle."""
    from osmquadtreepostgis_ray import queries as Q
    from osmquadtreepostgis_ray.functions import codecs, geotag, quadtree
    from osmquadtreepostgis_ray.sources.images import read_images

    mos = Q.q_tile_mosaic(sf_dir).to_pandas()
    # independent per-image thumbs on the driver (small sf)
    imgs = read_images(sf_dir, with_bytes=True).to_pandas()
    lon_m, lat_m = geotag.lonlat_milli_from_phash(imgs["phash"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon_m, lat_m)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, Q.TILE_DEPTH)
    tiles = quadtree.encode_ixy(ix, iy, Q.TILE_DEPTH)
    exp_sum = {}
    exp_cnt = {}
    for i, row in imgs.iterrows():
        dec = codecs.decode(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"])
        t8 = codecs.resize_nearest(dec, 8, 8).astype(np.int64)
        t = int(tiles[i])
        exp_sum[t] = exp_sum.get(t, 0) + t8
        exp_cnt[t] = exp_cnt.get(t, 0) + 1
    assert set(mos["tile"]) == set(exp_sum)
    for t, g in mos.groupby("tile"):
        g = g.sort_values(["py", "px"])
        assert np.array_equal(g["pixel_sum"].to_numpy(np.int64),
                              exp_sum[int(t)].ravel())
        assert (g["n_images"] == exp_cnt[int(t)]).all()


def test_dup_spans_matches_brute(sf_dir):
    """dup_spans vs a driver-side brute force over the same shingler."""
    from osmquadtreepostgis_ray import queries as Q
    from osmquadtreepostgis_ray.functions.text import char_shingles
    from osmquadtreepostgis_ray.sources.tables import read_table

    got = Q.q_dup_spans(sf_dir).to_pandas().set_index("doc_id").sort_index()
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    sh = {int(r.doc_id): set(char_shingles(r.text, 9).tolist())
          for r in docs.itertuples()}
    from collections import Counter
    owners = Counter(s for v in sh.values() for s in v)
    for did, grams in sh.items():
        dup = sum(1 for s in grams if owners[s] >= 2)
        if dup == 0:
            assert did not in got.index
            continue
        row = got.loc[did]
        assert row["dup_grams"] == dup and row["n_grams"] == len(grams)
        assert row["dup_permille"] == 1000 * dup // len(grams)


def test_mosaic_pyramid_rolls_up_exactly(sf_dir):
    """Each ancestor mosaic pixel must be the exact integer sum of its
    children's sums (pyramid consistency), and the deepest level must
    equal q_tile_mosaic."""
    from osmquadtreepostgis_ray import queries as Q
    from osmquadtreepostgis_ray.functions import quadtree

    pyr = Q.q_mosaic_pyramid(sf_dir).to_pandas()
    base = Q.q_tile_mosaic(sf_dir).to_pandas()
    d8 = pyr[pyr["depth"] == 8].drop(columns=["depth"])
    key = ["tile", "py", "px"]
    a = d8.sort_values(key).reset_index(drop=True)
    b = base.sort_values(key).reset_index(drop=True)
    assert a.equals(b[a.columns.tolist()])
    for child_d, parent_d in ((8, 6), (6, 4)):
        ch = pyr[pyr["depth"] == child_d].copy()
        ch["ptile"] = quadtree.at_depth(ch["tile"].to_numpy(np.int64), parent_d)
        roll = (ch.groupby(["ptile", "py", "px"])[["pixel_sum", "n_images"]]
                .sum().reset_index().rename(columns={"ptile": "tile"}))
        par = (pyr[pyr["depth"] == parent_d]
               [["tile", "py", "px", "pixel_sum", "n_images"]])
        m = roll.merge(par, on=["tile", "py", "px"], suffixes=("_r", "_p"))
        assert len(m) == len(par) == len(roll)
        assert (m["pixel_sum_r"] == m["pixel_sum_p"]).all()
        assert (m["n_images_r"] == m["n_images_p"]).all()


def test_dissolve_matches_union_find(sf_dir):
    """q_dissolve == a driver-side union-find over the same raster:
    same-count 4-adjacent cells merge, component id = min cell id."""
    import pandas as pd
    from osmquadtreepostgis_ray.queries import CELL_DEPTH, q_dissolve, q_rasterize

    G = 1 << CELL_DEPTH
    ras = q_rasterize(sf_dir).to_pandas()
    tx, ty, _ = quadtree.decode(ras["tile"].to_numpy())
    gx = tx * 16 + ras["px"].to_numpy()
    gy = ty * 16 + ras["py"].to_numpy()
    gid = gy * G + gx
    n = ras["n"].to_numpy(np.int64)
    by_id = dict(zip(gid, n))
    parent = {int(i): int(i) for i in gid}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, x, y, c in zip(gid, gx, gy, n):
        for nx, ny in ((x + 1, y), (x, y + 1)):
            j = ny * G + nx
            if nx < G and ny < G and by_id.get(j) == c:
                ra, rb = find(int(i)), find(int(j))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)

    rows = {}
    for i in gid:
        r = find(int(i))
        cells, mass = rows.get(r, (0, 0))
        rows[r] = (cells + 1, mass + by_id[i])
    want = (pd.DataFrame([(k, v[0], v[1]) for k, v in rows.items()],
                         columns=["comp", "n_cells", "sum_n"])
            .sort_values("comp").reset_index(drop=True).astype(np.int64))
    got = (q_dissolve(sf_dir).to_pandas()
           .sort_values("comp").reset_index(drop=True).astype(np.int64))
    pd.testing.assert_frame_equal(got, want)
    # merges are exercised at sf0.01 by the parity harness (9985
    # components from 9989 cells); sf0.001's raster is merge-free and
    # covers the all-isolated / empty-edge-set path instead


def test_sobel_kernel_known_values():
    """SobelPartial's convolution on a hand-built batch: a constant
    image has zero gradient; a vertical step edge of height s yields
    |gx| = 4s on the two interior columns flanking the step."""
    from osmquadtreepostgis_ray.stages.images import SobelPartial

    w = h = 8
    flat = np.full((h, w), 100, np.uint8)
    step = np.full((h, w), 10, np.uint8)
    step[:, 4:] = 110  # step of 100 between columns 3 and 4
    batch = pa.table({
        "bytes": pa.array([flat.tobytes(), step.tobytes()], pa.binary()),
        "w": pa.array([w, w], pa.int64()),
        "h": pa.array([h, h], pa.int64()),
        "fmt": pa.array(["raw", "raw"]),
        "phash": pa.array([7, 7], pa.int64()),  # same tile
    })
    out = SobelPartial(tile_depth=8, thresh=300).__call__(batch).to_pandas()
    assert len(out) == 1 and out["n_images"][0] == 2
    # step image: |gx| = 400 at interior centers cx in {3, 4}, 6 rows
    # each -> grad 400 * 12; edge pixels: the same 12 (400 >= 300)
    assert out["grad_sum"][0] == 400 * 12
    assert out["edge_px"][0] == 12


def test_pip_anti_is_exact_complement(sf_dir):
    """pip_anti ∪ {points with a grid containment} == all events, and
    the two sets are disjoint — the anti join is the exact complement
    of the positive join's grid rows (same containment kernel)."""
    from osmquadtreepostgis_ray.queries import q_pip_anti, q_pip_zones

    anti = set(q_pip_anti(sf_dir).to_pandas()["event_id"])
    pos = q_pip_zones(sf_dir).to_pandas()
    hit = set(pos.loc[pos["kind"] == "grid", "event_id"])
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert anti.isdisjoint(hit)
    assert len(anti) + len(hit) == n


def test_zone_distance_zero_iff_covered_and_matches_brute(sf_dir):
    """zone_distance: dist_sq == 0 exactly for the grid-covered points
    (complement of pip_anti), and a numpy brute-force clamp distance
    over all kept rectangles reproduces every row."""
    import numpy as np
    from osmquadtreepostgis_ray.queries import q_pip_anti, q_zone_distance
    from osmquadtreepostgis_ray.sources import zones as Z

    out = q_zone_distance(sf_dir).to_pandas().set_index("event_id").sort_index()
    anti = set(q_pip_anti(sf_dir).to_pandas()["event_id"])
    assert set(out.index[out["dist_sq"] > 0]) == anti

    gz = Z.grid_zone_ids()
    x0 = (gz % Z.GX) * Z.GRID_W
    y0 = (gz // Z.GX) * Z.GRID_H
    x1 = x0 + Z.GRID_W - 1
    y1 = y0 + Z.GRID_H - 1
    anti_pts = q_pip_anti(sf_dir).to_pandas().set_index("event_id")
    for eid in list(anti)[:50]:
        px = int(anti_pts.loc[eid, "lon_milli"])
        py = int(anti_pts.loc[eid, "lat_milli"])
        dx = px - np.clip(px, x0, x1)
        dy = py - np.clip(py, y0, y1)
        d = dx * dx + dy * dy
        best = int(np.argmin(d))
        assert out.loc[eid, "dist_sq"] == d[best]
        assert out.loc[eid, "zone_id"] == gz[best]


def test_zone_border_dist_consistent_with_zone_membership(sf_dir):
    """zone_border_dist: edge_dist within [0, half the smaller zone
    span], both flag classes present, and the shared kernel helper
    gives 0 on an exact zone edge and the true min at a center point."""
    import numpy as np
    from osmquadtreepostgis_ray.queries import q_zone_border_dist
    from osmquadtreepostgis_ray.sources import zones as Z
    from osmquadtreepostgis_ray.sources.zones import admin_border_dist

    out = q_zone_border_dist(sf_dir).to_pandas()
    assert (out["edge_dist"] >= 0).all()
    assert (out["edge_dist"] <= min(Z.ADMIN_W, Z.ADMIN_H) // 2).all()
    assert out["near_border"].any() and not out["near_border"].all()

    zid, d = admin_border_dist(
        np.array([Z.ADMIN_W, Z.ADMIN_W + Z.ADMIN_W // 2]),
        np.array([Z.ADMIN_H // 2, Z.ADMIN_H // 2]))
    assert d[0] == 0                              # on the left edge
    assert d[1] == min(Z.ADMIN_W - 1 - Z.ADMIN_W // 2, Z.ADMIN_H // 2,
                       Z.ADMIN_H - 1 - Z.ADMIN_H // 2)
    assert zid[0] == Z.ADMIN_ID_BASE + 1          # second column, first row


def test_tile_bundle_digest_matches_local(sf_dir):
    """tile_bundle: per-tile blob digests equal a local single-process
    reference built from the same canonical encoding, independent of
    the shard layout."""
    import hashlib

    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.functions import geotag, quadtree
    from osmquadtreepostgis_ray.queries import TILE_DEPTH, q_tile_bundle

    out = q_tile_bundle(sf_dir).to_pandas() \
        .sort_values("tile").reset_index(drop=True)

    ev = duckdb.sql(f"SELECT event_id, user_id FROM "
                    f"'{sf_dir}/events.parquet'").df()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon, lat)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, TILE_DEPTH)
    tile = quadtree.encode_ixy(ix, iy, TILE_DEPTH)
    ref: dict = {}
    order = np.lexsort((ev["event_id"].to_numpy(), tile))
    for i in order:
        ref.setdefault(int(tile[i]), []).append(
            f"{int(ev['event_id'][i])}:{int(lon[i])}:{int(lat[i])}")
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        blob = ";".join(ref[int(row["tile"])]).encode()
        assert row["n"] == len(ref[int(row["tile"])])
        assert row["bytes_len"] == len(blob)
        assert row["digest"] == hashlib.md5(blob).hexdigest()


def test_viewport_prunes_partitions(sf_dir):
    """viewport: result equals the exact bbox filter AND the pruned
    read provably scans fewer rows than the corpus (parquet metadata),
    i.e. the partition prune is a storage-path prune, not a row
    filter over a full scan."""
    import duckdb
    import numpy as np
    from osmquadtreepostgis_ray.functions import geotag
    from osmquadtreepostgis_ray.queries import (VIEWPORT,
                                                VIEWPORT_PART_DEPTH,
                                                q_viewport,
                                                viewport_cache_path)
    from osmquadtreepostgis_ray.state.partcache import (partition_rows,
                                                        partition_values)

    out = q_viewport(sf_dir).to_pandas().sort_values("event_id")
    lon0, lat0, lon1, lat1 = VIEWPORT
    ev = duckdb.sql(f"SELECT event_id, user_id FROM "
                    f"'{sf_dir}/events.parquet'").df()
    lon, lat = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                         ev["event_id"].to_numpy())
    m = (lon >= lon0) & (lon < lon1) & (lat >= lat0) & (lat < lat1)
    assert (out["event_id"].to_numpy()
            == np.sort(ev["event_id"].to_numpy()[m])).all()

    path = viewport_cache_path(sf_dir)
    all_parts = partition_values(path, "part")
    total = partition_rows(path, "part", all_parts)
    # rows in the partitions the viewport actually reads
    from osmquadtreepostgis_ray.functions import quadtree
    fx, fy = geotag.milli_to_fixed(np.array([lon0, lon1 - 1]),
                                   np.array([lat0, lat1 - 1]))
    ix, iy = quadtree.fixed_to_ixy(fx, fy, VIEWPORT_PART_DEPTH)
    gx, gy = np.meshgrid(np.arange(ix[0], ix[1] + 1),
                         np.arange(iy[0], iy[1] + 1))
    parts = np.unique(quadtree.encode_ixy(gx.ravel(), gy.ravel(),
                                          VIEWPORT_PART_DEPTH))
    touched = partition_rows(path, "part", parts)
    assert total == len(ev)
    assert touched < total        # the prune scans strictly less
    assert touched >= len(out)    # and at least the matching rows
