"""Batch: adaptive_tiles (calc-quadtree selection), zone_overlay,
contour_cells — brute references plus the partition invariant."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.sources.zones import (
    ADMIN_H, ADMIN_ID_BASE, ADMIN_W, AX, GRID_H, GRID_KEEP_LT,
    GRID_KEEP_MOD, GRID_KEEP_MULT, GRID_W, GX)


def _event_cells(sf_dir, depth):
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    lon_m, lat_m = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                             ev["event_id"].to_numpy())
    fx, fy = geotag.milli_to_fixed(lon_m, lat_m)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
    return quadtree.encode_ixy(ix, iy, depth), lon_m, lat_m


def test_adaptive_tiles_is_exact_partition(sf_dir):
    out = Q.q_adaptive_tiles(sf_dir).to_pandas()
    leaf, _, _ = _event_cells(sf_dir, Q.ADAPT_DEPTHS[-1])
    total = len(leaf)
    # every row's count is consistent with a brute recount at its depth
    for d in Q.ADAPT_DEPTHS:
        at_d = quadtree.at_depth(leaf, d)
        counts = pd.Series(at_d).value_counts()
        sub = out[out["depth"] == d]
        for cell, n in zip(sub["cell"], sub["n"]):
            assert counts[cell] == n
    # selected + overflow tiles partition the corpus exactly
    assert out["n"].sum() == total
    # no selected tile is an ancestor of another output tile
    cells = out[["depth", "cell"]].to_numpy()
    ids = set(out["cell"].tolist())
    for d, c in cells:
        for ad in Q.ADAPT_DEPTHS:
            if ad >= d:
                break
            anc = int(quadtree.at_depth(np.array([c]), ad)[0])
            assert anc not in ids
    # non-overflow rows respect the budget; overflow rows exceed it
    assert (out.loc[~out["overflow"], "n"] <= Q.ADAPT_MAX).all()
    assert (out.loc[out["overflow"], "n"] > Q.ADAPT_MAX).all()


def test_zone_overlay_matches_brute(sf_dir):
    out = Q.q_zone_overlay(sf_dir).to_pandas() \
        .sort_values(["gzone", "azone"]).reset_index(drop=True)
    _, lon, lat = _event_cells(sf_dir, 12)
    gid = (lat // GRID_H) * GX + lon // GRID_W
    keep = (gid * GRID_KEEP_MULT) % GRID_KEEP_MOD < GRID_KEEP_LT
    aid = (lat // ADMIN_H) * AX + lon // ADMIN_W + ADMIN_ID_BASE
    ref = pd.DataFrame({"gzone": gid[keep], "azone": aid[keep]}) \
        .groupby(["gzone", "azone"]).size().reset_index(name="n")
    g, a = ref["gzone"].to_numpy(), ref["azone"].to_numpy() - ADMIN_ID_BASE
    gx0, gy0 = (g % GX) * GRID_W, (g // GX) * GRID_H
    ax0, ay0 = (a % AX) * ADMIN_W, (a // AX) * ADMIN_H
    iw = np.minimum(gx0 + GRID_W, ax0 + ADMIN_W) - np.maximum(gx0, ax0)
    ih = np.minimum(gy0 + GRID_H, ay0 + ADMIN_H) - np.maximum(gy0, ay0)
    ref["inter_area"] = iw * ih
    ref = ref.sort_values(["gzone", "azone"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    assert (out["inter_area"] > 0).all()


def test_contour_cells_matches_brute(sf_dir):
    out = Q.q_contour_cells(sf_dir).to_pandas() \
        .sort_values("code").reset_index(drop=True)
    base = Q.q_rasterize(sf_dir).to_pandas()
    tx, ty, _ = quadtree.decode(base["tile"].to_numpy())
    gx = tx * 16 + base["px"].to_numpy()
    gy = ty * 16 + base["py"].to_numpy()
    G = 1 << Q.CELL_DEPTH
    occ = set(zip(gx.tolist(), gy.tolist()))
    anchors = set()
    for (x, y) in occ:
        for dx in (0, 1):
            for dy in (0, 1):
                ax, ay = x - dx, y - dy
                if 0 <= ax <= G - 2 and 0 <= ay <= G - 2:
                    anchors.add((ax, ay))
    codes = {}
    for (ax, ay) in anchors:
        code = sum((1 << (dy * 2 + dx))
                   for dx in (0, 1) for dy in (0, 1)
                   if (ax + dx, ay + dy) in occ)
        codes[code] = codes.get(code, 0) + 1
    ref = pd.DataFrame(sorted(codes.items()), columns=["code", "n_cells"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
