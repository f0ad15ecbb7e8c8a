"""Road-network raster/match operators + geohash: densify, line_raster,
map_match, geohash.  Each pins the Ray result against an independent
pandas/numpy brute-force reference on sf0.001 (the DuckDB twins run in
tools/check_parity.py); geohash additionally pins against a known
reference implementation value.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geohash, geotag


def _segments_ref(sf_dir):
    """Brute segments straight from doc ids (independent derivation)."""
    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    ids = np.sort(ids.astype(np.int64))
    ph = geotag.phash_of(ids)
    x, y = geotag.lonlat_milli_from_phash(ph)
    same = ids[1:] // 8 == ids[:-1] // 8
    keep = same & ((x[1:] != x[:-1]) | (y[1:] != y[:-1]))
    return pd.DataFrame({"seg_id": ids[:-1][keep], "gid": ids[:-1][keep] // 8,
                         "x1": x[:-1][keep], "y1": y[:-1][keep],
                         "x2": x[1:][keep], "y2": y[1:][keep]})


def test_densify_matches_brute(sf_dir):
    out = Q.q_densify(sf_dir).to_pandas() \
        .sort_values(["seg_id", "j"]).reset_index(drop=True)
    seg = _segments_ref(sf_dir)
    k = Q.DENSIFY_K
    rows = []
    for r in seg.itertuples(index=False):
        for j in range(k + 1):
            rows.append((r.seg_id, j, (r.x1 * (k - j) + r.x2 * j) // k,
                         (r.y1 * (k - j) + r.y2 * j) // k))
    ref = pd.DataFrame(rows, columns=["seg_id", "j", "px", "py"]) \
        .sort_values(["seg_id", "j"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["seg_id", "j", "px", "py"]], ref,
                                  check_dtype=False)
    # endpoints are exact
    assert (out[out["j"] == 0].set_index("seg_id")["px"]
            == seg.set_index("seg_id")["x1"]).all()
    assert (out[out["j"] == k].set_index("seg_id")["px"]
            == seg.set_index("seg_id")["x2"]).all()


def test_line_raster_distinct_segments_per_cell(sf_dir):
    out = Q.q_line_raster(sf_dir).to_pandas() \
        .sort_values(["cx", "cy"]).reset_index(drop=True)
    dense = Q.q_densify(sf_dir).to_pandas()
    ref = pd.DataFrame({
        "seg_id": dense["seg_id"],
        "cx": dense["px"].to_numpy(np.int64) * Q.RASTER_N // 360000,
        "cy": (dense["py"].to_numpy(np.int64) + 5000) * Q.RASTER_N // 180000,
    }).drop_duplicates().groupby(["cx", "cy"]).size().reset_index(name="n")
    ref = ref.sort_values(["cx", "cy"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_map_match_brute_argmin(sf_dir):
    out = Q.q_map_match(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    seg = _segments_ref(sf_dir)
    seg = seg[seg["gid"] % Q.MM_GID_MOD == 0]
    k = Q.DENSIFY_K
    pts = []
    for r in seg.itertuples(index=False):
        for j in range(k + 1):
            pts.append((r.seg_id * Q.MM_RID_W + j,
                        (r.x1 * (k - j) + r.x2 * j) // k,
                        (r.y1 * (k - j) + r.y2 * j) // k))
    rid, px, py = (np.array(v, np.int64) for v in zip(*pts))
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    ev = ev[ev["event_id"] % Q.MM_EVENT_MOD == 0]
    ex, ey = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                       ev["event_id"].to_numpy())
    d2 = (ex[:, None] - px[None, :]) ** 2 + (ey[:, None] - py[None, :]) ** 2
    # brute argmin with the (d2, rid) lexicographic tie-break
    order = np.argsort(rid, kind="stable")
    d2o, rido = d2[:, order], rid[order]
    jm = d2o.argmin(axis=1)
    ref = pd.DataFrame({"event_id": ev["event_id"].to_numpy(np.int64),
                        "rid": rido[jm],
                        "d2": d2o[np.arange(len(jm)), jm]}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_geohash_known_values_and_counts(sf_dir):
    # reference geohash of the cell CENTER convention is not what we
    # encode (we encode the point itself); pin against a hand-rolled
    # bit-by-bit reference encoder instead
    def ref_encode(lon_deg: float, lat_deg: float) -> str:
        lo, hi = -180.0, 180.0
        la, lb = -90.0, 90.0
        bits, code = 0, 0
        even = True  # lon first
        while bits < geohash.BITS:
            if even:
                mid = (lo + hi) / 2
                b = int(lon_deg >= mid)
                lo, hi = (mid, hi) if b else (lo, mid)
            else:
                mid = (la + lb) / 2
                b = int(lat_deg >= mid)
                la, lb = (mid, lb) if b else (la, mid)
            code = (code << 1) | b
            bits += 1
            even = not even
        return "".join(geohash.ALPHABET[(code >> (geohash.BITS - 5 * (j + 1))) & 31]
                       for j in range(geohash.PRECISION))

    rng = np.random.default_rng(7)
    lon_m = rng.integers(0, 360000, 50)
    lat_m = rng.integers(0, 170000, 50)
    got = geohash.encode(lon_m, lat_m)
    for g, lm, tm in zip(got, lon_m, lat_m):
        assert g == ref_encode(lm / 1000.0 - 180.0, tm / 1000.0 - 85.0)

    out = Q.q_geohash(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    assert int(out["n"].sum()) == len(ev)
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    ref = pd.Series(geohash.encode(x, y)).value_counts()
    got_map = out.set_index("gh")["n"]
    assert got_map.sort_index().astype(int).to_dict() == \
        ref.sort_index().astype(int).to_dict()
