"""Hex ring-1 smoothing + Ripley's K pair counts: brute references."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import geotag


def _hex_assign(x, y):
    C, R = Q.HEX_C, Q.HEX_R
    best = None
    for dj in (0, 1):
        j = y // R + dj
        o = (j % 2) * (C // 2)
        i = (2 * (x - o) + C) // (2 * C)
        d2 = (x - (i * C + o)) ** 2 + (y - j * R) ** 2
        if best is None or d2 < best[0]:
            best = (d2, j, i)
    return best[1], best[2]


def test_hex_ring_matches_brute(sf_dir):
    out = Q.q_hex_ring(sf_dir).to_pandas() \
        .sort_values("hex_id").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    raw: dict[tuple, int] = {}
    for xi, yi in zip(x.tolist(), y.tolist()):
        j, i = _hex_assign(xi, yi)
        raw[(j, i)] = raw.get((j, i), 0) + 1
    sm: dict[int, int] = {}
    for (j, i), n in raw.items():
        for di, dj in Q.HEXRING_OFF[j % 2]:
            ni, nj = i + di, j + dj
            if 0 <= ni < Q.HEX_NCOLS and nj >= 0:
                hid = nj * Q.HEX_NCOLS + ni
                sm[hid] = sm.get(hid, 0) + n
    ref = pd.DataFrame(sorted(sm.items()), columns=["hex_id", "sm_n"]) \
        .reset_index(drop=True)
    # smoothing widens support: more cells than raw, same total mass x7-ish
    assert len(ref) > len(raw) and ref["sm_n"].sum() <= 7 * len(ev)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_ripley_k_matches_brute(sf_dir):
    out = Q.q_ripley_k(sf_dir).to_pandas() \
        .sort_values("r").reset_index(drop=True)
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id"]).to_pandas()
    ev = ev[ev["user_id"] % Q.RIPLEY_MOD == 0]
    x, y = geotag.event_lonlat_milli(ev["user_id"].to_numpy(),
                                     ev["event_id"].to_numpy())
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    rows = [(r, int((d2 <= r * r).sum())) for r in Q.RIPLEY_R]
    ref = pd.DataFrame(rows, columns=["r", "n_pairs"]) \
        .sort_values("r").reset_index(drop=True)
    assert ref["n_pairs"].is_monotonic_increasing and ref["n_pairs"].iloc[-1] > 0
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
