"""Stream-window / LM / graph operators: late_events, moving_window,
lm_score, kcore.  Brute pandas/python references on sf0.001.
"""

import collections

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osmquadtreepostgis_ray import queries as Q


def _events(sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    return ev


def test_late_events_matches_pandas(sf_dir):
    out = Q.q_late_events(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = _events(sf_dir)
    ev["arr"] = Q._arrival_of(ev["event_id"].to_numpy(),
                              ev["ts_us"].to_numpy())
    ev = ev.sort_values(["user_id", "arr", "event_id"], kind="mergesort")
    rows = []
    for _u, g in ev.groupby("user_id", sort=False):
        mx = None
        for r in g.itertuples(index=False):
            if mx is not None and mx - r.ts_us > Q.LATE_THRESH_US:
                rows.append((r.event_id, r.user_id, mx - r.ts_us))
            mx = r.ts_us if mx is None else max(mx, r.ts_us)
    ref = pd.DataFrame(rows, columns=["event_id", "user_id", "late_by_us"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert len(ref) > 0          # the jitter constants must produce late rows
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_moving_window_matches_pandas_rolling(sf_dir):
    out = Q.q_moving_window(sf_dir).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = _events(sf_dir)
    ev["cents"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
    g = ev.groupby("user_id", sort=False)["cents"]
    ev["w3_sum_cents"] = g.rolling(3, min_periods=1).sum() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ev["w3_n"] = g.rolling(3, min_periods=1).count() \
        .reset_index(level=0, drop=True).astype(np.int64)
    ref = ev[["event_id", "w3_sum_cents", "w3_n"]] \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_lm_score_matches_brute(sf_dir):
    out = Q.q_lm_score(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cnt = collections.Counter()
    pairs = {}
    for r in docs.itertuples(index=False):
        ws = [w for w in r.text.split() if w]
        ps = list(zip(ws[:-1], ws[1:]))
        pairs[r.doc_id] = ps
        cnt.update(ps)
    rows = []
    for d in sorted(pairs):
        ps = pairs[d]
        mass = sum(cnt[p] for p in ps)
        sc = (100 * mass) // len(ps) if ps else 0
        rows.append((d, len(ps), mass, sc))
    ref = pd.DataFrame(rows, columns=["doc_id", "n_pairs", "mass",
                                      "score_centi"])
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_kcore_matches_brute_peel(sf_dir):
    out = Q.q_kcore(sf_dir).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    ids = np.sort(pq.read_table(f"{sf_dir}/documents.parquet",
                                columns=["doc_id"]).column("doc_id").to_numpy())
    edges = []
    for d in ids:
        d = int(d)
        if d >= 1 and d % 5 != 0:
            edges.append((d - 1, d))
        if d >= 2 and (d - 2) % 3 == 0:
            edges.append((d - 2, d))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        dead = [v for v in alive
                if sum(u in alive for u in adj[v]) < Q.KCORE_K]
        if not dead:
            break
        alive -= set(dead)
    ref = pd.DataFrame(
        sorted((v, sum(u in alive for u in adj[v])) for v in alive),
        columns=["node", "deg"])
    assert 0 < len(ref) < len(ids)   # non-trivial core
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
