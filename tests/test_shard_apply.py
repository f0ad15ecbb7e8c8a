"""util.shard_apply / util.sharded_agg / joins.multiway_bucket_join.

These are the engine's answer to Ray's per-key aggregate/map_groups tax
on data-scaled key spaces; the tests pin (a) exact equivalence with a
local pandas reference, (b) co-location (every key lands in exactly one
shard), and (c) multiway == chained two-way joins.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.stages.joins import (bucket_hash_join,
                                                 multiway_bucket_join)
from osmquadtreepostgis_ray.util import shard_apply, sharded_agg


def _events(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 700, n).astype(np.int64),
        "s": rng.choice(["ab", "cd", "ef", "gh"], n),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })


def test_sharded_agg_matches_pandas():
    df = _events()
    ds = ray.data.from_pandas(df).repartition(8)
    out = sharded_agg(ds, ["k", "s"], {"total": ("v", "sum"),
                                       "lo": ("v", "min"),
                                       "n": ("v", "count")}) \
        .to_pandas().sort_values(["k", "s"]).reset_index(drop=True)
    ref = df.groupby(["k", "s"], as_index=False).agg(
        total=("v", "sum"), lo=("v", "min"), n=("v", "count")) \
        .sort_values(["k", "s"]).reset_index(drop=True)
    ref["n"] = ref["n"].astype(out["n"].dtype)
    pd.testing.assert_frame_equal(out, ref, check_like=True)


def test_shard_apply_colocates_keys():
    # fn sees every row of a key or none: per-shard key counts must sum
    # to the global per-key count in ONE shard each
    df = _events(3000)
    ds = ray.data.from_pandas(df).repartition(8)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False).size()
        out = out.rename(columns={"size": "n"})
        return out

    out = shard_apply(ds, ["k"], per_key).to_pandas()
    # exactly one row per key (a split key would produce two)
    assert out["k"].is_unique
    ref = df.groupby("k", as_index=False).size().rename(columns={"size": "n"})
    merged = out.sort_values("k").reset_index(drop=True) \
        .merge(ref.sort_values("k").reset_index(drop=True), on="k")
    assert (merged["n_x"] == merged["n_y"]).all()


def test_shard_apply_string_keys_stable():
    # string keys hash via pandas hash_array (fixed key): same rows ->
    # same shards regardless of block layout
    df = _events(2000)
    a = shard_apply(ray.data.from_pandas(df).repartition(2), ["s"],
                    lambda g: g.groupby("s", as_index=False)["v"].sum()).to_pandas()
    b = shard_apply(ray.data.from_pandas(df).repartition(16), ["s"],
                    lambda g: g.groupby("s", as_index=False)["v"].sum()).to_pandas()
    a = a.sort_values("s").reset_index(drop=True)
    b = b.sort_values("s").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_multiway_equals_chained_two_way():
    rng = np.random.default_rng(11)
    n = 800
    t1 = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "a": rng.integers(0, 9, n).astype(np.int64)})
    t2 = pd.DataFrame({"id": rng.permutation(n).astype(np.int64),
                       "b": rng.integers(0, 9, n).astype(np.int64)})
    t3 = pd.DataFrame({"id": np.arange(0, n, 2, dtype=np.int64),  # half match
                       "c": rng.integers(0, 9, n // 2).astype(np.int64)})
    d1, d2, d3 = (ray.data.from_pandas(t).repartition(4) for t in (t1, t2, t3))
    multi = multiway_bucket_join([d1, d2, d3], on="id").to_pandas() \
        .sort_values("id").reset_index(drop=True)[["id", "a", "b", "c"]]
    chain = bucket_hash_join(bucket_hash_join(d1, d2, on="id"), d3, on="id") \
        .to_pandas().sort_values("id").reset_index(drop=True)[["id", "a", "b", "c"]]
    chain = chain.astype({c: np.int64 for c in chain.columns})
    pd.testing.assert_frame_equal(multi, chain)
    assert len(multi) == n // 2
    assert all(multi[c].dtype == np.int64 for c in multi.columns)


def test_skew_aware_join_equals_plain():
    """detect_hot_keys finds exactly the over-threshold keys, and the
    adaptive salted join's output is identical to the plain bucket join
    on a deliberately skewed corpus."""
    rng = np.random.default_rng(3)
    n = 20_000
    # 60% of rows on key 7, the rest uniform over 500 keys
    k = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 500, n)).astype(np.int64)
    left = pd.DataFrame({"k": k, "rid": np.arange(n, dtype=np.int64),
                         "v": rng.integers(0, 100, n).astype(np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 500, dtype=np.int64),
                          "tag": np.arange(0, 500, dtype=np.int64) * 3})
    dl = ray.data.from_pandas(left).repartition(8)
    dr = ray.data.from_pandas(right).repartition(2)

    from osmquadtreepostgis_ray.stages.joins import (detect_hot_keys,
                                                     skew_aware_join)
    hot = detect_hot_keys(dl, "k", max_rows=2000)
    want_hot = left.groupby("k").size()
    assert list(hot) == sorted(want_hot[want_hot > 2000].index)
    assert 7 in hot

    adaptive = skew_aware_join(dl, dr, on="k", max_rows_per_key=2000,
                               id_col="rid").to_pandas()
    plain = bucket_hash_join(dl, dr, on="k").to_pandas()
    a = adaptive.sort_values(["k", "rid"]).reset_index(drop=True)[["k", "rid", "v", "tag"]]
    p = plain.sort_values(["k", "rid"]).reset_index(drop=True)[["k", "rid", "v", "tag"]]
    a = a.astype(np.int64)
    p = p.astype(np.int64)
    pd.testing.assert_frame_equal(a, p)


def test_bloom_semi_join_exact_and_pruning():
    """bloom_semi_join == plain bucket_semi_join (bloom is exact-
    transparent), the prefilter keeps every true match (no false
    negatives), and it actually prunes: candidates << left rows when
    the right side is selective."""
    from osmquadtreepostgis_ray.stages.joins import (
        bloom_semi_join, bucket_semi_join, build_bloom_bitmap, bloom_probe)

    rng = np.random.default_rng(11)
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 10_000, 4000), pa.int64()),
        "v": pa.array(np.arange(4000), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 10_000, 97), pa.int64())}))  # ~1% of keys

    def norm(ds):
        df = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        return df

    for anti in (False, True):
        got = norm(bloom_semi_join(left, right, on="k", anti=anti))
        want = norm(bucket_semi_join(left, right, on="k", anti=anti))
        pd.testing.assert_frame_equal(got, want)

    bm = build_bloom_bitmap(right, "k")
    cand = bloom_probe(left, "k", bm).to_pandas()
    true_keys = set(right.to_pandas()["k"])
    matched = left.to_pandas()["k"].isin(true_keys)
    assert set(cand["v"]) >= set(left.to_pandas().loc[matched, "v"])  # no FN
    assert len(cand) < 4000 * 0.25  # selective right side really prunes


def test_heavy_hitters_exact(tmp_path):
    """CM-sketch heavy hitters == exact pandas HAVING on a skewed key
    set (sketch is candidate-generation only; output must be exact)."""
    from osmquadtreepostgis_ray.queries import q_heavy_hitters
    sf = "/root/testdata/sf0.001"
    got = q_heavy_hitters(sf).to_pandas().sort_values("user_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    cnt = ev.groupby("user_id").size()
    th = int(np.ceil(0.008 * len(ev)))
    want = (cnt[cnt >= th].rename("n").reset_index()
            .sort_values("user_id").reset_index(drop=True))
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_keyed_row_number_and_ntile():
    """Ranks are globally dense per group across many blocks; ntile_of
    reproduces ANSI semantics incl. the N < tiles edge."""
    from osmquadtreepostgis_ray.stages.window import keyed_row_number, ntile_of

    rng = np.random.default_rng(3)
    t = pa.table({"g": pa.array(rng.integers(0, 3, 500), pa.int64()),
                  "v": pa.array(rng.integers(0, 50, 500), pa.int64()),
                  "id": pa.array(np.arange(500), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    ranked, totals = keyed_row_number(ds, ["g"], ["v", "id"])
    df = ranked.to_pandas().sort_values(["g", "v", "id"]).reset_index(drop=True)
    for g, sub in df.groupby("g"):
        assert (sub["rank"].to_numpy() == np.arange(len(sub))).all()
        assert totals[(g,)] == len(sub)
    # NTILE edges: 10 rows / 4 tiles -> 3,3,2,2; 2 rows / 4 tiles -> 1,2
    assert ntile_of(np.arange(10), np.full(10, 10), 4).tolist() == \
        [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert ntile_of(np.arange(2), np.full(2, 2), 4).tolist() == [1, 2]


def test_pagerank_paths_identical():
    """The broadcast-scores plan and the bucket-join plan produce the
    same integer table (same graph, same 2 iterations)."""
    from osmquadtreepostgis_ray.stages.graph import pagerank

    rng = np.random.default_rng(5)
    a = rng.integers(0, 60, 400).astype(np.int64)
    b = rng.integers(0, 60, 400).astype(np.int64)
    m = a != b
    e = pa.table({"src": pa.array(np.r_[a[m], b[m]], pa.int64()),
                  "dst": pa.array(np.r_[b[m], a[m]], pa.int64())})
    edges = ray.data.from_arrow(e).repartition(5)
    got_b = pagerank(edges).to_pandas().sort_values("node").reset_index(drop=True)
    got_j = pagerank(edges, broadcast_nodes_max=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, got_j)
    assert got_b["pr"].nunique() > 1  # degrees differ -> ranks differ


def test_reduce_small_or_shard_plans_agree():
    """The guarded one-task solve and the sort-based shard path are the
    same reduce: identical rows either way (the repo's plan-equivalence
    convention)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    rng = np.random.RandomState(11)
    t = pa.table({"k": pa.array(rng.randint(0, 7, 500), pa.int64()),
                  "v": pa.array(rng.randint(0, 1000, 500), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False)["v"].agg(["sum", "min"])
        out.columns = ["k", "s", "m"]
        return out

    small = reduce_small_or_shard(ds, ["k"], fn,
                                  max_small_bytes=1 << 40).to_pandas()
    shard = reduce_small_or_shard(ds, ["k"], fn,
                                  max_small_bytes=0).to_pandas()
    small = small.sort_values("k").reset_index(drop=True)
    shard = shard.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(small, shard)


def test_kcore_paths_identical():
    """Broadcast peel and the bucket-join peel return the same core
    (same gapped-chain + chord graph, same round cap)."""
    from osmquadtreepostgis_ray.stages.graph import kcore_peel

    # segments of 4 (gap every 4th edge) peel in 2 rounds; the %3
    # chords leave a surviving triangle core — small rounds keep the
    # bucketed plan's per-round shuffles cheap in the suite
    ids = np.arange(60, dtype=np.int64)
    d1 = ids[(ids >= 1) & (ids % 4 != 0)]
    d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
    a = np.concatenate([d1 - 1, d2 - 2])
    b = np.concatenate([d1, d2])
    e = pa.table({"src": pa.array(np.r_[a, b], pa.int64()),
                  "dst": pa.array(np.r_[b, a], pa.int64())})
    edges = ray.data.from_arrow(e).repartition(5)
    got_b = kcore_peel(edges, k=2, max_rounds=6).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got_j = kcore_peel(edges, k=2, max_rounds=6, broadcast_nodes_max=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, got_j)
    assert 0 < len(got_b) < 60  # the peel actually dropped nodes


def test_bfs_paths_identical():
    """Broadcast relaxation and the bucket-join frontier plan return
    identical hop distances (multi-source, gapped chain)."""
    from osmquadtreepostgis_ray.stages.graph import bfs_hops

    # unbroken chain with a source every 5 nodes -> max dist 2,
    # fixpoint in 3 rounds (cheap per-round shuffles for the suite)
    ids = np.arange(40, dtype=np.int64)
    d1 = ids[ids >= 1]
    e = pa.table({"src": pa.array(np.r_[d1 - 1, d1], pa.int64()),
                  "dst": pa.array(np.r_[d1, d1 - 1], pa.int64())})
    edges = ray.data.from_arrow(e).repartition(4)
    got_b = bfs_hops(edges, src_mod=5, max_rounds=6).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    got_j = bfs_hops(edges, src_mod=5, max_rounds=6,
                     broadcast_nodes_max=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, got_j)
    assert got_b["dist"].max() > 1  # multi-hop structure exercised


def test_wedge_pairs_hub_guard():
    """wedge_pairs on a star K1,40 with chunk=8: exact common-neighbor
    counts (every leaf pair shares exactly the center) AND no single
    (u, c1, c2) group holds the hub's full deg^2 expansion."""
    from osmquadtreepostgis_ray.stages.graph import wedge_pairs
    from osmquadtreepostgis_ray.util import sharded_agg

    leaves = np.arange(1, 41, dtype=np.int64)
    a = np.zeros(40, np.int64)
    e = pa.table({"u": pa.array(np.r_[a, leaves], pa.int64()),
                  "v": pa.array(np.r_[leaves, a], pa.int64())})
    und = ray.data.from_arrow(e).repartition(4)

    got = sharded_agg(wedge_pairs(und, chunk=8), ["v1", "v2"],
                      {"common": ("c", "sum")}).to_pandas() \
        .sort_values(["v1", "v2"]).reset_index(drop=True)
    # leaf pairs: C(40,2) with common=1 via the center; plus each
    # (center, leaf) pair has 0 common neighbors -> absent
    assert len(got) == 40 * 39 // 2
    assert (got["common"] == 1).all()
    assert got["v1"].min() == 1 and got["v2"].max() == 40

    # bound check on the fan kernel itself: the hub's 40 neighbors
    # split into 5 chunks of <= 8 rows, so no (u, c1, c2) group holds
    # more than 2*chunk rows (-> <= (2*chunk)^2 pairs, not deg^2);
    # leaves (deg 1 <= chunk) expand DIRECTLY — only hub rows fan
    from osmquadtreepostgis_ray.stages.graph import _wedge_fan_split
    und_df = e.to_pandas().rename(columns={})
    mixed = _wedge_fan_split(und_df, 8)
    fanned = mixed[mixed["kind"] == 1].rename(
        columns={"x1": "u", "x4": "c1", "x5": "c2"})
    assert set(fanned["u"]) == {0}  # only the hub pays the fan copies
    gsz = fanned.groupby(["u", "c1", "c2"]).size()
    assert gsz.max() <= 2 * 8
    hub_groups = fanned[["c1", "c2"]].drop_duplicates()
    assert len(hub_groups) == 5 * 6 // 2  # C(5,2) cross + 5 same-chunk
    # unguarded chunk: identical totals (plan equivalence)
    big = sharded_agg(wedge_pairs(und), ["v1", "v2"],
                      {"common": ("c", "sum")}).to_pandas() \
        .sort_values(["v1", "v2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, big)
