"""Round-3 scale fixes (VERDICT r2 'Next round' items 1-5).

- distributed ANN/kNN final top-k reduce: partition-invariant, bit-equal
  to the driver-side merge it replaced
- cosine_neardup_pairs returns a Dataset; hot buckets split on extra
  planes; identical-signature residue emits bounded star pairs
- data-aware shard/bucket sizing grows with the input-size estimate
- dim_join: bucket fallback produces the same rows as the broadcast path
- keyed_prefix_sum / keyed_row_number skip empty blocks (schema stays
  uniform) and survive all-empty input
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _vec_corpus(n=400, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32)), pa.list_(pa.float32())),
    })


def test_knn_embeddings_partition_invariant():
    """The sharded final top-k must not depend on block layout: 2-block
    and 32-block corpora give the identical ranked table."""
    from osmquadtreepostgis_ray.stages.embed import knn_embeddings

    tab = _vec_corpus()
    rng = np.random.default_rng(9)
    qids = np.arange(5, dtype=np.int64)
    qmat = np.stack([tab.column("embedding").to_pylist()[i] for i in qids]).astype(np.float64)
    outs = []
    for parts in (2, 32):
        ds = ray.data.from_arrow(tab).repartition(parts)
        outs.append(knn_embeddings(ds, qids, qmat, k=5).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 25
    assert list(outs[0].columns) == ["query_id", "neighbor_id", "rank"]


def test_knn_brute_partition_invariant_and_short_query():
    """Geo kNN: block-layout invariance, and a query against a corpus
    smaller than k never ranks the self-mask sentinel."""
    from osmquadtreepostgis_ray.stages.knn import knn_brute

    rng = np.random.default_rng(4)
    n = 300
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "lon_milli": pa.array(rng.integers(-50_000, 50_000, n), pa.int64()),
        "lat_milli": pa.array(rng.integers(-50_000, 50_000, n), pa.int64()),
    })
    q = {"id": np.array([0, 5], dtype=np.int64),
         "lon_milli": np.array([0, 100], dtype=np.int64),
         "lat_milli": np.array([0, -100], dtype=np.int64)}
    outs = [knn_brute(ray.data.from_arrow(tab).repartition(p), q, k=4).to_pandas()
            for p in (1, 16)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 8

    # corpus of 3 rows (one is the query itself) with k=5 -> 2 neighbors
    small = ray.data.from_arrow(tab.slice(0, 3))
    out = knn_brute(small, {"id": np.array([0]), "lon_milli": np.array([0]),
                            "lat_milli": np.array([0])}, k=5).to_pandas()
    assert len(out) == 2
    assert (out["dist"] < np.iinfo(np.int64).max).all()


def test_cosine_neardup_returns_dataset_and_bounds_hot_buckets():
    from osmquadtreepostgis_ray.stages.embed import cosine_neardup_pairs

    rng = np.random.default_rng(7)
    d = 16
    # 60 IDENTICAL vectors (ids 0..59): un-splittable by extra planes
    dup = np.tile(rng.standard_normal(d), (60, 1))
    # 200 random background vectors (ids 100..299)
    bg = rng.standard_normal((200, d))
    m = np.vstack([dup, bg])
    ids = np.r_[np.arange(60), np.arange(100, 300)].astype(np.int64)
    tab = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(m.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tab).repartition(6)
    out = cosine_neardup_pairs(ds, threshold=0.95, bucket_cap=8)
    assert isinstance(out, ray.data.Dataset)  # never driver pandas
    df = out.to_pandas()
    # the identical cluster is capped to STAR pairs: 59 rows (min id 0
    # paired with each other member), not 60*59/2 = 1770
    clus = df[(df["a"] < 60) & (df["b"] < 60)]
    assert len(clus) == 59
    assert (clus["a"] == 0).all()
    assert (clus["sim_permille"] == 1000).all()
    assert set(clus["b"]) == set(range(1, 60))


def test_cosine_neardup_small_buckets_exact():
    """Below the cap the verify is the full pairwise check: planted
    twins at sim 1.0 all surface."""
    from osmquadtreepostgis_ray.stages.embed import cosine_neardup_pairs

    rng = np.random.default_rng(11)
    d = 16
    base = rng.standard_normal((50, d))
    m = np.vstack([base, base[:10]])            # ids 50..59 twin ids 0..9
    ids = np.arange(60, dtype=np.int64)
    tab = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(m.astype(np.float32)),
                                          pa.list_(pa.float32()))})
    df = cosine_neardup_pairs(ray.data.from_arrow(tab).repartition(4),
                              threshold=0.99).to_pandas()
    twins = {(i, 50 + i) for i in range(10)}
    assert twins <= set(zip(df["a"], df["b"]))


def test_scaled_shards_and_buckets_grow_with_input():
    from osmquadtreepostgis_ray.stages.joins import default_buckets
    from osmquadtreepostgis_ray.util import (SHARD_FLOOR, estimate_bytes,
                                             scaled_shards)

    small = ray.data.range(1000)                      # ~8 KB
    big = ray.data.range(20_000_000_000)              # ~160 GB, metadata only
    assert scaled_shards(small) == SHARD_FLOOR
    assert scaled_shards(big) > SHARD_FLOOR
    # the estimate survives per-row transforms by walking to the source
    est = estimate_bytes(big.map_batches(lambda t: t, batch_format="pyarrow"))
    assert est and est >= 8 * 20_000_000_000
    assert scaled_shards(big.map_batches(lambda t: t, batch_format="pyarrow")) \
        > SHARD_FLOOR
    # join buckets: data-aware above the cluster floor
    assert default_buckets(big, big) > default_buckets(small, small)


def test_dim_join_fallback_matches_broadcast():
    from osmquadtreepostgis_ray.stages.joins import dim_join

    rng = np.random.default_rng(2)
    n = 2000
    big = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 50, n), pa.int64()),
        "v": pa.array(np.arange(n), pa.int64())})).repartition(5)
    small = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
        "tag": pa.array(np.arange(50, dtype=np.int64) * 7, pa.int64())}))

    def norm(ds):
        df = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        return df[["k", "v", "tag"]].astype(np.int64)

    bc = norm(dim_join(big, small, on="k"))
    bucketed = norm(dim_join(big, small, on="k", max_broadcast_bytes=0))
    pd.testing.assert_frame_equal(bc, bucketed)
    assert len(bc) == n


def test_keyed_prefix_sum_skips_empty_blocks():
    from osmquadtreepostgis_ray.stages.window import (keyed_prefix_sum,
                                                      keyed_row_number)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"g": rng.integers(0, 3, 200).astype(np.int64),
                       "o": np.arange(200, dtype=np.int64),
                       "v": rng.integers(0, 9, 200).astype(np.int64)})
    empty = df.iloc[:0]
    ds = ray.data.from_pandas([df.iloc[:100], empty, df.iloc[100:], empty])
    out = keyed_prefix_sum(ds, ["g"], ["o"], "v", out_col="run") \
        .select_columns(["g", "o", "v", "run"]).to_pandas() \
        .sort_values(["g", "o"]).reset_index(drop=True)
    ref = df.sort_values(["g", "o"]).reset_index(drop=True)
    ref["run"] = ref.groupby("g")["v"].cumsum()
    pd.testing.assert_frame_equal(out, ref)

    ranked, totals = keyed_row_number(ds, ["g"], ["o"])
    assert set(ranked.schema().names) == {"g", "o", "v", "rank"}
    assert sum(totals.values()) == 200

    # all-empty input: full output schema, zero rows
    eds = ray.data.from_pandas([empty, empty])
    eout = keyed_prefix_sum(eds, ["g"], ["o"], "v", out_col="run")
    assert eout.count() == 0
    assert set(eout.schema().names) == {"g", "o", "v", "run"}


def test_window_scan_cardinality_guard():
    """keyed_row_number / keyed_prefix_sum raise once the driver scan
    sees more distinct groups than max_groups (a data-scaled key must
    not silently grow driver state), and still work under the bound."""
    import pytest

    from osmquadtreepostgis_ray.stages.window import (keyed_prefix_sum,
                                                      keyed_row_number)

    df = pd.DataFrame({"g": np.arange(50, dtype=np.int64) % 10,
                       "o": np.arange(50, dtype=np.int64),
                       "v": np.ones(50, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)

    out, totals = keyed_row_number(ds, ["g"], ["o"], max_groups=10)
    assert sum(totals.values()) == 50
    with pytest.raises(RuntimeError, match="distinct groups"):
        keyed_row_number(ds, ["g"], ["o"], max_groups=9)
    with pytest.raises(RuntimeError, match="distinct groups"):
        keyed_prefix_sum(ds, ["g"], ["o"], "v", max_groups=9)
