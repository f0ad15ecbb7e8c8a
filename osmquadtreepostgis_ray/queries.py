"""The Ray-side implementations behind __ray_entry__.queries().

Each function takes sf_dir and returns a Dataset / pyarrow Table whose
columns match the DuckDB oracle in osmquadtreepostgis_ray/oracle.py
name-for-name and value-for-value (driver compares order-insensitively).

Numeric discipline: money/value aggregates are computed in EXACT int64
(2dp columns -> cents, revenue -> 1e-4 units) on both engines — float
partial sums are not associativity-stable across block boundaries at
scale (lineitem_pricing diverged from DuckDB at sf0.1 before this).
Everything the oracle compares is int64 or exact-int-derived.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from osmquadtreepostgis_ray.config import EngineParams
from osmquadtreepostgis_ray.functions import geohash, geotag, quadtree
from osmquadtreepostgis_ray.sources.tables import read_table
from osmquadtreepostgis_ray.util import (pool_size, reduce_small_or_shard,
                                         shard_apply, sharded_agg)
from osmquadtreepostgis_ray.sources.audio import \
    payload_batch_size as _audio_payload_batch
from osmquadtreepostgis_ray.sources.images import \
    payload_batch_size as _img_payload_batch

# memory-aware rows-per-batch for opaque-payload stages: batch bytes x
# concurrency must fit a worker heap at ANY payload width (the brief's
# large-binary rule) — 4096 on this thin synthetic corpus, 32 on real
# 1-MB images (util.payload_batch_rows)
IMG_BATCH = _img_payload_batch()
AUDIO_BATCH = _audio_payload_batch()

CELL_DEPTH = 12
TILE_DEPTH = 8


# ------------------------------------------------------------------ events geo

def prep_events(sf_dir: str, columns: list[str] | None = None,
                repeat: int = 1) -> ray.data.Dataset:
    """events + geotag + cell/tile columns (vectorized, exact ints)."""
    cols = columns or ["event_id", "user_id"]

    def enc(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy()
        e = batch.column("event_id").to_numpy()
        lon_m, lat_m = geotag.event_lonlat_milli(u, e)
        fx, fy = geotag.milli_to_fixed(lon_m, lat_m)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, CELL_DEPTH)
        cell = quadtree.encode_ixy(ix, iy, CELL_DEPTH)
        tile = quadtree.at_depth(cell, TILE_DEPTH)
        lon, lat = geotag.milli_to_degrees(lon_m, lat_m)
        for name, arr, typ in (("lon_milli", lon_m, pa.int64()), ("lat_milli", lat_m, pa.int64()),
                               ("lon", lon, pa.float64()), ("lat", lat, pa.float64()),
                               ("cell", cell, pa.int64()), ("tile", tile, pa.int64())):
            batch = batch.append_column(name, pa.array(arr, typ))
        return batch

    return read_table(sf_dir, "events", columns=cols, repeat=repeat) \
        .map_batches(enc, batch_format="pyarrow")


def pip_zones_ds(sf_dir: str, repeat: int = 1) -> ray.data.Dataset:
    """The headline spatial join, parameterized for benchmarking.
    Task-based with a per-worker index cache — the zone side is tiny, so
    actor spawn would dominate (see stages/pip_join.py)."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_fn
    zref = ray.put(zones_table())
    return prep_events(sf_dir, repeat=repeat).map_batches(
        pip_join_fn(zref), batch_format="pyarrow", batch_size=8192)


def q_cell_histogram(sf_dir: str):
    """Per-cell counts with the combiner pattern: the shuffle carries one
    (cell, partial-count) row per distinct cell per batch, never events."""
    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(batch.column("cell").to_numpy(), return_counts=True)
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    part = prep_events(sf_dir).map_batches(partial, batch_format="pyarrow")
    return (sharded_agg(part, ["cell"], {"n": ("n", "sum")})
            .select_columns(["cell", "n"]))


def q_tile_assign(sf_dir: str):
    return prep_events(sf_dir).select_columns(["event_id", "cell", "tile"])


def q_agg_cells(sf_dir: str):
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b = t.to_pandas()  # arrow out below: Ray's sort-based Aggregate is
        # ~20x slower on pandas blocks; cents ints keep sums exact
        b["sum_value_cents"] = np.rint(b["value"] * 100).astype(np.int64)
        g = b.groupby("tile", sort=False).agg(
            n=("sum_value_cents", "size"), sum_value_cents=("sum_value_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return (sharded_agg(part, ["tile"], {"n": ("n", "sum"),
                                         "sum_value_cents": ("sum_value_cents", "sum")})
            .select_columns(["tile", "n", "sum_value_cents"]))


def q_tile_quadkey(sf_dir: str):
    """Tile-serving manifest (the web-map pyramid index the reference's
    PostGIS output ultimately feeds): one row per occupied tile with
    its z/x/y address, Bing-style quadkey string and event count.
    Combiner per-batch distinct-tile counts -> one tile-cardinality
    groupby; the z/x/y/quadkey enrichment runs on the aggregated
    (bounded: 4^z) table."""
    def partial(batch: pa.Table) -> pa.Table:
        tiles, counts = np.unique(batch.column("tile").to_numpy(),
                                  return_counts=True)
        return pa.table({"tile": pa.array(tiles, pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    agg = sharded_agg(prep_events(sf_dir).map_batches(
        partial, batch_format="pyarrow"), ["tile"], {"n": ("n", "sum")})

    def enrich(t: pa.Table) -> pa.Table:
        cells = t.column("tile").to_numpy()
        ix, iy, d = quadtree.decode(cells)
        return pa.table({
            "tile": pa.array(cells, pa.int64()),
            "z": pa.array(d, pa.int64()),
            "x": pa.array(ix, pa.int64()),
            "y": pa.array(iy, pa.int64()),
            "quadkey": pa.array(list(quadtree.quadkey(cells)), pa.string()),
            "n": t.column("n"),
        })

    return agg.map_batches(enrich, batch_format="pyarrow")


def q_tile_bundle(sf_dir: str):
    """Per-tile byte-exact export bundle (the MVT / COPY-per-tile sink
    shape: the reference writes one CsvBlock per quadtree tile —
    src/postgiswriter.cpp:1099): each tile's events render to canonical
    'id:lon:lat' records, id-ordered, ';'-joined into ONE blob whose
    md5 both engines compute identically.  One tile-keyed shard
    exchange co-locates each tile's rows (inherent to blob assembly);
    rendering is vectorized pandas str ops, the only per-group work is
    the md5 over group slices."""
    import hashlib

    from osmquadtreepostgis_ray.util import shard_apply

    pts = prep_events(sf_dir).select_columns(
        ["tile", "event_id", "lon_milli", "lat_milli"])

    def bundle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tile", "event_id"], kind="stable")
        rec = (g["event_id"].astype(str) + ":"
               + g["lon_milli"].astype(str) + ":"
               + g["lat_milli"].astype(str)).to_numpy(dtype=object)
        tiles = g["tile"].to_numpy()
        bounds = np.flatnonzero(np.diff(tiles)) + 1
        out_t, out_n, out_len, out_md5 = [], [], [], []
        for chunk, t0 in zip(np.split(rec, bounds),
                             tiles[np.concatenate([[0], bounds])] if len(tiles)
                             else []):
            blob = ";".join(chunk).encode()
            out_t.append(int(t0))
            out_n.append(len(chunk))
            out_len.append(len(blob))
            out_md5.append(hashlib.md5(blob).hexdigest())
        return pd.DataFrame({"tile": np.array(out_t, np.int64),
                             "n": np.array(out_n, np.int64),
                             "bytes_len": np.array(out_len, np.int64),
                             "digest": out_md5})

    return shard_apply(pts, ["tile"], bundle)


# tile-server viewport: (lon0, lat0, lon1, lat1) milli, half-open
VIEWPORT = (120_000, 60_000, 180_000, 100_000)
VIEWPORT_PART_DEPTH = 4


def q_viewport(sf_dir: str):
    """Tile-server viewport read (the bbox query every map client
    issues): the corpus caches hive-partitioned by its depth-4 quadtree
    ancestor ONCE per process (state/partcache — the partitioned table
    layout a serving deployment maintains), each viewport read then
    touches ONLY the partitions intersecting the bbox (a storage-path
    prune proven via parquet metadata in pytest) and applies the exact
    half-open bbox filter inside.  At 100 TB this is the difference
    between a full scan per pan/zoom and an O(viewport) read."""
    import tempfile

    from osmquadtreepostgis_ray.state.partcache import (cache_partitioned,
                                                        read_partitions)
    import pyarrow.compute as pc

    lon0, lat0, lon1, lat1 = VIEWPORT

    def part_of(batch: pa.Table) -> pa.Table:
        part = quadtree.at_depth(batch.column("cell").to_numpy(),
                                 VIEWPORT_PART_DEPTH)
        return pa.table({
            "event_id": batch.column("event_id"),
            "lon_milli": batch.column("lon_milli"),
            "lat_milli": batch.column("lat_milli"),
            "part": pa.array(part, pa.int64()),
        })

    path = viewport_cache_path(sf_dir)
    cache_partitioned(prep_events(sf_dir).map_batches(
        part_of, batch_format="pyarrow"), path, "part")

    # covered depth-4 cells of the bbox corners' ixy rectangle
    fx, fy = geotag.milli_to_fixed(np.array([lon0, lon1 - 1]),
                                   np.array([lat0, lat1 - 1]))
    ix, iy = quadtree.fixed_to_ixy(fx, fy, VIEWPORT_PART_DEPTH)
    xs = np.arange(ix[0], ix[1] + 1)
    ys = np.arange(iy[0], iy[1] + 1)
    gx, gy = np.meshgrid(xs, ys)
    parts = quadtree.encode_ixy(gx.ravel(), gy.ravel(), VIEWPORT_PART_DEPTH)

    sub = read_partitions(path, "part", np.unique(parts))
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "lon_milli": pa.array([], pa.int64()),
                      "lat_milli": pa.array([], pa.int64())})
    if sub is None:
        return ray.data.from_arrow(empty)

    def in_bbox(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lon_milli" not in t.column_names:
            return empty          # zero-row block with empty schema
        x = t.column("lon_milli").to_numpy()
        y = t.column("lat_milli").to_numpy()
        m = (x >= lon0) & (x < lon1) & (y >= lat0) & (y < lat1)
        return t.filter(pa.array(m)).select(
            ["event_id", "lon_milli", "lat_milli"])

    return sub.map_batches(in_bbox, batch_format="pyarrow")


def viewport_cache_path(sf_dir: str) -> str:
    """Stable per-sf_dir cache dir for the viewport layout (the
    _SUCCESS marker makes re-use across processes safe; a killed build
    leaves no marker and rebuilds)."""
    import hashlib
    import os
    import tempfile
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"viewport_{tag}")


def q_pip_zones(sf_dir: str):
    return pip_zones_ds(sf_dir)


def q_pip_anti(sf_dir: str):
    """Spatial ANTI join / coverage-gap finder: events contained in NO
    grid zone (stages/pip_join.PipAnti over the grid-kind zone subset;
    admin zones tile the whole domain, so the full-set anti is empty by
    construction).  Same broadcast-small-side plan and containment
    kernel as pip_zones, membership inverted — row-pure, no shuffle."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_anti_fn
    grid = zones_table()
    grid = grid.filter(pc.equal(grid.column("kind"), "grid"))
    zref = ray.put(grid)
    return prep_events(sf_dir).map_batches(
        pip_anti_fn(zref), batch_format="pyarrow", batch_size=8192) \
        .select_columns(["event_id", "lon_milli", "lat_milli"])


def q_zone_border_dist(sf_dir: str, margin: int = 2000):
    """Distance to the containing admin zone's BOUNDARY per event (the
    geofence-margin audit: how close is each point to leaving its
    zone; the ST_Distance-to-ST_Boundary analog).  Admin zones tile
    the domain, so every point is inside exactly one; the boundary
    distance of an interior point of a rectangle is the min of its
    four edge offsets — exact int milli, closed-left/open-right
    convention.  Row-pure vectorized kernel, no shuffle."""
    from osmquadtreepostgis_ray.sources.zones import admin_border_dist

    def kernel(batch: pa.Table) -> pa.Table:
        zid, d = admin_border_dist(batch.column("lon_milli").to_numpy(),
                                   batch.column("lat_milli").to_numpy())
        return pa.table({
            "event_id": batch.column("event_id"),
            "zone_id": pa.array(zid, pa.int64()),
            "edge_dist": pa.array(d, pa.int64()),
            "near_border": pa.array(d < margin),
        })

    return prep_events(sf_dir).map_batches(kernel, batch_format="pyarrow")


def q_zone_distance(sf_dir: str):
    """Distance to the nearest grid zone per event (the PostGIS
    ST_Distance / nearest-polygon analog, stages/pip_join.ZoneDistance):
    0 for covered points, exact squared milli euclid to the nearest
    kept rectangle otherwise, tie -> lowest zone_id.  Broadcast small
    side, vectorized clamp matrix per batch — no shuffle."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import ZoneDistance
    from osmquadtreepostgis_ray.util import worker_cached
    grid = zones_table()
    grid = grid.filter(pc.equal(grid.column("kind"), "grid"))
    zref = ray.put(grid)
    return prep_events(sf_dir).map_batches(
        worker_cached(lambda: ZoneDistance(zref)),
        batch_format="pyarrow", batch_size=8192) \
        .select_columns(["event_id", "zone_id", "dist_sq"])


def q_pip_zones_partitioned(sf_dir: str):
    """Co-partitioned PIP join (groupby-on-cell shuffle, per-partition
    GridIndex) — the big-polygon-side scale path; same oracle as the
    broadcast variant."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_copartitioned
    pts = prep_events(sf_dir).select_columns(
        ["event_id", "lon_milli", "lat_milli", "lon", "lat"])
    return pip_join_copartitioned(pts, zones_table()) \
        .select_columns(["event_id", "zone_id", "kind"])


def _event_queries(sf_dir: str, nq: int = 10) -> dict:
    import duckdb
    con = duckdb.connect()
    df = con.sql(f"SELECT event_id, user_id FROM '{sf_dir}/events.parquet' "
                 f"WHERE event_id < {nq} ORDER BY event_id").df()
    lon_m, lat_m = geotag.event_lonlat_milli(df["user_id"].to_numpy(), df["event_id"].to_numpy())
    return {"id": df["event_id"].to_numpy(), "lon_milli": lon_m, "lat_milli": lat_m}


def q_knn_brute(sf_dir: str, k: int = 5):
    from osmquadtreepostgis_ray.stages.knn import knn_brute
    return knn_brute(prep_events(sf_dir), _event_queries(sf_dir), k=k)


def q_knn_cellring(sf_dir: str, k: int = 5):
    """Distributed exact cell-ring kNN: the projected corpus is
    materialized hive-partitioned by coarse cell ONCE (deterministic
    /tmp path, reused across calls) and every ring round reads only the
    disk-intersecting partitions (stages/knn.knn_cellring_pruned)."""
    import hashlib

    from osmquadtreepostgis_ray.stages.knn import knn_cellring_pruned
    ev = prep_events(sf_dir).select_columns(["event_id", "lon_milli", "lat_milli", "cell"])
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return knn_cellring_pruned(ev, _event_queries(sf_dir), k=k,
                               cache_dir=f"/tmp/oqp_cellring_{tag}")


def q_dedup_latest(sf_dir: str):
    """S1 diff-merge semantic: latest event per (user_id, event_type),
    ties broken by max event_id."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        batch = t.to_pandas().sort_values(["ts", "event_id"], kind="stable")
        keep = batch.groupby(["user_id", "event_type"], sort=False).tail(1)
        return pa.Table.from_pandas(keep, preserve_index=False)

    # partial per batch, then one shard_apply shuffle — (user, type)
    # keys scale with the data, so the exact final pick is a vectorized
    # sort + groupby.tail(1) per shard, not a task per key
    part = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        keep = g.groupby(["user_id", "event_type"], sort=False).tail(1)
        return keep[["user_id", "event_type", "event_id"]]

    return (shard_apply(part, ["user_id", "event_type"], final)
            .select_columns(["user_id", "event_type", "event_id"]))


def q_window_hourly(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def hour(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # microseconds
        return batch.append_column("hour", pa.array(ts // 3_600_000_000, pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["sum_value_cents"] = np.rint(df["value"] * 100).astype(np.int64)
        g = df.groupby(["user_id", "hour"], sort=False).agg(
            n=("sum_value_cents", "size"), sum_value_cents=("sum_value_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    part = (ds.map_batches(hour, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow"))
    return (sharded_agg(part, ["user_id", "hour"],
                        {"n": ("n", "sum"),
                         "sum_value_cents": ("sum_value_cents", "sum")})
            .select_columns(["user_id", "hour", "n", "sum_value_cents"]))


# --------------------------------------------------------------- TPC-H-ish

def q_join_orders_customer(sf_dir: str):
    """Dimension join (A3/A4 pattern): customer is the small side —
    broadcast as Dataset BLOCKS (no driver pandas transit; customer is
    data-scaled), bucket-join fallback above the worker-heap cap."""
    from osmquadtreepostgis_ray.stages.joins import dim_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .rename_columns({"c_custkey": "o_custkey"})
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = dim_join(orders, cust, on="o_custkey")

    # combiner: collapse each joined batch to per-segment partials so the
    # groupby shuffle carries ~5 rows per batch, not the join output
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["sum_price_cents"] = np.rint(df["o_totalprice"] * 100).astype(np.int64)
        g = df.groupby("c_mktsegment", sort=False).agg(
            n=("sum_price_cents", "size"), sum_price_cents=("sum_price_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_price_cents", alias_name="sum_price_cents"))
            .select_columns(["c_mktsegment", "n", "sum_price_cents"]))


def q_skew_join(sf_dir: str, max_rows_per_key: int = 5):
    """Adaptive skew-aware join (stages/joins.skew_aware_join): a cheap
    combiner counting pass detects keys above `max_rows_per_key` on the
    big side and switches to the salted join automatically — with the
    deliberately low threshold every user key is hot at every sf, so
    the salted path is what the oracle certifies (output is identical
    to a plain join by construction).  Events joined to customer
    segments on user key, rolled up per segment."""
    from osmquadtreepostgis_ray.stages.joins import skew_aware_join
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "cents": pa.array(np.rint(t.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64()),
        })

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .rename_columns({"c_custkey": "user_id"})
    joined = skew_aware_join(ev.map_batches(cents, batch_format="pyarrow"), cust,
                             on="user_id", max_rows_per_key=max_rows_per_key,
                             id_col="event_id")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("c_mktsegment", sort=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_cents"] = g["sum_cents"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
            .select_columns(["c_mktsegment", "n", "sum_cents"]))


def q_join_lineitem_part(sf_dir: str):
    """Partitioned bucket hash join with aggregate pushdown BELOW the
    join: lineitem is pre-reduced to (partkey, n, sum) partials inside
    each batch, so the join shuffle carries one row per distinct
    partkey per batch (~30x fewer rows than lineitems at sf0.1, and the
    ratio grows with fanout at scale); the brand rollup finishes on the
    joined partials."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])

    def li_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.rint(df["l_extendedprice"] * 100).astype(np.int64)
        g = df.groupby("l_partkey", sort=False).agg(
            n=("cents", "size"), sum_price_cents=("cents", "sum")).reset_index()
        return pa.table({"p_partkey": g["l_partkey"].to_numpy(np.int64),
                         "n": g["n"].to_numpy(np.int64),
                         "sum_price_cents": g["sum_price_cents"].to_numpy(np.int64)})

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    # batch_size >> |partkeys| per batch: the combiner only reduces when
    # a batch spans many duplicates of a key, so coalesce read blocks
    # into 256k-row batches before the partial (6x fewer shuffle rows
    # at sf0.1 than per-block partials)
    joined = bucket_hash_join(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=1 << 18),
        part, on="p_partkey")

    def brand_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("p_brand", sort=False).agg(
            n=("n", "sum"), sum_price_cents=("sum_price_cents", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_price_cents"] = g["sum_price_cents"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(brand_partial, batch_format="pyarrow")
            .groupby("p_brand")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_price_cents", alias_name="sum_price_cents"))
            .select_columns(["p_brand", "n", "sum_price_cents"]))


SAMPLE_MULT = 2654435761
SAMPLE_MOD = 1000


def q_sample_events(sf_dir: str, permille: int = 100):
    """Deterministic hash sampling (training-data subsetting): keep rows
    whose Knuth-hashed id lands under the rate — a pure row predicate,
    stable across parallelism and re-runs (unlike ds.random_sample)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def samp(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy()
        keep = (ids * SAMPLE_MULT) % SAMPLE_MOD < permille
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


def q_sample_stratified(sf_dir: str, per_group: int = 20):
    """Stratified deterministic sample: per event_type, the `per_group`
    rows with the smallest hashed id (uniform within stratum, reproducible).
    Local top-k combiner -> exact grouped head, like topk_per_segment."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def local(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["hk"] = (df["event_id"].to_numpy() * SAMPLE_MULT) % SAMPLE_MOD * 10_000_000 \
            + df["event_id"].to_numpy()  # total order: (hash, id)
        df = df.sort_values("hk", kind="stable")
        return pa.Table.from_pandas(
            df.groupby("event_type", sort=False).head(per_group), preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("hk", kind="stable").head(per_group)[["event_type", "event_id"]]

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("event_type").map_groups(final, batch_format="pandas"))


def q_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Streaming session windows: per user, a gap > gap_minutes starts a
    new session.  groupby(user) -> per-group sort + gap cumsum (the
    stateful-window shape; partition key = user, state never crosses
    users).  Output: per-session (user_id, session, n_events,
    span_us)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    gap_us = gap_minutes * 60_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # whole-shard vectorized: one sort over (user, ts, id); a session
        # break is a user change OR a gap; ids restart per user
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "session": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "span_us": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        user_start = np.r_[True, uid[1:] != uid[:-1]]
        new = user_start | np.r_[True, np.diff(ts) > gap_us]
        gsid = np.cumsum(new)                          # global session id
        base = np.maximum.accumulate(np.where(user_start, gsid - 1, 0))
        sid = gsid - base                              # restarts at 1 per user
        out = pd.DataFrame({"user_id": uid, "session": sid, "ts": ts}) \
            .groupby(["user_id", "session"], sort=False).agg(
                n_events=("ts", "size"), start=("ts", "min"), end=("ts", "max")).reset_index()
        out["span_us"] = out["end"] - out["start"]
        return out[["user_id", "session", "n_events", "span_us"]]

    return shard_apply(ds, ["user_id"], sessions)


def q_distinct_users(sf_dir: str):
    """Distinct-count via the combiner pattern: per-batch unique pairs,
    grouped unique, final count — the shuffle carries distinct pairs
    only (a `unique` that never materializes raw rows)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["event_type", "user_id"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"event_type": g["event_type"].iloc[0],
                              "n_users": int(g["user_id"].nunique())}])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(count_group, batch_format="pandas"))


def q_topk_per_segment(sf_dir: str, k: int = 3):
    """Windowed rank analog: top-k orders by price per market segment
    (grouped sort + head; ties broken by o_orderkey desc)."""
    from osmquadtreepostgis_ray.stages.joins import dim_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .rename_columns({"c_custkey": "o_custkey"})
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    joined = dim_join(orders, cust, on="o_custkey")

    # combiner: per-batch local top-k per segment, then exact grouped top-k
    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["o_totalprice", "o_orderkey"],
                                       ascending=[False, False], kind="stable")
        return pa.Table.from_pandas(df.groupby("c_mktsegment", sort=False).head(k),
                                    preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, False], kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["c_mktsegment", "o_orderkey", "rank"]]

    return (joined.map_batches(local_topk, batch_format="pyarrow")
            .groupby("c_mktsegment").map_groups(final_topk, batch_format="pandas"))


def q_topk_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, True]).limit(10)


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style pre-aggregated wide aggregate."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # exact integer money: 2dp columns -> cents; revenue in 1e-4 units.
        # float partial sums are NOT associativity-stable across block
        # boundaries at 600k+ rows, so both engines aggregate int64.
        df = batch.to_pandas()
        df["sum_qty"] = np.rint(df["l_quantity"]).astype(np.int64)
        df["sum_price_cents"] = np.rint(df["l_extendedprice"] * 100).astype(np.int64)
        df["revenue_e4"] = df["sum_price_cents"] * (
            100 - np.rint(df["l_discount"] * 100).astype(np.int64))
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("sum_qty", "sum"), sum_price_cents=("sum_price_cents", "sum"),
            revenue_e4=("revenue_e4", "sum"), n=("sum_qty", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                       Sum("sum_price_cents", alias_name="sum_price_cents"),
                       Sum("revenue_e4", alias_name="revenue_e4"),
                       Sum("n", alias_name="n"))
            .select_columns(["l_returnflag", "l_linestatus", "sum_qty",
                             "sum_price_cents", "revenue_e4", "n"]))


# ------------------------------------------------------------------ flagship

def q_flagship_point(sf_dir: str):
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    ds = output_tables(sf_dir)["point"]
    cols = [c for c in ds.schema().names if c != "way"]
    return ds.select_columns(cols)


def q_flagship_counts(sf_dir: str):
    """S4 counting sink over the single-pass union pipeline: one read,
    per-batch partial counts, tiny groupby."""
    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union

    def partial(b: pa.Table) -> pa.Table:
        t = pd.Series(b.column("tbl").to_pylist()).value_counts()
        return pa.table({"tbl": pa.array(t.index.to_numpy(), pa.string()),
                         "n": pa.array(t.to_numpy().astype(np.int64), pa.int64())})

    agg = (all_tables_union(sf_dir).map_batches(partial, batch_format="pyarrow")
           .groupby("tbl").aggregate(Sum("n", alias_name="n")))
    return _fill_missing_tables(agg)


def _fill_missing_tables(agg) -> pa.Table:
    """Tables with zero routed rows still get an n=0 row (the oracle
    enumerates all six)."""
    df = agg.to_pandas()[["tbl", "n"]]
    names = ["point", "line", "highway", "polygon", "building", "boundary"]
    missing = [t for t in names if t not in set(df["tbl"])]
    if missing:
        df = pd.concat([df, pd.DataFrame({"tbl": missing, "n": 0})], ignore_index=True)
    df["n"] = df["n"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_union_lines(sf_dir: str):
    """J2 analog: planet_osm_line = line UNION highway (id, tile, z_order)."""
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    t = output_tables(sf_dir)
    cols = ["osm_id", "tile", "z_order"]
    return t["line"].select_columns(cols).union(t["highway"].select_columns(cols))


def q_roads(sf_dir: str):
    """J1 planet_osm_roads analog (/root/reference
    osmquadtreepostgis/__init__.py:214-230): a filtered union-with-
    schema-alignment — major highway rows (`highway IN (major classes)
    OR railway IS NOT NULL` transposed to `z_order >= 20 OR kv_scan >
    0`) UNION admin boundary relations (`osm_id < 0 AND
    boundary='administrative'` transposed to `osm_id < 0`), with the
    boundary side contributing constants (0 AS z_order, NULL AS length)
    and its way_exterior ring in the way slot."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    t = output_tables(sf_dir)
    cols = ["osm_id", "quadtree", "tile", "z_order", "length", "minzoom"]

    def hw_side(b: pa.Table) -> pa.Table:
        m = pc.or_(pc.greater_equal(b.column("z_order"), 20),
                   pc.greater(b.column("kv_scan"), 0))
        return b.filter(m).select(cols)

    def bd_side(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("osm_id"), 0))
        n = b.num_rows
        return pa.table({
            "osm_id": b.column("osm_id"),
            "quadtree": b.column("quadtree"),
            "tile": b.column("tile"),
            "z_order": pa.array(np.zeros(n, np.int64), pa.int64()),
            "length": pa.nulls(n, pa.float64()),
            "minzoom": b.column("minzoom"),
            # way_exterior-as-way (the reference's `way_exterior as way`)
        })

    hw = t["highway"].map_batches(hw_side, batch_format="pyarrow")
    bd = t["boundary"].map_batches(bd_side, batch_format="pyarrow")
    return hw.union(bd)


def q_union_polygon(sf_dir: str):
    """J3 planet_osm_polygon view analog (__init__.py:376-378):
    polygon UNION ALL building over the shared column set."""
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    t = output_tables(sf_dir)
    cols = ["osm_id", "part", "area", "quadtree", "tile", "minzoom"]
    return t["polygon"].select_columns(cols).union(
        t["building"].select_columns(cols))


def q_polygon_point(sf_dir: str):
    """J4 polygon_point view analog (__init__.py:368): the polygon table
    re-emitted with way_point in the way slot, filtered to rows whose
    representative point exists."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.pipelines.flagship import output_tables

    def rp(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("way_point")))
        b = b.drop_columns(["way"]).rename_columns(
            [c if c != "way_point" else "way" for c in b.column_names
             if c != "way"])
        return b

    ds = output_tables(sf_dir)["polygon"].map_batches(rp, batch_format="pyarrow")
    cols = [c for c in ds.schema().names if c != "way"]
    return ds.select_columns(cols)


def q_lowzoom_counts(sf_dir: str, z: int = 12):
    """V1/V2 analog: per-table row count at minzoom <= z (single-pass
    union + minzoom predicate + partial counts)."""
    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pa.compute.less_equal(b.column("minzoom"), z))
        t = pd.Series(b.column("tbl").to_pylist()).value_counts()
        return pa.table({"tbl": pa.array(t.index.to_numpy(), pa.string()),
                         "n": pa.array(t.to_numpy().astype(np.int64), pa.int64())})

    agg = (all_tables_union(sf_dir).map_batches(partial, batch_format="pyarrow")
           .groupby("tbl").aggregate(Sum("n", alias_name="n")))
    return _fill_missing_tables(agg)


COVER_DEPTH = 10


def q_tile_cover(sf_dir: str, depth: int = COVER_DEPTH):
    """Raster<->vector tile assignment (north-star op): each image
    footprint box is exploded to every raster cell it intersects at
    `depth` — a vectorized 1->N flat_map in exact integer math."""
    from osmquadtreepostgis_ray.sources.images import read_images

    def cover(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        lon_m, lat_m = geotag.lonlat_milli_from_phash(batch.column("phash").to_numpy())
        w = batch.column("w").to_numpy().astype(np.int64)
        h = batch.column("h").to_numpy().astype(np.int64)
        x0, y0, x1, y1 = geotag.footprint_milli(lon_m, lat_m, w, h)
        fx0, fy0 = geotag.milli_to_fixed(x0, y0)
        fx1, fy1 = geotag.milli_to_fixed(x1, y1)
        ix0, iy0 = quadtree.fixed_to_ixy(fx0, fy0, depth)
        ix1, iy1 = quadtree.fixed_to_ixy(fx1, fy1, depth)
        nx = (ix1 - ix0 + 1)
        ny = (iy1 - iy0 + 1)
        reps = nx * ny
        rid = np.repeat(np.arange(len(ids)), reps)
        # per-row local offsets 0..nx*ny-1 -> (dx, dy)
        local = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.empty(0, np.int64)
        nxr = np.repeat(nx, reps)
        dx = local % nxr
        dy = local // nxr
        ix = ix0[rid] + dx
        iy = iy0[rid] + dy
        cell = quadtree.encode_ixy(ix, iy, depth)
        return pa.table({"doc_id": pa.array(ids[rid], pa.int64()),
                         "cover_cell": pa.array(cell, pa.int64())})

    return read_images(sf_dir, with_bytes=False).map_batches(cover, batch_format="pyarrow")


# ------------------------------------------------------------- assembly (A1-A4)

def q_assembly(sf_dir: str):
    """A1/A2: phash-grouped images -> stitched ways / multipolygon parts."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.stages.assembly import assemble
    return assemble(read_table(sf_dir, "documents", columns=["doc_id", "text"])) \
        .map_batches(lambda t: t.filter(pc.not_equal(t.column("kind"), "error")),
                     batch_format="pyarrow") \
        .select_columns(["group_id", "osm_id", "kind", "part", "n_points", "measure2"])


def q_relation_tags(sf_dir: str):
    """A3: route-relation refs string-agg'd per member."""
    from osmquadtreepostgis_ray.stages.assembly import relation_tags
    return relation_tags(read_table(sf_dir, "documents", columns=["doc_id"])) \
        .select_columns(["doc_id", "routes"])


def q_admin_levels(sf_dir: str):
    """A3 detail: min/max parent boundary admin_level per member
    (min_admin_level/max_admin_level text columns of the reference's
    line/highway tables, docs/output.txt:6)."""
    from osmquadtreepostgis_ray.stages.assembly import admin_levels
    return admin_levels(read_table(sf_dir, "documents", columns=["doc_id"]))


def q_parent_tags(sf_dir: str):
    """A4: parent-group tag maxima propagated onto members."""
    from osmquadtreepostgis_ray.stages.assembly import parent_tags
    return parent_tags(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def q_checkpoint(sf_dir: str):
    """North-rule lineage: resumable partitioned write of the flagship
    point table; returns the per-partition checkpoint metrics rows."""
    import tempfile

    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    from osmquadtreepostgis_ray.state.checkpoint import resumable_write
    out_dir = tempfile.mkdtemp(prefix="ckpt_", dir="/tmp")
    metrics = resumable_write(output_tables(sf_dir)["point"], out_dir,
                              key_col="tile", part_depth=4)
    return metrics.select(["part", "rows"])


def q_json_props(sf_dir: str):
    """V3 JSON property view (jsonb_strip_nulls analog)."""
    from osmquadtreepostgis_ray.stages.jsonview import json_props
    return json_props(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def q_simplify_ways(sf_dir: str, tol: float = 20000.0):
    """V1 lowzoom generalization: Douglas-Peucker simplify (F10) of the
    assembled open ways; returns per-way vertex counts before/after.
    Deterministic but not SQL-expressible (rows-only check)."""
    from osmquadtreepostgis_ray.functions.geometry import simplify
    from osmquadtreepostgis_ray.stages.assembly import member_table

    from osmquadtreepostgis_ray.functions.geometry import simplify_ring

    def simp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"group_id": pd.Series([], dtype=np.int64),
                                 "n_before": pd.Series([], dtype=np.int64),
                                 "n_after": pd.Series([], dtype=np.int64)})
        coords = np.stack([g["lon_milli"].to_numpy(np.float64),
                           g["lat_milli"].to_numpy(np.float64)], axis=1)
        closed = (g["close_hit"] > 0).any() and len(g) >= 3
        if closed:  # ring simplify keeps closure (points pass through in V1)
            ring = np.vstack([coords, coords[:1]])
            out = simplify_ring(ring, tol)
        else:
            out = simplify(coords, tol)
        return pd.DataFrame({"group_id": [int(g["group_id"].iloc[0])],
                             "n_before": [len(coords) + (1 if closed else 0)],
                             "n_after": [len(out)]})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return member_table(docs).groupby("group_id").map_groups(simp, batch_format="pandas")


# ------------------------------------------------------------------ documents

def q_dedup_exact(sf_dir: str):
    from osmquadtreepostgis_ray.stages.dedup import dedup_exact
    ds = dedup_exact(read_table(sf_dir, "documents", columns=["doc_id", "text"]))
    return ds.select_columns(["keep_id", "n_dups"])


def q_lang_id(sf_dir: str):
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    ds = add_text_stats(read_table(sf_dir, "documents", columns=["doc_id", "text"]))
    return ds.select_columns(["doc_id", "lang_pred"])


def q_quality(sf_dir: str):
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    ds = add_text_stats(read_table(sf_dir, "documents", columns=["doc_id", "text"]))
    return ds.select_columns(["doc_id", "n_tokens", "stop_hits", "stop_permille"])


def q_hstore_tags(sf_dir: str):
    from osmquadtreepostgis_ray.config import DEFAULT_FEATURE_KEYS
    from osmquadtreepostgis_ray.functions.tags import hstore_leftover

    def hs(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pylist())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "tags": pa.array(hstore_leftover(s, set(DEFAULT_FEATURE_KEYS)).to_numpy(), pa.string()),
        })

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        hs, batch_format="pyarrow")


def q_token_bpe(sf_dir: str):
    """Per-source totals under the BPE-ish regex pre-tokenizer (letter /
    digit / symbol runs) alongside the whitespace count — the two token
    accountings a training-data pipeline reports."""
    from osmquadtreepostgis_ray.functions import text as T

    def tok(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pylist())
        return pa.table({
            "source": batch.column("source"),
            "bpe_tokens": pa.array(T.bpe_token_count(s), pa.int64()),
            "ws_tokens": pa.array(T.token_count(s), pa.int64()),
        })

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("source", sort=False).agg(
            bpe_tokens=("bpe_tokens", "sum"), ws_tokens=("ws_tokens", "sum"),
            docs=("ws_tokens", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (read_table(sf_dir, "documents", columns=["text", "source"])
            .map_batches(tok, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("bpe_tokens", alias_name="bpe_tokens"),
                       Sum("ws_tokens", alias_name="ws_tokens"),
                       Sum("docs", alias_name="docs"))
            .select_columns(["source", "bpe_tokens", "ws_tokens", "docs"]))


def q_token_totals(sf_dir: str):
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    ds = add_text_stats(read_table(sf_dir, "documents", columns=["doc_id", "text", "source"]))
    return (ds.groupby("source")
              .aggregate(Sum("n_tokens", alias_name="tokens"), Count(alias_name="docs"))
              .select_columns(["source", "tokens", "docs"]))


# ------------------------------------------------------------------ embeddings

def _query_vectors(sf_dir: str, nq: int = 5):
    import duckdb
    con = duckdb.connect()
    df = con.sql(f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id < {nq} ORDER BY vec_id").df()
    ids = df["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def q_embed_docs(sf_dir: str, k: int = 5):
    """Embedding generation + self-kNN end-to-end: hash-embed the
    documents, then top-k over the generated vectors (no precomputed
    embeddings table).  Rows-only (hash embedder isn't SQL)."""
    import pyarrow.dataset as pds

    from osmquadtreepostgis_ray.stages.embed import embed_documents, knn_embeddings
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    corpus = embed_documents(docs).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]), batch_format="pyarrow")
    # query vectors: the embedder is a pure per-row function, so embed
    # ONLY the 5 query docs (predicate pushed into the parquet scan)
    # instead of executing the whole corpus embedding pipeline twice
    qdocs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                       filter=pds.field("doc_id") < 5)
    q = embed_documents(qdocs).to_pandas()
    ids = q["doc_id"].to_numpy().astype(np.int64)
    mat = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    return knn_embeddings(corpus, ids, mat, k=k)


def q_embed_knn(sf_dir: str, k: int = 5):
    from osmquadtreepostgis_ray.stages.embed import knn_embeddings
    ids, mat = _query_vectors(sf_dir)
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_embeddings(corpus, ids, mat, k=k)


def _ivf_setup(sf_dir: str):
    """Shared centroids + deterministic index path for the IVF queries
    (the index is built once per corpus and reused across calls)."""
    import duckdb
    import hashlib
    con = duckdb.connect()
    cdf = con.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                  f"WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 16").df()
    centroids = np.stack(cdf["embedding"].to_numpy()).astype(np.float64)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return centroids, f"/tmp/oqp_ivf_{tag}_{len(centroids)}"


def q_embed_knn_ivf(sf_dir: str, k: int = 5):
    """Pruned ANN: only the nprobe probed buckets' parquet files are
    read (file-level prune via the hive-partitioned IVF index)."""
    from osmquadtreepostgis_ray.stages.embed import ivf_knn
    ids, mat = _query_vectors(sf_dir)
    centroids, path = _ivf_setup(sf_dir)
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_knn(corpus, centroids, ids, mat, k=k, nprobe=6, index_path=path)


NEARDUP_TWIN_STEP = 50
NEARDUP_TWIN_OFFSET = 1_000_000


def q_embed_knn_ivf_exhaustive(sf_dir: str, k: int = 5):
    """IVF with nprobe = all buckets: must equal the brute-force top-k
    bit-for-bit — the correctness gate for the IVF assignment/probe
    machinery (the nprobe<buckets query demonstrates the pruned path)."""
    from osmquadtreepostgis_ray.stages.embed import ivf_knn
    ids, mat = _query_vectors(sf_dir)
    centroids, path = _ivf_setup(sf_dir)
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_knn(corpus, centroids, ids, mat, k=k, nprobe=len(centroids),
                   index_path=path).select(["query_id", "neighbor_id", "rank"])


def q_embed_knn_lsh(sf_dir: str, k: int = 5):
    """LSH-bucketed ANN (multi-probe hamming<=2 over 6 hyperplane sign
    bits; exact within the probed buckets).  Hash-gated since round 3:
    oracle.sql_embed_knn_lsh inlines the seeded hyperplanes as SQL
    literals and reproduces the probe-set prune exactly; recall vs
    brute force is additionally asserted in tests."""
    import hashlib

    from osmquadtreepostgis_ray.stages.embed import lsh_knn
    ids, mat = _query_vectors(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_knn(corpus, ids, mat, k=k, max_hamming=2,
                   index_path=f"/tmp/oqp_lsh_{tag}")


def q_embed_knn_lsh_exhaustive(sf_dir: str, k: int = 5):
    """LSH with max_hamming = planes (every bucket probed): must equal
    the brute-force top-k bit-for-bit — the correctness gate for the
    bucket assignment/probe machinery, mirroring
    q_embed_knn_ivf_exhaustive (oracle: sql_embed_knn)."""
    import hashlib

    from osmquadtreepostgis_ray.stages.embed import lsh_knn
    ids, mat = _query_vectors(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_knn(corpus, ids, mat, k=k, max_hamming=6,
                   index_path=f"/tmp/oqp_lsh_{tag}") \
        .select(["query_id", "neighbor_id", "rank"])


def q_embed_neardup(sf_dir: str):
    """Near-dup pairs over the corpus plus deterministic exact-duplicate
    twins (vec_id % 50 == 0 -> twin at vec_id + 1e6): the driver corpus
    is random (max cosine ~0.5), so the twins give the operator a known,
    SQL-expressible answer set — every (id, id+1e6) pair at sim 1000,
    nothing else at threshold 0.9."""
    from osmquadtreepostgis_ray.stages.embed import cosine_neardup_pairs

    def add_twins(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        m = ids % NEARDUP_TWIN_STEP == 0
        if not m.any():
            return batch
        twins = batch.filter(pa.array(m))
        twins = twins.set_column(
            twins.schema.get_field_index("vec_id"), "vec_id",
            pa.array(twins.column("vec_id").to_numpy() + NEARDUP_TWIN_OFFSET, pa.int64()))
        return pa.concat_tables([batch, twins])

    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .map_batches(add_twins, batch_format="pyarrow")
    return cosine_neardup_pairs(corpus, threshold=0.9)


def q_minhash_pairs(sf_dir: str):
    from osmquadtreepostgis_ray.stages.dedup import minhash_candidates
    ds = minhash_candidates(read_table(sf_dir, "documents", columns=["doc_id", "text"]),
                            sim_threshold=0.5)
    return ds


def q_simhash(sf_dir: str):
    from osmquadtreepostgis_ray.stages.dedup import simhash_buckets
    return simhash_buckets(read_table(sf_dir, "documents", columns=["doc_id", "text"])) \
        .select_columns(["doc_id", "simhash", "bucket"])


def q_ngram_dups(sf_dir: str):
    from osmquadtreepostgis_ray.stages.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(read_table(sf_dir, "documents", columns=["doc_id", "text"]),
                               n=3, threshold=0.6)


def q_fingerprints(sf_dir: str):
    from osmquadtreepostgis_ray.stages.dedup import add_fingerprint
    return add_fingerprint(read_table(sf_dir, "documents", columns=["doc_id", "text"])) \
        .select_columns(["doc_id", "fingerprint"])


# ------------------------------------------------------------------ images

def q_frame_sample(sf_dir: str, stride: int = 2):
    """Multimodal video path: synth multi-frame payloads -> actor-pool
    frame sampling (1->N explode) with per-frame features.  Frame count
    is SQL-expressible; pixel features are rows-only."""
    from osmquadtreepostgis_ray.stages.images import FrameSample, synth_videos_batch
    vids = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth_videos_batch, batch_format="pyarrow")
    from osmquadtreepostgis_ray.util import worker_cached
    return vids.map_batches(worker_cached(lambda: FrameSample(stride=stride)),
                            batch_format="pyarrow", batch_size=IMG_BATCH)


def q_image_decode(sf_dir: str):
    """Multimodal decode path: actor-pool decode + PSNR invariant +
    feature extraction. Returns integer stats (psnr floor, mean pixel)."""
    from osmquadtreepostgis_ray.stages.images import DecodeStats
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.util import worker_cached
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(DecodeStats), batch_format="pyarrow", batch_size=IMG_BATCH) \
        .select_columns(["image_id", "psnr_ok", "mean_pixel", "w_out", "h_out"])


def q_caption_stats_by_zone(sf_dir: str):
    """Per-admin-zone caption statistics (text x geo fusion: the
    regional content profile a geotagged-corpus curation dashboard
    shows): each document's phash-derived geotag places it in exactly
    one admin zone; combiner (zone, n, sum_chars) partials -> one
    bounded (AX*AY-row) grouped sum; mean in exact milli."""
    from ray.data.aggregate import Sum

    from osmquadtreepostgis_ray.sources import zones as Z

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        ph = geotag.phash_of(ids)
        lon, lat = geotag.lonlat_milli_from_phash(ph)
        zone = (lat // Z.ADMIN_H) * Z.AX + (lon // Z.ADMIN_W) + Z.ADMIN_ID_BASE
        df = pd.DataFrame({"zone_id": zone,
                           "chars": batch.column("n_chars").to_numpy()})
        g = df.groupby("zone_id", as_index=False).agg(
            n=("chars", "size"), sum_chars=("chars", "sum"))
        for c in ("n", "sum_chars"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("zone_id") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_chars", alias_name="sum_chars"))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        s = t.column("sum_chars").to_numpy()
        return t.append_column(
            "mean_chars_milli",
            pa.array(1000 * s // np.maximum(n, 1), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["zone_id", "n", "sum_chars", "mean_chars_milli"])


GEO_DUP_DEPTH = 2


def q_geo_dup_groups(sf_dir: str):
    """Geo-constrained perceptual dedup — the graft's two axes fused
    (image fingerprint x quadtree cell): images sharing BOTH the ahash
    AND the depth-2 cell of their phash-derived geotag form one
    duplicate-at-location group (a repost of the same shot at the same
    place — distinct from a lookalike elsewhere, which ahash_dups alone
    would conflate).  Combiner-first: per-batch (ahash, cell) partial
    counts + min doc; one sharded composite-key aggregate; >=2 filter
    on the aggregated table."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import AHash
    from osmquadtreepostgis_ray.util import worker_cached

    hasher_fn = worker_cached(AHash)

    def part(b: pa.Table) -> pa.Table:
        a = hasher_fn(b)  # row-aligned with the input batch
        ph = b.column("phash").to_numpy()
        lon, lat = geotag.lonlat_milli_from_phash(ph)
        fx, fy = geotag.milli_to_fixed(lon, lat)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, GEO_DUP_DEPTH)
        df = pd.DataFrame({
            "ahash": a.column("ahash").to_numpy(),
            "cell": quadtree.encode_ixy(ix, iy, GEO_DUP_DEPTH),
            "doc": b.column("doc_id").to_numpy()})
        g = df.groupby(["ahash", "cell"], as_index=False).agg(
            n=("doc", "size"), min_doc=("doc", "min"))
        for c in ("n", "min_doc"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(read_images(sf_dir, with_bytes=True).map_batches(
        part, batch_format="pyarrow", batch_size=IMG_BATCH),
        ["ahash", "cell"], {"n": ("n", "sum"), "min_doc": ("min_doc", "min")})

    def keep_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"), 2))

    return agg.map_batches(keep_dups, batch_format="pyarrow") \
        .select_columns(["ahash", "cell", "n", "min_doc"])


def q_image_augment(sf_dir: str):
    """Deterministic seeded train-time augmentation (flip + crop) with
    exact-int64 stats of the augmented view (stages/images.AugmentCrop).
    Row-pure — decode/flip/crop/reduce all inside the batch, no shuffle;
    the same epoch re-runs bit-identically at any parallelism because
    the augmentation parameters are a pure function of phash."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import AugmentCrop
    from osmquadtreepostgis_ray.util import worker_cached
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(AugmentCrop), batch_format="pyarrow", batch_size=IMG_BATCH)


def q_image_ahash(sf_dir: str):
    """Perceptual average-hash feature extraction (image-payload
    fingerprint): decode -> 8x8 integer block means -> 64-bit hash.
    Full-value oracle (oracle.sql_image_ahash)."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import AHash
    from osmquadtreepostgis_ray.util import worker_cached
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(AHash), batch_format="pyarrow", batch_size=IMG_BATCH) \
        .select_columns(["image_id", "w", "h", "ahash"])


def q_ahash_dups(sf_dir: str):
    """Perceptual exact-dup groups: images sharing an ahash, grouped on
    the hash (the dedup_exact shape on a perceptual key — linear
    output; pairwise hamming output is quadratic on this adversarial
    synthetic corpus, see stages/images.ahash_neardup_pairs)."""
    hashed = q_image_ahash(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"ahash": batch.column("ahash").to_numpy(),
                           "image_id": batch.column("image_id").to_pylist()})
        g = df.groupby("ahash", sort=False)["image_id"].agg(["min", "count"]).reset_index()
        return pa.table({"ahash": g["ahash"].to_numpy(),
                         "keep_id": pa.array(g["min"].tolist(), pa.string()),
                         "n": g["count"].to_numpy().astype(np.int64)})

    agg = (hashed.map_batches(partial, batch_format="pyarrow")
                 .groupby("ahash")
                 .aggregate(Min("keep_id", alias_name="keep_id"),
                            Sum("n", alias_name="n_dups")))
    return agg.filter(expr="n_dups >= 2").select_columns(["ahash", "n_dups", "keep_id"])


def q_neardup_clusters(sf_dir: str):
    """Dedup clustering: synthetic near-dup edge graph over documents
    (chains doc->doc+1 where doc%7<3, tree links doc->doc//2 where
    doc%11==0 — multi-hop components) -> connected components via
    distributed min-label propagation (stages/cluster.py).  Oracle:
    recursive-CTE transitive closure."""
    from osmquadtreepostgis_ray.stages.cluster import connected_components
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        a1 = ids[ids % 7 < 3]
        a2 = ids[(ids % 11 == 0) & (ids > 0)]
        return pa.table({"a": pa.array(np.r_[a1, a2], pa.int64()),
                         "b": pa.array(np.r_[a1 + 1, a2 // 2], pa.int64())})

    return connected_components(docs.map_batches(edges, batch_format="pyarrow"))


def q_split_leakage_safe(sf_dir: str, train_permille: int = 800):
    """Leakage-safe train/test split: every document in a near-dup
    CLUSTER gets the same split, so near-duplicates never straddle
    train and test (the contamination mode a per-doc random split
    creates).  Components from the same synthetic edge graph as
    q_neardup_clusters; isolated docs are their own component (label =
    doc_id, via a bucket LEFT join + coalesce — the label table scales
    with the corpus, so no broadcast).  The split is the deterministic
    Knuth hash of the COMPONENT id — pure, reproducible, oracle-exact."""
    from osmquadtreepostgis_ray.stages.cluster import connected_components
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        a1 = ids[ids % 7 < 3]
        a2 = ids[(ids % 11 == 0) & (ids > 0)]
        return pa.table({"a": pa.array(np.r_[a1, a2], pa.int64()),
                         "b": pa.array(np.r_[a1 + 1, a2 // 2], pa.int64())})

    labels = connected_components(docs.map_batches(edges, batch_format="pyarrow")) \
        .map_batches(lambda t: t.rename_columns(["doc_id", "component"]),
                     batch_format="pyarrow")
    joined = bucket_hash_join(docs, labels, on="doc_id", how="left")

    def assign(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ids = df["doc_id"].to_numpy(np.int64)
        comp = df["component"].to_numpy(np.float64)
        comp = np.where(np.isnan(comp), ids, comp).astype(np.int64)
        train = (comp * SAMPLE_MULT) % SAMPLE_MOD < train_permille
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "component": pa.array(comp, pa.int64()),
                         "split": pa.array(np.where(train, "train", "test"))})

    return joined.map_batches(assign, batch_format="pyarrow")


def q_audio_features(sf_dir: str):
    """Audio decode + SNR invariant + integer feature extraction
    (stages/audio.AudioFeatures over the synthetic PCM corpus)."""
    from osmquadtreepostgis_ray.sources.audio import read_audio
    from osmquadtreepostgis_ray.stages.audio import AudioFeatures
    from osmquadtreepostgis_ray.util import worker_cached
    return read_audio(sf_dir).map_batches(
        worker_cached(AudioFeatures), batch_format="pyarrow",
        batch_size=AUDIO_BATCH)


def q_audio_windows(sf_dir: str, window: int = 256, stride: int = 2):
    """Windowed audio energy explode (1->N; the audio frame-sample
    analog): every stride-th 256-sample window's exact |s| sum."""
    from osmquadtreepostgis_ray.sources.audio import read_audio
    from osmquadtreepostgis_ray.stages.audio import WindowEnergy
    from osmquadtreepostgis_ray.util import worker_cached
    return read_audio(sf_dir).map_batches(
        worker_cached(lambda: WindowEnergy(window=window, stride=stride)),
        batch_format="pyarrow", batch_size=AUDIO_BATCH)


def q_asof_join(sf_dir: str):
    """As-of join (the custom temporal operator): every event matched to
    its user's LATEST prior status update (update rows = events with
    event_id % 10 == 0; update value a pure function of ts so duplicate
    (user, ts) updates agree).  Oracle: DuckDB native ASOF JOIN."""
    from osmquadtreepostgis_ray.stages.joins import asof_join
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep_left(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        t = pa.table({"event_id": batch.column("event_id"),
                      "user_id": batch.column("user_id"),
                      "ts_us": batch.column("ts").cast(pa.int64())})
        return t.filter(pa.array(eid % 10 != 0))

    def prep_right(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        m = eid % 10 == 0
        return pa.table({"user_id": pa.array(batch.column("user_id").to_numpy()[m], pa.int64()),
                         "ts_us": pa.array(ts[m], pa.int64()),
                         "cents": pa.array(ts[m] % 100000, pa.int64())})

    j = asof_join(ev.map_batches(prep_left, batch_format="pyarrow"),
                  ev.map_batches(prep_right, batch_format="pyarrow"),
                  key="user_id", ts_col="ts_us")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "asof_cents": batch.column("__r_cents"),
            "lag_us": pa.array(batch.column("ts_us").to_numpy()
                               - batch.column("__r_ts_us").to_numpy(), pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_range_join(sf_dir: str):
    """1-D range join (stages/joins.interval_join): orders priced inside
    each supplier's derived price band [lo, lo+100000) cents.  Bounds
    are shifted non-negative (CLAUDE.md integer-division invariant);
    bin width equals the band width so intervals replicate <= 2x."""
    from osmquadtreepostgis_ray.stages.joins import interval_join
    WIDTH = 100_000

    def prep_points(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "price_cents": pa.array(
                np.rint(batch.column("o_totalprice").to_numpy() * 100).astype(np.int64),
                pa.int64()),
        })

    def prep_intervals(batch: pa.Table) -> pa.Table:
        lo = (np.rint(batch.column("s_acctbal").to_numpy() * 100).astype(np.int64)
              + 100_000) * 20
        return pa.table({
            "s_suppkey": batch.column("s_suppkey"),
            "lo_cents": pa.array(lo, pa.int64()),
            "hi_cents": pa.array(lo + WIDTH, pa.int64()),
        })

    pts = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(prep_points, batch_format="pyarrow")
    ivs = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]) \
        .map_batches(prep_intervals, batch_format="pyarrow")
    out = interval_join(pts, ivs, val_col="price_cents",
                        lo_col="lo_cents", hi_col="hi_cents", bin_width=WIDTH)
    return out.select_columns(["o_orderkey", "s_suppkey", "price_cents", "lo_cents"])


def q_chunk_docs(sf_dir: str, chunk_tokens: int = 32, overlap: int = 8):
    """LLM-training document chunking (1->N): fixed-token chunks with
    overlap, Arrow split/slice/join kernels end to end."""
    from osmquadtreepostgis_ray.stages.textstats import chunk_documents
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=chunk_tokens, overlap=overlap)


def q_window_sliding(sf_dir: str, width_hours: int = 3):
    """Sliding-window aggregate: per (user, hour), counts/sums over the
    trailing `width_hours` window.  Combiner partials collapse events
    to hourly rows FIRST (shuffle carries hourly aggregates, never
    events); the per-user trailing sum is a keyed map_groups over tiny
    groups (same shape as sessionize)."""
    hourly = q_window_hourly(sf_dir)

    def slide(g: pd.DataFrame) -> pd.DataFrame:
        # whole-shard vectorized: sort (user, hour); the trailing
        # [h-width+1, h] window never crosses users because the
        # searchsorted runs on the composite key user*2^32 + hour
        # (hours are epoch-hour ints << 2^31)
        g = g.sort_values(["user_id", "hour"], kind="stable")
        u = g["user_id"].to_numpy(np.int64)
        h = g["hour"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        c = g["sum_value_cents"].to_numpy(np.int64)
        assert not len(h) or (h.min() >= 0 and h.max() < (1 << 31))
        comp = (u << np.int64(32)) | h
        lo = np.searchsorted(comp, (u << np.int64(32)) | np.maximum(h - width_hours + 1, 0))
        cn = np.r_[0, np.cumsum(n)]
        cc = np.r_[0, np.cumsum(c)]
        idx = np.arange(len(h)) + 1
        return pd.DataFrame({
            "user_id": u,
            "hour": h,
            "n_win": cn[idx] - cn[lo],
            "sum_cents_win": cc[idx] - cc[lo],
        })

    return (shard_apply(hourly, ["user_id"], slide)
            .select_columns(["user_id", "hour", "n_win", "sum_cents_win"]))


def q_quantiles(sf_dir: str):
    """Exact grouped quantiles (p25/p50/p75 of value cents per
    event_type) — the grouped order-statistic aggregate.  The combiner
    collapses events to (cents, count) per batch first, so the shuffle
    carries distinct values, and the per-group pick is a weighted
    order statistic over the (tiny) distinct-value axis.  At 100 TB a
    group's distinct axis can still be bounded by bucketing cents; the
    exact pick then happens over bucket counts the same way.  Index
    convention matches DuckDB quantile_disc: element ceil(p*n)-1 of the
    sorted multiset."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.rint(df["value"] * 100).astype(np.int64)
        g = df.groupby(["event_type", "cents"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "cents"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        c = g["cents"].to_numpy(np.int64)
        w = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(w)
        n = int(cum[-1])
        out = {}
        for name, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            k = max(0, int(np.ceil(p * n)) - 1)          # quantile_disc
            out[name] = int(c[np.searchsorted(cum, k + 1, side="left")])
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n": np.array([n], np.int64),
                             "p25": np.array([out["p25"]], np.int64),
                             "p50": np.array([out["p50"]], np.int64),
                             "p75": np.array([out["p75"]], np.int64)})

    return (counts.groupby("event_type").map_groups(pick, batch_format="pandas")
            .select_columns(["event_type", "n", "p25", "p50", "p75"]))


QCONT_PERMILLE = (500, 900)


def q_quantiles_cont(sf_dir: str):
    """Interpolated grouped quantiles (percentile_cont shape, p50/p90
    of value cents per event_type) in EXACT integer milli-cents: the
    0-based position is (n-1)*q_permille; with k = pos // 1000 and
    rem = pos % 1000 the answer is v[k]*(1000-rem) + v[k+1]*rem — all
    operands non-negative int64, so the DuckDB twin matches
    bit-for-bit (no float percentile_cont on either side).  Same
    distinct-value combiner as q_quantiles: the shuffle carries
    (type, cents, count), never rows."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.rint(df["value"] * 100).astype(np.int64)
        g = df.groupby(["event_type", "cents"], sort=False).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "cents"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        c = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(g["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        et, qs, vs = [], [], []
        for qpm in QCONT_PERMILLE:
            pos = (n - 1) * qpm
            k, rem = pos // 1000, pos % 1000
            vlo = int(c[np.searchsorted(cum, k + 1, side="left")])
            vhi = int(c[np.searchsorted(cum, min(k + 1, n - 1) + 1, side="left")])
            et.append(g["event_type"].iloc[0])
            qs.append(qpm)
            vs.append(vlo * (1000 - rem) + vhi * rem)
        return pd.DataFrame({"event_type": et,
                             "qpm": np.array(qs, np.int64),
                             "interp_milli": np.array(vs, np.int64)})

    return (counts.groupby("event_type").map_groups(pick, batch_format="pandas")
            .select_columns(["event_type", "qpm", "interp_milli"]))


def _urgent_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def keep(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch.column("o_orderpriority"), "1-URGENT")
        return pa.table({"c_custkey": batch.column("o_custkey").filter(m)})

    return ds.map_batches(keep, batch_format="pyarrow")


def q_semi_join(sf_dir: str):
    """Semi join: customers with at least one URGENT order (left
    columns only, no pair expansion)."""
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    return bucket_semi_join(cust, _urgent_orders(sf_dir), on="c_custkey")


def q_anti_join(sf_dir: str):
    """Anti join: customers with no urgent order."""
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    return bucket_semi_join(cust, _urgent_orders(sf_dir), on="c_custkey", anti=True)


def q_bloom_semi(sf_dir: str):
    """Bloom-prefiltered semi join: lineitems whose part has p_size = 1
    (~2% of parts).  The 128 KiB Bloom bitmap of matching part keys is
    built distributed and broadcast once; ~98% of lineitem rows are
    dropped BEFORE the join shuffle, and the exact bucket semi join on
    the survivors removes bloom false positives — result identical to
    the plain semi join, exchange volume proportional to the match
    rate, not the table."""
    from osmquadtreepostgis_ray.stages.joins import bloom_semi_join
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_linenumber"])

    def small_parts(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch.column("p_size"), 1)
        return pa.table({"p_partkey": batch.column("p_partkey").filter(m)})

    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_size"]) \
        .map_batches(small_parts, batch_format="pyarrow")
    return bloom_semi_join(li, parts.rename_columns(["l_partkey"]),
                           on="l_partkey")


PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]


def q_pivot(sf_dir: str):
    """Pivot (long -> wide reshape): order counts per market segment x
    priority, priorities as columns.  The combiner counts per
    (segment, priority) inside each batch; the shuffle carries the tiny
    long-form table; the final widening is a vectorized per-segment
    reshape.  Broadcast join attaches the segment (customer is the
    small side)."""
    from osmquadtreepostgis_ray.stages.joins import dim_join
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .rename_columns({"c_custkey": "o_custkey"})
    joined = dim_join(orders, cust, on="o_custkey")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["c_mktsegment", "o_orderpriority"], sort=False) \
              .size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    long = (joined.map_batches(partial, batch_format="pyarrow")
            .groupby(["c_mktsegment", "o_orderpriority"])
            .aggregate(Sum("cnt", alias_name="cnt")))

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        counts = dict(zip(g["o_orderpriority"], g["cnt"]))
        row = {"c_mktsegment": [g["c_mktsegment"].iloc[0]]}
        for col, p in zip(_PRIORITY_COLS, PRIORITIES):
            row[col] = np.array([counts.get(p, 0)], np.int64)
        return pd.DataFrame(row)

    return (long.groupby("c_mktsegment").map_groups(widen, batch_format="pandas")
            .select_columns(["c_mktsegment"] + _PRIORITY_COLS))


def q_image_resize(sf_dir: str, target: tuple = (8, 8)):
    """Oracle-checked resize path: decode -> nearest-neighbor resize to
    8x8 (exact integer index map (i*src)//dst) -> integer mean of the
    resized pixels (stages/images.DecodeStats(target=...))."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import DecodeStats
    from osmquadtreepostgis_ray.util import worker_cached
    t = tuple(target)
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(lambda: DecodeStats(target=t)),
        batch_format="pyarrow", batch_size=IMG_BATCH) \
        .select_columns(["image_id", "mean_pixel", "w_out", "h_out"])


def q_multimodal_fusion(sf_dir: str):
    """Multimodal training-row assembly: per document, fuse the image
    perceptual hash, the text quality stats and the audio features into
    one wide feature row — ONE 3-way bucket join on doc_id (a single
    shuffle; chaining two-way joins pays an exchange per modality, and
    a real fusion fans in many modalities).  Bytes never enter the
    join — each modality is reduced to its feature columns first."""
    from osmquadtreepostgis_ray.stages.joins import multiway_bucket_join

    img = q_image_ahash(sf_dir)

    def img_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = pc.cast(pc.utf8_slice_codeunits(batch.column("image_id"), 3), pa.int64())
        return pa.table({"doc_id": ids, "ahash": batch.column("ahash")})

    aud = q_audio_features(sf_dir)

    def aud_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = pc.cast(pc.utf8_slice_codeunits(batch.column("audio_id"), 3), pa.int64())
        return pa.table({"doc_id": ids,
                         "mean_abs": batch.column("mean_abs"),
                         "peak": batch.column("peak")})

    txt = q_quality(sf_dir)
    fused = multiway_bucket_join(
        [txt, img.map_batches(img_key, batch_format="pyarrow"),
         aud.map_batches(aud_key, batch_format="pyarrow")], on="doc_id")

    def cast_int(batch: pa.Table) -> pa.Table:
        cols = ["doc_id", "n_tokens", "stop_permille", "ahash", "mean_abs", "peak"]
        return pa.table({c: batch.column(c).cast(pa.int64()) for c in cols})

    return fused.map_batches(cast_int, batch_format="pyarrow")


def q_top_terms(sf_dir: str, k: int = 3):
    """Keyword extraction (tf-idf shape, integer-exact): per document
    the top-k terms ranked by (tf desc, df asc, term asc) — df ranks
    replace the float idf log so the oracle compares exactly.  Document
    frequency is a combiner groupby (vocabulary-sized) broadcast once;
    per-doc tf + ranking never leave the batch."""
    import pyarrow.compute as pc
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks).to_pandas()
        doc = np.repeat(np.arange(len(n)), n)
        u = pd.DataFrame({"doc": doc, "w": flat}).drop_duplicates()
        g = u.groupby("w", sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(g, preserve_index=False)

    df_tab = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("df", alias_name="df"))).to_pandas()
    df_ref = ray.put(dict(zip(df_tab["w"], df_tab["df"].astype(np.int64))))

    from osmquadtreepostgis_ray.util import worker_cached

    class TopTerms:
        def __init__(self):
            self.df = ray.get(df_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = pc.split_pattern(batch.column("text"), " ")
            n = pc.list_value_length(toks).to_numpy()
            ids = batch.column("doc_id").to_numpy()
            flat = pc.list_flatten(toks).to_pandas()
            doc = np.repeat(ids, n)
            tf = (pd.DataFrame({"doc_id": doc, "term": flat})
                  .groupby(["doc_id", "term"], sort=False).size()
                  .reset_index(name="tf"))
            tf["df"] = tf["term"].map(self.df).astype(np.int64)
            tf = tf.sort_values(["doc_id", "tf", "df", "term"],
                                ascending=[True, False, True, True],
                                kind="stable")
            tf["rank"] = tf.groupby("doc_id", sort=False).cumcount() + 1
            out = tf[tf["rank"] <= 3]
            return pa.Table.from_pandas(out, preserve_index=False)

    return docs.map_batches(worker_cached(TopTerms), batch_format="pyarrow") \
        .select_columns(["doc_id", "term", "tf", "df", "rank"])


def q_json_extract(sf_dir: str):
    """Semi-structured extraction: pull the integer `k` field out of
    the events' JSON props column (vectorized Arrow extract_regex — a
    compiled kernel, no per-row json.loads) and aggregate per
    event_type with the combiner pattern."""
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("props").combine_chunks(),
                               r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "k": k})
        g = df.groupby("event_type", sort=False)["k"].agg(["sum", "count", "max"]).reset_index()
        return pa.table({"event_type": g["event_type"].tolist(),
                         "sum_k": g["sum"].to_numpy(np.int64),
                         "n": g["count"].to_numpy(np.int64),
                         "max_k": g["max"].to_numpy(np.int64)})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("sum_k", alias_name="sum_k"),
                       Sum("n", alias_name="n"),
                       Max("max_k", alias_name="max_k"))
            .select_columns(["event_type", "sum_k", "n", "max_k"]))


def q_unpivot(sf_dir: str):
    """Unpivot (wide -> long reshape): the pivot table melted back to
    (segment, priority, cnt) rows — one vectorized concat per batch,
    priorities restored from the column mapping."""
    wide = q_pivot(sf_dir)

    def melt(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_pylist()
        n = len(seg)
        segs, prios, cnts = [], [], []
        for col, p in zip(_PRIORITY_COLS, PRIORITIES):
            segs.extend(seg)
            prios.extend([p] * n)
            cnts.append(batch.column(col).to_numpy())
        return pa.table({
            "c_mktsegment": pa.array(segs, pa.string()),
            "priority": pa.array(prios, pa.string()),
            "cnt": pa.array(np.concatenate(cnts) if cnts else
                            np.array([], np.int64), pa.int64()),
        })

    return wide.map_batches(melt, batch_format="pyarrow")


def q_intersect_keys(sf_dir: str):
    """Set intersection: distinct event users that are also customer
    keys — batch-level distinct combiner on the big side, then ONE
    semi-join membership shuffle whose bucket merge also finishes the
    exact distinct (equal keys co-locate; no separate groupby(key)
    aggregate pass)."""
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join
    ev = read_table(sf_dir, "events", columns=["user_id"])

    def distinct(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("user_id").to_numpy())
        return pa.table({"user_id": pa.array(u, pa.int64())})

    users = ev.map_batches(distinct, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey"]) \
        .rename_columns({"c_custkey": "user_id"})
    return bucket_semi_join(users, cust, on="user_id", distinct=True)


def q_sequence_packing(sf_dir: str, capacity: int = 64):
    """Sequence packing over the chunked corpus: contiguous-fill bin
    assignment in global (doc_id, chunk_idx) order via the distributed
    prefix-sum (stages/textstats.sequence_packing)."""
    from osmquadtreepostgis_ray.stages.textstats import sequence_packing
    chunks = q_chunk_docs(sf_dir).select_columns(["doc_id", "chunk_idx", "n_tokens"])
    return sequence_packing(chunks, capacity=capacity)


HIST_BUCKET_CENTS = 100   # fixed-width histogram bucket (1 currency unit)
HIST_MAX_BUCKET = 1023    # overflow cap -> bounded sketch size


def q_histogram_quantiles(sf_dir: str):
    """Fixed-memory mergeable-histogram quantiles (the 100-TB-scale
    alternative to q_quantiles' distinct-value combiner, whose state
    grows with value cardinality): every batch emits bounded
    (event_type, bucket, n) partials (<=1024 buckets per type
    regardless of input size), one sharded sum merges them, and
    p50/p95 read off the cumulative counts as bucket UPPER BOUNDS —
    deterministic, exact-integer, rank error bounded by the bucket
    width.  The sketch never exceeds types x 1024 rows anywhere."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(np.int64)
        b = np.minimum(cents // HIST_BUCKET_CENTS, HIST_MAX_BUCKET)
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "bucket": b})
        g = df.groupby(["event_type", "bucket"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["event_type", "bucket"], {"n": ("n", "sum")})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("bucket")
            cum = grp["n"].to_numpy().cumsum()
            tot = int(cum[-1])
            bks = grp["bucket"].to_numpy()
            row = {"event_type": et, "n": tot}
            for name, p in (("p50_cents_ub", 500), ("p95_cents_ub", 950)):
                rank = (tot * p + 999) // 1000
                b = int(bks[np.searchsorted(cum, rank)])
                row[name] = (b + 1) * HIST_BUCKET_CENTS
            out.append(row)
        return pd.DataFrame(out, columns=["event_type", "n",
                                          "p50_cents_ub", "p95_cents_ub"]) \
            .astype({"n": np.int64, "p50_cents_ub": np.int64,
                     "p95_cents_ub": np.int64})

    from osmquadtreepostgis_ray.util import shard_apply
    return shard_apply(agg, ["event_type"], finish)


def q_outliers(sf_dir: str):
    """Quantile-based outlier detection: count events above their
    event_type's p75 (per-type thresholds computed distributed, then
    broadcast into a vectorized filter — quantile reuse, no second
    shuffle of events)."""
    th = q_quantiles(sf_dir).select_columns(["event_type", "p75"]).to_pandas()
    ref = ray.put(dict(zip(th["event_type"], th["p75"].astype(np.int64))))
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    from osmquadtreepostgis_ray.util import worker_cached

    class Above:
        def __init__(self):
            self.th = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.rint(df["value"] * 100).astype(np.int64)
            lim = df["event_type"].map(self.th).astype(np.int64)
            df = df[cents > lim]
            g = df.groupby("event_type", sort=False).size().reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(worker_cached(Above), batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("n", alias_name="n_outliers"))
            .select_columns(["event_type", "n_outliers"]))


def q_moments(sf_dir: str):
    """Exact second-moment aggregate (the corr/covariance building
    blocks as integers): per event_type the sums n, Σx, Σy, Σxy, Σx²,
    Σy² over x = value cents, y = props.k — exact int64 partials so
    the oracle compares bit-for-bit (float corr would sit at the 9-dp
    comparison boundary)."""
    import pyarrow.compute as pc
    ds = read_table(sf_dir, "events", columns=["event_type", "value", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.rint(df["value"] * 100).astype(np.int64)
        ext = pc.extract_regex(batch.column("props").combine_chunks(), r'"k": (?P<k>\d+)')
        y = pc.cast(pc.struct_field(ext, "k"), pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"event_type": df["event_type"], "x": x, "y": y,
                          "xy": x * y, "x2": x * x, "y2": y * y})
        a = g.groupby("event_type", sort=False).agg(
            n=("x", "size"), sum_x=("x", "sum"), sum_y=("y", "sum"),
            sum_xy=("xy", "sum"), sum_x2=("x2", "sum"), sum_y2=("y2", "sum")).reset_index()
        for c in a.columns[1:]:
            a[c] = a[c].astype(np.int64)
        return pa.Table.from_pandas(a, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"), Sum("sum_x", alias_name="sum_x"),
                       Sum("sum_y", alias_name="sum_y"), Sum("sum_xy", alias_name="sum_xy"),
                       Sum("sum_x2", alias_name="sum_x2"), Sum("sum_y2", alias_name="sum_y2"))
            .select_columns(["event_type", "n", "sum_x", "sum_y",
                             "sum_xy", "sum_x2", "sum_y2"]))


def q_zonal_stats(sf_dir: str):
    """Zonal statistics (the classic geospatial aggregate): per zone,
    count and exact-cents sum of the events inside it.  The measure
    rides THROUGH the PIP join (PipJoin carry columns), so there is no
    join back to the point table at all — the only shuffle left is the
    tiny per-zone aggregate of combiner partials."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_fn
    ev = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cents", pa.array(np.rint(batch.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64()))

    zref = ray.put(zones_table())
    joined = ev.map_batches(cents, batch_format="pyarrow").map_batches(
        pip_join_fn(zref, carry=("cents",)), batch_format="pyarrow", batch_size=8192)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["zone_id", "kind"], sort=False)["cents"] \
              .agg(["size", "sum"]).reset_index()
        return pa.table({"zone_id": g["zone_id"].to_numpy(np.int64),
                         "kind": g["kind"].tolist(),
                         "n": g["size"].to_numpy(np.int64),
                         "sum_cents": g["sum"].to_numpy(np.int64)})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby(["zone_id", "kind"])
            .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
            .select_columns(["zone_id", "kind", "n", "sum_cents"]))


def q_pushdown_filter(sf_dir: str):
    """Prune-at-the-read demonstration: the row predicate (user_id <
    50) is pushed into the parquet scan as a pyarrow dataset expression
    — row groups outside the range never materialize — then a combiner
    count per event_type."""
    import pyarrow.dataset as pads
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"],
                    filter=(pads.field("user_id") < 50))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist()})
        g = df.groupby("event_type", sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("n", alias_name="n"))
            .select_columns(["event_type", "n"]))


def q_except_keys(sf_dir: str):
    """Set difference: customer keys with NO event activity (anti
    sibling of q_intersect_keys; direction chosen so the result is
    non-empty at every scale).  The membership side needs no global
    distinct at all — the bucket merge uniques its keys — so only the
    batch-level combiner shrinks the shuffle."""
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join
    ev = read_table(sf_dir, "events", columns=["user_id"])

    def distinct(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("user_id").to_numpy())
        return pa.table({"user_id": pa.array(u, pa.int64())})

    users = ev.map_batches(distinct, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey"]) \
        .rename_columns({"c_custkey": "user_id"})
    return bucket_semi_join(cust, users, on="user_id", anti=True)


def q_transitions(sf_dir: str):
    """Global event-type transition matrix from per-user event order
    (the next-event / Markov training-set builder): consecutive events
    of each user in (ts, event_id) order produce one (from_type,
    to_type) pair; one user-sharded exchange co-locates each user's
    rows, pairs count vectorized per shard, and the tiny type x type
    matrix sums in a final combiner groupby."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type", "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        out = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        c = out.groupby(["from_type", "to_type"], sort=False).size() \
            .reset_index(name="n")
        c["n"] = c["n"].astype(np.int64)
        return c

    part = shard_apply(ds, ["user_id"], pairs)
    return (part.groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n"))
            .select_columns(["from_type", "to_type", "n"]))


def q_rollup(sf_dir: str):
    """Rollup: per-segment totals plus the grand total (segment =
    '__ALL__') in one result — two combiner aggregates unioned, the
    grand total computed from the per-segment partials (no second pass
    over orders)."""
    # materialize the (tiny) per-segment aggregate: both result branches
    # consume it, and a lazy diamond would re-execute the whole
    # orders-customer join once per branch
    seg = (q_join_orders_customer(sf_dir)
           .select_columns(["c_mktsegment", "n", "sum_price_cents"])
           .materialize())

    def total(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": pa.array(["__ALL__"], pa.string()),
            "n": pa.array([int(np.sum(batch.column("n").to_numpy()))], pa.int64()),
            "sum_price_cents": pa.array(
                [int(np.sum(batch.column("sum_price_cents").to_numpy()))], pa.int64()),
        })

    grand = (seg.repartition(1).map_batches(total, batch_format="pyarrow",
                                            batch_size=None))
    return seg.union(grand)


def q_repetition(sf_dir: str):
    """Repetition detection (the Gopher duplicate-n-gram quality signal):
    per doc the total and distinct word-bigram counts and the duplicate
    fraction in exact permille.  One vectorized batch kernel; nothing
    leaves the batch but the per-doc stat row."""
    from osmquadtreepostgis_ray.functions.text import repetition_stats_batch
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        s = repetition_stats_batch(batch.column("text"), n=2)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_grams": pa.array(s["n_grams"], pa.int64()),
                         "n_distinct": pa.array(s["n_distinct"], pa.int64()),
                         "dup_permille": pa.array(s["dup_permille"], pa.int64())})

    return docs.map_batches(rep, batch_format="pyarrow")


def q_decontaminate(sf_dir: str, n: int = 3):
    """Benchmark decontamination: flag corpus docs sharing any word-
    3-gram with the 'benchmark' subset (doc_id % 50 == 0 — the held-out
    eval suite analog).  The benchmark gram set is small by definition:
    collected once, broadcast via ray.put; the corpus side is one
    searchsorted membership pass per batch (never a shuffle)."""
    from osmquadtreepostgis_ray.functions.text import (
        overlap_counts_batch, word_ngram_segments_nopad_batch)
    from osmquadtreepostgis_ray.util import worker_cached
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(batch: pa.Table) -> pa.Table:
        gh, _, _ = word_ngram_segments_nopad_batch(batch.column("text"), n=n)
        return pa.table({"g": pa.array(np.unique(gh), pa.uint64())})

    def keep_mod(eq: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = (t.column("doc_id").to_numpy() % 50 == 0)
            return t.filter(pa.array(m if eq else ~m))
        return fn

    bench_parts = docs.map_batches(keep_mod(True), batch_format="pyarrow") \
        .map_batches(grams, batch_format="pyarrow").to_pandas()
    bench_set = np.unique(bench_parts["g"].to_numpy().astype(np.uint64))
    bref = ray.put(bench_set)

    class Decon:
        def __init__(self):
            self.bench = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n_shared = overlap_counts_batch(batch.column("text"), self.bench, n=n)
            return pa.table({"doc_id": batch.column("doc_id"),
                             "n_shared": pa.array(n_shared, pa.int64()),
                             "contaminated": pa.array((n_shared > 0).astype(np.int64), pa.int64())})

    return docs.map_batches(keep_mod(False), batch_format="pyarrow") \
        .map_batches(worker_cached(Decon), batch_format="pyarrow")


def q_pii_redact(sf_dir: str):
    """PII redaction: deterministic synthetic PII injected (pure function
    of doc_id, replicated in the SQL twin) then counted + scrubbed with
    compiled RE2-compatible patterns — one pandas str pass per batch."""
    from osmquadtreepostgis_ray.functions.text import pii_inject, pii_redact
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        t = pii_inject(df["doc_id"].to_numpy(), df["text"])
        r = pii_redact(t)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "n_emails": r["n_emails"], "n_phones": r["n_phones"],
                             "clean_text": r["clean_text"]})

    return docs.map_batches(scrub, batch_format="pandas")


PYRAMID_DEPTHS = (12, 10, 8, 6, 4)


def q_tile_pyramid(sf_dir: str, depths: tuple = PYRAMID_DEPTHS):
    """Tile-pyramid rollup (the V1/V2 lowzoom generalization applied to
    the tiling layer): per-cell counts at every pyramid depth in ONE
    input pass.  Leaf cells are combined per batch first, ancestors are
    exploded from the distinct-cell partial (never from raw events, so
    the fanout multiplies distinct cells, not rows), and one 2-key
    groupby finishes — no per-depth re-read, no driver loop."""
    ds = prep_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(batch.column("cell").to_numpy(), return_counts=True)
        d_out, c_out, n_out = [], [], []
        for d in depths:
            c = quadtree.at_depth(cells, d)
            u, inv = np.unique(c, return_inverse=True)
            n = np.bincount(inv, weights=counts).astype(np.int64)  # exact: ints < 2^53
            d_out.append(np.full(len(u), d, np.int64))
            c_out.append(u)
            n_out.append(n)
        return pa.table({"depth": pa.array(np.concatenate(d_out), pa.int64()),
                         "cell": pa.array(np.concatenate(c_out), pa.int64()),
                         "n": pa.array(np.concatenate(n_out), pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow")
    return (sharded_agg(part, ["depth", "cell"], {"n": ("n", "sum")})
            .select_columns(["depth", "cell", "n"]))


def q_radius_join(sf_dir: str, radius_milli: int = 2000):
    """ST_DWithin-style within-distance join (stages/pip_join.radius_join):
    queries replicated to <= 4 covering cells, one groupby(cell) shuffle."""
    from osmquadtreepostgis_ray.stages.pip_join import radius_join
    ev = prep_events(sf_dir).select_columns(["event_id", "lon_milli", "lat_milli"])
    return radius_join(ev, radius_milli=radius_milli)


def q_rect_join(sf_dir: str):
    """Rectangle-overlap spatial join, both sides distributed (PBSM,
    stages/rect_join.py): image footprint boxes x zone boxes -> one row
    per intersecting pair with the exact integer intersection area.
    Distinct from pip_zones (point-in-polygon, broadcast small side):
    boundary-straddling footprints match EVERY zone they touch, and the
    join is grid-fanout + one cell-keyed exchange — the shape that
    survives when neither side fits a broadcast."""
    from osmquadtreepostgis_ray.sources import zones as Z
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.rect_join import rect_overlap_join

    def fp(b: pa.Table) -> pa.Table:
        lon_m, lat_m = geotag.lonlat_milli_from_phash(b.column("phash").to_numpy())
        x0, y0, x1, y1 = geotag.footprint_milli(
            lon_m, lat_m, b.column("w").to_numpy(), b.column("h").to_numpy())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "fx0": pa.array(x0, pa.int64()), "fy0": pa.array(y0, pa.int64()),
            # footprint bounds are inclusive ints -> half-open via +1
            "fx1": pa.array(x1 + 1, pa.int64()), "fy1": pa.array(y1 + 1, pa.int64()),
        })

    imgs = read_images(sf_dir, with_bytes=False).map_batches(
        fp, batch_format="pyarrow")
    zt = Z.zones_table().rename_columns(
        ["zone_id", "kind", "zx0", "zy0", "zx1", "zy1"])
    zds = ray.data.from_arrow(zt)
    out = rect_overlap_join(
        imgs, zds, lbox=("fx0", "fy0", "fx1", "fy1"),
        rbox=("zx0", "zy0", "zx1", "zy1"),
        cell_w=Z.GRID_W, cell_h=Z.GRID_H,
        int_cols=["doc_id", "zone_id"])
    return out.select_columns(["doc_id", "zone_id", "kind", "inter_area"])


def q_dup_spans(sf_dir: str, k: int = 9):
    """Exact duplicate-substring detection (the substring-dedup
    statistic of "Deduplicating Training Data Makes Language Models
    Better": how much of each doc is verbatim elsewhere in the corpus):
    per doc, the count of its distinct k-char shingles that also occur
    in ANOTHER doc, plus the duplicated fraction in exact permille.

    Fully distributed — stage 1 emits (doc, shingle-hash) pairs with the
    vectorized batch shingler, stage 2 is ONE shingle-keyed shard apply
    (a shingle's owners co-locate; segments of size >= 2 are cross-doc
    duplicates since pairs are per-doc distinct), stage 3 a doc-keyed
    combiner sum.  No driver-side corpus dict — the fix pattern from the
    round-1 ngram_dups verdict applied from the start."""
    from osmquadtreepostgis_ray.functions.text import char_shingles_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sh, seg = char_shingles_batch(t.column("text").to_pylist(), k)
        counts = np.bincount(seg, minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[seg], pa.int64()),
            "s": pa.array(sh.view(np.int64), pa.int64()),
            "n_grams": pa.array(counts[seg], pa.int64()),
        })

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("doc_id", "dup_grams", "n_grams")})
        g = g.sort_values("s", kind="stable")
        s = g["s"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        seglen = np.diff(np.r_[starts, len(s)])
        dup = np.repeat(seglen >= 2, seglen)
        d = g.loc[dup]
        out = d.groupby("doc_id", sort=False).agg(
            dup_grams=("s", "size"), n_grams=("n_grams", "max")).reset_index()
        out["dup_grams"] = out["dup_grams"].astype(np.int64)
        return out

    part = shard_apply(docs.map_batches(pairs, batch_format="pyarrow"),
                       ["s"], mark)
    agg = sharded_agg(part, ["doc_id"],
                      {"dup_grams": ("dup_grams", "sum"),
                       "n_grams": ("n_grams", "max")})

    def permille(t: pa.Table) -> pa.Table:
        d = t.column("dup_grams").to_numpy().astype(np.int64)
        n = t.column("n_grams").to_numpy().astype(np.int64)
        return t.append_column("dup_permille",
                               pa.array(1000 * d // np.maximum(n, 1), pa.int64()))

    return agg.map_batches(permille, batch_format="pyarrow").select_columns(
        ["doc_id", "dup_grams", "n_grams", "dup_permille"])


def q_dup_span_runs(sf_dir: str, k: int = 9):
    """Suffix-window EXACT duplicate spans — the sorted-suffix upgrade
    of q_dup_spans' per-shingle census ("Deduplicating Training Data
    Makes Language Models Better", the ExactSubstr suffix-array side):
    every k-gram OCCURRENCE (hash, doc, pos) sorts within its shingle
    group; each occurrence pairs only with its SUCCESSOR in (doc, pos)
    order (the suffix-array adjacency bound — O(occurrences) candidate
    pairs, never a per-shingle cross product, so stop-phrase shingles
    cannot explode a shard); cross-doc adjacencies land on a
    (d1, d2, diagonal) shard where consecutive positions merge into
    MAXIMAL spans (a run of L adjacent k-grams = one span of L + k - 1
    chars).  Output per ordered doc pair: span count, total duplicated
    chars, longest span.  Three single-exchange stages; every key is
    data-scaled and sharded — no driver corpus state."""
    from osmquadtreepostgis_ray.functions.text import (
        char_shingles_positional_batch)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def occ(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        h, seg, pos = char_shingles_positional_batch(
            t.column("text").to_pylist(), k)
        return pa.table({
            "s": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(ids[seg].astype(np.int64), pa.int64()),
            "pos": pa.array(pos, pa.int64())})

    def adj(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("d1", "d2", "diag", "p1")
        if len(g) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["s", "doc_id", "pos"], kind="stable")
        s = g["s"].to_numpy(np.int64)
        d = g["doc_id"].to_numpy(np.int64)
        p = g["pos"].to_numpy(np.int64)
        keep = (s[1:] == s[:-1]) & (d[1:] != d[:-1])
        return pd.DataFrame({"d1": d[:-1][keep], "d2": d[1:][keep],
                             "diag": p[1:][keep] - p[:-1][keep],
                             "p1": p[:-1][keep]})

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("d1", "d2", "chars")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["d1", "d2", "diag", "p1"], kind="stable")
        d1 = g["d1"].to_numpy(np.int64)
        d2 = g["d2"].to_numpy(np.int64)
        dg = g["diag"].to_numpy(np.int64)
        p1 = g["p1"].to_numpy(np.int64)
        new = np.r_[True, (d1[1:] != d1[:-1]) | (d2[1:] != d2[:-1])
                    | (dg[1:] != dg[:-1]) | (p1[1:] != p1[:-1] + 1)]
        rid = np.cumsum(new) - 1
        runlen = np.bincount(rid)
        firsts = np.flatnonzero(new)
        return pd.DataFrame({"d1": d1[firsts], "d2": d2[firsts],
                             "chars": (runlen + k - 1).astype(np.int64)})

    cand = shard_apply(docs.map_batches(occ, batch_format="pyarrow"),
                       ["s"], adj)
    spans = shard_apply(cand, ["d1", "d2", "diag"], runs)
    return sharded_agg(spans, ["d1", "d2"],
                       {"n_spans": ("chars", "count"),
                        "span_chars": ("chars", "sum"),
                        "max_span": ("chars", "max")})


def q_tile_mosaic(sf_dir: str):
    """Overview-mosaic tiles (geospatial x image): per map tile, the
    pixel-wise exact-integer mean of the 8x8 thumbnails of every image
    geotagged into the tile (stages/images.MosaicPartial).  Decode +
    resize + per-tile pre-sum happen inside the batch; the shuffle
    carries <= 64 rows per (tile, batch) — pixels never cross the
    exchange, the mosaic analog of the flagship's combiner rule."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import MosaicPartial
    from osmquadtreepostgis_ray.util import worker_cached

    part = read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(lambda: MosaicPartial(tile_depth=TILE_DEPTH)),
        batch_format="pyarrow", batch_size=IMG_BATCH)
    agg = sharded_agg(part, ["tile", "py", "px"],
                      {"pixel_sum": ("pixel_sum", "sum"),
                       "n_images": ("n_images", "sum")})

    def mean(t: pa.Table) -> pa.Table:
        s = t.column("pixel_sum").to_numpy().astype(np.int64)
        c = t.column("n_images").to_numpy().astype(np.int64)
        return t.append_column("mean_pixel",
                               pa.array(s // np.maximum(c, 1), pa.int64()))

    return agg.map_batches(mean, batch_format="pyarrow").select_columns(
        ["tile", "py", "px", "pixel_sum", "n_images", "mean_pixel"])


def q_tile_sobel(sf_dir: str):
    """Edge-energy map tiles (geospatial x image): per map tile, the
    exact-integer Sobel gradient energy and edge-pixel count of every
    image geotagged into the tile (stages/images.SobelPartial — decode
    + 3x3 convolution + per-tile pre-sum inside the batch; the shuffle
    carries one row per tile per batch, never pixels)."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import SobelPartial
    from osmquadtreepostgis_ray.util import worker_cached

    part = read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(lambda: SobelPartial(tile_depth=TILE_DEPTH)),
        batch_format="pyarrow", batch_size=IMG_BATCH)
    return sharded_agg(part, ["tile"],
                       {"grad_sum": ("grad_sum", "sum"),
                        "edge_px": ("edge_px", "sum"),
                        "n_images": ("n_images", "sum")}) \
        .select_columns(["tile", "grad_sum", "edge_px", "n_images"])


def q_crossmodal_knn(sf_dir: str, k: int = 5, nq: int = 8):
    """Cross-modal retrieval (image -> caption): for each of nq fixed
    query IMAGES, the top-k documents whose caption SIMHASH fingerprint
    is closest (hamming) to the image's perceptual AHASH — the
    CLIP-retrieval pipeline shape with deterministic 64-bit fingerprints
    standing in for the embedding models, so the DuckDB twin is exact.

    Scale design: the nq query fingerprints are a FIXED-size broadcast
    (the _query_vectors convention); each corpus batch computes the
    (m, nq) XOR+popcount matrix and emits only nq x k partial rows; the
    final merge is util.topk_per_key (sharded by query, never the
    driver)."""
    import duckdb

    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.dedup import simhash_buckets
    from osmquadtreepostgis_ray.stages.images import AHash
    from osmquadtreepostgis_ray.util import topk_per_key

    con = duckdb.connect()
    qdf = con.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
                  f"WHERE doc_id < {nq} ORDER BY doc_id").df()
    qb = synth_images_batch(pa.table({
        "doc_id": pa.array(qdf["doc_id"].to_numpy(np.int64), pa.int64()),
        "text": pa.array(qdf["text"].tolist(), pa.string())}))
    qa = AHash()(qb)
    q_ids = qdf["doc_id"].to_numpy(np.int64)
    q_hash = qa.column("ahash").to_numpy().view(np.uint64)

    pop8 = np.array([bin(i).count("1") for i in range(256)], np.int64)

    corpus = simhash_buckets(read_table(sf_dir, "documents",
                                        columns=["doc_id", "text"]))

    def part(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        s = t.column("simhash").to_numpy().view(np.uint64)
        m = len(d)
        if m == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        x = s[:, None] ^ q_hash[None, :]                     # (m, nq)
        ham = pop8[x.view(np.uint8)].reshape(m, len(q_ids), 8).sum(axis=2)
        qi, di, hm = [], [], []
        for j in range(len(q_ids)):
            top = np.lexsort((d, ham[:, j]))[:k]             # local top-k
            qi.append(np.full(len(top), q_ids[j], np.int64))
            di.append(d[top]); hm.append(ham[top, j])
        return pa.table({"query_id": pa.array(np.concatenate(qi), pa.int64()),
                         "doc_id": pa.array(np.concatenate(di), pa.int64()),
                         "hamming": pa.array(np.concatenate(hm), pa.int64())})

    partials = corpus.map_batches(part, batch_format="pyarrow")
    return topk_per_key(partials, key="query_id", by=["hamming", "doc_id"],
                        ascending=[True, True], k=k,
                        out_cols=["query_id", "doc_id", "hamming"])


def q_image_transcode(sf_dir: str):
    """Ingest -> training-format transcode (stages/images.TranscodeRLE):
    raw payloads re-encoded with the quantized-RLE codec, PSNR invariant
    verified per image, codec telemetry (runs / bytes / ratio) emitted.
    Runs over the raw-format subset (a predicate the 100-TB job pushes
    into the read); row-pure, no shuffle."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import TranscodeRLE
    from osmquadtreepostgis_ray.util import worker_cached

    def only_raw(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("fmt"), "raw"))

    return read_images(sf_dir, with_bytes=True) \
        .map_batches(only_raw, batch_format="pyarrow") \
        .map_batches(worker_cached(TranscodeRLE), batch_format="pyarrow",
                     batch_size=IMG_BATCH)


def q_image_norm_stats(sf_dir: str):
    """Dataset-wide pixel normalization constants per format (the
    mean/std every vision training run computes once and bakes into its
    input transform): decode -> per-batch (fmt, n_px, sum_p, sum_p2)
    partials (stages/images.NormStatsPartial — pixels never cross the
    shuffle) -> format-cardinality groupby -> exact milli mean/variance
    finished in arbitrary-precision Python ints on the <=2-row table."""
    from ray.data.aggregate import Sum

    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import NormStatsPartial
    from osmquadtreepostgis_ray.util import worker_cached

    agg = read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(NormStatsPartial), batch_format="pyarrow",
        batch_size=IMG_BATCH) \
        .groupby("fmt") \
        .aggregate(Sum("n_px", alias_name="n_px"),
                   Sum("sum_p", alias_name="sum_p"),
                   Sum("sum_p2", alias_name="sum_p2"))

    def finish(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()   # format-cardinality (<= #codecs rows)
        for r in rows:         # Python ints: n*s2 can exceed int64
            n, s1, s2 = int(r["n_px"]), int(r["sum_p"]), int(r["sum_p2"])
            r["mean_milli"] = 1000 * s1 // n
            r["var_milli"] = (n * s2 - s1 * s1) * 1000 // (n * n)
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("fmt", pa.string()), ("n_px", pa.int64()), ("sum_p", pa.int64()),
            ("sum_p2", pa.int64()), ("mean_milli", pa.int64()),
            ("var_milli", pa.int64())]))

    return agg.map_batches(finish, batch_format="pyarrow")


def q_crossmodal_align(sf_dir: str):
    """Per-pair caption<->image alignment gate (CLIP-score-filter shape,
    stages/images.CrossmodalAlign): fused ahash+simhash fingerprints and
    their hamming score per row, aligned flag at the drop threshold.
    Row-pure — no shuffle; bit-stable at any parallelism."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import CrossmodalAlign
    from osmquadtreepostgis_ray.util import worker_cached
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(CrossmodalAlign), batch_format="pyarrow",
        batch_size=IMG_BATCH)


def q_image_blur(sf_dir: str):
    """Per-image blur screening (training-data quality filter): exact
    variance-of-Laplacian moments + sharpness flag per image
    (stages/images.LaplacianBlur).  Fully row-pure — decode, 4-neighbor
    Laplacian and variance all happen inside the batch; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import LaplacianBlur
    from osmquadtreepostgis_ray.util import worker_cached

    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(LaplacianBlur),
        batch_format="pyarrow", batch_size=IMG_BATCH)


def q_ann_recall(sf_dir: str, k: int = 5):
    """Recall@k of the pruned IVF ANN against the exact brute-force
    top-k — the index-quality gate every ANN deployment monitors.  Both
    inputs are the existing distributed pipelines; their outputs are
    nq x k rows by construction, so the per-query set intersection is
    driver-side pandas on top-k tables, exact integer permille."""
    brute = q_embed_knn(sf_dir, k=k).to_pandas()
    ivf = q_embed_knn_ivf(sf_dir, k=k).to_pandas()
    hit = brute.merge(ivf, on=["query_id", "neighbor_id"], how="left",
                      suffixes=("", "_i"))
    g = hit.groupby("query_id", sort=True).agg(
        n_hit=("rank_i", "count")).reset_index()
    g["recall_permille"] = (1000 * g["n_hit"].astype(np.int64)) // k
    g["n_hit"] = g["n_hit"].astype(np.int64)
    return pa.Table.from_pandas(
        g[["query_id", "n_hit", "recall_permille"]], preserve_index=False)


def q_hard_negatives(sf_dir: str):
    """All-pairs top-1 cosine neighbor over the embedding corpus (hard-
    negative mining for contrastive training): EVERY vector gets its
    nearest other vector — the n x n kNN join, not the nq-query probe
    of embed_knn.  Chunked-broadcast blocked matmul: the corpus's Arrow
    blocks broadcast once via to_arrow_refs (object-store refs, never
    through the driver); each streaming batch folds a running
    (best_sim, best_id) over the chunks, so task memory is
    batch x chunk, independent of corpus size, and the output is one
    row per vector.  Ties break to the smallest neighbor id; only the
    argmax identity is emitted (the float-discipline rule: ranks, not
    floats, cross the oracle boundary)."""
    from osmquadtreepostgis_ray.stages.embed import _mat
    from osmquadtreepostgis_ray.util import worker_cached

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    refs = emb.to_arrow_refs()

    class Best:
        def __init__(self):
            tabs = [t for t in ray.get(list(refs)) if t.num_rows]
            self.chunks = []
            for c in tabs:
                cid = c.column("vec_id").to_numpy().astype(np.int64)
                cm = _mat(c.column("embedding"))
                cn = np.sqrt((cm * cm).sum(axis=1))
                self.chunks.append((cid, cm, cn))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy().astype(np.int64)
            m = _mat(batch.column("embedding"))
            na = np.sqrt((m * m).sum(axis=1))
            n = len(ids)
            best_sim = np.full(n, -2.0)
            best_id = np.full(n, np.iinfo(np.int64).max, np.int64)
            for cid, cm, cn in self.chunks:
                sim = m @ cm.T
                sim = sim / na[:, None] / cn[None, :]
                sim[ids[:, None] == cid[None, :]] = -2.0
                rowmax = sim.max(axis=1)
                cand = np.where(sim == rowmax[:, None], cid[None, :],
                                np.iinfo(np.int64).max).min(axis=1)
                take = (rowmax > best_sim) | ((rowmax == best_sim) & (cand < best_id))
                best_sim = np.where(take, rowmax, best_sim)
                best_id = np.where(take, cand, best_id)
            return pa.table({"vec_id": pa.array(ids, pa.int64()),
                             "nn_id": pa.array(best_id, pa.int64())})

    return emb.map_batches(worker_cached(Best), batch_format="pyarrow",
                           batch_size=2048).select_columns(["vec_id", "nn_id"])


MOSAIC_DEPTHS = (8, 6, 4)


def q_mosaic_pyramid(sf_dir: str, depths: tuple = MOSAIC_DEPTHS):
    """Overview-mosaic PYRAMID (gdaladdo-style multi-zoom overviews):
    q_tile_mosaic at every pyramid depth in ONE decode pass.  Integer
    pixel sums roll up exactly across depths, so each batch emits
    per-(depth, tile) partials from the same thumbnails and one 4-key
    combiner groupby finishes — the image analog of q_tile_pyramid (no
    per-depth re-read, no driver loop)."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import MosaicPartial
    from osmquadtreepostgis_ray.util import worker_cached

    d = tuple(depths)
    part = read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(lambda: MosaicPartial(depths=d)),
        batch_format="pyarrow", batch_size=IMG_BATCH)
    agg = sharded_agg(part, ["depth", "tile", "py", "px"],
                      {"pixel_sum": ("pixel_sum", "sum"),
                       "n_images": ("n_images", "sum")})

    def mean(t: pa.Table) -> pa.Table:
        s = t.column("pixel_sum").to_numpy().astype(np.int64)
        c = t.column("n_images").to_numpy().astype(np.int64)
        return t.append_column("mean_pixel",
                               pa.array(s // np.maximum(c, 1), pa.int64()))

    return agg.map_batches(mean, batch_format="pyarrow").select_columns(
        ["depth", "tile", "py", "px", "pixel_sum", "n_images", "mean_pixel"])


def q_hll_sketch(sf_dir: str):
    """Approximate-distinct sketch: HyperLogLog registers per event_type
    over splitmix64(user_id).  The shuffle carries one <= 64-register
    partial per type per batch (max-mergeable) — the sketch pattern that
    replaces the exact distinct shuffle at 100 TB.  Output is the exact
    register table (integer rho), so the oracle compares full values;
    the float estimate is a trivial epilogue (functions/sketch.hll_estimate)."""
    from osmquadtreepostgis_ray.functions.sketch import hll_register_rho
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        reg, rho = hll_register_rho(t.column("user_id").to_numpy())
        df = pd.DataFrame({"event_type": t.column("event_type").to_pandas(),
                           "register": reg, "rho": rho})
        g = df.groupby(["event_type", "register"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "register"]).aggregate(Max("rho", alias_name="rho"))
            .select_columns(["event_type", "register", "rho"]))


def q_pagerank(sf_dir: str, iters: int = 2):
    """Damped PageRank (2 power iterations, integer-exact) over the
    bipartite customer<->supplier interaction graph (distinct pairs via
    the lineitem->orders join, both directions so every node has
    out-degree).  Each iteration is one bucket join + one sharded sum
    over a once-materialized degree-annotated edge list —
    stages/graph.pagerank; the iterative-graph shape (quality/dedup
    label diffusion) the Dataset API can express without driver loops
    over rows."""
    from osmquadtreepostgis_ray.stages.graph import pagerank
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]) \
        .map_batches(lambda t: t.rename_columns(["o_orderkey", "l_suppkey"]),
                     batch_format="pyarrow")
    pairs = bucket_hash_join(li, orders, on="o_orderkey")

    def mk_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        src = df["o_custkey"].to_numpy(np.int64) * 2
        dst = df["l_suppkey"].to_numpy(np.int64) * 2 + 1
        return pa.table({"src": pa.array(np.r_[src, dst], pa.int64()),
                         "dst": pa.array(np.r_[dst, src], pa.int64())})

    dup = pairs.map_batches(mk_edges, batch_format="pyarrow")
    edges = sharded_agg(dup, ["src", "dst"], {"n": ("src", "count")},
                        shards=64) \
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    return pagerank(edges, iters=iters)


def q_ntile(sf_dir: str, tiles: int = 4):
    """NTILE(4) per event_type ordered by (value cents, event_id) —
    the global-rank window function the Dataset API lacks, built from
    one range-partitioned sort + the keyed prefix-sum scan
    (stages/window.keyed_row_number): blocks ship per-group COUNTS to
    the driver, never rows; the tile is then pure arithmetic on
    (rank, group total) against the broadcast totals table."""
    from osmquadtreepostgis_ray.stages.window import keyed_row_number, ntile_of
    from osmquadtreepostgis_ray.util import worker_cached

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "cents": pa.array(cents, pa.int64()),
                         "event_id": t.column("event_id")})

    ranked, totals = keyed_row_number(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], ["cents", "event_id"])
    tref = ray.put({k[0]: v for k, v in totals.items()})

    class Tile:
        def __init__(self):
            self.tot = ray.get(tref)

        def __call__(self, t: pa.Table) -> pa.Table:
            et = t.column("event_type").to_numpy(zero_copy_only=False)
            total = pd.Series(et).map(self.tot).to_numpy(np.int64)
            tile = ntile_of(t.column("rank").to_numpy(), total, tiles)
            return pa.table({"event_id": t.column("event_id"),
                             "event_type": t.column("event_type"),
                             "tile": pa.array(tile, pa.int64())})

    return ranked.map_batches(worker_cached(Tile), batch_format="pyarrow")


def q_heavy_hitters(sf_dir: str, phi: float = 0.008):
    """phi-heavy hitters (users with >= phi of all events) via a
    count-min sketch + exact verify — TWO passes over the data, never
    an all-keys distinct shuffle:

    Pass 1 builds the CM sketch distributed: per batch, unique keys
    hash into d x w slots, nonzero (slot, n) partials (bounded by the
    SKETCH size, not the batch) flow through one sharded sum; the
    driver holds only the d x w matrix (64 KiB).  The total row count
    falls out as row 0's sum — no separate count pass.

    Pass 2 broadcasts the sketch: candidacy (min-of-d estimate >=
    ceil(phi * total)) is a pure function of the key, so per-batch
    partial counts of candidate keys aggregate to EXACT global counts;
    CM never underestimates, so no true heavy hitter is missed, and
    the final exact filter removes the sketch's false positives.
    Output is exact (user_id, n) — the oracle is plain HAVING SQL."""
    from osmquadtreepostgis_ray.functions.sketch import CM_D, CM_W, cm_positions
    from osmquadtreepostgis_ray.util import sharded_agg, worker_cached

    ds = read_table(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t.column("user_id").to_numpy(), return_counts=True)
        pos = cm_positions(u)
        slot = (np.arange(CM_D, dtype=np.int64)[:, None] * CM_W + pos).ravel()
        n = np.tile(c.astype(np.int64), CM_D)
        s2, inv = np.unique(slot, return_inverse=True)
        acc = np.zeros(len(s2), np.int64)
        np.add.at(acc, inv, n)
        return pa.table({"slot": pa.array(s2, pa.int64()),
                         "n": pa.array(acc, pa.int64())})

    sk = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     ["slot"], {"n": ("n", "sum")}, shards=64)
    cm = np.zeros(CM_D * CM_W, np.int64)
    for t in ray.get(sk.to_arrow_refs()):
        if t.num_rows:
            cm[t.column("slot").to_numpy()] += t.column("n").to_numpy()
    cm = cm.reshape(CM_D, CM_W)
    thresh = int(np.ceil(phi * cm[0].sum()))
    ref = ray.put(cm)

    class CandCount:
        def __init__(self):
            self.cm = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            u, c = np.unique(t.column("user_id").to_numpy(), return_counts=True)
            pos = cm_positions(u)
            est = self.cm[np.arange(CM_D)[:, None], pos].min(axis=0)
            keep = est >= thresh
            return pa.table({"user_id": pa.array(u[keep], pa.int64()),
                             "n": pa.array(c[keep].astype(np.int64), pa.int64())})

    cand = ds.map_batches(worker_cached(CandCount), batch_format="pyarrow")
    exact = sharded_agg(cand, ["user_id"], {"n": ("n", "sum")}, shards=64)

    def final(t: pa.Table) -> pa.Table:
        m = pa.compute.greater_equal(t.column("n"), thresh)
        return t.filter(m)

    return (exact.map_batches(final, batch_format="pyarrow")
            .select_columns(["user_id", "n"]))


def q_kmeans_embed(sf_dir: str, k: int = 4, iters: int = 3):
    """Distributed k-means (semantic-dedup bucketing) over the embedding
    corpus — stages/cluster.kmeans_assign; integer-exact so the unrolled
    DuckDB CTE twin compares every assignment + distance."""
    from osmquadtreepostgis_ray.stages.cluster import kmeans_assign
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_assign(ds, k=k, iters=iters)


def _token_doc_arrays(batch: pa.Table):
    """(doc_ids-per-token, token strings) for a documents batch —
    whitespace split, boundary empties dropped (str.split semantics)."""
    import pyarrow.compute as pc
    toks = pc.utf8_split_whitespace(batch.column("text"))
    n = pc.list_value_length(toks).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    doc = np.repeat(batch.column("doc_id").to_numpy(), n)[
        keep.to_numpy(zero_copy_only=False)]
    return doc, flat.filter(keep)


def q_inverted_index(sf_dir: str):
    """Inverted-index build (search-engine / RAG-prep shape): per term
    the document frequency and the sorted posting list.  Combiner: each
    batch emits DISTINCT (term, doc_id) pairs — a doc lives in exactly
    one batch, so pairs are globally unique and the per-term group work
    is one sort + join of its own postings (independent per term; the
    string render keeps the oracle hash comparable)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        doc, toks = _token_doc_arrays(batch)
        df = pd.DataFrame({"term": toks.to_pandas(), "doc_id": doc}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        return pd.DataFrame({"term": [g["term"].iloc[0]],
                             "df": np.array([len(ids)], dtype=np.int64),
                             "postings": [",".join(map(str, ids))]})

    return (docs.map_batches(pairs, batch_format="pyarrow")
            .groupby("term").map_groups(finish, batch_format="pandas"))


def q_collocations(sf_dir: str, topk: int = 20):
    """Collocation extraction (PMI-shaped, integer-exact): corpus-wide
    bigram counts scored by 1000 * c_xy * N // (c_x * c_y) (N = total
    tokens) — the float log PMI replaced by its exact-rank integer core
    so the oracle compares values.  Unigram counts are vocabulary-sized:
    aggregated once, broadcast into the scoring pass; global top-k by
    (score desc, w1, w2) via sort.limit."""
    from osmquadtreepostgis_ray.util import worker_cached
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, toks = _token_doc_arrays(batch)
        vc = toks.to_pandas().value_counts()
        return pa.table({"w": vc.index.to_numpy(), "c": vc.to_numpy().astype(np.int64)})

    uni = (docs.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("c", alias_name="c"))).to_pandas()
    n_total = int(uni["c"].sum())
    uref = ray.put(dict(zip(uni["w"], uni["c"].astype(np.int64))))

    def bi_partial(batch: pa.Table) -> pa.Table:
        doc, toks = _token_doc_arrays(batch)
        w = toks.to_pandas().to_numpy()
        same = doc[1:] == doc[:-1]
        df = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="c_xy")
        g["c_xy"] = g["c_xy"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    class Score:
        def __init__(self):
            self.uni = ray.get(uref)

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df["c_x"] = df["w1"].map(self.uni).astype(np.int64)
            df["c_y"] = df["w2"].map(self.uni).astype(np.int64)
            df["score"] = (1000 * df["c_xy"] * n_total) // (df["c_x"] * df["c_y"])
            return pa.Table.from_pandas(df, preserve_index=False)

    bi = sharded_agg(docs.map_batches(bi_partial, batch_format="pyarrow"),
                     ["w1", "w2"], {"c_xy": ("c_xy", "sum")})
    return (bi.map_batches(worker_cached(Score), batch_format="pyarrow")
            .sort(["score", "w1", "w2"], descending=[True, False, False])
            .limit(topk)
            .select_columns(["w1", "w2", "c_xy", "c_x", "c_y", "score"]))


def q_fuzzy_join(sf_dir: str):
    """Fuzzy self-join (record linkage): customer-name pairs within edit
    distance 1 via FastSS deletion-neighborhood hashing
    (stages/joins.fuzzy_join_dist1)."""
    from osmquadtreepostgis_ray.stages.joins import fuzzy_join_dist1
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return fuzzy_join_dist1(ds, "c_custkey", "c_name")


def q_image_patches(sf_dir: str):
    """ViT-style patch extraction (1->N image op): decode -> 8x8 patch
    grid -> exact integer patch means (stages/images.PatchMeans)."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import PatchMeans
    from osmquadtreepostgis_ray.util import worker_cached
    return read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(PatchMeans), batch_format="pyarrow", batch_size=IMG_BATCH)


def q_rasterize(sf_dir: str):
    """Vector->raster: per depth-8 tile, the 16x16 sub-pixel occupancy
    histogram (pixel = depth-12 cell position within the tile) — the
    heatmap-tile renderer.  Nonzero pixels only; per-batch combiner so
    the shuffle carries distinct (tile, py, px) rows."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cell = t.column("cell").to_numpy()
        tile = t.column("tile").to_numpy()
        ix, iy, _ = quadtree.decode(cell)
        key = pd.DataFrame({"tile": tile, "py": iy & 15, "px": ix & 15})
        g = key.groupby(["tile", "py", "px"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return (sharded_agg(part, ["tile", "py", "px"], {"n": ("n", "sum")})
            .select_columns(["tile", "py", "px", "n"]))


def q_raster_blur(sf_dir: str):
    """Distributed raster stencil (3x3 box filter) over the heatmap
    raster, with HALO EXCHANGE across tile boundaries — the ghost-cell
    pattern: each nonzero pixel of the aggregated q_rasterize histogram
    scatters its count to its <= 9 covering output pixels (vectorized
    9-way fanout of the DISTINCT-pixel aggregate, never of raw events);
    neighbors that land in an adjacent tile re-derive their owner tile
    from global pixel coords, and one combiner groupby sums.  At scale
    the fanout volume is 9 x distinct nonzero pixels — independent of
    row count."""
    base = q_rasterize(sf_dir)
    G = 1 << CELL_DEPTH                    # global pixel grid per axis
    offs = np.array([(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                    dtype=np.int64)

    def halo(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "py", "px", "n")})
        tx, ty, _ = quadtree.decode(t.column("tile").to_numpy())
        gx = tx * 16 + t.column("px").to_numpy().astype(np.int64)
        gy = ty * 16 + t.column("py").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        k = len(offs)
        ogx = np.repeat(gx, k) + np.tile(offs[:, 1], len(gx))
        ogy = np.repeat(gy, k) + np.tile(offs[:, 0], len(gy))
        on = np.repeat(n, k)
        m = (ogx >= 0) & (ogx < G) & (ogy >= 0) & (ogy < G)
        ogx, ogy, on = ogx[m], ogy[m], on[m]
        tile = quadtree.encode_ixy(ogx >> 4, ogy >> 4, TILE_DEPTH)
        return pa.table({
            "tile": pa.array(tile, pa.int64()),
            "py": pa.array(ogy & 15, pa.int64()),
            "px": pa.array(ogx & 15, pa.int64()),
            "n": pa.array(on, pa.int64()),
        })

    part = base.map_batches(halo, batch_format="pyarrow")
    return (sharded_agg(part, ["tile", "py", "px"], {"blur_sum": ("n", "sum")})
            .select_columns(["tile", "py", "px", "blur_sum"]))


DBSCAN_EPS = 1500
DBSCAN_MIN_PTS = 4


def q_dbscan(sf_dir: str):
    """Density clustering of event geotags — grid-based distributed
    DBSCAN (stages/cluster.dbscan): one cell exchange for neighbor
    counts + pairs, bucket join for the candidate flag, contraction
    connected-components over core-core edges, sharded border min,
    noise -1.  Labels are the min core event_id per cluster (order-free
    deterministic variant).  Oracle: self-join pairs + recursive-CTE
    closure over the core graph."""
    from osmquadtreepostgis_ray.stages.cluster import dbscan
    pts = prep_events(sf_dir).select_columns(
        ["event_id", "lon_milli", "lat_milli"])
    return dbscan(pts, eps_milli=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)


IDW_RADIUS = 2500


def q_idw(sf_dir: str):
    """Grid interpolation (IDW analog with the integer linear kernel
    R^2 - d^2; stages/spatialstats.idw_grid): per occupied depth-6 cell,
    the exact numerator/denominator of the kernel-weighted event-value
    estimate at the cell CENTER.  One groupby(cell) exchange — events
    fan as sources to every cell their radius-bbox overlaps.  Oracle:
    DISTINCT-cell centers range-joined to events."""
    from osmquadtreepostgis_ray.stages.spatialstats import idw_grid
    ev = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "lon_milli": t.column("lon_milli"),
            "lat_milli": t.column("lat_milli"),
            "cents": pa.array(np.rint(t.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64())})

    return idw_grid(ev.map_batches(cents, batch_format="pyarrow"),
                    radius_milli=IDW_RADIUS)


def q_moran(sf_dir: str):
    """Global Moran's I spatial autocorrelation over depth-6 cell
    counts, rook adjacency (stages/spatialstats.moran): one row of
    exact integer parts (n_cells, w_pairs, num, den) with deviations
    scaled by n_cells so I = (n_cells/w_pairs)*(num/den) stays
    rational.  Combiner-partial count aggregate + a neighbor fan over
    the structurally bounded cell table."""
    from osmquadtreepostgis_ray.stages.spatialstats import moran
    return moran(prep_events(sf_dir).select_columns(
        ["lon_milli", "lat_milli"]))


def q_hotspot(sf_dir: str):
    """Getis-Ord Gi* hot-spot inputs (stages/spatialstats.hotspot_gi):
    per occupied depth-6 cell its count, queen-neighborhood (self + 8,
    occupied) count sum and member count — exact integer parts of the
    local-statistic z-score.  Oracle: 9-offset equi-join."""
    from osmquadtreepostgis_ray.stages.spatialstats import hotspot_gi
    return hotspot_gi(prep_events(sf_dir).select_columns(
        ["lon_milli", "lat_milli"]))


def q_od_flows(sf_dir: str):
    """Origin-destination flow matrix (the trajectory-aggregation
    surface a movement dataset serves): consecutive events of each user
    in (ts, event_id) order produce one (from_tile, to_tile) transition;
    one user-sharded exchange, vectorized lag per shard, partial counts
    through the data-scaled sharded aggregate."""
    def epoch(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "tile": t.column("tile"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    j = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .map_batches(epoch, batch_format="pyarrow")

    def flows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        tile = g["tile"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        out = pd.DataFrame({"from_tile": tile[:-1][same],
                            "to_tile": tile[1:][same]})
        c = out.groupby(["from_tile", "to_tile"], sort=False).size() \
            .reset_index(name="n")
        c["n"] = c["n"].astype(np.int64)
        return c

    part = shard_apply(j, ["user_id"], flows)
    return sharded_agg(part, ["from_tile", "to_tile"], {"n": ("n", "sum")}) \
        .select_columns(["from_tile", "to_tile", "n"])


STAY_D = 100_000   # max squared-step radicand guard: milli-degrees
STAY_MIN = 3       # minimum run length


def q_staypoints(sf_dir: str):
    """Stay-point (dwell-segment) detection over user trajectories:
    maximal runs of consecutive events (per user, (ts, event_id) order)
    whose step distance stays <= STAY_D; runs of >= STAY_MIN points
    emit (user_id, start_event_id, n_pts, dur_us, sum_x, sum_y) — the
    centroid numerators stay exact ints.  One user-sharded exchange;
    run segmentation is a vectorized flag-cumsum.  Oracle: LAG window
    step flags -> windowed run ids -> HAVING count >= STAY_MIN."""
    def epoch(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "lon_milli": t.column("lon_milli"),
                         "lat_milli": t.column("lat_milli"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    j = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .map_batches(epoch, batch_format="pyarrow")
    d2max = STAY_D * STAY_D

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        x = g["lon_milli"].to_numpy(np.int64)
        y = g["lat_milli"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        d2 = (x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2
        brk = np.r_[True, (u[1:] != u[:-1]) | (d2 > d2max)]
        rid = np.cumsum(brk) - 1
        firsts = np.flatnonzero(brk)
        lens = np.diff(np.r_[firsts, len(rid)])
        keep = lens >= STAY_MIN
        if not keep.any():
            z = np.empty(0, np.int64)
            return pd.DataFrame({"user_id": z, "start_event_id": z,
                                 "n_pts": z, "dur_us": z,
                                 "sum_x": z, "sum_y": z})
        cs_x = np.r_[0, np.cumsum(x)]
        cs_y = np.r_[0, np.cumsum(y)]
        f, l = firsts[keep], firsts[keep] + lens[keep]
        return pd.DataFrame({
            "user_id": u[f], "start_event_id": e[f],
            "n_pts": lens[keep].astype(np.int64),
            "dur_us": t[l - 1] - t[f],
            "sum_x": cs_x[l] - cs_x[f], "sum_y": cs_y[l] - cs_y[f]})

    return shard_apply(j, ["user_id"], runs)


HILBERT_DEPTH = 8
HILBERT_BUCKETS = 256


def q_hilbert(sf_dir: str):
    """Hilbert-curve bulk-load ordering (functions/hilbert.xy2d): each
    event's position on the depth-8 Hilbert curve over the tile grid,
    plus its equal-width curve-range bucket — the locality-preserving
    partition assignment spatial stores cluster bulk loads by (better
    seam behavior than the Morton order the tile ids use).  Pure
    row-local map; the oracle is the same rounds unrolled as CTEs."""
    from osmquadtreepostgis_ray.functions.hilbert import xy2d

    def enc(t: pa.Table) -> pa.Table:
        fx, fy = geotag.milli_to_fixed(t.column("lon_milli").to_numpy(),
                                       t.column("lat_milli").to_numpy())
        ix, iy = quadtree.fixed_to_ixy(fx, fy, HILBERT_DEPTH)
        d = xy2d(ix, iy, HILBERT_DEPTH)
        bucket = d // ((4 ** HILBERT_DEPTH) // HILBERT_BUCKETS)
        return pa.table({"event_id": t.column("event_id"),
                         "hilbert": pa.array(d, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    return prep_events(sf_dir).select_columns(
        ["event_id", "lon_milli", "lat_milli"]) \
        .map_batches(enc, batch_format="pyarrow")


# byte-class table for the BPE pre-tokenizer classes: 0 letter, 1 digit,
# 2 other symbol, 3 whitespace (pairs only form inside one class run —
# exactly the [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+ token boundaries)
_BPE_CLS = np.full(256, 2, np.int8)
_BPE_CLS[[9, 10, 11, 12, 13, 32]] = 3
for _c in range(48, 58):
    _BPE_CLS[_c] = 1
for _c in list(range(65, 91)) + list(range(97, 123)):
    _BPE_CLS[_c] = 0


def q_bpe_pairs(sf_dir: str):
    """One BPE vocabulary-induction merge round: corpus-wide counts of
    adjacent character pairs INSIDE BPE pre-tokens (the statistic each
    merge step of tokenizer training maximizes).  A pair is in-token
    iff both bytes share a character class and neither is whitespace —
    so the kernel needs no tokenization at all: one byte-class lookup +
    one dense 65536-bin bincount per batch (fixed-size, data-
    independent — the CLAUDE.md dense-bincount guard is structural
    here).  Pair cardinality is bounded by the alphabet squared, so the
    global sum is the guarded small reduce.  ASCII corpus (bytes ==
    chars; matches the substring-based SQL twin)."""
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        blob = "\n".join(t.column("text").to_pylist())
        b = np.frombuffer(blob.encode("ascii"), np.uint8)
        if len(b) < 2:
            z = pa.array([], pa.string())
            return pa.table({"a": z, "b": z,
                             "n": pa.array([], pa.int64())})
        cls = _BPE_CLS[b]
        ok = (cls[:-1] == cls[1:]) & (cls[:-1] != 3)
        key = b[:-1].astype(np.int64) * 256 + b[1:]
        cnt = np.bincount(key[ok], minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "a": pa.array([chr(k >> 8) for k in nz], pa.string()),
            "b": pa.array([chr(k & 255) for k in nz], pa.string()),
            "n": pa.array(cnt[nz].astype(np.int64), pa.int64())})

    part = docs.map_batches(partial, batch_format="pyarrow")

    def total(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a", "b"], as_index=False)["n"].sum()

    return reduce_small_or_shard(part, ["a", "b"], total)


BPE_MERGE_ROUNDS = 6


def q_bpe_merges(sf_dir: str, rounds: int = BPE_MERGE_ROUNDS):
    """FULL iterative BPE vocabulary induction (not just the round-0
    pair census of q_bpe_pairs): ``rounds`` merge rounds, each one
    bounded-alphabet pair-count exchange + a driver argmax over the
    <= vocab^2 pair table (vocab = printable ASCII + one new symbol
    per round — fixed driver state), emitting the merge table
    (round, a, b, n).

    Words live as space-separated symbol strings (" h e l l o ");
    applying merge (a, b) is the CANONICAL greedy left-to-right token
    merge: within each maximal run of consecutive occurrence positions
    only the even offsets merge (a plain " a b "->" ab " string
    replace consumes the shared boundary space and misses back-to-back
    occurrences — 'mama' would stay [ma, m, a]); bpe_merge_tokens
    implements the run-parity rule vectorized and the unrolled CTE
    twin (sql_bpe_merges) repeats it with window functions.  Ties
    break (n DESC, a ASC, b ASC) on both
    engines.  The unique-word frequency table is built once (one
    sharded count — the corpus-sized exchange); each round then scans
    only that table."""
    from osmquadtreepostgis_ray.functions.text import BPE_TOKEN_RE
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    docs = read_table(sf_dir, "documents", columns=["text"])

    def words(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist(), dtype=object)
        vc = s.str.findall(BPE_TOKEN_RE).explode().dropna().value_counts()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64),
                                       pa.int64())})

    wct = sharded_agg(docs.map_batches(words, batch_format="pyarrow"),
                      ["word"], {"n": ("n", "sum")})

    def sep_form(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("word").to_pylist(), dtype=object)
        s = " " + s.str.replace(r"(.)", r"\1 ", regex=True)
        return pa.table({"s": pa.array(s.to_numpy(), pa.string()),
                         "n": t.column("n")})

    w = wct.map_batches(sep_form, batch_format="pyarrow").materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "s" not in t.column_names:
            return empty
        s = pd.Series(t.column("s").to_pylist(), dtype=object)
        n = t.column("n").to_numpy()
        toks = s.str.strip().str.split(" ")
        lens = toks.str.len().to_numpy()
        keep = lens >= 2
        if not keep.any():
            return empty
        flat = np.concatenate(
            [np.asarray(x, object) for x in toks[keep]])
        wl = lens[keep]
        wid = np.repeat(np.arange(int(keep.sum())), wl)
        wn = np.repeat(n[keep], wl)
        ok = wid[:-1] == wid[1:]
        g = (pd.DataFrame({"a": flat[:-1][ok], "b": flat[1:][ok],
                           "n": wn[:-1][ok]})
             .groupby(["a", "b"], as_index=False)["n"].sum())
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    merges = []
    for r in range(1, rounds + 1):
        pairs = reduce_small_or_shard(
            w.map_batches(pair_partial, batch_format="pyarrow"),
            ["a", "b"], total).to_pandas()
        if not len(pairs):
            break
        best = pairs.sort_values(["n", "a", "b"],
                                 ascending=[False, True, True]).iloc[0]
        a, b, cnt = str(best["a"]), str(best["b"]), int(best["n"])
        merges.append((r, a, b, cnt))

        def apply_merge(t: pa.Table, _a=a, _b=b) -> pa.Table:
            if t.num_rows == 0 or "s" not in t.column_names:
                return pa.table({"s": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            out = bpe_merge_tokens(
                pd.Series(t.column("s").to_pylist(), dtype=object), _a, _b)
            return pa.table({"s": pa.array(out.to_numpy(), pa.string()),
                             "n": t.column("n")})

        w = w.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pa.table({
        "round": pa.array([m[0] for m in merges], pa.int64()),
        "a": pa.array([m[1] for m in merges], pa.string()),
        "b": pa.array([m[2] for m in merges], pa.string()),
        "n": pa.array([m[3] for m in merges], pa.int64())})


def bpe_merge_tokens(ser: pd.Series, a: str, b: str) -> pd.Series:
    """Canonical greedy L2R BPE merge of pair (a, b) over sep-strings
    (" t o k e n s "): occurrence positions group into maximal
    consecutive runs and only EVEN offsets within a run merge — the
    exact skip-after-merge semantics of the reference tokenizer loop
    (run of L adjacent occurrences -> ceil(L/2) merges).  Vectorized:
    one token explode, one boolean occurrence pass, run parity via the
    arange-minus-start trick, one grouped join back."""
    if not len(ser):
        return ser
    toks = ser.str.strip().str.split(" ")
    lens = toks.str.len().to_numpy()
    flat = np.concatenate([np.asarray(x, object) for x in toks])
    wid = np.repeat(np.arange(len(ser)), lens)
    occ = np.zeros(len(flat), bool)
    if len(flat) >= 2:
        occ[:-1] = (flat[:-1] == a) & (flat[1:] == b) \
            & (wid[:-1] == wid[1:])
    kpos = np.flatnonzero(occ)
    if not len(kpos):
        return ser
    # consecutive kpos are necessarily same-word (adjacent occurrences
    # share a token), so diff==1 is the complete run condition
    new_run = np.r_[True, np.diff(kpos) != 1]
    run_len = np.diff(np.r_[np.flatnonzero(new_run), len(kpos)])
    starts = np.repeat(kpos[new_run], run_len)
    kept = kpos[((kpos - starts) % 2) == 0]
    flat = flat.copy()
    flat[kept] = a + b
    drop = np.zeros(len(flat), bool)
    drop[kept + 1] = True
    rebuilt = pd.Series(flat[~drop]).groupby(wid[~drop]).agg(" ".join)
    return pd.Series((" " + rebuilt + " ").to_numpy(),
                     index=ser.index, dtype=object)


def q_spacetime_cube(sf_dir: str):
    """Space-time cube: per (tile, hour-of-day) event count and its
    exact permille share of the tile's total — the diurnal-profile
    aggregation a movement dataset serves.  Combiner partials, one
    bounded-cardinality keyed aggregate, then the per-tile share in
    the guarded reduce (tile x 24 is structurally bounded).  Hour from
    epoch microseconds on BOTH engines (no calendar/timezone path)."""
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        tile = t.column("tile").to_numpy()
        hour = (t.column("ts").cast(pa.int64()).to_numpy()
                // 3_600_000_000) % 24
        key = tile * 24 + hour
        u, c = np.unique(key, return_counts=True)
        return pa.table({"tile": pa.array(u // 24, pa.int64()),
                         "hour": pa.array(u % 24, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["tile", "hour"], {"n": ("n", "sum")})

    def share(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        tot = g.groupby("tile")["n"].transform("sum")
        g["permille"] = (1000 * g["n"]) // tot
        return g[["tile", "hour", "n", "permille"]]

    return reduce_small_or_shard(agg, ["tile"], share)


COLOC_T_US = 14_400_000_000   # 4 h contact window
COLOC_DEPTH = 6


def q_colocation(sf_dir: str):
    """Spatio-temporal co-location (contact) join: unordered user pairs
    with events in the SAME depth-6 cell within 4 h of each other, with
    contact counts — the contact-tracing / co-visitation shape.  ONE
    groupby((cell, time-bucket)) exchange: every event is OWNER in its
    own bucket and fans as CANDIDATE to (bucket, bucket-1), so each
    qualifying event pair forms exactly once in the EARLIER event's
    bucket ((ts, event_id) lexicographic order breaks ties); per-group
    work is a vectorized time-window mask.  Pair volume is bounded by
    spatio-temporal density x window, never dataset size."""
    def fan(t: pa.Table) -> pa.Table:
        fx, fy = geotag.milli_to_fixed(t.column("lon_milli").to_numpy(),
                                       t.column("lat_milli").to_numpy())
        ix, iy = quadtree.fixed_to_ixy(fx, fy, COLOC_DEPTH)
        cell = quadtree.encode_ixy(ix, iy, COLOC_DEPTH)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        b = ts // COLOC_T_US
        assert (b < 1_000_000).all()  # packing headroom (epoch-us / 4 h)
        e = t.column("event_id").to_numpy()
        u = t.column("user_id").to_numpy()
        key0 = cell * 1_000_000 + b          # owner: own bucket
        keyc = cell * 1_000_000 + (b - 1)    # candidate: previous too
        return pa.table({
            "key": pa.array(np.concatenate([key0, key0, keyc]), pa.int64()),
            "side": pa.array(np.concatenate(
                [np.zeros(len(e), np.int8), np.ones(2 * len(e), np.int8)]),
                pa.int8()),
            "e": pa.array(np.concatenate([e, e, e]), pa.int64()),
            "u": pa.array(np.concatenate([u, u, u]), pa.int64()),
            "t": pa.array(np.concatenate([ts, ts, ts]), pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # many near-singleton (cell, bucket) keys per shard: a keyed
        # MERGE forms every owner x candidate pair at C speed (the
        # shard_apply contract — no per-group Python)
        own = g[g["side"] == 0]
        cand = g[g["side"] == 1]
        z = np.empty(0, np.int64)
        if not len(own) or not len(cand):
            return pd.DataFrame({"ua": z, "ub": z, "n": z})
        m = own[["key", "e", "u", "t"]].merge(
            cand[["key", "e", "u", "t"]], on="key", suffixes=("_o", "_c"))
        to = m["t_o"].to_numpy(np.int64)
        tc = m["t_c"].to_numpy(np.int64)
        eo = m["e_o"].to_numpy(np.int64)
        ec = m["e_c"].to_numpy(np.int64)
        uo = m["u_o"].to_numpy(np.int64)
        uc = m["u_c"].to_numpy(np.int64)
        later = (tc > to) | ((tc == to) & (ec > eo))   # strict event order
        keep = later & (tc - to <= COLOC_T_US) & (uc != uo)
        a, b = uo[keep], uc[keep]
        df = pd.DataFrame({"ua": np.minimum(a, b), "ub": np.maximum(a, b)})
        c = df.groupby(["ua", "ub"], sort=False).size().reset_index(name="n")
        c["n"] = c["n"].astype(np.int64)
        return c

    part = shard_apply(
        prep_events(sf_dir, columns=["event_id", "user_id", "ts"])
        .select_columns(["event_id", "user_id", "ts",
                         "lon_milli", "lat_milli"])
        .map_batches(fan, batch_format="pyarrow"), ["key"], pairs)
    return sharded_agg(part, ["ua", "ub"], {"n": ("n", "sum")}) \
        .select_columns(["ua", "ub", "n"])


def q_headings(sf_dir: str):
    """Per-user heading (movement-direction) octant histogram from
    consecutive trajectory steps — exact integer octant classification
    (sign + |dx| vs |dy| comparisons, diagonal ties to the
    counter-clockwise sector, stationary steps octant -1), one
    user-sharded exchange."""
    def epoch(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "lon_milli": t.column("lon_milli"),
                         "lat_milli": t.column("lat_milli"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    j = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .map_batches(epoch, batch_format="pyarrow")

    def oct_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        x = g["lon_milli"].to_numpy(np.int64)
        y = g["lat_milli"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        dx = (x[1:] - x[:-1])[same]
        dy = (y[1:] - y[:-1])[same]
        uu = u[1:][same]
        ax, ay = np.abs(dx), np.abs(dy)
        # octants 0..7 CCW from east; sector [k*45, (k+1)*45) degrees
        o = np.full(len(dx), -1, np.int64)
        o = np.where((dx > 0) & (dy >= 0) & (ax > ay), 0, o)    # [0,45)
        o = np.where((dy > 0) & (dx > 0) & (ay >= ax), 1, o)    # [45,90)
        o = np.where((dy > 0) & (dx <= 0) & (ay > ax), 2, o)    # [90,135)
        o = np.where((dx < 0) & (dy > 0) & (ax >= ay), 3, o)    # [135,180)
        o = np.where((dx < 0) & (dy <= 0) & (ax > ay), 4, o)    # [180,225)
        o = np.where((dy < 0) & (dx < 0) & (ay >= ax), 5, o)    # [225,270)
        o = np.where((dy < 0) & (dx >= 0) & (ay > ax), 6, o)    # [270,315)
        o = np.where((dx > 0) & (dy < 0) & (ax >= ay), 7, o)    # [315,360)
        c = pd.DataFrame({"user_id": uu, "octant": o}) \
            .groupby(["user_id", "octant"], sort=False).size() \
            .reset_index(name="n")
        c["n"] = c["n"].astype(np.int64)
        return c

    part = shard_apply(j, ["user_id"], oct_counts)
    return sharded_agg(part, ["user_id", "octant"], {"n": ("n", "sum")}) \
        .select_columns(["user_id", "octant", "n"])


THIN_K = 2


def q_thin(sf_dir: str):
    """Spatial feature thinning (the tile-render density cap — the
    engine-side analog of the reference's minzoom visibility cut): per
    depth-6 cell keep the THIN_K smallest event_ids.  Combiner per
    batch first (each batch keeps at most K per cell, so the shuffle
    carries at most K x occupied-cells rows per batch), then the final
    per-cell head in a sharded vectorized pass."""
    def enc(t: pa.Table) -> pa.Table:
        fx, fy = geotag.milli_to_fixed(t.column("lon_milli").to_numpy(),
                                       t.column("lat_milli").to_numpy())
        ix, iy = quadtree.fixed_to_ixy(fx, fy, COLOC_DEPTH)
        df = pd.DataFrame({"ix": ix, "iy": iy,
                           "event_id": t.column("event_id").to_numpy()})
        df = df.sort_values(["ix", "iy", "event_id"], kind="mergesort")
        keep = df.groupby(["ix", "iy"], sort=False).head(THIN_K)
        return pa.Table.from_pandas(keep, preserve_index=False)

    part = prep_events(sf_dir).select_columns(
        ["event_id", "lon_milli", "lat_milli"]) \
        .map_batches(enc, batch_format="pyarrow")

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ix", "iy", "event_id"], kind="mergesort")
        return g.groupby(["ix", "iy"], sort=False).head(THIN_K)

    return shard_apply(part, ["ix", "iy"], head) \
        .select_columns(["ix", "iy", "event_id"])


PACK_BUDGET = 2048
PACK_SHARDS = 32


def q_seq_pack(sf_dir: str):
    """Training-sequence packing (the LM-pretraining concat-and-slice
    layout): documents order by doc_id within doc_id%32 shards; each
    document's first training chunk is floor(exclusive-prefix-tokens /
    BUDGET) and its intra-chunk token offset — the document-boundary
    map a packed-sequence loader needs.  ONE distributed sort (the
    keyed prefix-sum window, stages/window.keyed_prefix_sum) is the
    only exchange; token counts are the whitespace tokenizer shared
    with token_totals."""
    from osmquadtreepostgis_ray.functions.text import token_count
    from osmquadtreepostgis_ray.stages.window import keyed_prefix_sum

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy()
        ntok = token_count(t.column("text").to_pandas())
        return pa.table({"shard": pa.array(did % PACK_SHARDS, pa.int64()),
                         "doc_id": pa.array(did, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64())})

    out = keyed_prefix_sum(ds.map_batches(prep, batch_format="pyarrow"),
                           ["shard"], ["doc_id"], "n_tokens",
                           out_col="run_tokens")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "run_tokens" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"shard": z, "doc_id": z, "n_tokens": z,
                             "chunk": z, "tok_offset": z})
        excl = (t.column("run_tokens").to_numpy()
                - t.column("n_tokens").to_numpy())
        return pa.table({"shard": t.column("shard"),
                         "doc_id": t.column("doc_id"),
                         "n_tokens": t.column("n_tokens"),
                         "chunk": pa.array(excl // PACK_BUDGET, pa.int64()),
                         "tok_offset": pa.array(excl % PACK_BUDGET, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def q_zonal_mode(sf_dir: str):
    """Zonal MODE (majority vote per zone — the categorical zonal
    statistic): the most frequent event_type per PIP zone, smallest
    type string on ties.  The measure rides through the PIP join
    (carry columns); combiner partials shuffle one (zone, type,
    partial) row per batch; the argmax runs in the guarded keyed
    reduce (zone x type cardinality is bounded)."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_fn
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    ev = prep_events(sf_dir, columns=["event_id", "user_id", "event_type"])
    zref = ray.put(zones_table())
    joined = ev.map_batches(pip_join_fn(zref, carry=("event_type",)),
                            batch_format="pyarrow", batch_size=8192)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["zone_id", "kind", "event_type"], sort=False) \
              .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(joined.map_batches(partial, batch_format="pyarrow"),
                      ["zone_id", "kind", "event_type"], {"n": ("n", "sum")})

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        # max count, tie -> lexicographically smallest type (order by
        # -n then event_type, take first per zone)
        g = g.sort_values(["zone_id", "kind", "n", "event_type"],
                          ascending=[True, True, False, True], kind="mergesort")
        top = g.groupby(["zone_id", "kind"], sort=False).head(1)
        return pd.DataFrame({"zone_id": top["zone_id"].to_numpy(np.int64),
                             "kind": top["kind"].to_numpy(object),
                             "mode_type": top["event_type"].to_numpy(object),
                             "n_mode": top["n"].to_numpy(np.int64)})

    return reduce_small_or_shard(agg, ["zone_id", "kind"], argmax)


def q_dissolve(sf_dir: str):
    """Raster dissolve (polygon dissolve on the pixel grid): adjacent
    (4-neighbor) cells of the heatmap raster with EQUAL counts merge
    into connected regions; output one row per region (component id =
    min global cell id, cell count, count mass).  The GIS dissolve /
    region-labelling operator, built from pieces that each scale:

    - adjacency discovery is an owner/probe halo shuffle over the
      DISTINCT-cell aggregate (each cell posts itself to its E and S
      neighbors' keys; equal keys co-locate in one shard) — never a
      spatial self-join of raw rows;
    - region labelling is stages/cluster.connected_components
      (block-local contraction, star merge, bounded solve);
    - isolated cells skip the component machinery entirely via a left
      bucket join (label = own id)."""
    from osmquadtreepostgis_ray.stages.cluster import connected_components
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    G = 1 << CELL_DEPTH
    cells = q_rasterize(sf_dir)

    def to_global(t: pa.Table) -> pa.Table:
        tx, ty, _ = quadtree.decode(t.column("tile").to_numpy())
        gx = tx * 16 + t.column("px").to_numpy().astype(np.int64)
        gy = ty * 16 + t.column("py").to_numpy().astype(np.int64)
        return pa.table({"id": pa.array(gy * G + gx, pa.int64()),
                         "gx": pa.array(gx, pa.int64()),
                         "gy": pa.array(gy, pa.int64()),
                         "n": t.column("n")})
    # g is consumed TWICE (edge discovery + the label join-back); it is
    # the distinct-cell AGGREGATE (bounded by raster area, not by row
    # count), so materializing once beats re-executing the full
    # read->geotag->rasterize chain per consumer.
    g = cells.map_batches(to_global, batch_format="pyarrow").materialize()

    def fan(t: pa.Table) -> pa.Table:
        gid = t.column("id").to_numpy()
        gx = t.column("gx").to_numpy()
        gy = t.column("gy").to_numpy()
        n = t.column("n").to_numpy()
        # owner row at own key; probe rows at E and S neighbors' keys
        keys = [gid]
        orig = [gid]
        role = [np.zeros(len(gid), np.int8)]
        for dx, dy in ((1, 0), (0, 1)):
            ngx, ngy = gx + dx, gy + dy
            m = (ngx < G) & (ngy < G)
            keys.append((ngy * G + ngx)[m])
            orig.append(gid[m])
            role.append(np.ones(m.sum(), np.int8))
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "orig": pa.array(np.concatenate(orig), pa.int64()),
                         "n": pa.array(np.concatenate([n, n[(gx + 1 < G)],
                                                       n[(gy + 1 < G)]]), pa.int64()),
                         "role": pa.array(np.concatenate(role), pa.int8())})

    def edges_of(df: pd.DataFrame) -> pd.DataFrame:
        own = df[df["role"] == 0]
        probe = df[df["role"] == 1]
        e = probe.merge(own[["key", "orig", "n"]], on=["key", "n"],
                        suffixes=("_a", "_b"))
        return pd.DataFrame({"a": e["orig_a"].astype(np.int64),
                             "b": e["orig_b"].astype(np.int64)})

    edges = shard_apply(g.map_batches(fan, batch_format="pyarrow"),
                        ["key"], edges_of)
    comp = connected_components(edges, "a", "b")
    # rename the (never-empty) LEFT side to the components' key name —
    # a map_batches rename on comp would erase its schema when the edge
    # set is empty (Ray infers schema by running the UDF on a block)
    gl = g.map_batches(
        lambda t: t.select(["id", "n"]).rename_columns(["node", "n"]),
        batch_format="pyarrow")
    lab = bucket_hash_join(gl, comp, on="node", how="left")

    def fix(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cid = df["node"].to_numpy(np.int64)
        comp_col = df["component"].to_numpy(np.float64)
        comp_i = np.where(np.isnan(comp_col), cid, comp_col).astype(np.int64)
        return pa.table({"comp": pa.array(comp_i, pa.int64()),
                         "one": pa.array(np.ones(len(cid), np.int64), pa.int64()),
                         "n": pa.array(df["n"].to_numpy(np.int64), pa.int64())})

    out = lab.map_batches(fix, batch_format="pyarrow")
    return (sharded_agg(out, ["comp"], {"n_cells": ("one", "sum"),
                                        "sum_n": ("n", "sum")})
            .select_columns(["comp", "n_cells", "sum_n"]))


def q_trajectories(sf_dir: str):
    """Per-user trajectory statistics (the movement-analytics streaming
    shape): events ordered by (ts, event_id) per user; exact-int squared
    step lengths, max step, net displacement.  groupby(user).map_groups
    — the keyed stateful-window pattern (same as sessionize)."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["event_id", "user_id", "ts", "lon_milli", "lat_milli"])

    def path(g: pd.DataFrame) -> pd.DataFrame:
        # whole-shard vectorized: sort (user, ts, id); steps are diffs
        # with cross-user boundaries masked out; per-user reductions via
        # add/maximum.reduceat over user segments
        if not len(g):
            return pd.DataFrame({k: pd.Series([], dtype=np.int64) for k in (
                "user_id", "n_steps", "sum_step2", "max_step2", "net_dx", "net_dy")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        x = g["lon_milli"].to_numpy(np.int64)
        y = g["lat_milli"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        dx = np.diff(x)
        dy = np.diff(y)
        st2 = dx * dx + dy * dy
        valid = np.ones(len(st2), bool)
        valid[starts[1:] - 1] = False                  # steps crossing users
        st2v = np.where(valid, st2, 0)
        cs = np.r_[0, np.cumsum(st2v)]
        sum_step2 = cs[ends - 1] - cs[starts]          # excl. boundary step
        # per-segment max via reduceat over masked steps: boundary steps
        # are zeroed and squares are >= 0, so including them is harmless;
        # single-row segments are zeroed by the length mask
        pad = np.r_[st2v, 0]
        max_step2 = np.maximum.reduceat(pad, np.minimum(starts, len(pad) - 1))
        max_step2 = np.where(ends - starts > 1, max_step2, 0)
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_steps": ends - starts - 1,
            "sum_step2": sum_step2,
            "max_step2": max_step2,
            "net_dx": x[ends - 1] - x[starts],
            "net_dy": y[ends - 1] - y[starts]})

    return (shard_apply(ds, ["user_id"], path)
            .select_columns(["user_id", "n_steps", "sum_step2", "max_step2",
                             "net_dx", "net_dy"]))


# --------------------------------------------------- round-2 widening ops

def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(lang, source) over documents — all four grouping
    sets in ONE pass: the per-batch combiner emits each distinct
    (lang, source) partial under its 4 cube keys (sentinel for the
    rolled-up axis), one sharded sum finishes, and the sentinel maps to
    NULL at the end.  The shuffle carries 4x the distinct-combination
    count, never 4x the rows — the standard cube-as-combiner plan."""
    ds = read_table(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    SENT = "\x00ALL"

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # pandas groupby(dropna=True) would silently DROP null lang/source
        # rows where DuckDB groups them, and a real value containing the
        # rollup sentinel would collide with rollup rows (ADVICE r2):
        # assert both preconditions instead of corrupting counts.
        for c in ("lang", "source"):
            if df[c].isna().any():
                raise ValueError(f"q_cube_counts: null {c!r} unsupported "
                                 f"(add an explicit placeholder upstream)")
            if (df[c] == SENT).any():
                raise ValueError(f"q_cube_counts: {c!r} contains the rollup "
                                 f"sentinel byte")
        g = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        frames = []
        for ml, ms in ((False, False), (False, True), (True, False), (True, True)):
            f = g.copy()
            if ml:
                f["lang"] = SENT
            if ms:
                f["source"] = SENT
            frames.append(f)
        out = pd.concat(frames, ignore_index=True).groupby(
            ["lang", "source"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["sum_chars"] = out["sum_chars"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["lang", "source"],
                      {"n_docs": ("n_docs", "sum"), "sum_chars": ("sum_chars", "sum")})

    def desentinel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = {}
        for c in ("lang", "source"):
            col = t.column(c)
            out[c] = pc.if_else(pc.equal(col, SENT), pa.scalar(None, pa.string()), col)
        return pa.table({**out, "n_docs": t.column("n_docs"),
                         "sum_chars": t.column("sum_chars")})

    return agg.map_batches(desentinel, batch_format="pyarrow")


def q_mode_user_type(sf_dir: str):
    """Per-user MODE of event_type (tie -> lexicographically smallest):
    per-batch (user, type) count combiner, then ONE user-sharded stage
    that sums partials and picks the argmax per user vectorized —
    never a per-group Python call on a data-scaled key."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["user_id", "event_type"], as_index=False).size() \
              .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "mode_type": pd.Series([], dtype=object),
                                 "mode_n": pd.Series([], dtype=np.int64)})
        c = df.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="stable")
        top = c.drop_duplicates("user_id")
        return pd.DataFrame({"user_id": top["user_id"].to_numpy(np.int64),
                             "mode_type": top["event_type"].to_numpy(object),
                             "mode_n": top["n"].to_numpy(np.int64)})

    return shard_apply(ds.map_batches(partial, batch_format="pyarrow"),
                       ["user_id"], pick)


def q_sample_weighted(sf_dir: str, scale_div: int = 5):
    """Weighted Bernoulli sample: doc kept with probability proportional
    to its length (permille = min(n_chars // scale_div, 1000)), decided
    by the row-pure Knuth hash — deterministic, shuffle-free, exact."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        nc = t.column("n_chars").to_numpy().astype(np.int64)
        w = np.minimum(nc // scale_div, SAMPLE_MOD)
        m = (ids * SAMPLE_MULT) % SAMPLE_MOD < w
        return pa.table({"doc_id": pa.array(ids[m], pa.int64()),
                         "n_chars": pa.array(nc[m], pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow")


def q_corr_components(sf_dir: str):
    """Exact-integer covariance/correlation components per
    ``event_id % 5`` bucket (5 fixed strata — NOT per event_type):
    (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) with x = value cents and
    y = lat_milli — the one-pass parallel corr shape (driver derives
    r from the six sums; the engine ships partials only)."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = (t.column("event_id").to_numpy() % 5).astype(np.int64)
        x = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        y = t.column("lat_milli").to_numpy().astype(np.int64)
        df = pd.DataFrame({"bucket": et, "one": np.ones(len(x), np.int64),
                           "x": x, "y": y, "xy": x * y, "x2": x * x, "y2": y * y})
        g = df.groupby("bucket", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                        ["bucket"],
                        {"n": ("one", "sum"), "sum_x": ("x", "sum"),
                         "sum_y": ("y", "sum"), "sum_xy": ("xy", "sum"),
                         "sum_x2": ("x2", "sum"), "sum_y2": ("y2", "sum")})
            .select_columns(["bucket", "n", "sum_x", "sum_y", "sum_xy",
                             "sum_x2", "sum_y2"]))


def q_nn_join(sf_dir: str):
    """All-rows 1-NN join: every event gets its nearest grid-zone
    CENTROID (exact int64 squared distance; tie -> lowest zone id).
    The zone side is tiny and static, so the scale plan is broadcast-
    argmin per batch (a [B x Z] vectorized distance, no shuffle at
    all) — the degenerate-but-dominant case of NN joins in practice.
    For a data-scaled right side the cell-ring machinery
    (stages/knn.py) is the fallback."""
    from osmquadtreepostgis_ray.sources import zones as Z
    gz = Z.grid_zone_ids()
    cx = (gz % Z.GX) * Z.GRID_W + Z.GRID_W // 2
    cy = (gz // Z.GX) * Z.GRID_H + Z.GRID_H // 2

    def nn(t: pa.Table) -> pa.Table:
        x = t.column("lon_milli").to_numpy().astype(np.int64)
        y = t.column("lat_milli").to_numpy().astype(np.int64)
        d2 = (x[:, None] - cx[None, :]) ** 2 + (y[:, None] - cy[None, :]) ** 2
        j = np.argmin(d2, axis=1)          # first hit = lowest zone id
        return pa.table({
            "event_id": t.column("event_id"),
            "nn_zone": pa.array(gz[j], pa.int64()),
            "d2": pa.array(d2[np.arange(len(x)), j], pa.int64())})

    return prep_events(sf_dir).map_batches(nn, batch_format="pyarrow",
                                           batch_size=8192)


def q_running_total(sf_dir: str):
    """Global running revenue: SUM(total cents) OVER (ORDER BY
    o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) — the distributed
    prefix-sum window (stages/window.keyed_prefix_sum): one sort,
    per-block per-group sums to the driver, block-local finish."""
    from osmquadtreepostgis_ray.stages.window import keyed_prefix_sum

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        day = t.column("o_orderdate").cast(pa.int64()).to_numpy()  # epoch us
        return pa.table({"g": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                         "day": pa.array(day, pa.int64()),
                         "o_orderkey": t.column("o_orderkey"),
                         "cents": pa.array(cents, pa.int64())})

    out = keyed_prefix_sum(ds.map_batches(prep, batch_format="pyarrow"),
                           ["g"], ["day", "o_orderkey"], "cents",
                           out_col="run_cents")
    return out.select_columns(["o_orderkey", "run_cents"])


def _segments_of(df: pd.DataFrame) -> pd.DataFrame:
    """Per-group member chain -> line segments (consecutive doc pairs
    within a way group; zero-length segments dropped)."""
    cols = {"seg_id": np.int64, "gid": np.int64, "x1": np.int64,
            "y1": np.int64, "x2": np.int64, "y2": np.int64}
    if not len(df):
        return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in cols.items()})
    df = df.sort_values(["group_id", "doc_id"], kind="stable")
    g = df["group_id"].to_numpy(np.int64)
    x = df["lon_milli"].to_numpy(np.int64)
    y = df["lat_milli"].to_numpy(np.int64)
    i = np.flatnonzero(g[1:] == g[:-1])        # row i and i+1 same group
    x1, y1, x2, y2 = x[i], y[i], x[i + 1], y[i + 1]
    keep = (x1 != x2) | (y1 != y2)
    return pd.DataFrame({"seg_id": df["doc_id"].to_numpy(np.int64)[i][keep],
                         "gid": g[i][keep],
                         "x1": x1[keep], "y1": y1[keep],
                         "x2": x2[keep], "y2": y2[keep]})


def way_segments(sf_dir: str) -> ray.data.Dataset:
    """Way chains -> segments (seg_id, gid, x1, y1, x2, y2): the shared
    road-network derivation behind segment_intersections / densify /
    line_raster / map_match.  One group-sharded vectorized pass over
    the assembly member chains (stages/assembly.member_table — the
    reference's way-node refs, SURVEY.md §2.4)."""
    from osmquadtreepostgis_ray.stages.assembly import member_table
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return shard_apply(member_table(docs), ["group_id"], _segments_of)


def q_segment_intersections(sf_dir: str):
    """Segment-intersection spatial join (line x line — the OSM
    crossing-ways shape; PBSM like stages/rect_join but with the exact
    integer orientation predicate instead of interval overlap):

    1. way chains (assembly member_table order) -> segments, one
       group-sharded vectorized pass;
    2. each segment fans out to the admin-grid cells its bbox covers —
       candidate pairs only ever form inside one cell, so the only
       all-to-all is the cell-keyed exchange;
    3. per cell: bbox-prefilter (chunked broadcast mask), then the
       exact int64 cross-product sign test (proper crossings only —
       touching/collinear excluded, so no tie-rounding ambiguity);
    4. exactly-once WITHOUT a distinct shuffle: a crossing pair is
       emitted only by the cell that OWNS the intersection point (the
       PBSM reference-point dedup, as stages/rect_join).  The point of
       a proper crossing of integer segments is rational px = Nx/D; its
       cell floor(Nx/(D*W)) is exact int64 (|N| <= (|coord|+|d|)*|D| <
       2^58 for milli-degree domains) and lies inside both segments'
       bboxes, so the owning cell is always among the fanned cells of
       BOTH sides — every pair is emitted exactly once.

    Partitioning assumption (documented per CLAUDE.md): cell size ~
    segment bbox size.  Synthetic chains are domain-length, so the cell
    grid here is the coarse admin overlay; real map data wants the
    depth-8 quadtree cells + the skew subdivision in stages/skew.py."""
    from osmquadtreepostgis_ray.sources.zones import ADMIN_H, ADMIN_W, AX

    seg = way_segments(sf_dir)

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("cellk", pa.array([], pa.int64()))
        x1 = t.column("x1").to_numpy(); x2 = t.column("x2").to_numpy()
        y1 = t.column("y1").to_numpy(); y2 = t.column("y2").to_numpy()
        cx0 = np.minimum(x1, x2) // ADMIN_W
        cx1 = np.maximum(x1, x2) // ADMIN_W
        cy0 = np.minimum(y1, y2) // ADMIN_H
        cy1 = np.maximum(y1, y2) // ADMIN_H
        w = cx1 - cx0 + 1
        cnt = w * (cy1 - cy0 + 1)
        idx = np.repeat(np.arange(t.num_rows), cnt)
        starts = np.r_[0, np.cumsum(cnt)[:-1]]
        local = np.arange(int(cnt.sum()), dtype=np.int64) - starts[idx]
        cell = (cy0[idx] + local // w[idx]) * AX + cx0[idx] + local % w[idx]
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("cellk", pa.array(cell, pa.int64()))

    fanned = seg.map_batches(fan, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for ck, cdf in df.groupby("cellk", sort=False):
            m = len(cdf)
            if m < 2:
                continue
            sid = cdf["seg_id"].to_numpy(np.int64)
            gid = cdf["gid"].to_numpy(np.int64)
            x1 = cdf["x1"].to_numpy(np.int64); y1 = cdf["y1"].to_numpy(np.int64)
            x2 = cdf["x2"].to_numpy(np.int64); y2 = cdf["y2"].to_numpy(np.int64)
            bx0 = np.minimum(x1, x2); bx1 = np.maximum(x1, x2)
            by0 = np.minimum(y1, y2); by1 = np.maximum(y1, y2)
            for lo in range(0, m, 512):          # bound the m x m temporaries
                sl = slice(lo, min(lo + 512, m))
                mask = ((gid[sl, None] != gid[None, :])
                        & (sid[sl, None] < sid[None, :])
                        & (bx0[sl, None] <= bx1[None, :]) & (bx0[None, :] <= bx1[sl, None])
                        & (by0[sl, None] <= by1[None, :]) & (by0[None, :] <= by1[sl, None]))
                ii, jj = np.nonzero(mask)
                if not len(ii):
                    continue
                ii = ii + lo
                ax1, ay1, ax2, ay2 = x1[ii], y1[ii], x2[ii], y2[ii]
                qx1, qy1, qx2, qy2 = x1[jj], y1[jj], x2[jj], y2[jj]
                dax = ax2 - ax1; day = ay2 - ay1
                dbx = qx2 - qx1; dby = qy2 - qy1
                s1 = np.sign(dax * (qy1 - ay1) - day * (qx1 - ax1))
                s2 = np.sign(dax * (qy2 - ay1) - day * (qx2 - ax1))
                s3 = np.sign(dbx * (ay1 - qy1) - dby * (ax1 - qx1))
                s4 = np.sign(dbx * (ay2 - qy1) - dby * (ax2 - qx1))
                hit = (s1 * s2 < 0) & (s3 * s4 < 0)
                if not hit.any():
                    continue
                # exact rational intersection point of the hit pairs:
                # p = a1 + (t_num/den) * dA, den != 0 for proper crossings
                h = np.flatnonzero(hit)
                den = dax[h] * dby[h] - day[h] * dbx[h]
                t_num = (qx1[h] - ax1[h]) * dby[h] - (qy1[h] - ay1[h]) * dbx[h]
                neg = den < 0
                den = np.where(neg, -den, den)
                t_num = np.where(neg, -t_num, t_num)
                px_num = ax1[h] * den + t_num * dax[h]   # px = px_num/den >= 0
                py_num = ay1[h] * den + t_num * day[h]
                cx = px_num // (den * ADMIN_W)           # exact floor: all >= 0
                cy = py_num // (den * ADMIN_H)
                own = (cy * AX + cx) == ck
                out_a.append(sid[ii[h[own]]])
                out_b.append(sid[jj[h[own]]])
        if not out_a:
            return pd.DataFrame({"a_seg": pd.Series([], dtype=np.int64),
                                 "b_seg": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a_seg": np.concatenate(out_a),
                             "b_seg": np.concatenate(out_b)})

    return shard_apply(fanned, ["cellk"], pairs)


TRI_ID_ORIENT_MAX_DEG = 64   # id-oriented plan is safe below this


def q_triangles(sf_dir: str, force_plan: str | None = None):
    """Per-node triangle counts over a deterministic document graph —
    the degree-ordered distributed triangle algorithm (the MapReduce
    classic): orient every edge from its lower-(degree, id) endpoint so
    each triangle is generated from exactly one vertex and hub fanout
    is bounded; wedges (v, w) from a vertex's oriented neighbor pairs
    close against the oriented edge set via one hash join.

    PLAN SELECTION (the pagerank broadcast/bucketed pattern): the
    degree table is computed anyway; when its MAX degree is bounded
    (<= TRI_ID_ORIENT_MAX_DEG) the cheaper ID-oriented plan — skip the
    two degree-attach joins, wedge directly on the lower endpoint — is
    provably safe (per-vertex wedge fanout <= max_deg^2) and produces
    the identical triangle multiset; hub-skewed graphs take the
    degree-ordered plan.  Both plans tested equal.

    Edges (row-pure, from each doc row i): (i-1, i) always, and
    (i-2, i) when (i-2) % 3 == 0 — every third chain step closes a
    triangle."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    SHIFT = np.int64(1) << np.int64(31)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        i = t.column("doc_id").to_numpy().astype(np.int64)
        c1 = i[i >= 1]
        a1, b1 = c1 - 1, c1
        c2 = i[(i >= 2) & ((i - 2) % 3 == 0)]
        a2, b2 = c2 - 2, c2
        return pa.table({"a": pa.array(np.r_[a1, a2], pa.int64()),
                         "b": pa.array(np.r_[b1, b2], pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow")

    def endpoints(t: pa.Table) -> pa.Table:
        n = np.r_[t.column("a").to_numpy(), t.column("b").to_numpy()]
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())})

    # deg and directed are DAG forks (each consumed twice); materialize
    # so the edge scan + degree shuffle run once, not per consumer.
    deg = sharded_agg(e.map_batches(endpoints, batch_format="pyarrow"),
                      ["node"], {"deg": ("deg", "sum")}).materialize()

    import pyarrow.compute as _pc
    max_deg, max_node = 0, -1
    for t in ray.get(deg.to_arrow_refs()):
        if t.num_rows:
            max_deg = max(max_deg, int(_pc.max(t.column("deg")).as_py()))
            max_node = max(max_node, int(_pc.max(t.column("node")).as_py()))
    # the (v1, v2) wedge/edge keys pack as v1*2^31 + v2: ids >= 2^31
    # would silently collide / overflow int64 (ADVICE r2) — refuse and
    # point at the unpacked-key join instead of returning wrong counts
    if max_node >= int(SHIFT):
        raise ValueError(
            f"q_triangles packed join keys require node ids < 2^31 "
            f"(max seen {max_node}); join on (v1, v2) via "
            f"bucket_hash_join on two columns for wider id spaces")
    plan = force_plan or ("id" if max_deg <= TRI_ID_ORIENT_MAX_DEG
                          else "degree")

    def corners(t: pa.Table) -> pa.Table:
        n = np.r_[t.column("u").to_numpy(), t.column("v1").to_numpy(),
                  t.column("v2").to_numpy()].astype(np.int64)
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "n_tri": pa.array(c.astype(np.int64), pa.int64())})

    if plan == "id":
        # edges are canonical a<b already: wedge on the lower endpoint,
        # close against the a<b edge-key set — 3 shuffles total
        def wedges_id(df: pd.DataFrame) -> pd.DataFrame:
            cols = ("u", "v1", "v2", "key")
            if not len(df):
                return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                     for c in cols})
            m = df.merge(df, on="a", suffixes=("_1", "_2"))
            m = m[m["b_1"] < m["b_2"]]
            v1 = m["b_1"].to_numpy(np.int64)
            v2 = m["b_2"].to_numpy(np.int64)
            return pd.DataFrame({"u": m["a"].to_numpy(np.int64),
                                 "v1": v1, "v2": v2,
                                 "key": v1 * SHIFT + v2})

        w = shard_apply(e, ["a"], wedges_id).materialize()
        ekey = e.map_batches(
            lambda t: pa.table({"key": pa.array(
                t.column("a").to_numpy().astype(np.int64) * SHIFT
                + t.column("b").to_numpy().astype(np.int64), pa.int64())}),
            batch_format="pyarrow")
        tri = bucket_hash_join(w, ekey, on="key")
        return (sharded_agg(tri.map_batches(corners, batch_format="pyarrow"),
                            ["node"], {"n_tri": ("n_tri", "sum")})
                .select_columns(["node", "n_tri"]))

    da = deg.map_batches(lambda t: t.rename_columns(["a", "deg_a"]),
                         batch_format="pyarrow")
    db = deg.map_batches(lambda t: t.rename_columns(["b", "deg_b"]),
                         batch_format="pyarrow")
    # bucket_hash_join reads .schema() of both sides; on a lazy
    # groupby-output that call EXECUTES the plan once, and the join then
    # executes it again — materialize the first join so the second sees
    # a pinned schema (measured 62s -> ~20s at sf0.1).
    ed = bucket_hash_join(
        bucket_hash_join(e, da, on="a").materialize(), db, on="b")

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        dega = t.column("deg_a").to_numpy().astype(np.int64)
        degb = t.column("deg_b").to_numpy().astype(np.int64)
        fwd = (dega < degb) | ((dega == degb) & (a < b))
        u = np.where(fwd, a, b); v = np.where(fwd, b, a)
        du = np.where(fwd, dega, degb); dv = np.where(fwd, degb, dega)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "dv": pa.array(dv, pa.int64())})

    directed = ed.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("u", "v1", "v2", "key")
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
        m = df.merge(df, on="u", suffixes=("_1", "_2"))
        lt = (m["dv_1"] < m["dv_2"]) | ((m["dv_1"] == m["dv_2"])
                                        & (m["v_1"] < m["v_2"]))
        m = m[lt]
        v1 = m["v_1"].to_numpy(np.int64); v2 = m["v_2"].to_numpy(np.int64)
        return pd.DataFrame({"u": m["u"].to_numpy(np.int64),
                             "v1": v1, "v2": v2, "key": v1 * SHIFT + v2})

    w = shard_apply(directed, ["u"], wedges).materialize()  # schema tax

    ekey = directed.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("u").to_numpy().astype(np.int64) * SHIFT
            + t.column("v").to_numpy().astype(np.int64), pa.int64())}),
        batch_format="pyarrow")
    tri = bucket_hash_join(w, ekey, on="key")

    return (sharded_agg(tri.map_batches(corners, batch_format="pyarrow"),
                        ["node"], {"n_tri": ("n_tri", "sum")})
            .select_columns(["node", "n_tri"]))


# hex lattice: C = column pitch, R = row pitch ~ C*sqrt(3)/2 -> the
# lattice Voronoi cells are hexagons.  Integer constants keep every
# assignment exact (DuckDB twin bit-for-bit).
HEX_C = 10_000
HEX_R = 8_660
HEX_NCOLS = 38            # > LON_MOD // HEX_C + 1


def q_hex_bin(sf_dir: str):
    """H3-analog hexagonal binning (the north rule's hex-index face of
    the quadtree cell encode): events assigned to the nearest center of
    an offset hex lattice — candidate centers are the nearest column of
    rows j0 = lat//R and j0+1 (provably sufficient for R/C = 0.866),
    decided by exact int64 squared distance, tie -> lower row.  Pure
    function of the row; one combiner + sharded sum, same shape as
    cell_histogram."""
    C, R = HEX_C, HEX_R

    def assign(t: pa.Table) -> pa.Table:
        x = t.column("lon_milli").to_numpy().astype(np.int64)
        y = t.column("lat_milli").to_numpy().astype(np.int64)
        j0 = y // R
        best_d2 = None
        bj = bi = None
        for dj in (0, 1):
            j = j0 + dj
            o = (j % 2) * (C // 2)
            i = (2 * (x - o) + C) // (2 * C)
            cx = i * C + o
            cy = j * R
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            if best_d2 is None:
                best_d2, bj, bi = d2, j.copy(), i.copy()
            else:
                better = d2 < best_d2          # tie keeps the lower row
                bj = np.where(better, j, bj)
                bi = np.where(better, i, bi)
                best_d2 = np.where(better, d2, best_d2)
        hid = bj * HEX_NCOLS + bi
        u, c = np.unique(hid, return_counts=True)
        return pa.table({"hex_id": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    part = prep_events(sf_dir).map_batches(assign, batch_format="pyarrow")
    return (sharded_agg(part, ["hex_id"], {"n": ("n", "sum")})
            .select_columns(["hex_id", "n"]))


PIP_HOLES_GROUPS = 32      # fixed test-polygon set -> broadcastable


def q_pip_holes(sf_dir: str):
    """Point-in-polygon with HOLE semantics (even-odd ray cast) against
    the assembled closed groups with group_id < PIP_HOLES_GROUPS — the
    A2 hole assignment (stages/assembly.py) exercised as a JOIN
    predicate, like the reference's polygon tables feeding PostGIS
    ST_Contains (/root/reference/osmquadtreepostgis/__init__.py:368).

    Inside-ness is the crossing parity over ALL of a group's ring edges
    (outer + shrunk hole for even k>=6 groups — subtracting the hole
    falls out of the parity), decided by the exact int64 crossing test:
    edge counts iff (y1>py) != (y2>py) and the signed intercept
    comparison (x1-px)*dy + (py-y1)*dx matches sign(dy) — no division.

    The polygon side is FIXED-size (driver reads just those groups via
    parquet filter pushdown, builds the edge table once, closes over
    it); events stream through a stateless vectorized batch kernel —
    the same broadcast-small-side plan as pip_zones."""
    from osmquadtreepostgis_ray.stages.assembly import (GROUP_SIZE,
                                                        hole_shrink,
                                                        member_table,
                                                        ring_split)

    max_doc = PIP_HOLES_GROUPS * GROUP_SIZE
    import pyarrow.dataset as pads
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      filter=pads.field("doc_id") < max_doc)
    mem = member_table(docs).to_pandas().sort_values("doc_id")

    ex1, ey1, ex2, ey2, egrp = [], [], [], [], []
    for gid, g in mem.groupby("group_id"):
        k = len(g)
        closed = bool((g["close_hit"] > 0).any()) and k >= 3
        if not closed:
            continue
        xs = g["lon_milli"].to_numpy(np.int64)
        ys = g["lat_milli"].to_numpy(np.int64)
        m = ring_split(k)
        rings = [(xs[:m], ys[:m])]
        if m != k:
            hx, hy = xs[m:], ys[m:]
            if gid % 2 == 0:  # A2 hole shrink — SHARED helper, no drift
                hx, hy = hole_shrink(xs[:m], ys[:m], hx, hy)
            rings.append((hx, hy))
        for rx, ry in rings:
            ex1.append(rx); ey1.append(ry)
            ex2.append(np.roll(rx, -1)); ey2.append(np.roll(ry, -1))
            egrp.append(np.full(len(rx), gid, np.int64))
    x1 = np.concatenate(ex1); y1 = np.concatenate(ey1)
    x2 = np.concatenate(ex2); y2 = np.concatenate(ey2)
    grp = np.concatenate(egrp)
    order = np.argsort(grp, kind="stable")
    x1, y1, x2, y2, grp = x1[order], y1[order], x2[order], y2[order], grp[order]
    gstarts = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1]])
    gids = grp[gstarts]
    dx, dy = x2 - x1, y2 - y1

    def inside(t: pa.Table) -> pa.Table:
        px = t.column("lon_milli").to_numpy().astype(np.int64)[:, None]
        py = t.column("lat_milli").to_numpy().astype(np.int64)[:, None]
        straddle = (y1 > py) != (y2 > py)
        tnum = (x1 - px) * dy + (py - y1) * dx
        crosses = straddle & (((dy > 0) & (tnum > 0)) | ((dy < 0) & (tnum < 0)))
        per_group = np.add.reduceat(crosses.astype(np.int8), gstarts, axis=1)
        ei, gi = np.nonzero(per_group % 2 == 1)
        return pa.table({
            "event_id": t.column("event_id").take(pa.array(ei, pa.int64())),
            "group_id": pa.array(gids[gi], pa.int64())})

    return prep_events(sf_dir).map_batches(inside, batch_format="pyarrow",
                                           batch_size=2048)


def q_dense_rank(sf_dir: str):
    """DENSE_RANK per event_type over value cents — the distinct-value
    window rank in ONE shuffle: a combiner pass dedupes (type, cents)
    per batch, a single event_type-sharded exchange dedupes globally
    and ranks (the distinct table is bounded by VALUE CARDINALITY —
    cents of a bounded-range measure — not row count, so a per-type
    shard always fits a worker and the result is broadcast-safe), and
    an Arrow broadcast join carries the rank back to every row with the
    big side untouched.  Previous plan paid 3 shuffles (distinct agg +
    rank sort + composite-key bucket join) for the same answer."""
    from osmquadtreepostgis_ray.stages.joins import broadcast_join

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "cents": pa.array(cents, pa.int64())})

    # materialize: rows feeds BOTH the distinct chain (executed first,
    # at broadcast time) and the join-back — a lazy fork re-reads parquet
    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["event_type", "cents"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["event_type", "cents"],
                                            kind="stable")
        drank = g.groupby("event_type", sort=False).cumcount() + 1
        return pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                             "cents": g["cents"].to_numpy(np.int64),
                             "drank": drank.to_numpy(np.int64)})

    ranked = reduce_small_or_shard(
        rows.map_batches(distinct, batch_format="pyarrow"),
        ["event_type"], rank_shard, shards=16)
    out = broadcast_join(rows, ranked, on=["event_type", "cents"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id").cast(pa.int64()),
                         "event_type": t.column("event_type"),
                         "cents": t.column("cents").cast(pa.int64()),
                         "drank": t.column("drank").cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def q_rank_ties(sf_dir: str):
    """RANK() (gap ranking over ties) per event_type by value cents —
    the dense_rank plan with the rank computed from the running count
    of strictly-smaller values: the (type, cents, count) distinct table
    is cardinality-bounded, ranked in a guarded one-task reduce, and
    broadcast back onto the rows (no data-scaled shuffle)."""
    from osmquadtreepostgis_ray.stages.joins import broadcast_join

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "event_type": t.column("event_type"),
                         "cents": pa.array(cents, pa.int64())})

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def counts(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["event_type", "cents"], sort=False) \
            .size().reset_index(name="cnt")
        return pa.Table.from_pandas(df, preserve_index=False)

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "cents"], sort=False, as_index=False)["cnt"].sum()
        g = g.sort_values(["event_type", "cents"], kind="stable")
        cum = g.groupby("event_type", sort=False)["cnt"].cumsum().to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        return pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                             "cents": g["cents"].to_numpy(np.int64),
                             "rnk": cum - cnt + 1})   # 1 + #smaller

    ranked = reduce_small_or_shard(
        rows.map_batches(counts, batch_format="pyarrow"),
        ["event_type"], rank_shard, shards=16)
    out = broadcast_join(rows, ranked, on=["event_type", "cents"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id").cast(pa.int64()),
                         "event_type": t.column("event_type"),
                         "cents": t.column("cents").cast(pa.int64()),
                         "rnk": t.column("rnk").cast(pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def q_lag_delta(sf_dir: str):
    """LAG window: per-user microsecond gap to the previous event in
    (ts, event_id) order — one user-sharded exchange, vectorized diff
    with cross-user boundaries dropped (first event per user emits no
    row, matching LAG IS NOT NULL)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": np.int64, "user_id": np.int64, "delta_us": np.int64}
        if not len(df):
            return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in cols.items()})
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[1:][same],
            "user_id": uid[1:][same],
            "delta_us": (ts[1:] - ts[:-1])[same]})

    return shard_apply(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], deltas)


def q_embed_calibration(sf_dir: str):
    """Per-dimension embedding calibration stats (the min/max/mean scan
    an INT8 embedding-quantization deployment runs once over the
    corpus before choosing scales): values in the house floor-1024
    fixed point (stages/cluster._quantize convention — floor, not
    round: round's half-tie resolves differently between numpy and
    DuckDB).  Per-batch (dim, n, min, max, sum) partials -> one
    dim-cardinality groupby; embedding lists never cross the shuffle."""
    from ray.data.aggregate import Max, Min, Sum

    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT

    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = t.num_rows
        if n == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "min_q": pa.array([], pa.int64()),
                             "max_q": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64())})
        flat = pc.list_flatten(t.column("embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // n
        q = (np.floor(flat * KM_SCALE).astype(np.int64) + KM_SHIFT).reshape(n, d)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "n": pa.array(np.full(d, n, np.int64), pa.int64()),
            "min_q": pa.array(q.min(axis=0), pa.int64()),
            "max_q": pa.array(q.max(axis=0), pa.int64()),
            "sum_q": pa.array(q.sum(axis=0), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("dim") \
        .aggregate(Sum("n", alias_name="n"), Min("min_q", alias_name="min_q"),
                   Max("max_q", alias_name="max_q"),
                   Sum("sum_q", alias_name="sum_q"))

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        s = t.column("sum_q").to_numpy()
        # quantized values are shifted strictly positive -> floor == trunc
        return t.append_column("mean_milli_q",
                               pa.array(1000 * s // np.maximum(n, 1), pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["dim", "n", "min_q", "max_q", "sum_q", "mean_milli_q"])


_PQ_CODEBOOKS: dict = {}


def _pq_codebooks(sf_dir: str, m: int, kc: int, iters: int):
    """Memoized PQ training: ONE shared materialized quantized corpus
    and one combiner round per Lloyd iteration covering ALL m subspaces
    (stages/cluster.pq_train) — vs m sequential kmeans runs; the tiny
    (m x kc x sd) codebook set is cached per process so embed_pq /
    embed_knn_pq / pq_recall within one session train once.  Training
    is deterministic (integer-exact, order-independent partials), so
    the cache never changes results."""
    key = (sf_dir, m, kc, iters)
    if key not in _PQ_CODEBOOKS:
        from osmquadtreepostgis_ray.stages.cluster import pq_train
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        corpus, cents = pq_train(ds, m=m, kc=kc, iters=iters)
        _PQ_CODEBOOKS[key] = cents
    return _PQ_CODEBOOKS[key]


def q_embed_pq(sf_dir: str, m: int = 4, k: int = 4, iters: int = 3):
    """Product-quantization encoding (THE embedding-compression scheme
    ANN deployments run at 100-TB scale: split each vector into m
    subspaces, k-means each subspace, store only the m small codes):
    codebooks from the single-pass multi-subspace Lloyd
    (stages/cluster.pq_train — bit-identical per subspace to
    kmeans_assign over the slice, pinned by the oracle), then ONE
    streaming assign pass emits (vec_id, subspace, cluster, d2) for
    every code — d2 is the exact per-subspace quantization error the
    recall-vs-compression tradeoff is tuned on.  Bit-stable at any
    parallelism."""
    from osmquadtreepostgis_ray.stages.cluster import _quantize, pq_assign

    cents = _pq_codebooks(sf_dir, m, k, iters)
    corpus = read_table(sf_dir, "embeddings",
                        columns=["vec_id", "embedding"]) \
        .map_batches(_quantize, batch_format="pyarrow")
    return pq_assign(corpus, cents, m)


def q_embed_knn_pq(sf_dir: str, k: int = 5, nq: int = 5, m: int = 4,
                   kc: int = 4, iters: int = 3):
    """PQ asymmetric-distance ANN (the ADC scan that makes PQ codes
    useful: per-query lookup tables against the m codebooks, corpus
    vectors scored as the SUM of m table entries — at 100 TB the scan
    touches only the m-byte codes, never the raw vectors): codebooks
    from q_embed_pq's per-subspace integer-exact Lloyd, LUT built once
    on the driver (nq x m x kc ints — fixed size), one streaming scan
    emits per-batch local top-k partials, topk_per_key sharded merge.
    Exact integers end-to-end, tie -> lowest neighbor_id."""
    import duckdb

    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    from osmquadtreepostgis_ray.util import topk_per_key

    import pyarrow.compute as pc

    cents = _pq_codebooks(sf_dir, m, kc, iters)           # [(kc, sd)] x m

    qdf = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id < {nq} ORDER BY vec_id").df()
    qids = qdf["vec_id"].to_numpy(np.int64)
    Qm = np.floor(np.stack([np.asarray(v, np.float64)
                            for v in qdf["embedding"]])
                  * KM_SCALE).astype(np.int64) + KM_SHIFT  # (nq, d)
    sd = Qm.shape[1] // m
    lut = np.stack([((Qm[:, s * sd:(s + 1) * sd][:, None, :]
                      - cents[s][None, :, :]) ** 2).sum(axis=2)
                    for s in range(m)])                    # (m, nq, kc)
    bref = ray.put((np.stack(cents), lut, qids))

    def scan(t: pa.Table) -> pa.Table:
        C, L, qi = ray.get(bref)                           # (m,kc,sd),(m,nq,kc)
        emb = t.column("embedding")
        n = t.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "approx_d2": pa.array([], pa.int64())})
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = len(flat) // n
        Q = (np.floor(flat * KM_SCALE).astype(np.int64) + KM_SHIFT) \
            .reshape(n, d)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        approx = np.zeros((len(qi), n), np.int64)          # (nq, n)
        for s in range(m):
            Qs = Q[:, s * sd:(s + 1) * sd]
            code = ((Qs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2) \
                .argmin(axis=1)                            # ties -> smallest j
            approx += L[s][:, code]
        approx = np.where(ids[None, :] == qi[:, None],
                          np.iinfo(np.int64).max, approx)
        kk = min(k, n)
        part = np.argpartition(approx, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(qi, kk), pa.int64()),
            "neighbor_id": pa.array(ids[part.ravel()], pa.int64()),
            "approx_d2": pa.array(
                np.take_along_axis(approx, part, axis=1).ravel(), pa.int64()),
        })

    partials = read_table(sf_dir, "embeddings",
                          columns=["vec_id", "embedding"]) \
        .map_batches(scan, batch_format="pyarrow")
    import pyarrow.compute as _pc
    partials = partials.map_batches(
        lambda b: b.filter(_pc.less(b.column("approx_d2"),
                                    np.iinfo(np.int64).max)),
        batch_format="pyarrow")
    return topk_per_key(partials, "query_id",
                        ["query_id", "approx_d2", "neighbor_id"],
                        [True, True, True], k,
                        ["query_id", "neighbor_id", "approx_d2"])


def q_embed_knn_quant(sf_dir: str, k: int = 5, nq: int = 5):
    """Exact brute top-k in the QUANTIZED-euclid metric (floor-1024
    fixed point) — the ground truth the PQ ADC scan is measured
    against.  Broadcast query matrix, per-batch vectorized distance
    block, local top-k partials, sharded topk_per_key merge."""
    import duckdb

    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    from osmquadtreepostgis_ray.util import topk_per_key

    qdf = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id < {nq} ORDER BY vec_id").df()
    qids = qdf["vec_id"].to_numpy(np.int64)
    Qm = np.floor(np.stack([np.asarray(v, np.float64)
                            for v in qdf["embedding"]])
                  * KM_SCALE).astype(np.int64) + KM_SHIFT
    bref = ray.put((Qm, qids))

    def scan(t: pa.Table) -> pa.Table:
        QM, qi = ray.get(bref)
        n = t.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        flat = pc.list_flatten(t.column("embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // n
        Q = (np.floor(flat * KM_SCALE).astype(np.int64) + KM_SHIFT) \
            .reshape(n, d)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        dm = ((QM[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2)  # (nq, n)
        dm = np.where(ids[None, :] == qi[:, None],
                      np.iinfo(np.int64).max, dm)
        kk = min(k, n)
        part = np.argpartition(dm, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(qi, kk), pa.int64()),
            "neighbor_id": pa.array(ids[part.ravel()], pa.int64()),
            "d2": pa.array(np.take_along_axis(dm, part, axis=1).ravel(),
                           pa.int64()),
        })

    partials = read_table(sf_dir, "embeddings",
                          columns=["vec_id", "embedding"]) \
        .map_batches(scan, batch_format="pyarrow") \
        .map_batches(lambda b: b.filter(
            pc.less(b.column("d2"), np.iinfo(np.int64).max)),
            batch_format="pyarrow")
    return topk_per_key(partials, "query_id",
                        ["query_id", "d2", "neighbor_id"],
                        [True, True, True], k,
                        ["query_id", "neighbor_id", "d2"])


def q_pq_recall(sf_dir: str, k: int = 5, nq: int = 5):
    """Recall@k of the PQ ADC scan against the exact quantized-euclid
    brute top-k — the compression-quality gate a PQ deployment tunes
    (m, kc) on.  Both inputs are nq x k by construction, so the
    per-query intersection is driver-side pandas on top-k tables."""
    adc = q_embed_knn_pq(sf_dir, k=k, nq=nq).to_pandas()
    exact = q_embed_knn_quant(sf_dir, k=k, nq=nq).to_pandas()
    hit = exact.merge(adc, on=["query_id", "neighbor_id"], how="left",
                      suffixes=("", "_a"))
    g = hit.groupby("query_id", sort=True).agg(
        n_hit=("rank_a", "count")).reset_index()
    g["recall_permille"] = (1000 * g["n_hit"].astype(np.int64)) // k
    g["n_hit"] = g["n_hit"].astype(np.int64)
    return pa.Table.from_pandas(
        g[["query_id", "n_hit", "recall_permille"]], preserve_index=False)


def q_snapshot_diff(sf_dir: str):
    """CDC diff between two table snapshots (the version audit every
    incremental-export pipeline runs; reference analog: the diff-merge
    import, /root/reference/osmquadtreepostgis/__init__.py update path):
    v_old keeps (event_id*2654435761)%10 < 8 of events, v_new keeps
    (event_id*7919)%10 < 9 with value bumped +100 cents on
    event_id%7==0 rows.  ONE typed-union FULL OUTER bucket join on the
    key; status (added/removed/changed/same) from side presence +
    value equality; absent sides emit -1 cents so every column stays
    int64 (the typed-union dtype discipline)."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])

    def mk_old(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy().astype(np.int64)
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        m = (e * 2654435761) % 10 < 8
        return pa.table({"event_id": pa.array(e[m], pa.int64()),
                         "old_cents": pa.array(cents[m], pa.int64())})

    def mk_new(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy().astype(np.int64)
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        cents = cents + np.where(e % 7 == 0, 100, 0)
        m = (e * 7919) % 10 < 9
        return pa.table({"event_id": pa.array(e[m], pa.int64()),
                         "new_cents": pa.array(cents[m], pa.int64())})

    old = ds.map_batches(mk_old, batch_format="pyarrow")
    new = ds.map_batches(mk_new, batch_format="pyarrow")
    j = bucket_hash_join(old, new, on="event_id", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        o = df["old_cents"].to_numpy(np.float64)
        n = df["new_cents"].to_numpy(np.float64)
        o_abs, n_abs = np.isnan(o), np.isnan(n)
        status = np.where(o_abs, "added",
                          np.where(n_abs, "removed",
                                   np.where(o == n, "same", "changed")))
        to_i = lambda a, absent: np.where(absent, -1,
                                          np.nan_to_num(a)).astype(np.int64)
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(np.int64), pa.int64()),
            "old_cents": pa.array(to_i(o, o_abs), pa.int64()),
            "new_cents": pa.array(to_i(n, n_abs), pa.int64()),
            "status": pa.array(status.astype(object), pa.string()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def q_outer_join(sf_dir: str):
    """FULL OUTER join of two derived per-customer aggregates (odd-key
    order counts vs %3-key cents sums — each side has keys the other
    lacks), through the typed-union single-shuffle bucket join with
    how='outer'; missing sides coalesce to 0 so every column stays
    int64 (the typed-union dtype discipline)."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def sides(t: pa.Table) -> tuple[pa.Table, pa.Table]:
        k = t.column("o_orderkey").to_numpy()
        c = t.column("o_custkey").to_numpy().astype(np.int64)
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        m1 = (k % 2) == 1
        m2 = (k % 3) == 0
        l = pd.DataFrame({"custkey": c[m1]}).groupby("custkey", as_index=False) \
            .size().rename(columns={"size": "n_odd"})
        r = pd.DataFrame({"custkey": c[m2], "cents3": cents[m2]}) \
            .groupby("custkey", as_index=False)["cents3"].sum()
        l["n_odd"] = l["n_odd"].astype(np.int64)
        return (pa.Table.from_pandas(l, preserve_index=False),
                pa.Table.from_pandas(r, preserve_index=False))

    left = sharded_agg(orders.map_batches(lambda t: sides(t)[0],
                                          batch_format="pyarrow"),
                       ["custkey"], {"n_odd": ("n_odd", "sum")})
    right = sharded_agg(orders.map_batches(lambda t: sides(t)[1],
                                           batch_format="pyarrow"),
                        ["custkey"], {"cents3": ("cents3", "sum")})
    j = bucket_hash_join(left, right, on="custkey", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table({
            "custkey": pa.array(df["custkey"].to_numpy(np.int64), pa.int64()),
            "n_odd": pa.array(np.nan_to_num(
                df["n_odd"].to_numpy(np.float64)).astype(np.int64), pa.int64()),
            "cents3": pa.array(np.nan_to_num(
                df["cents3"].to_numpy(np.float64)).astype(np.int64), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["custkey", "n_odd", "cents3"])


def q_ahash_neardup(sf_dir: str, max_hamming: int = 3, mod: int = 10):
    """Perceptual near-dup PAIRS over a deterministic 1-in-`mod` image
    sample (the sampled dedup-audit pattern): banded-hamming candidate
    buckets (pigeonhole-complete for r<=3) + exact verify, equal to the
    exhaustive self-join by construction.  Sampling bounds the
    quadratic pair output on this synthetic gradient corpus (~8
    effective hash bits — the adversarial case; see
    stages/images.ahash_neardup_pairs scale note)."""
    from osmquadtreepostgis_ray.sources.images import synth_images_batch
    from osmquadtreepostgis_ray.stages.images import ahash_neardup_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t.column("doc_id").to_numpy() % mod == 0))

    imgs = docs.map_batches(keep, batch_format="pyarrow") \
        .map_batches(synth_images_batch, batch_format="pyarrow")
    return ahash_neardup_pairs(imgs, max_hamming=max_hamming)


# --------------------------------------------------------- mixture / curation


def q_vocab_coverage(sf_dir: str, top_v: int = 20):
    """Tokenizer-prep vocabulary coverage: corpus top-`top_v` words by
    (count desc, word asc), then per-doc OOV token count + permille.

    Scale shape: word counts are combiner partials (vocab-sized per
    batch) reduced by one small groupby; only the VOCABULARY (top_v
    rows) is driver-materialized and closure-broadcast — per-doc stats
    never leave their batch.  Docs with zero tokens are absent (the
    oracle's GROUP BY can't see them either)."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.functions.tags import _tokens_of

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def wc_partial(batch: pa.Table) -> pa.Table:
        _, _, d = _tokens_of(batch.column("text"))
        if d is None:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        c = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                        minlength=len(d.dictionary))
        keep = pc.not_equal(d.dictionary, "").to_numpy(zero_copy_only=False)
        keep = np.asarray(keep, dtype=bool)
        return pa.table({"w": d.dictionary.filter(pa.array(keep)),
                         "c": pa.array(c[keep], pa.int64())})

    wc = (docs.map_batches(wc_partial, batch_format="pyarrow")
          .groupby("w").aggregate(Sum("c", alias_name="c"))).to_pandas()
    wc = wc.sort_values(["c", "w"], ascending=[False, True], kind="stable")
    vocab = pa.array(wc["w"].head(top_v).tolist(), pa.string())

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        nb = len(ids)
        _, rows, d = _tokens_of(batch.column("text"))
        if d is None:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "oov_tokens": pa.array([], pa.int64()),
                             "oov_permille": pa.array([], pa.int64())})
        codes = d.indices.to_numpy(zero_copy_only=False)
        nonempty = np.asarray(
            pc.not_equal(d.dictionary, "").to_numpy(zero_copy_only=False), bool)
        in_vocab = np.asarray(pc.is_in(d.dictionary, value_set=vocab)
                              .to_numpy(zero_copy_only=False), bool)
        tok = nonempty[codes]
        ntok = np.bincount(rows[tok], minlength=nb).astype(np.int64)
        oov = np.bincount(rows[tok & ~in_vocab[codes]],
                          minlength=nb).astype(np.int64)
        keep = ntok > 0
        permille = np.zeros(nb, np.int64)
        permille[keep] = 1000 * oov[keep] // ntok[keep]
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_tokens": pa.array(ntok[keep], pa.int64()),
                         "oov_tokens": pa.array(oov[keep], pa.int64()),
                         "oov_permille": pa.array(permille[keep], pa.int64())})

    return docs.map_batches(per_doc, batch_format="pyarrow")


def q_domain_cap(sf_dir: str, cap: int = 100):
    """Per-source document cap (the per-domain cap of web-crawl
    curation): keep the first `cap` docs per source by doc_id, emitting
    the within-source rank.  Shard by source (co-location only, rank is
    a pure function of the group) + per-shard vectorized rank —
    identical rows at any parallelism."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def capg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="stable")
        g["rk"] = (g.groupby("source", sort=False).cumcount() + 1).astype(np.int64)
        return g[g["rk"] <= cap]

    return shard_apply(docs, ["source"], capg)


def q_mixture_quotas(sf_dir: str, target: int = 1000):
    """Data-mixture allocation: per-(source, lang) sampling quotas
    proportional to group count, rounded to exactly `target` total by
    the largest-remainder method — integer-exact.  The grouped table is
    cardinality-bounded (sources x langs, NOT data-scaled), so after
    the distributed count the allocation is one worker task
    (repartition(1) — the util.reduce_small_or_shard one-task-solve
    plan; allocation needs the global total so it is not a keyed
    reduce)."""
    docs = read_table(sf_dir, "documents", columns=["source", "lang"])

    def cpart(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks may carry an EMPTY schema
            return pa.table({"source": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = (batch.to_pandas().groupby(["source", "lang"], sort=False)
             .size().reset_index(name="cnt"))
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (docs.map_batches(cpart, batch_format="pyarrow")
              .groupby(["source", "lang"]).aggregate(Sum("cnt", alias_name="cnt")))

    def alloc(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        total = int(df["cnt"].sum())
        df["base"] = (target * df["cnt"]) // total
        rem = (target * df["cnt"]) % total
        order = df.assign(rem=rem).sort_values(
            ["rem", "source", "lang"], ascending=[False, True, True],
            kind="stable").index
        extra = target - int(df["base"].sum())
        bump = pd.Series(np.arange(len(df)) < extra, index=order)
        df["quota"] = (df["base"] + bump.reindex(df.index).astype(np.int64))
        df = df.sort_values(["source", "lang"], kind="stable")
        out = df[["source", "lang", "cnt", "quota"]].copy()
        out["quota"] = out["quota"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return counts.repartition(1).map_batches(alloc, batch_format="pyarrow",
                                             batch_size=None)


def q_retention(sf_dir: str):
    """Cohort retention matrix: users bucketed by their FIRST active
    day; for each (cohort_day, day_offset) the count of users active
    again that day — the activation/retention analysis every
    large-scale event pipeline runs.

    Plan: per-batch distinct (user, day) pairs (combiner dedup), ONE
    user-sharded pass computing each user's cohort + offsets (all a
    user's days co-located; per-shard counts are disjoint partials),
    then a guarded reduce over the cardinality-BOUNDED (days x days)
    matrix.  No data-scaled join: the cohort join-back happens inside
    the shard."""
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    DAY_US = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "day": t.column("ts").cast(pa.int64()).to_numpy() // DAY_US,
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"]) \
             .sort_values(["user_id", "day"], kind="stable")
        first = g.groupby("user_id", sort=False)["day"].transform("min")
        out = pd.DataFrame({
            "cohort_day": first.to_numpy(np.int64),
            "day_offset": (g["day"] - first).to_numpy(np.int64)})
        return (out.groupby(["cohort_day", "day_offset"], sort=False)
                .size().reset_index(name="users").astype(np.int64))

    partials = shard_apply(ds.map_batches(pairs, batch_format="pyarrow"),
                           ["user_id"], per_user)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["cohort_day", "day_offset"], sort=False)["users"]
               .sum().reset_index())
        return out.astype(np.int64)

    return reduce_small_or_shard(partials, ["cohort_day", "day_offset"], total)


def q_funnel(sf_dir: str):
    """Ordered funnel completion (signup -> view -> click -> purchase):
    per step, the number of users whose first qualifying event strictly
    follows their previous step's time.  ONE user-sharded pass — each
    step is a vectorized per-user min over the co-located shard; the
    driver sees only 4-row partials per shard (bounded)."""
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    STEPS = ("signup", "view", "click", "purchase")

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t.column("user_id"),
                         "ts": t.column("ts").cast(pa.int64()),
                         "event_type": t.column("event_type")})

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        reach = np.zeros(len(STEPS), np.int64)
        prev = None  # Series: user -> time of previous step
        for i, typ in enumerate(STEPS):
            d = g[g["event_type"] == typ]
            if prev is not None:
                p = d["user_id"].map(prev)
                d = d[d["ts"] > p.fillna(np.iinfo(np.int64).max)]
            cur = d.groupby("user_id")["ts"].min()
            reach[i] = len(cur)
            prev = cur
        return pd.DataFrame({"step": np.arange(1, len(STEPS) + 1, dtype=np.int64),
                             "users": reach})

    partials = shard_apply(ds.map_batches(to_us, batch_format="pyarrow"),
                           ["user_id"], funnel)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("step", sort=False)["users"].sum().reset_index()
                .astype(np.int64))

    return reduce_small_or_shard(partials, ["step"], total)


def q_mixture_sample(sf_dir: str, target: int = 1000):
    """Materialize the data mixture: per (source, lang) keep the first
    quota_g docs by doc_id, quotas from q_mixture_quotas (exact
    largest-remainder).  The quota table is cardinality-bounded, so it
    broadcasts via the UDF closure; the doc stream is group-sharded and
    ranked vectorized (the domain_cap pattern with per-group caps)."""
    quotas = q_mixture_quotas(sf_dir, target).to_pandas()[
        ["source", "lang", "quota"]]
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def samp(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "lang", "doc_id"], kind="stable")
        g["rk"] = (g.groupby(["source", "lang"], sort=False).cumcount() + 1) \
            .astype(np.int64)
        m = g.merge(quotas, on=["source", "lang"], how="left")
        # left-join NaN floats the int column (CLAUDE.md) — cast back
        m["quota"] = m["quota"].fillna(0).astype(np.int64)
        return m[m["rk"] <= m["quota"]][["doc_id", "source", "lang", "rk"]]

    return shard_apply(docs, ["source", "lang"], samp)


def q_cluster_dedup_sample(sf_dir: str):
    """Canonical-representative selection — the step AFTER near-dup
    clustering: keep exactly one doc per near-dup component (its min
    doc_id == the component label) plus every isolated doc.  Reps are a
    zero-copy projection of the component table (components are labeled
    by their min member); isolated docs come from an exact bucket ANTI
    join of the corpus against the clustered node set — no driver-side
    membership state."""
    from osmquadtreepostgis_ray.stages.cluster import connected_components
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        a1 = ids[ids % 7 < 3]
        a2 = ids[(ids % 11 == 0) & (ids > 0)]
        return pa.table({"a": pa.array(np.r_[a1, a2], pa.int64()),
                         "b": pa.array(np.r_[a1 + 1, a2 // 2], pa.int64())})

    cc = connected_components(docs.map_batches(edges, batch_format="pyarrow"))
    cc = cc.materialize()  # consumed twice (reps + anti probe): pin the fork

    def reps(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        comp = t.column("component") if "component" in t.column_names \
            else pa.chunked_array([pa.array([], pa.int64())])
        return pa.table({"doc_id": pc.unique(comp)})

    rep_ds = cc.map_batches(reps, batch_format="pyarrow")

    def node_key(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": t.column("node")})

    isolated = bucket_semi_join(
        docs, cc.map_batches(node_key, batch_format="pyarrow"),
        on="doc_id", anti=True)

    def dedup_ids(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_id"])

    # reps can repeat across blocks (component spans blocks) — one
    # sharded distinct, then the isolated stream unions in (disjoint)
    return shard_apply(rep_ds, ["doc_id"], dedup_ids).union(isolated)


def q_epoch_shuffle(sf_dir: str, seed: int = 1):
    """Deterministic epoch shuffle — the training-data ordering op: every
    doc gets a global 0-based position in seeded pseudo-random order
    (h = (doc_id * PHASH_MULT + seed) % PHASH_MOD, ties broken by
    doc_id; the product stays in int64 for doc_id < 3.4e9 — same
    domain note as geotag.phash_of).  One distributed sort + the
    per-block prefix-rank finish (stages/window.keyed_row_number) — the
    driver sees only per-block counts, never rows.  Same seed -> same
    order at any parallelism; a new seed reshuffles every epoch."""
    from osmquadtreepostgis_ray.functions.geotag import PHASH_MOD, PHASH_MULT
    from osmquadtreepostgis_ray.stages.window import keyed_row_number

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        h = (ids * PHASH_MULT + seed) % PHASH_MOD
        return pa.table({"g": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
                         "doc_id": t.column("doc_id"),
                         "h": pa.array(h, pa.int64())})

    ranked, _ = keyed_row_number(docs.map_batches(key, batch_format="pyarrow"),
                                 ["g"], ["h", "doc_id"], rank_col="pos")
    return ranked.select_columns(["doc_id", "pos"])


# --------------------------------------------- road-network raster/match ops

DENSIFY_K = 8            # interpolation steps per segment
RASTER_N = 64            # 64x64 density raster (the q_thin grid)
MM_GID_MOD = 101         # road subsample: 1 in 101 way chains
MM_EVENT_MOD = 10        # GPS-trace sample: 1 in 10 events
MM_RID_W = 16            # rid = seg_id * 16 + j (j <= DENSIFY_K < 16)


def _densify(t: pa.Table, k: int) -> pa.Table:
    """Segments -> k+1 interpolated points each (1->N explode).  Exact
    integer interpolation px = (x1*(k-j) + x2*j) // k with EVERY operand
    non-negative (milli coords >= 0), so numpy's floor `//` equals
    DuckDB's truncating `//` (the CLAUDE.md shared-division rule)."""
    if t.num_rows == 0:
        return pa.table({"seg_id": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "px": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64())})
    x1 = t.column("x1").to_numpy(); x2 = t.column("x2").to_numpy()
    y1 = t.column("y1").to_numpy(); y2 = t.column("y2").to_numpy()
    sid = t.column("seg_id").to_numpy()
    idx = np.repeat(np.arange(t.num_rows), k + 1)
    j = np.tile(np.arange(k + 1, dtype=np.int64), t.num_rows)
    px = (x1[idx] * (k - j) + x2[idx] * j) // k
    py = (y1[idx] * (k - j) + y2[idx] * j) // k
    return pa.table({"seg_id": pa.array(sid[idx], pa.int64()),
                     "j": pa.array(j, pa.int64()),
                     "px": pa.array(px, pa.int64()),
                     "py": pa.array(py, pa.int64())})


def _densify_k(t: pa.Table) -> pa.Table:
    return _densify(t, DENSIFY_K)


def q_densify(sf_dir: str):
    """Polyline densification / resampling (the vector-tile and
    map-matching preprocessing step; reference analog: the node
    interpolation inside oqt's simplification, SURVEY.md §2.3 F10):
    each way segment explodes into DENSIFY_K+1 points at exact integer
    fractions.  Row-pure after the shared way_segments derivation — no
    extra shuffle."""
    return way_segments(sf_dir).map_batches(_densify_k, batch_format="pyarrow")


def q_line_raster(sf_dir: str):
    """Line rasterization (road-density raster — the raster<->vector
    direction the north rule names): each segment marks the RASTER_N^2
    grid cells its densified points visit; output = per-cell count of
    DISTINCT segments.  The per-batch distinct is globally correct by
    construction: one segment's densified points are emitted inside the
    single batch that carries the segment row, so a (seg, cell) pair can
    never recur across batches; the shuffle then carries bounded
    (cell, n) partials (<= RASTER_N^2 per batch), never points."""
    def cells(t: pa.Table) -> pa.Table:
        d = _densify(t, DENSIFY_K)
        if d.num_rows == 0:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        cx = d.column("px").to_numpy() * RASTER_N // geotag.LON_MOD
        cy = (d.column("py").to_numpy() + 5000) * RASTER_N // 180000
        df = pd.DataFrame({"seg_id": d.column("seg_id").to_numpy(),
                           "cx": cx, "cy": cy}).drop_duplicates()
        g = df.groupby(["cx", "cy"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = way_segments(sf_dir).map_batches(cells, batch_format="pyarrow")
    return sharded_agg(part, ["cx", "cy"], {"n": ("n", "sum")}) \
        .select_columns(["cx", "cy", "n"])


def q_map_match(sf_dir: str):
    """Map matching (snap GPS samples to the nearest road point — the
    trajectory-to-network join every mobility pipeline runs): the road
    side is the MM_GID_MOD-subsampled way network densified at
    DENSIFY_K (at real scale the road network is a FIXED small input
    table — the classic broadcast side; here it derives from the corpus
    so its size is documented as the broadcast bound), sorted by rid
    and broadcast once via ray.put; each sampled-event batch computes
    exact int64 squared distances in rid-ordered chunks (bounded
    batch x chunk temporaries) keeping a running argmin — ties resolve
    to the smallest rid because chunks arrive rid-ascending and updates
    require a STRICT improvement.  No shuffle at all: one streaming
    pass over events."""
    def road_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        keep = t.column("gid").to_numpy() % MM_GID_MOD == 0
        return t.filter(pa.array(keep))

    roads = way_segments(sf_dir) \
        .map_batches(road_filter, batch_format="pyarrow") \
        .map_batches(_densify_k, batch_format="pyarrow")
    tabs = [t for t in ray.get(roads.to_arrow_refs()) if t.num_rows]
    rt = pa.concat_tables(tabs)
    rid = rt.column("seg_id").to_numpy() * MM_RID_W + rt.column("j").to_numpy()
    order = np.argsort(rid, kind="stable")
    rid = np.ascontiguousarray(rid[order])
    rpx = np.ascontiguousarray(rt.column("px").to_numpy()[order])
    rpy = np.ascontiguousarray(rt.column("py").to_numpy()[order])
    ref = ray.put((rid, rpx, rpy))

    def match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "rid": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        rid_, rpx_, rpy_ = ray.get(ref)
        eid = t.column("event_id").to_numpy()
        keep = eid % MM_EVENT_MOD == 0
        eid = eid[keep]
        ex = t.column("lon_milli").to_numpy()[keep]
        ey = t.column("lat_milli").to_numpy()[keep]
        best = np.full(len(eid), np.iinfo(np.int64).max, np.int64)
        bid = np.zeros(len(eid), np.int64)
        for lo in range(0, len(rid_), 1024):
            dx = ex[:, None] - rpx_[None, lo:lo + 1024]
            dy = ey[:, None] - rpy_[None, lo:lo + 1024]
            d2 = dx * dx + dy * dy
            jm = d2.argmin(axis=1)          # first occurrence = lowest rid
            dm = d2[np.arange(len(eid)), jm]
            upd = dm < best                 # strict: earlier chunks win ties
            best[upd] = dm[upd]
            bid[upd] = rid_[lo + jm[upd]]
        return pa.table({"event_id": pa.array(eid, pa.int64()),
                         "rid": pa.array(bid, pa.int64()),
                         "d2": pa.array(best, pa.int64())})

    return prep_events(sf_dir).map_batches(match, batch_format="pyarrow",
                                           batch_size=8192)


def q_geohash(sf_dir: str):
    """Geohash-4 cell counts (the interop spatial key — see
    functions/geohash.py): combiner per-batch distinct-geohash counts,
    one bounded (<= 2^20 cells) sharded sum.  The string render happens
    AFTER the per-batch distinct, so string work is cell-bounded."""
    def part(t: pa.Table) -> pa.Table:
        code = geohash.encode_codes(t.column("lon_milli").to_numpy(),
                                    t.column("lat_milli").to_numpy())
        u, c = np.unique(code, return_counts=True)
        return pa.table({"gh": pa.array(geohash.render(u), pa.string()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    part_ds = prep_events(sf_dir).map_batches(part, batch_format="pyarrow")
    return sharded_agg(part_ds, ["gh"], {"n": ("n", "sum")}) \
        .select_columns(["gh", "n"])


# -------------------------------------------------- pixel-statistics ops

def q_pixel_hist(sf_dir: str):
    """Dataset-wide decoded-pixel histogram per codec format (the
    exposure/brightness profile a vision-data audit reports): decode ->
    bounded (fmt, bin, n) partials per batch (pixels never cross the
    shuffle) -> one 2 x 16-row grouped sum."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import pixel_hist_partial

    part = read_images(sf_dir, with_bytes=True).map_batches(
        pixel_hist_partial, batch_format="pyarrow", batch_size=IMG_BATCH)
    return sharded_agg(part, ["fmt", "bin"], {"n": ("n", "sum")}) \
        .select_columns(["fmt", "bin", "n"])


def q_glcm(sf_dir: str):
    """Horizontal gray-level co-occurrence matrix per format (GLCM —
    the classic texture descriptor; screening input for synthetic /
    flat-texture image detection): decode -> bounded (fmt, la, lb, n)
    partials -> one 2 x 16-row grouped sum."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import glcm_partial

    part = read_images(sf_dir, with_bytes=True).map_batches(
        glcm_partial, batch_format="pyarrow", batch_size=IMG_BATCH)
    return sharded_agg(part, ["fmt", "la", "lb"], {"n": ("n", "sum")}) \
        .select_columns(["fmt", "la", "lb", "n"])


def q_codec_sse(sf_dir: str):
    """Per-image codec squared error vs clean reference pixels (the
    PSNR audit behind the BASELINE.json decoded-pixel invariant,
    reported as exact integers: PSNR_dB = 10*log10(255^2*n_px/sse) is
    derivable but floats never cross engines).  Row-pure decode +
    diff; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import codec_sse_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        codec_sse_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_dup_frames(sf_dir: str):
    """Consecutive-frame change screening over the synthetic videos
    (static/duplicate frame detection — the video-dedup primitive):
    per (video, frame f) the count of pixels whose |delta| to frame
    f+1 exceeds FRAMEDIFF_T.  Row-pure per video; no shuffle."""
    from osmquadtreepostgis_ray.stages.images import (frame_diff_batch,
                                                      synth_videos_batch)

    vids = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth_videos_batch, batch_format="pyarrow")
    return vids.map_batches(frame_diff_batch, batch_format="pyarrow",
                            batch_size=IMG_BATCH)


# --------------------------------------- stream-window / LM / k-core ops

LATE_DELAY_US = 14_400_000_000   # per-event delivery delay < 4 hours
LATE_THRESH_US = 3_600_000_000   # watermark lateness threshold: 1 hour


def _arrival_of(event_id: np.ndarray, ts_us: np.ndarray) -> np.ndarray:
    """Synthetic arrival time: event time plus a bounded pseudo-random
    delivery delay (< LATE_DELAY_US) — the out-of-order ingest shape
    watermark logic exists for.  TIME-based so the disorder rate is
    scale-free (a positional jitter stops producing same-user
    inversions as the user count grows — measured 156 late rows at
    sf0.01 but ZERO at sf0.1).  Pure function of the row; products stay
    in int64 for event_id < 3.4e9 (the geotag.phash_of domain note)."""
    e = np.asarray(event_id, np.int64)
    return np.asarray(ts_us, np.int64) \
        + (e * geotag.PHASH_MULT + 7) % LATE_DELAY_US


def q_late_events(sf_dir: str):
    """Late-data detection (the watermark primitive of every streaming
    ingest): per user, in synthetic ARRIVAL order, an event is late by
    (running max event-time of prior arrivals - its event-time); emit
    events more than LATE_THRESH_US late.  One user-sharded exchange;
    running max is a vectorized accumulate."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def epoch(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64())})

    def late(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("event_id", "user_id", "late_by_us")})
        g = g.assign(arr=_arrival_of(g["event_id"].to_numpy(),
                                     g["ts_us"].to_numpy())) \
            .sort_values(["user_id", "arr", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        tu = g["ts_us"].to_numpy(np.int64)
        # per-user running max (C-level grouped cummax), then a global
        # one-row shift; the shifted value at each group FIRST row
        # belongs to the previous user but is masked out below
        cm = g.groupby("user_id", sort=False)["ts_us"].cummax() \
            .to_numpy(np.int64)
        prior = np.r_[np.int64(0), cm[:-1]]
        is_first = np.r_[True, u[1:] != u[:-1]]
        late_by = prior - tu
        keep = (~is_first) & (late_by > LATE_THRESH_US)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64)[keep],
                             "user_id": u[keep],
                             "late_by_us": late_by[keep]})

    part = ds.map_batches(epoch, batch_format="pyarrow")
    return shard_apply(part, ["user_id"], late)


def q_moving_window(sf_dir: str):
    """Row-frame moving aggregate (ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW) of value cents per user in (ts, event_id) order — the
    fixed-width smoothing window (the RANGE-frame sibling is
    q_window_sliding).  One user-sharded exchange; the window is a
    cumsum difference with a group-start clamp, exact int64 (sum and
    count emitted, never a float mean)."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts_us": t.column("ts").cast(pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    def win(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("event_id", "w3_sum_cents", "w3_n")})
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        v = g["cents"].to_numpy(np.int64)
        firsts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        gid = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        pos = np.arange(len(u)) - firsts[gid]
        cs = np.cumsum(v)
        lo = np.arange(len(u)) - np.minimum(pos, 2)   # window start index
        s = cs - cs[lo] + v[lo]
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "w3_sum_cents": s,
                             "w3_n": np.minimum(pos + 1, 3).astype(np.int64)})

    part = ds.map_batches(prep, batch_format="pyarrow")
    return shard_apply(part, ["user_id"], win)


def q_lm_score(sf_dir: str):
    """Bigram language-model predictability scoring (the KenLM-shaped
    corpus-fluency quality signal, integer-exact): pass 1 counts corpus
    word bigrams (combiner partials -> one vocab^2-bounded grouped sum
    — at open-web scale this table is capped to top-B bigrams, the
    count-min/top-k variant; here the synthetic vocab keeps it tiny);
    pass 2 broadcasts the sorted (hash, count) arrays once and scores
    each doc as the sum of corpus counts of its adjacent word pairs —
    per-doc work never leaves the batch.  score_centi = 100*mass //
    n_pairs (non-negative operands)."""
    from osmquadtreepostgis_ray.functions.text import \
        word_ngram_segments_nopad_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bg_partial(t: pa.Table) -> pa.Table:
        gh, _seg, _per = word_ngram_segments_nopad_batch(t.column("text"), n=2)
        u, c = np.unique(gh, return_counts=True)
        return pa.table({"g": pa.array(u.view(np.int64), pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    bc = sharded_agg(docs.map_batches(bg_partial, batch_format="pyarrow"),
                     ["g"], {"c": ("c", "sum")}).to_pandas()
    gu = bc["g"].to_numpy(np.int64).view(np.uint64)
    order = np.argsort(gu)
    ref = ray.put((np.ascontiguousarray(gu[order]),
                   np.ascontiguousarray(bc["c"].to_numpy(np.int64)[order])))

    def score(t: pa.Table) -> pa.Table:
        gs, cs = ray.get(ref)
        ids = t.column("doc_id").to_numpy()
        gh, seg, per = word_ngram_segments_nopad_batch(t.column("text"), n=2)
        mass = np.zeros(len(ids), np.int64)
        if len(gh):
            cnt = cs[np.searchsorted(gs, gh)]   # every gram is in the table
            np.add.at(mass, seg, cnt)
        per = per.astype(np.int64)
        sc = np.where(per > 0, (100 * mass) // np.maximum(per, 1), 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_pairs": pa.array(per, pa.int64()),
                         "mass": pa.array(mass, pa.int64()),
                         "score_centi": pa.array(sc, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


KCORE_K = 2
KCORE_ROUNDS = 8


def q_kcore(sf_dir: str):
    """k-core decomposition (k=2) of the gapped-chain + chord document
    graph — the graph-degeneracy screen (spam rings / dedup clusters
    live in dense cores): path edges (d-1, d) except every 5th (the gap
    makes the peel non-trivial), chord edges (d-2, d) for (d-2)%3=0.
    Peel depth is structurally bounded by the gap spacing, so the
    KCORE_ROUNDS cap (and the SQL twin's unroll) is a graph invariant,
    not a tuning knob.  One edge materialization; each round is one
    broadcast edge pass, zero shuffles (stages/graph.kcore_peel)."""
    from osmquadtreepostgis_ray.stages.graph import kcore_peel

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        d1 = ids[(ids >= 1) & (ids % 5 != 0)]
        d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
        a = np.concatenate([d1 - 1, d2 - 2])
        b = np.concatenate([d1, d2])
        return pa.table({"src": pa.array(np.r_[a, b], pa.int64()),
                         "dst": pa.array(np.r_[b, a], pa.int64())})

    return kcore_peel(docs.map_batches(edges, batch_format="pyarrow"),
                      k=KCORE_K, max_rounds=KCORE_ROUNDS)


# --------------------------------------- trajectory similarity / MMR ops

TRAJ_MOD = 13         # trajectory sample: 1 user in 13


def q_traj_hausdorff(sf_dir: str):
    """Trajectory-similarity join: directed Hausdorff distance (squared,
    exact int64) between every ordered pair of SAMPLED users' point
    sets — h2(a,b) = max over a's points of min over b's points of d².
    The sampled point set (bounded by the TRAJ_MOD rate — the
    trajectory-clustering working set every mobility pipeline bounds
    before an all-pairs step) broadcasts once sorted by user; each
    event batch computes min-d² blocks in user-boundary-aligned column
    chunks (np.minimum.reduceat) and emits (ua, ub, partial-max) rows;
    one sharded max finishes.  Max decomposes over a's points, so
    per-batch partials are globally correct."""
    def sample_geo(t: pa.Table) -> pa.Table:
        # lean geotag-only prep: the full prep_events cell/tile/degree
        # enrichment is dead weight here (halved the sf0.1 wall time)
        u = t.column("user_id").to_numpy()
        e = t.column("event_id").to_numpy()
        keep = u % TRAJ_MOD == 0
        u, e = u[keep], e[keep]
        lon_m, lat_m = geotag.event_lonlat_milli(u, e)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "lon_milli": pa.array(lon_m, pa.int64()),
                         "lat_milli": pa.array(lat_m, pa.int64())})

    samp = read_table(sf_dir, "events", columns=["event_id", "user_id"]) \
        .map_batches(sample_geo, batch_format="pyarrow").materialize()
    tabs = [t for t in ray.get(samp.to_arrow_refs())
            if t.num_rows and "user_id" in t.column_names]
    bu = np.concatenate([t.column("user_id").to_numpy() for t in tabs])
    bx = np.concatenate([t.column("lon_milli").to_numpy() for t in tabs])
    by = np.concatenate([t.column("lat_milli").to_numpy() for t in tabs])
    order = np.argsort(bu, kind="stable")
    bu, bx, by = bu[order], bx[order], by[order]
    ustarts = np.flatnonzero(np.r_[True, bu[1:] != bu[:-1]])
    uids = bu[ustarts]                      # sorted distinct sampled users
    ref = ray.put((np.ascontiguousarray(bx), np.ascontiguousarray(by),
                   ustarts.astype(np.int64), uids.astype(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ua": pa.array([], pa.int64()),
                             "ub": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64())})
        rbx, rby, rstarts, ruids = ray.get(ref)
        au = t.column("user_id").to_numpy()
        ax = t.column("lon_milli").to_numpy()
        ay = t.column("lat_milli").to_numpy()
        m = len(au)
        nb = len(ruids)
        minb = np.empty((m, nb), np.int64)
        bounds = np.r_[rstarts, len(rbx)]
        # user-boundary-aligned column chunks bound the d2 temporary;
        # in-place squares (the zone_distance lesson: materialized
        # contiguous temps + in-place ops, no broadcast-view ufuncs)
        CH = 32                              # users per chunk
        for lo in range(0, nb, CH):
            hi = min(lo + CH, nb)
            s, e = bounds[lo], bounds[hi]
            d2 = ax[:, None] - rbx[None, s:e]
            d2 *= d2
            dy = ay[:, None] - rby[None, s:e]
            dy *= dy
            d2 += dy
            minb[:, lo:hi] = np.minimum.reduceat(d2, bounds[lo:hi] - s,
                                                 axis=1)
        ua_u, inv = np.unique(au, return_inverse=True)
        h2 = np.full((len(ua_u), nb), np.int64(-1))
        np.maximum.at(h2, inv, minb)
        ii, jj = np.nonzero(ua_u[:, None] != ruids[None, :])
        return pa.table({"ua": pa.array(ua_u[ii], pa.int64()),
                         "ub": pa.array(ruids[jj], pa.int64()),
                         "h2": pa.array(h2[ii, jj], pa.int64())})

    part = samp.map_batches(partial, batch_format="pyarrow",
                            batch_size=2048)
    return sharded_agg(part, ["ua", "ub"], {"h2": ("h2", "max")}) \
        .select_columns(["ua", "ub", "h2"])


MMR_K = 5
MMR_QID = 0


def q_mmr_select(sf_dir: str):
    """Maximal-marginal-relevance data selection (the diversity-aware
    top-k a curated fine-tuning set is drawn with): greedily pick
    MMR_K vectors minimizing d2(query) - min d2(selected) — relevance
    minus redundancy, all in the floor-1024 quantized integer space of
    the kmeans/PQ family (no float scores cross engines; ties to the
    smallest vec_id).  Each step is ONE streaming pass over the
    materialized quantized corpus: per-block argmin partials (a 1-row
    table per block), driver picks the global min; the <=K selected
    vectors broadcast per step via ray.put."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        flat = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        q = (np.floor(flat.astype(np.float64) * KM_SCALE).astype(np.int64)
             + KM_SHIFT)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "q": pa.array(list(q), pa.list_(pa.int64()))})

    qds = emb.map_batches(quant, batch_format="pyarrow").materialize()
    refs = [r for r in qds.to_arrow_refs()]

    @ray.remote
    def qvec_of(tab: pa.Table, qid: int):
        if tab.num_rows == 0 or "vec_id" not in tab.column_names:
            return None
        ids = tab.column("vec_id").to_numpy()
        hit = np.flatnonzero(ids == qid)
        if not len(hit):
            return None
        return np.asarray(tab.column("q")[int(hit[0])].as_py(), np.int64)

    qvec = next(v for v in ray.get([qvec_of.remote(r, MMR_QID) for r in refs])
                if v is not None)

    @ray.remote
    def step_argmin(tab: pa.Table, state) -> tuple:
        qv, sel_ids, sel_vecs = state
        if tab.num_rows == 0 or "vec_id" not in tab.column_names:
            return None
        ids = tab.column("vec_id").to_numpy()
        v = np.stack(tab.column("q").to_numpy(zero_copy_only=False)).astype(np.int64)
        d = v - qv[None, :]
        d2q = (d * d).sum(axis=1)
        if len(sel_vecs):
            dd = v[:, None, :] - sel_vecs[None, :, :]
            mind = (dd * dd).sum(axis=2).min(axis=1)
        else:
            mind = np.zeros(len(ids), np.int64)
        score = d2q - mind
        keep = (ids != MMR_QID) & ~np.isin(ids, sel_ids)
        if not keep.any():
            return None
        ki = np.flatnonzero(keep)
        order = np.lexsort((ids[ki], score[ki]))
        b = ki[order[0]]
        return int(score[b]), int(ids[b]), v[b]

    sel_ids: list[int] = []
    sel_vecs = np.empty((0, len(qvec)), np.int64)
    for _step in range(MMR_K):
        sref = ray.put((qvec, np.array(sel_ids, np.int64), sel_vecs))
        cands = [c for c in ray.get([step_argmin.remote(r, sref)
                                     for r in refs]) if c is not None]
        cands.sort(key=lambda c: (c[0], c[1]))
        _sc, vid, vec = cands[0]
        sel_ids.append(vid)
        sel_vecs = np.vstack([sel_vecs, vec[None, :]])
    return pa.table({"step": pa.array(np.arange(1, MMR_K + 1), pa.int64()),
                     "vec_id": pa.array(sel_ids, pa.int64())})


# --------------------------------------- per-image binarization ops

def q_otsu(sf_dir: str):
    """Per-image Otsu auto-threshold over the 16-bin decoded histogram
    (the binarization screen for mask/OCR curation).  Row-pure decode +
    vectorized per-group histogram/argmax (stages/images.otsu_batch);
    no shuffle — output is one 3-int row per image."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import otsu_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        otsu_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_morphology(sf_dir: str):
    """Per-image 3x3 binary erosion/dilation counts on the p >= 128
    mask (mask-cleanup audit: speckle kill + pinhole close).  Row-pure
    padded 9-shift min/max per (fmt, dims) group
    (stages/images.morph_batch); no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import morph_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        morph_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_blobs(sf_dir: str):
    """Per-image blob statistics (4-connected components of the bright
    p >= 208 mask — the watermark/bright-spot screen): Jacobi min-label
    propagation inside the batch UDF with a structural round bound
    (stages/images.blob_batch); row-pure, no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import blob_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        blob_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


# --------------------------------------- hex smoothing / point-pattern ops

# ring-1 neighbor offsets (di, dj) per row parity for the odd-r offset
# lattice of q_hex_bin (odd rows shifted +C/2): self + 6 hex neighbors
HEXRING_OFF = {0: ((0, 0), (-1, 0), (1, 0), (-1, -1), (0, -1), (-1, 1), (0, 1)),
               1: ((0, 0), (-1, 0), (1, 0), (0, -1), (1, -1), (0, 1), (1, 1))}


def q_hex_ring(sf_dir: str):
    """Hex ring-1 smoothing (the H3 kRing hotspot-smoothing primitive):
    each hex cell's smoothed count = sum of raw counts over itself and
    its 6 lattice neighbors.  Each aggregated cell SCATTERS its count to
    its ring (7 emits, parity-dependent offsets, lattice-bounds filter)
    — receiving cells with zero raw count appear naturally; one
    cell-cardinality sharded sum finishes."""
    def scatter(t: pa.Table) -> pa.Table:
        hid = t.column("hex_id").to_numpy()
        nn = t.column("n").to_numpy()
        j = hid // HEX_NCOLS
        i = hid % HEX_NCOLS
        oid, on = [], []
        for par in (0, 1):
            pm = (j % 2) == par
            if not pm.any():
                continue
            ip, jp, np_ = i[pm], j[pm], nn[pm]
            for di, dj in HEXRING_OFF[par]:
                ni = ip + di
                nj = jp + dj
                ok = (ni >= 0) & (ni < HEX_NCOLS) & (nj >= 0)
                oid.append(nj[ok] * HEX_NCOLS + ni[ok])
                on.append(np_[ok])
        cat = (lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64))
        return pa.table({"hex_id": pa.array(cat(oid), pa.int64()),
                         "sm_n": pa.array(cat(on), pa.int64())})

    part = q_hex_bin(sf_dir).map_batches(scatter, batch_format="pyarrow")
    return sharded_agg(part, ["hex_id"], {"sm_n": ("sm_n", "sum")}) \
        .select_columns(["hex_id", "sm_n"])


RIPLEY_MOD = 7                          # point-pattern sample: 1 user in 7
RIPLEY_R = (2_000, 5_000, 10_000)       # radii in milli-degrees


def q_ripley_k(sf_dir: str):
    """Ripley's K pair counts (the point-pattern clustering statistic —
    CSR deviation screening for geotag quality audits): for each radius
    r, the number of ORDERED pairs of distinct sampled events with
    d2 <= r2, exact int64.  The sampled set broadcasts once (bounded by
    RIPLEY_MOD); each batch counts its pairs against the broadcast in
    column chunks; output is len(RIPLEY_R) rows after a tiny sharded
    sum.  Self-pairs are removed as a COUNT (one per batch point per
    radius), never materialized."""
    def sample_geo(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        e = t.column("event_id").to_numpy()
        keep = u % RIPLEY_MOD == 0
        u, e = u[keep], e[keep]
        lon_m, lat_m = geotag.event_lonlat_milli(u, e)
        return pa.table({"lon_milli": pa.array(lon_m, pa.int64()),
                         "lat_milli": pa.array(lat_m, pa.int64())})

    samp = read_table(sf_dir, "events", columns=["event_id", "user_id"]) \
        .map_batches(sample_geo, batch_format="pyarrow").materialize()
    tabs = [t for t in ray.get(samp.to_arrow_refs())
            if t.num_rows and "lon_milli" in t.column_names]
    bx = np.concatenate([t.column("lon_milli").to_numpy() for t in tabs])
    by = np.concatenate([t.column("lat_milli").to_numpy() for t in tabs])
    ref = ray.put((np.ascontiguousarray(bx), np.ascontiguousarray(by)))
    r2s = np.array([r * r for r in RIPLEY_R], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        rbx, rby = ray.get(ref)
        ax = t.column("lon_milli").to_numpy()
        ay = t.column("lat_milli").to_numpy()
        m = len(ax)
        counts = np.zeros(len(r2s), np.int64)
        CH = 4096                        # broadcast-side chunk: m x CH temps
        for lo in range(0, len(rbx), CH):
            d2 = ax[:, None] - rbx[None, lo:lo + CH]
            d2 *= d2
            dy = ay[:, None] - rby[None, lo:lo + CH]
            dy *= dy
            d2 += dy
            for k, r2 in enumerate(r2s):
                counts[k] += int((d2 <= r2).sum())
        counts -= m                      # each batch point's self-pair
        return pa.table({"r": pa.array(np.array(RIPLEY_R, np.int64)),
                         "n_pairs": pa.array(counts, pa.int64())})

    part = samp.map_batches(partial, batch_format="pyarrow",
                            batch_size=4096)
    return sharded_agg(part, ["r"], {"n_pairs": ("n_pairs", "sum")}) \
        .select_columns(["r", "n_pairs"])


# --------------------------------------- network distance / proximity ops

SSSP_SRC_MOD = 50       # BFS sources: doc_id % 50 == 0 (the depot set)
SSSP_ROUNDS = 16        # measured max 9 rounds at sf0.1; structural slack


def q_sssp_hops(sf_dir: str):
    """Multi-source BFS hop distance to the nearest depot (doc_id %
    SSSP_SRC_MOD == 0) over the gapped-chain + chord document graph —
    the isochrone/service-area primitive.  kcore's broadcast-rounds
    plan: one edge materialization, one zero-shuffle edge pass per
    round, raises past SSSP_ROUNDS (stages/graph.bfs_hops); components
    without a depot are unreachable and dropped on both engines."""
    from osmquadtreepostgis_ray.stages.graph import bfs_hops

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        d1 = ids[(ids >= 1) & (ids % 5 != 0)]
        d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
        a = np.concatenate([d1 - 1, d2 - 2])
        b = np.concatenate([d1, d2])
        return pa.table({"src": pa.array(np.r_[a, b], pa.int64()),
                         "dst": pa.array(np.r_[b, a], pa.int64())})

    return bfs_hops(docs.map_batches(edges, batch_format="pyarrow"),
                    src_mod=SSSP_SRC_MOD, max_rounds=SSSP_ROUNDS)


def q_dist_raster(sf_dir: str):
    """Proximity raster (exact Manhattan distance from every RASTER_N^2
    grid cell to the nearest road-covered cell — the GIS distance-
    transform / 'distance to nearest road' layer).  The road-cell set
    is RASTER_N^2-BOUNDED, so it reduces to the driver and broadcasts
    once (the cardinality-bounded admission of
    util.reduce_small_or_shard); the grid side streams as a Dataset
    with one chunked vectorized min-L1 pass per batch.  On an
    obstacle-free grid 4-neighbor BFS distance IS the L1 distance to
    the nearest seed, so the closed form replaces an iterative
    transform on both engines."""
    cells = q_line_raster(sf_dir).materialize()
    tabs = [t for t in ray.get(cells.to_arrow_refs())
            if t.num_rows and "cx" in t.column_names]
    rx = np.concatenate([t.column("cx").to_numpy() for t in tabs])
    ry = np.concatenate([t.column("cy").to_numpy() for t in tabs])
    ref = ray.put((np.ascontiguousarray(rx), np.ascontiguousarray(ry)))

    def min_l1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cx": pa.array([], pa.int64()),
                             "cy": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        bx, by = ray.get(ref)
        gid = t.column("id").to_numpy()
        gx = gid // RASTER_N
        gy = gid % RASTER_N
        best = np.full(len(gid), np.int64(1) << 40)
        CH = 2048
        for lo in range(0, len(bx), CH):
            d = np.abs(gx[:, None] - bx[None, lo:lo + CH]) \
                + np.abs(gy[:, None] - by[None, lo:lo + CH])
            np.minimum(best, d.min(axis=1), out=best)
        return pa.table({"cx": pa.array(gx, pa.int64()),
                         "cy": pa.array(gy, pa.int64()),
                         "dist": pa.array(best, pa.int64())})

    grid = ray.data.range(RASTER_N * RASTER_N)
    return grid.map_batches(min_l1, batch_format="pyarrow")


# --------------------------------------- fuzzy decontamination / curriculum

FDECON_NUM, FDECON_DEN = 1, 5    # flag when Jaccard >= 1/5 (exact ints)


def q_fuzzy_decontam(sf_dir: str, n: int = 3):
    """Fuzzy benchmark decontamination (the near-duplicate complement of
    q_decontaminate's exact-overlap screen): for every corpus doc that
    shares ANY word-3-gram with the benchmark subset (doc_id % 50 == 0),
    report its BEST-Jaccard benchmark doc.  The benchmark side is
    fixed-size by definition — its per-doc DISTINCT gram sets collect
    once and broadcast; each corpus batch runs one searchsorted
    membership pass per benchmark doc over per-doc-deduped grams (no
    shuffle).  Ordering uses fl(inter)/fl(union) — identical int64 →
    double rounding + one identical division on both engines, ties to
    the smallest bench_id; the flag itself is exact-integer
    (DEN*inter >= NUM*union)."""
    from osmquadtreepostgis_ray.functions.text import (
        _segment_unique, word_ngram_segments_nopad_batch)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        m = t.column("doc_id").to_numpy() % 50 == 0
        sub = t.filter(pa.array(m))
        gh, seg, _ = word_ngram_segments_nopad_batch(sub.column("text"), n=n)
        uv, us = _segment_unique(gh, seg)
        bid = sub.column("doc_id").to_numpy()[us] if len(us) else \
            np.empty(0, np.int64)
        return pa.table({"bench_id": pa.array(bid, pa.int64()),
                         "g": pa.array(uv, pa.uint64())})

    bdf = docs.map_batches(bench_grams, batch_format="pyarrow").to_pandas()
    bdf = bdf.sort_values(["bench_id", "g"], kind="stable")
    bids = np.unique(bdf["bench_id"].to_numpy(np.int64))
    ball = bdf["g"].to_numpy().astype(np.uint64)
    boffs = np.searchsorted(bdf["bench_id"].to_numpy(np.int64),
                            np.r_[bids, bids[-1] + 1] if len(bids)
                            else np.empty(0, np.int64))
    bref = ray.put((bids, ball, boffs))

    def match(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "bench_id": pa.array([], pa.int64()),
                          "inter_n": pa.array([], pa.int64()),
                          "union_n": pa.array([], pa.int64()),
                          "flagged": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        keep = t.column("doc_id").to_numpy() % 50 != 0
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return empty
        ids = sub.column("doc_id").to_numpy()
        rbids, rball, rboffs = ray.get(bref)
        gh, seg, _ = word_ngram_segments_nopad_batch(sub.column("text"), n=n)
        uv, us = _segment_unique(gh, seg)
        nd = len(ids)
        nb = len(rbids)
        nc = np.bincount(us, minlength=nd).astype(np.int64)
        inter = np.zeros((nd, nb), np.int64)
        for bi in range(nb):
            bg = rball[rboffs[bi]:rboffs[bi + 1]]
            if not len(bg) or not len(uv):
                continue
            pos = np.minimum(np.searchsorted(bg, uv), len(bg) - 1)
            hit = bg[pos] == uv
            inter[:, bi] = np.bincount(us[hit], minlength=nd)
        nbs = np.array([rboffs[i + 1] - rboffs[i] for i in range(nb)],
                       np.int64)
        union = nc[:, None] + nbs[None, :] - inter
        j = inter.astype(np.float64) / union.astype(np.float64)
        best = np.argmax(j, axis=1)              # first max = smallest bench
        bi = inter[np.arange(nd), best]
        bu = union[np.arange(nd), best]
        has = bi > 0
        flag = (FDECON_DEN * bi >= FDECON_NUM * bu).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[has], pa.int64()),
                         "bench_id": pa.array(rbids[best[has]], pa.int64()),
                         "inter_n": pa.array(bi[has], pa.int64()),
                         "union_n": pa.array(bu[has], pa.int64()),
                         "flagged": pa.array(flag[has], pa.int64())})

    return docs.map_batches(match, batch_format="pyarrow")


CURR_EASY = 40          # n_tokens < 40 -> bucket 0
CURR_MED = 70           # n_tokens < 70 -> bucket 1; else bucket 2


def q_curriculum(sf_dir: str):
    """Curriculum ordering (the easy→hard interleave a staged training
    run consumes): docs bucket by token-count difficulty tertile; the
    global position round-robins the buckets (pos = 3*rank_in_bucket +
    bucket), so any prefix of the ordering holds a balanced mixture.
    One distributed sort via keyed_row_number; ranks finish
    block-locally."""
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    from osmquadtreepostgis_ray.stages.window import keyed_row_number

    ds = add_text_stats(read_table(sf_dir, "documents",
                                   columns=["doc_id", "text", "source"]))

    def bucketize(t: pa.Table) -> pa.Table:
        nt = t.column("n_tokens").to_numpy()
        b = np.where(nt < CURR_EASY, 0, np.where(nt < CURR_MED, 1, 2)) \
            .astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "bucket": pa.array(b, pa.int64())})

    ranked, _totals = keyed_row_number(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"], ["doc_id"], rank_col="rn")

    def pos_of(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy()
        b = t.column("bucket").to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "bucket": pa.array(b, pa.int64()),
                         "pos": pa.array(3 * rn + b, pa.int64())})

    return ranked.map_batches(pos_of, batch_format="pyarrow")


# --------------------------------------- centroid / skyline / windowed topk

def q_centroids(sf_dir: str):
    """Exact polygon centroid numerators per assembled ring (the
    label-placement / representative-point precursor, F8's exact
    sibling): SIGNED doubled shoelace a2 plus the 6A-scaled centroid
    numerators cxn = Σ(x_i+x_j)·cross, cyn = Σ(y_i+y_j)·cross over the
    pseq ring order — all exact int64 (|term| < 9e16, ring ≤ 8 edges),
    no division ever crosses engines.  Hole-mode groups (even gid,
    k≥6) are excluded — their shrunk second ring is a different
    surface (assembly covers it).  One group-sharded vectorized pass,
    same topology as way_segments."""
    from osmquadtreepostgis_ray.stages.assembly import member_table

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"osm_id": np.int64, "part": np.int64, "a2": np.int64,
                "cxn": np.int64, "cyn": np.int64}
        if not len(df):
            return pd.DataFrame({k: pd.Series([], dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["group_id", "doc_id"], kind="stable") \
            .reset_index(drop=True)
        g = df["group_id"].to_numpy(np.int64)
        x = df["lon_milli"].to_numpy(np.int64)
        y = df["lat_milli"].to_numpy(np.int64)
        hit = df["close_hit"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        cnt = np.diff(np.r_[starts, len(g)])
        gidx = np.repeat(np.arange(len(starts)), cnt)
        k = cnt[gidx]
        seq = np.arange(len(g)) - starts[gidx]
        maxhit = np.maximum.reduceat(hit, starts)[gidx]
        closed = (maxhit > 0) & (k >= 3)
        half = np.where(k >= 6, k // 2, k)
        in2 = closed & (k >= 6) & (seq >= half)
        pseq = np.where(in2, seq - half, seq)
        psize = np.where(closed & (k >= 6),
                         np.where(seq >= half, k - half, half), k)
        part = np.where(in2, 2, 1).astype(np.int64)
        keep = closed & ~((k >= 6) & (g % 2 == 0))
        ring_start = np.arange(len(g)) - pseq
        nxt = ring_start + (pseq + 1) % psize
        cross = x * y[nxt] - x[nxt] * y
        kk = np.flatnonzero(keep)
        out = pd.DataFrame({
            "osm_id": -g[kk], "part": part[kk],
            "a2": cross[kk],
            "cxn": (x[kk] + x[nxt][kk]) * cross[kk],
            "cyn": (y[kk] + y[nxt][kk]) * cross[kk]})
        return out.groupby(["osm_id", "part"], sort=False, as_index=False) \
            .sum()

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return shard_apply(member_table(docs), ["group_id"], cents)


def q_skyline(sf_dir: str):
    """Pareto-front (skyline) selection over (n_tokens, stop_permille)
    — the multi-criteria curation filter ('longest AND most fluent'
    undominated set).  Per-block LOCAL skylines first (a point survives
    iff no same-block point weakly dominates it with one strict edge —
    the union of local skylines provably contains the global front);
    the bounded union (≤ distinct-n_tokens candidates per block) then
    solves in ONE worker task (cluster.py's one-task-solve admission),
    never on the driver."""
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats

    def local_sky(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "stop_permille": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_numpy()
        nt = t.column("n_tokens").to_numpy()
        sp = t.column("stop_permille").to_numpy()
        keep = _sky_keep(nt, sp)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_tokens": pa.array(nt[keep], pa.int64()),
                         "stop_permille": pa.array(sp[keep], pa.int64())})

    ds = add_text_stats(read_table(sf_dir, "documents",
                                   columns=["doc_id", "text"]))
    locs = ds.select_columns(["doc_id", "n_tokens", "stop_permille"]) \
        .map_batches(local_sky, batch_format="pyarrow").materialize()

    @ray.remote
    def solve(*tabs) -> pa.Table:
        # varargs so Ray dereferences each block ref (a list arg ships
        # the refs themselves)
        live = [t for t in tabs
                if t.num_rows and "doc_id" in t.column_names]
        u = pa.concat_tables(live)
        ids = u.column("doc_id").to_numpy()
        nt = u.column("n_tokens").to_numpy()
        sp = u.column("stop_permille").to_numpy()
        keep = _sky_keep(nt, sp)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_tokens": pa.array(nt[keep], pa.int64()),
                         "stop_permille": pa.array(sp[keep], pa.int64())})

    final = ray.get(solve.remote(*locs.to_arrow_refs()))
    return ray.data.from_arrow(final)


def _sky_keep(nt: np.ndarray, sp: np.ndarray) -> np.ndarray:
    """Undominated mask for maximize-(nt, sp): dominated iff some point
    with strictly larger nt has sp >= mine, or an equal-nt point has
    sp > mine.  Vectorized via per-nt max + suffix max."""
    uq, inv = np.unique(nt, return_inverse=True)
    gmax = np.full(len(uq), np.int64(-1))
    np.maximum.at(gmax, inv, sp)
    suf = np.full(len(uq), np.int64(-1))
    if len(uq) > 1:
        suf[:-1] = np.maximum.accumulate(gmax[::-1])[::-1][1:]
    return ~((suf[inv] >= sp) | (gmax[inv] > sp))


WTOPK_K = 3


def q_windowed_topk(sf_dir: str):
    """Streaming per-window top-k (the 'trending event types per hour'
    shape): exact (hour, event_type) counts via combiner partials + one
    sharded sum, then util.topk_per_key — count-desc, type-asc ties,
    rank 1..k; the driver receives only n_hours x k rows."""
    from osmquadtreepostgis_ray.util import topk_per_key

    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        hour = ts // 3_600_000_000
        df = pd.DataFrame({"hour": hour,
                           "event_type": t.column("event_type").to_pylist()})
        g = df.groupby(["hour", "event_type"], sort=False) \
            .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["hour", "event_type"], {"n": ("n", "sum")})
    return topk_per_key(agg, key="hour", by=["n", "event_type"],
                        ascending=[False, True], k=WTOPK_K,
                        out_cols=["hour", "event_type", "n"])


# --------------------------------------- sinuosity / gini / changepoint

def q_sinuosity(sf_dir: str):
    """Per-way-chain sinuosity components (route-quality screen:
    winding factor = path length / straight-line chord): L1 path length
    over the seq chain plus the L1 first→last chord, exact ints — the
    ratio never crosses engines.  Every group with k >= 2 (the synthetic
    corpus closes all groups, so an open-only filter would be vacuous —
    the chain path before ring closure is the measured entity).  One
    group-sharded vectorized pass."""
    from osmquadtreepostgis_ray.stages.assembly import member_table

    def sin_of(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"gid": np.int64, "path_l1": np.int64, "chord_l1": np.int64}
        if not len(df):
            return pd.DataFrame({k: pd.Series([], dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["group_id", "doc_id"], kind="stable") \
            .reset_index(drop=True)
        g = df["group_id"].to_numpy(np.int64)
        x = df["lon_milli"].to_numpy(np.int64)
        y = df["lat_milli"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)] - 1
        cnt = ends - starts + 1
        is_line = cnt >= 2
        same = g[1:] == g[:-1]
        step = (np.abs(np.diff(x)) + np.abs(np.diff(y))) * same
        cum = np.r_[0, np.cumsum(step)]
        path = cum[ends] - cum[starts]
        chord = np.abs(x[ends] - x[starts]) + np.abs(y[ends] - y[starts])
        k = np.flatnonzero(is_line)
        return pd.DataFrame({"gid": g[starts][k], "path_l1": path[k],
                             "chord_l1": chord[k]})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return shard_apply(member_table(docs), ["group_id"], sin_of)


def q_zone_gini(sf_dir: str):
    """Per-zone Gini numerator of event spend (engagement-inequality
    audit per region): G2 = Σ (2i − n − 1)·v_(i) over ascending cents
    (= half the pairwise |v_i − v_j| sum; tie order provably cancels),
    exact int64 with n and sum alongside — normalization never crosses
    engines.  Cents ride through the PIP join as carry columns; the
    only shuffle is the zone-keyed shard."""
    from osmquadtreepostgis_ray.sources.zones import zones_table
    from osmquadtreepostgis_ray.stages.pip_join import pip_join_fn

    ev = prep_events(sf_dir, columns=["event_id", "user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cents", pa.array(np.rint(batch.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64()))

    zref = ray.put(zones_table())
    joined = ev.map_batches(cents, batch_format="pyarrow").map_batches(
        pip_join_fn(zref, carry=("cents",)), batch_format="pyarrow",
        batch_size=8192)

    def gini_of(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"zone_id": np.int64, "kind": str, "n": np.int64,
                "sum_cents": np.int64, "gini2": np.int64}
        if not len(df):
            return pd.DataFrame({k: pd.Series([], dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["zone_id", "kind", "cents"], kind="stable") \
            .reset_index(drop=True)
        z = df["zone_id"].to_numpy(np.int64)
        kd = df["kind"].to_numpy()
        v = df["cents"].to_numpy(np.int64)
        new = np.r_[True, (z[1:] != z[:-1]) | (kd[1:] != kd[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(z)])
        gidx = np.repeat(np.arange(len(starts)), cnt)
        i = np.arange(len(z)) - starts[gidx] + 1           # 1-based rank
        coef = 2 * i - cnt[gidx] - 1
        term = coef * v
        g2 = np.add.reduceat(term, starts)
        sums = np.add.reduceat(v, starts)
        return pd.DataFrame({"zone_id": z[starts], "kind": kd[starts],
                             "n": cnt.astype(np.int64), "sum_cents": sums,
                             "gini2": g2})

    return shard_apply(joined, ["zone_id", "kind"], gini_of)


def q_changepoint(sf_dir: str):
    """Per-user CUSUM change-point (the drift screen over a user's
    spend stream): over events in (ts, event_id) order with prefix sums
    S_i, the position i in 1..n-1 maximizing |n·S_i − i·S_n| — all
    exact int64, ties to the smallest i; users with n < 2 drop.  One
    user-keyed shard, per-shard vectorized prefix/argmax."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": pa.array(t.column("ts").cast(pa.int64()).to_numpy(),
                           pa.int64()),
            "event_id": t.column("event_id"),
            "cents": pa.array(np.rint(t.column("value").to_numpy() * 100)
                              .astype(np.int64), pa.int64())})

    def cp_of(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.int64, "pos": np.int64, "dev": np.int64}
        if not len(df):
            return pd.DataFrame({k: pd.Series([], dtype=v)
                                 for k, v in cols.items()})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable") \
            .reset_index(drop=True)
        u = df["user_id"].to_numpy(np.int64)
        v = df["cents"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cnt = np.diff(np.r_[starts, len(u)])
        gidx = np.repeat(np.arange(len(starts)), cnt)
        cum = np.cumsum(v)
        base = np.r_[0, cum[np.r_[starts[1:], len(u)] - 1][:-1]]
        s = cum - base[gidx]                       # per-group prefix S_i
        i = np.arange(len(u)) - starts[gidx] + 1   # 1-based position
        n = cnt[gidx]
        stot = s[np.r_[starts[1:], len(u)] - 1][gidx]
        dev = np.abs(n * s - i * stot)
        valid = i < n                              # positions 1..n-1
        dev = np.where(valid, dev, -1)
        # per-group argmax, tie -> smallest i (first occurrence)
        order = np.lexsort((i, -dev, gidx))        # gidx asc, dev desc, i asc
        firsts = order[np.r_[True, gidx[order][1:] != gidx[order][:-1]]]
        ok = dev[firsts] >= 0                      # groups with n >= 2
        return pd.DataFrame({"user_id": u[firsts][ok],
                             "pos": i[firsts][ok],
                             "dev": dev[firsts][ok]})

    return shard_apply(ds.map_batches(prep, batch_format="pyarrow"),
                       ["user_id"], cp_of)


def q_blockiness(sf_dir: str):
    """Per-image blockiness quality screen (8x8 boundary vs interior
    gradient, exact milli score — stages/images.blockiness_stats).
    Fully row-pure: decode + both direction sums inside the batch."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import blockiness_stats

    return read_images(sf_dir, with_bytes=True).map_batches(
        blockiness_stats, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_grad_orient(sf_dir: str):
    """Per-image gradient-orientation octant histogram (HOG-lite
    feature extraction — stages/images.grad_orient_stats).  Row-pure;
    the 10 bounded descriptor columns are the only output."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import grad_orient_stats

    return read_images(sf_dir, with_bytes=True).map_batches(
        grad_orient_stats, batch_format="pyarrow", batch_size=IMG_BATCH)


KMV_K = 32


def q_kmv_sketch(sf_dir: str, k: int = KMV_K):
    """K-minimum-values distinct sketch per event_type (the theta-sketch
    family — the OTHER mergeable distinct counter besides q_hll_sketch;
    KMV also supports set intersection estimates, which HLL can't).
    Per-batch partial = the k smallest distinct splitmix hashes per
    type; merge = k smallest of the union (one type-sharded pass over
    <= k * types * blocks partial rows).  Output is the exact signature
    table (event_type, rnk, kh) — integer-exact, full-value oracle; the
    float estimate (k-1)*2^63/kh_k is a driver epilogue
    (functions/sketch.kmv_estimate) and deliberately not compared."""
    from osmquadtreepostgis_ray.functions.codecs import _splitmix
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        h = _splitmix(t.column("user_id").to_numpy().astype(np.uint64))
        h63 = (h % np.uint64(1 << 63)).astype(np.int64)
        oe, oh = [], []
        for e in pd.unique(et):
            u = np.unique(h63[et == e])[:k]
            oe.append(np.full(len(u), e, object))
            oh.append(u)
        return pa.table({"event_type": pa.array(np.concatenate(oe), pa.string()),
                         "kh": pa.array(np.concatenate(oh), pa.int64())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": str, "rnk": np.int64, "kh": np.int64}
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=v)
                                 for c, v in cols.items()})
        d = (df.drop_duplicates(["event_type", "kh"])
               .sort_values(["event_type", "kh"], kind="stable")
               .reset_index(drop=True))
        d["rnk"] = d.groupby("event_type", sort=False).cumcount() + 1
        d = d[d["rnk"] <= k]
        return d[["event_type", "rnk", "kh"]]

    return shard_apply(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type"], merge)


def q_link_jaccard(sf_dir: str):
    """Link prediction by neighborhood Jaccard over the doc chain graph
    (the q_triangles edge set): non-edge pairs (v1 < v2) sharing >= 1
    common neighbor, with exact common / degree counts and
    jaccard_milli = common*1000 // (deg1 + deg2 - common) (denominator
    > 0 since common >= 1 and deg >= common — non-negative floor div).
    Wedge fanout per center is deg^2 — inherent output, but hub-guarded
    EXACTLY via stages/graph.wedge_pairs: each center's neighbor list
    splits into ceil(deg/chunk) chunks and its pairs expand per
    (u, c1, c2) chunk-pair shard, so no single shard holds a hub's
    deg^2 rows (tests/test_shard_apply.py star-graph bound).
    Pipeline: undirected fanout (row-pure) -> chunk-fanned pair
    expansion -> pair-sharded count -> packed-key anti join against
    the edge set -> two degree attaches."""
    from osmquadtreepostgis_ray.stages.graph import wedge_pairs
    from osmquadtreepostgis_ray.stages.joins import (bucket_hash_join,
                                                     bucket_semi_join)

    SHIFT = np.int64(1) << np.int64(31)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        i = t.column("doc_id").to_numpy().astype(np.int64)
        if len(i) and i.max() >= int(SHIFT):
            raise ValueError("link_jaccard packed keys need ids < 2^31")
        c1 = i[i >= 1]
        c2 = i[(i >= 2) & ((i - 2) % 3 == 0)]
        return pa.table({"a": pa.array(np.r_[c1 - 1, c2 - 2], pa.int64()),
                         "b": pa.array(np.r_[c1, c2], pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow").materialize()

    def und(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table({"u": pa.array(np.r_[a, b], pa.int64()),
                         "v": pa.array(np.r_[b, a], pa.int64())})

    u = e.map_batches(und, batch_format="pyarrow").materialize()

    def degp(t: pa.Table) -> pa.Table:
        n, c = np.unique(t.column("u").to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(n.astype(np.int64), pa.int64()),
                         "deg": pa.array(c.astype(np.int64), pa.int64())})

    deg = sharded_agg(u.map_batches(degp, batch_format="pyarrow"),
                      ["node"], {"deg": ("deg", "sum")})

    pairs = sharded_agg(wedge_pairs(u),
                        ["v1", "v2"], {"common": ("c", "sum")})

    def keyed(t: pa.Table) -> pa.Table:
        return t.append_column("key", pa.array(
            t.column("v1").to_numpy().astype(np.int64) * SHIFT
            + t.column("v2").to_numpy().astype(np.int64), pa.int64()))

    ekey = e.map_batches(
        lambda t: pa.table({"key": pa.array(
            t.column("a").to_numpy().astype(np.int64) * SHIFT
            + t.column("b").to_numpy().astype(np.int64), pa.int64())}),
        batch_format="pyarrow")
    nonedges = bucket_semi_join(
        pairs.map_batches(keyed, batch_format="pyarrow"), ekey,
        on="key", anti=True)

    d1 = deg.map_batches(lambda t: t.rename_columns(["v1", "deg1"]),
                         batch_format="pyarrow")
    d2 = deg.map_batches(lambda t: t.rename_columns(["v2", "deg2"]),
                         batch_format="pyarrow")
    j = bucket_hash_join(bucket_hash_join(nonedges, d1, on="v1"),
                         d2, on="v2")

    def finish(t: pa.Table) -> pa.Table:
        v1 = t.column("v1").to_numpy().astype(np.int64)
        v2 = t.column("v2").to_numpy().astype(np.int64)
        cm = t.column("common").to_numpy().astype(np.int64)
        g1 = t.column("deg1").to_numpy().astype(np.int64)
        g2 = t.column("deg2").to_numpy().astype(np.int64)
        return pa.table({"v1": pa.array(v1, pa.int64()),
                         "v2": pa.array(v2, pa.int64()),
                         "common": pa.array(cm, pa.int64()),
                         "deg1": pa.array(g1, pa.int64()),
                         "deg2": pa.array(g2, pa.int64()),
                         "jaccard_milli": pa.array(
                             cm * 1000 // (g1 + g2 - cm), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


FLOW_SOLVE_LIMIT = 5_000_000   # nonzero-cell ceiling for the one-task solve


def q_flow_accum(sf_dir: str):
    """D8 flow accumulation over the event-count raster (hydrology-style
    routing — the raster GIS op behind watershed/drainage analytics):
    every nonzero cell flows to its steepest-descent 8-neighbor (lower
    count; max drop, tie -> lowest cell id), and acc(c) = number of
    cells whose flow path passes through c (incl. itself).

    Scale shape: the data-scaled work (events -> distinct-cell counts,
    neighbor discovery) is combiner + owner/probe halo shuffles over the
    DISTINCT-cell aggregate (the q_dissolve pattern).  Counts strictly
    decrease along flow edges, so the flow graph is an in-forest; the
    subtree-size accumulation runs as ONE guarded worker task over the
    cardinality-BOUNDED cell table (<= 4^CELL_DEPTH nonzero cells,
    FLOW_SOLVE_LIMIT guard — the stages/cluster.py admission pattern),
    level-synchronous over distinct counts with exact int64 np.add.at."""
    G = 1 << CELL_DEPTH
    cells = q_rasterize(sf_dir)

    def to_global(t: pa.Table) -> pa.Table:
        tx, ty, _ = quadtree.decode(t.column("tile").to_numpy())
        gx = tx * 16 + t.column("px").to_numpy().astype(np.int64)
        gy = ty * 16 + t.column("py").to_numpy().astype(np.int64)
        return pa.table({"id": pa.array(gy * G + gx, pa.int64()),
                         "gx": pa.array(gx, pa.int64()),
                         "gy": pa.array(gy, pa.int64()),
                         "n": t.column("n")})

    g = cells.map_batches(to_global, batch_format="pyarrow").materialize()

    def fan(t: pa.Table) -> pa.Table:
        gid = t.column("id").to_numpy()
        gx = t.column("gx").to_numpy()
        gy = t.column("gy").to_numpy()
        n = t.column("n").to_numpy()
        keys = [gid]
        orig = [gid]
        nn = [n]
        role = [np.zeros(len(gid), np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                ngx, ngy = gx + dx, gy + dy
                # BOTH bounds: a -1 underflow would alias the previous
                # row's last column key (gy*G - 1 == (gy-1)*G + G-1)
                m = (ngx >= 0) & (ngx < G) & (ngy >= 0) & (ngy < G)
                keys.append((ngy * G + ngx)[m])
                orig.append(gid[m])
                nn.append(n[m])
                role.append(np.ones(int(m.sum()), np.int8))
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "orig": pa.array(np.concatenate(orig), pa.int64()),
                         "n": pa.array(np.concatenate(nn), pa.int64()),
                         "role": pa.array(np.concatenate(role), pa.int8())})

    def flow_of(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"id": np.int64, "n": np.int64, "tgt": np.int64,
                "is_sink": bool}
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=v)
                                 for c, v in cols.items()})
        own = df[df["role"] == 0][["key", "n"]] \
            .rename(columns={"n": "n_own"})
        probe = df[df["role"] == 1][["key", "orig", "n"]]
        cand = probe.merge(own, on="key")
        cand = cand[cand["n"] < cand["n_own"]]
        cand = cand.sort_values(["key", "n", "orig"], kind="stable") \
            .drop_duplicates("key")
        out = own.merge(cand[["key", "orig"]], on="key", how="left")
        tgt = out["orig"].to_numpy(np.float64)
        oid = out["key"].to_numpy(np.int64)
        sink = np.isnan(tgt)
        return pd.DataFrame({"id": oid,
                             "n": out["n_own"].to_numpy(np.int64),
                             "tgt": np.where(sink, oid, tgt).astype(np.int64),
                             "is_sink": sink})

    flow = shard_apply(g.map_batches(fan, batch_format="pyarrow"),
                       ["key"], flow_of)

    def solve(t: pa.Table) -> pa.Table:
        if t.num_rows > FLOW_SOLVE_LIMIT:
            raise ValueError(
                f"flow solve over {t.num_rows} cells exceeds "
                f"FLOW_SOLVE_LIMIT — subdivide the raster into drainage "
                f"windows or raise the guard with a bigger worker heap")
        ids = t.column("id").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        tgt = t.column("tgt").to_numpy().astype(np.int64)
        sink = t.column("is_sink").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids_s, n_s, tgt_s, sink_s = ids[order], n[order], tgt[order], sink[order]
        tix = np.searchsorted(ids_s, tgt_s)
        acc = np.ones(len(ids_s), np.int64)
        # level-synchronous topological sum: all cells of count v are
        # final when v's turn comes (flow strictly decreases the count)
        for v in np.unique(n_s)[::-1]:
            m = (n_s == v) & ~sink_s
            if m.any():
                np.add.at(acc, tix[m], acc[m])
        return pa.table({"id": pa.array(ids_s, pa.int64()),
                         "n": pa.array(n_s, pa.int64()),
                         "tgt": pa.array(tgt_s, pa.int64()),
                         "acc": pa.array(acc, pa.int64()),
                         "is_sink": pa.array(sink_s)})

    return flow.repartition(1).map_batches(solve, batch_format="pyarrow",
                                           batch_size=None)


# --------------------------------------- terrain / texture / variogram ops

def q_slope_aspect(sf_dir: str):
    """Terrain slope/aspect raster over the event-count surface (the
    hillshade precursor of raster GIS — reference's quadtree tiling is
    the storage model this renders from): central differences
    dzdx = z(x+1,y) - z(x-1,y), dzdy = z(x,y+1) - z(x,y-1) with absent
    (zero-count) neighbors contributing 0; aspect is the pure-integer
    4-way facing (0=E,1=N,2=W,3=S; -1 flat) so both engines compare
    without a single float.

    Scale shape: the q_raster_blur halo pattern — a 4-way fanout of the
    DISTINCT-pixel aggregate plus one sharded pivot; raw events never
    enter the stencil shuffle, so volume is 5 x nonzero pixels
    regardless of row count."""
    G = 1 << CELL_DEPTH
    cells = q_rasterize(sf_dir)

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("key", "role", "n")})
        tx, ty, _ = quadtree.decode(t.column("tile").to_numpy())
        gx = tx * 16 + t.column("px").to_numpy().astype(np.int64)
        gy = ty * 16 + t.column("py").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        keys = [gy * G + gx]
        roles = [np.zeros(len(gx), np.int64)]
        ns = [n]
        # the emitter sits at offset (-dx,-dy) from the receiving center:
        # (1,0) delivers the center's WEST neighbor value (role 1),
        # (-1,0) EAST (2), (0,1) SOUTH (3), (0,-1) NORTH (4)
        for dx, dy, role in ((1, 0, 1), (-1, 0, 2), (0, 1, 3), (0, -1, 4)):
            ngx, ngy = gx + dx, gy + dy
            m = (ngx >= 0) & (ngx < G) & (ngy >= 0) & (ngy < G)
            keys.append((ngy * G + ngx)[m])
            roles.append(np.full(int(m.sum()), role, np.int64))
            ns.append(n[m])
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "role": pa.array(np.concatenate(roles), pa.int64()),
                         "n": pa.array(np.concatenate(ns), pa.int64())})

    def grad_of(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("gx", "gy", "n", "dzdx", "dzdy", "slope2", "aspect")
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        own = df[df["role"] == 0].set_index("key")["n"]

        def side(r: int) -> np.ndarray:
            s = df[df["role"] == r].set_index("key")["n"]
            return s.reindex(own.index, fill_value=0).to_numpy(np.int64)

        w_, e_, s_, n_ = side(1), side(2), side(3), side(4)
        key = own.index.to_numpy(np.int64)
        z = own.to_numpy(np.int64)
        dzdx = e_ - w_
        dzdy = n_ - s_
        aspect = np.where(
            (dzdx == 0) & (dzdy == 0), -1,
            np.where(np.abs(dzdx) >= np.abs(dzdy),
                     np.where(dzdx > 0, 0, 2),
                     np.where(dzdy > 0, 1, 3))).astype(np.int64)
        return pd.DataFrame({"gx": key % G, "gy": key // G, "n": z,
                             "dzdx": dzdx, "dzdy": dzdy,
                             "slope2": dzdx * dzdx + dzdy * dzdy,
                             "aspect": aspect})

    part = cells.map_batches(fan, batch_format="pyarrow")
    return shard_apply(part, ["key"], grad_of)


def q_lbp(sf_dir: str):
    """Per-image LBP texture uniformity profile over the 16x16
    thumbnails (stages/images.lbp_partial).  Row-pure decode; no
    shuffle — output is <= 9 rows per image."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import lbp_partial

    return read_images(sf_dir, with_bytes=True).map_batches(
        lbp_partial, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_median3x3(sf_dir: str):
    """Per-image 3x3 median-filter summary over the 16x16 thumbnails
    (stages/images.median3x3_batch).  Row-pure; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import median3x3_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        median3x3_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_variogram(sf_dir: str):
    """Empirical semivariogram by distance band over the sampled event
    geotags (the spatial-interpolation diagnostic next to q_idw): for
    each band r2s[k-1] < d2 <= r2s[k], the ORDERED-pair count and the
    exact int64 sum of squared value-cents differences.  The ripley_k
    broadcast-sample shape: the bounded sample ships once via ray.put,
    every batch scans it in column chunks and accumulates CUMULATIVE
    per-radius masked sums (np.where keeps the sum int64-exact — not
    bincount weights, the CLAUDE.md float64 hazard; not add.at, ~8x
    slower than a masked sum here), diffed into bands at the end.
    Self-pairs leave only a count (d2=0, dv=0), subtracted exactly."""
    def sample_geo(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        e = t.column("event_id").to_numpy()
        v = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        keep = u % RIPLEY_MOD == 0
        u, e, v = u[keep], e[keep], v[keep]
        lon_m, lat_m = geotag.event_lonlat_milli(u, e)
        return pa.table({"lon_milli": pa.array(lon_m, pa.int64()),
                         "lat_milli": pa.array(lat_m, pa.int64()),
                         "v": pa.array(v, pa.int64())})

    samp = read_table(sf_dir, "events",
                      columns=["event_id", "user_id", "value"]) \
        .map_batches(sample_geo, batch_format="pyarrow").materialize()
    tabs = [t for t in ray.get(samp.to_arrow_refs())
            if t.num_rows and "lon_milli" in t.column_names]
    bx = np.concatenate([t.column("lon_milli").to_numpy() for t in tabs])
    by = np.concatenate([t.column("lat_milli").to_numpy() for t in tabs])
    bv = np.concatenate([t.column("v").to_numpy() for t in tabs])
    ref = ray.put((np.ascontiguousarray(bx), np.ascontiguousarray(by),
                   np.ascontiguousarray(bv)))
    r2s = np.array([r * r for r in RIPLEY_R], np.int64)
    rs = np.array(RIPLEY_R, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"r": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64()),
                             "sum_sq": pa.array([], pa.int64())})
        rbx, rby, rbv = ray.get(ref)
        ax = t.column("lon_milli").to_numpy()
        ay = t.column("lat_milli").to_numpy()
        av = t.column("v").to_numpy()
        m = len(ax)
        cum_c = np.zeros(len(r2s), np.int64)
        cum_s = np.zeros(len(r2s), np.int64)
        CH = 4096
        for lo in range(0, len(rbx), CH):
            d2 = ax[:, None] - rbx[None, lo:lo + CH]
            d2 *= d2
            dy = ay[:, None] - rby[None, lo:lo + CH]
            dy *= dy
            d2 += dy
            dv = av[:, None] - rbv[None, lo:lo + CH]
            dv *= dv
            for k, r2 in enumerate(r2s):
                mask = d2 <= r2
                cum_c[k] += int(mask.sum())
                cum_s[k] += int(np.where(mask, dv, 0).sum())
        counts = np.diff(np.r_[np.int64(0), cum_c])
        sums = np.diff(np.r_[np.int64(0), cum_s])
        counts[0] -= m                  # self-pairs: band 0, dv2 = 0
        return pa.table({"r": pa.array(rs, pa.int64()),
                         "n_pairs": pa.array(counts, pa.int64()),
                         "sum_sq": pa.array(sums, pa.int64())})

    part = samp.map_batches(partial, batch_format="pyarrow",
                            batch_size=1024)
    return sharded_agg(part, ["r"], {"n_pairs": ("n_pairs", "sum"),
                                     "sum_sq": ("sum_sq", "sum")}) \
        .select_columns(["r", "n_pairs", "sum_sq"])


# ------------------------------- curation splits / mixing / local stats

TS_SPLIT_TENTHS = (7, 8)    # train < 70% of the time span, embargo < 80%


def q_time_split(sf_dir: str):
    """Temporal train/embargo/test split with an embargo gap (the
    leakage-safe TIME split next to the group-based
    q_split_leakage_safe): thresholds are exact integer fractions of
    the global [min_ts, max_ts] span, every event labels by pure
    comparison.  Scale shape: the global bounds are a 2-scalar
    combiner reduce (per-batch min/max rows -> driver gets ONE tiny
    table); labeling + counting is one combiner pass, shuffle carries
    (split, event_type) partials only."""
    ds = read_table(sf_dir, "events", columns=["event_id", "ts",
                                               "event_type"])

    def epoch(t: pa.Table) -> pa.Table:
        return pa.table({"ts_us": t.column("ts").cast(pa.int64()),
                         "event_type": t.column("event_type")})

    ev = ds.map_batches(epoch, batch_format="pyarrow").materialize()

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        ts = t.column("ts_us").to_numpy()
        return pa.table({"lo": pa.array([ts.min()], pa.int64()),
                         "hi": pa.array([ts.max()], pa.int64())})

    bounds = [t for t in ray.get(ev.map_batches(
        mm, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and "lo" in t.column_names]
    lo = int(min(t.column("lo").to_numpy().min() for t in bounds))
    hi = int(max(t.column("hi").to_numpy().max() for t in bounds))
    span = hi - lo
    t1, t2 = (lo + (span * k) // 10 for k in TS_SPLIT_TENTHS)

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"split": pa.array([], pa.string()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ts = t.column("ts_us").to_numpy()
        split = np.where(ts < t1, "train",
                         np.where(ts < t2, "embargo", "test"))
        g = pd.DataFrame({"split": split,
                          "event_type": t.column("event_type").to_pandas()}) \
            .groupby(["split", "event_type"], sort=False) \
            .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ev.map_batches(label, batch_format="pyarrow")
    return sharded_agg(part, ["split", "event_type"], {"n": ("n", "sum")}) \
        .select_columns(["split", "event_type", "n"])


def q_temperature_mix(sf_dir: str, target: int = 1000):
    """Temperature-weighted language sampling quotas (tau = 0.5 — the
    low-resource upsampling rule multilingual LLM mixes use): per-lang
    weight isqrt(count), quota = floor(target * w / sum(w)).  floor of
    the IEEE sqrt equals exact isqrt for counts < 2^52 (correctly
    rounded sqrt cannot cross an integer boundary at this magnitude),
    so both engines stay integer-exact.  The lang table is
    cardinality-bounded: distributed combiner counts, then a one-task
    allocation (the q_mixture_quotas plan — the quota needs the global
    weight sum)."""
    docs = read_table(sf_dir, "documents", columns=["lang"])

    def cpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        langs, counts = np.unique(
            np.asarray(t.column("lang").to_pylist(), dtype=object),
            return_counts=True)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "n_docs": pa.array(counts.astype(np.int64),
                                            pa.int64())})

    counts = (docs.map_batches(cpart, batch_format="pyarrow")
              .groupby("lang").aggregate(Sum("n_docs",
                                             alias_name="n_docs")))

    def alloc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64() if c != "lang"
                                         else pa.string())
                             for c in ("lang", "n_docs", "w", "quota")})
        c = t.column("n_docs").to_numpy().astype(np.int64)
        w = np.floor(np.sqrt(c.astype(np.float64))).astype(np.int64)
        tw = int(w.sum())
        return pa.table({"lang": t.column("lang"),
                         "n_docs": pa.array(c, pa.int64()),
                         "w": pa.array(w, pa.int64()),
                         "quota": pa.array(target * w // tw, pa.int64())})

    return counts.repartition(1).map_batches(alloc, batch_format="pyarrow",
                                             batch_size=None)


def q_saliency_crop(sf_dir: str):
    """Gradient-energy smart-crop quadrant selection per image
    (stages/images.saliency_crop_batch).  Row-pure; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import saliency_crop_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        saliency_crop_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


LISA_N_MAX = 1 << 25   # int64 headroom guard: dev products stay < 2^63


def q_local_moran(sf_dir: str):
    """Local Moran's I (Anselin LISA) numerators over occupied depth-6
    cells — the per-cell cluster/outlier statistic next to the global
    q_moran and the Gi* q_hotspot: lisa_num = dev_i * sum of occupied
    queen-neighbor devs, with deviations scaled by the occupied-cell
    count (dev = N*n - S) so everything stays exact int64.

    Scale shape: reuses the hotspot_gi two-exchange plan; the global
    (N, S) scalars reduce from the structurally BOUNDED cell table
    (<= 4^depth rows — the driver holds two ints, never data-scaled
    rows); the guard keeps dev products inside int64."""
    h = q_hotspot(sf_dir).materialize()
    tabs = [t for t in ray.get(h.to_arrow_refs())
            if t.num_rows and "n" in t.column_names]
    N = int(sum(t.num_rows for t in tabs))
    S = int(sum(int(t.column("n").to_numpy().sum()) for t in tabs))

    def lisa(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("ix", "iy", "n", "lisa_num")})
        n = t.column("n").to_numpy().astype(np.int64)
        if n.max(initial=0) >= LISA_N_MAX:
            raise ValueError("cell count exceeds LISA int64 headroom — "
                             "deepen the grid or rescale deviations")
        nbr_sum = t.column("nbr_sum").to_numpy().astype(np.int64)
        nbr_cnt = t.column("nbr_cnt").to_numpy().astype(np.int64)
        dev = N * n - S
        nb_dev = N * (nbr_sum - n) - (nbr_cnt - 1) * S
        return pa.table({"ix": t.column("ix"), "iy": t.column("iy"),
                         "n": pa.array(n, pa.int64()),
                         "lisa_num": pa.array(dev * nb_dev, pa.int64())})

    return h.map_batches(lisa, batch_format="pyarrow")


# ------------------------- adaptive tiling / overlay / marching squares

ADAPT_DEPTHS = (4, 6, 8, 10, 12)   # coarse -> fine, step 2 (4-way split^2)
ADAPT_MAX = 64                     # target max objects per tile


def q_adaptive_tiles(sf_dir: str, max_per_tile: int = ADAPT_MAX):
    """Adaptive quadtree tiling — the osmquadtree calc-quadtree/group
    surface the reference's inputs are produced by (cells split until
    each tile holds <= max_per_tile objects; the engine's storage
    partitioner would consume exactly this selection): a cell is
    selected iff its count <= T and its parent (2 levels up) exceeds T;
    top-depth cells select on count alone; bottom-depth cells still
    over T emit overflow=TRUE rows.  Counts are monotone nondecreasing
    up the tree, so parent > T implies every ancestor > T — the
    selection is an exact partition of the corpus.

    Scale shape: ONE input pass builds the multi-depth distinct-cell
    combiner partial (the q_tile_pyramid plan); the parent check is one
    owner/probe shard exchange over the aggregated cell table — raw
    events never enter the selection shuffle."""
    T = max_per_tile
    ds = prep_events(sf_dir)
    depths = ADAPT_DEPTHS

    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(batch.column("cell").to_numpy(),
                                  return_counts=True)
        d_out, c_out, n_out = [], [], []
        for d in depths:
            c = quadtree.at_depth(cells, d)
            u, inv = np.unique(c, return_inverse=True)
            n = np.bincount(inv, weights=counts).astype(np.int64)
            d_out.append(np.full(len(u), d, np.int64))
            c_out.append(u)
            n_out.append(n)
        return pa.table({"depth": pa.array(np.concatenate(d_out), pa.int64()),
                         "cell": pa.array(np.concatenate(c_out), pa.int64()),
                         "n": pa.array(np.concatenate(n_out), pa.int64())})

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["depth", "cell"], {"n": ("n", "sum")})

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cell" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"key": z, "role": z, "depth": z,
                             "cell": z, "n": z})
        d = t.column("depth").to_numpy().astype(np.int64)
        c = t.column("cell").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        keys = [c]                      # owner: keyed to itself
        roles = [np.zeros(len(c), np.int64)]
        dd, cc, nn = [d], [c], [n]
        for dep in depths[1:]:
            m = d == dep
            keys.append(quadtree.at_depth(c[m], dep - 2))
            roles.append(np.ones(int(m.sum()), np.int64))
            dd.append(d[m])
            cc.append(c[m])
            nn.append(n[m])
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "role": pa.array(np.concatenate(roles), pa.int64()),
                         "depth": pa.array(np.concatenate(dd), pa.int64()),
                         "cell": pa.array(np.concatenate(cc), pa.int64()),
                         "n": pa.array(np.concatenate(nn), pa.int64())})

    top, bottom = depths[0], depths[-1]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"depth": np.int64, "cell": np.int64, "n": np.int64,
                "overflow": bool}
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=v)
                                 for c, v in cols.items()})
        own = df[df["role"] == 0]
        # top-depth cells have no in-set parent: select on count alone
        roots = own[(own["depth"] == top) & (own["n"] <= T)]
        probes = df[df["role"] == 1].merge(
            own[["key", "n"]].rename(columns={"n": "n_parent"}), on="key")
        split = probes["n_parent"].to_numpy(np.int64) > T
        nc = probes["n"].to_numpy(np.int64)
        sel = probes[split & (nc <= T)]
        over = probes[split & (nc > T)
                      & (probes["depth"].to_numpy(np.int64) == bottom)]
        return pd.DataFrame({
            "depth": np.concatenate([roots["depth"].to_numpy(np.int64),
                                     sel["depth"].to_numpy(np.int64),
                                     over["depth"].to_numpy(np.int64)]),
            "cell": np.concatenate([roots["cell"].to_numpy(np.int64),
                                    sel["cell"].to_numpy(np.int64),
                                    over["cell"].to_numpy(np.int64)]),
            "n": np.concatenate([roots["n"].to_numpy(np.int64),
                                 sel["n"].to_numpy(np.int64),
                                 over["n"].to_numpy(np.int64)]),
            "overflow": np.r_[np.zeros(len(roots), bool),
                              np.zeros(len(sel), bool),
                              np.ones(len(over), bool)]})

    return shard_apply(agg.map_batches(fan, batch_format="pyarrow"),
                       ["key"], pick)


def q_zone_overlay(sf_dir: str):
    """Polygon-overlay statistics between the two zone tilings (the
    ST_Intersection + count aggregate of an overlay analysis): per
    (grid zone, admin zone) pair, the event count inside the
    intersection and the EXACT integer intersection area in milli^2.
    The zone families are formula-defined rectangles (sources/zones.py)
    so the event -> pair map is a pure row function — no broadcast, no
    join; the pair table is cardinality-bounded and enriched with
    areas after the combiner aggregate."""
    from osmquadtreepostgis_ray.sources.zones import (
        ADMIN_H, ADMIN_ID_BASE, ADMIN_W, AX, GRID_H, GRID_KEEP_LT,
        GRID_KEEP_MOD, GRID_KEEP_MULT, GRID_W, GX)

    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("gzone", "azone", "n")})
        lon = t.column("lon_milli").to_numpy()
        lat = t.column("lat_milli").to_numpy()
        gid = (lat // GRID_H) * GX + lon // GRID_W
        keep = (gid * GRID_KEEP_MULT) % GRID_KEEP_MOD < GRID_KEEP_LT
        aid = (lat // ADMIN_H) * AX + lon // ADMIN_W + ADMIN_ID_BASE
        key = gid[keep] * np.int64(1 << 20) + aid[keep]
        u, counts = np.unique(key, return_counts=True)
        return pa.table({"gzone": pa.array(u >> np.int64(20), pa.int64()),
                         "azone": pa.array(u & np.int64((1 << 20) - 1),
                                           pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["gzone", "azone"], {"n": ("n", "sum")})

    def enrich(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "gzone" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("gzone", "azone", "n", "inter_area")})
        g = t.column("gzone").to_numpy().astype(np.int64)
        a = t.column("azone").to_numpy().astype(np.int64) - ADMIN_ID_BASE
        gx0 = (g % GX) * GRID_W
        gy0 = (g // GX) * GRID_H
        ax0 = (a % AX) * ADMIN_W
        ay0 = (a // AX) * ADMIN_H
        iw = np.minimum(gx0 + GRID_W, ax0 + ADMIN_W) - np.maximum(gx0, ax0)
        ih = np.minimum(gy0 + GRID_H, ay0 + ADMIN_H) - np.maximum(gy0, ay0)
        return pa.table({"gzone": t.column("gzone"),
                         "azone": t.column("azone"),
                         "n": t.column("n"),
                         "inter_area": pa.array(iw * ih, pa.int64())})

    return agg.map_batches(enrich, batch_format="pyarrow") \
        .select_columns(["gzone", "azone", "n", "inter_area"])


CONTOUR_T = 0   # marching-squares corner indicator: count > CONTOUR_T


def q_contour_cells(sf_dir: str):
    """Marching-squares contour-cell census over the occupancy raster
    (the iso-line extraction primitive of contour/heatmap rendering):
    every 2x2 pixel window with at least one occupied corner classifies
    by the 4-bit occupancy code (bit dy*2+dx set iff corner
    (ax+dx, ay+dy) has count > CONTOUR_T); output is the 15-row code
    census.  Scale shape: each occupied DISTINCT pixel fans to <= 4
    window anchors (the raster_blur halo pattern), the shard kernel
    both assembles codes AND pre-counts them, so the final exchange
    carries <= 16 rows per shard."""
    G = 1 << CELL_DEPTH
    cells = q_rasterize(sf_dir)

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"key": z, "idx": z, "ind": z})
        tx, ty, _ = quadtree.decode(t.column("tile").to_numpy())
        gx = tx * 16 + t.column("px").to_numpy().astype(np.int64)
        gy = ty * 16 + t.column("py").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        keys, idxs, inds = [], [], []
        for dx in (0, 1):
            for dy in (0, 1):
                ax, ay = gx - dx, gy - dy
                m = (ax >= 0) & (ax <= G - 2) & (ay >= 0) & (ay <= G - 2)
                keys.append((ay * G + ax)[m])
                idxs.append(np.full(int(m.sum()), dy * 2 + dx, np.int64))
                inds.append((n[m] > CONTOUR_T).astype(np.int64))
        return pa.table({"key": pa.array(np.concatenate(keys), pa.int64()),
                         "idx": pa.array(np.concatenate(idxs), pa.int64()),
                         "ind": pa.array(np.concatenate(inds), pa.int64())})

    def census(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("code", "n_cells")})
        w = df["ind"].to_numpy(np.int64) << df["idx"].to_numpy(np.int64)
        codes = pd.DataFrame({"key": df["key"], "w": w}) \
            .groupby("key", sort=False)["w"].sum()
        u, counts = np.unique(codes.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"code": u,
                             "n_cells": counts.astype(np.int64)})

    part = shard_apply(cells.map_batches(fan, batch_format="pyarrow"),
                       ["key"], census)
    return sharded_agg(part, ["code"], {"n_cells": ("n_cells", "sum")}) \
        .select_columns(["code", "n_cells"])


# ----------------------- smoothing / visual vocabulary / length profile

def q_chaikin(sf_dir: str):
    """Chaikin corner-cutting line smoothing over user trajectories (the
    pre-render generalization step next to q_simplify_ways/q_densify):
    ONE iteration — each consecutive pair (P, P') in (ts, event_id)
    order emits Q = (3P + P')/4 and R = (P + 3P')/4, kept as x4-scaled
    integers so both engines stay exact.  One user-sharded exchange;
    the pair/emit step is a whole-shard vectorized diff (the
    q_trajectories segment pattern)."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["event_id", "user_id", "ts",
                         "lon_milli", "lat_milli"])

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "seq", "qx4", "qy4")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(ts_us=g["ts"].astype("int64")) \
            .sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        x = g["lon_milli"].to_numpy(np.int64)
        y = g["lat_milli"].to_numpy(np.int64)
        idx = np.arange(len(uid), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        start_of = starts[np.searchsorted(starts, idx, side="right") - 1]
        pos = idx - start_of
        same = uid[1:] == uid[:-1]
        u = uid[:-1][same]
        p = pos[:-1][same]
        x0, x1 = x[:-1][same], x[1:][same]
        y0, y1 = y[:-1][same], y[1:][same]
        return pd.DataFrame({
            "user_id": np.r_[u, u],
            "seq": np.r_[2 * p, 2 * p + 1],
            "qx4": np.r_[3 * x0 + x1, x0 + 3 * x1],
            "qy4": np.r_[3 * y0 + y1, y0 + 3 * y1]})

    return shard_apply(ds, ["user_id"], smooth)


def q_visual_words(sf_dir: str):
    """Bag-of-visual-words codebook census (stages/images.
    visual_words_partial): per 8-bit patch word, the total patch count
    and the number of distinct images containing it.  Two bounded
    exchanges: (word, image) partials -> per-pair sum -> per-word
    (sum, count) — the shuffle never carries pixels or per-patch
    rows."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import visual_words_partial

    part = read_images(sf_dir, with_bytes=True).map_batches(
        visual_words_partial, batch_format="pyarrow", batch_size=IMG_BATCH)
    pairs = sharded_agg(part, ["word", "image_id"],
                        {"n_patches": ("n_patches", "sum")})

    def wpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "word" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("word", "n_patches", "n_images")})
        w = t.column("word").to_numpy().astype(np.int64)
        n = t.column("n_patches").to_numpy().astype(np.int64)
        u, inv = np.unique(w, return_inverse=True)
        return pa.table({
            "word": pa.array(u, pa.int64()),
            "n_patches": pa.array(np.bincount(inv, weights=n)
                                  .astype(np.int64), pa.int64()),
            "n_images": pa.array(np.bincount(inv).astype(np.int64),
                                 pa.int64())})

    return sharded_agg(pairs.map_batches(wpart, batch_format="pyarrow"),
                       ["word"], {"n_patches": ("n_patches", "sum"),
                                  "n_images": ("n_images", "sum")}) \
        .select_columns(["word", "n_patches", "n_images"])


def q_image_dhash(sf_dir: str):
    """Difference-hash per image (stages/images.dhash_batch).  Row-pure;
    no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import dhash_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        dhash_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


LEN_HIST_MAX_BIT = 24    # documents are << 16M chars; structural cap


def q_len_histogram(sf_dir: str):
    """Sequence-length profile by power-of-two bucket (the
    length-distribution report a packing/curriculum pipeline starts
    from): bucket k holds docs with 2^k <= n_chars < 2^(k+1), exact via
    searchsorted on the power table (never floor(log2) floats).
    Combiner partials; the shuffle carries <= LEN_HIST_MAX_BIT rows per
    batch."""
    docs = read_table(sf_dir, "documents", columns=["n_chars"])
    powers = np.int64(1) << np.arange(1, LEN_HIST_MAX_BIT + 1,
                                      dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("bucket", "n_docs", "sum_chars")})
        n = t.column("n_chars").to_numpy().astype(np.int64)
        b = np.searchsorted(powers, n, side="right")
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "bucket": pa.array(u, pa.int64()),
            "n_docs": pa.array(np.bincount(inv).astype(np.int64),
                               pa.int64()),
            "sum_chars": pa.array(np.bincount(inv, weights=n)
                                  .astype(np.int64), pa.int64())})

    part = docs.map_batches(partial, batch_format="pyarrow")
    return sharded_agg(part, ["bucket"], {"n_docs": ("n_docs", "sum"),
                                          "sum_chars": ("sum_chars", "sum")}) \
        .select_columns(["bucket", "n_docs", "sum_chars"])


# --------------------- fertility / k-anonymity / edge census / silence

def q_fertility(sf_dir: str):
    """Tokenizer fertility per language (tokens per 1000 chars — the
    multilingual tokenizer-efficiency report): exact integer sums and
    a single floor division per bounded lang row.  Combiner partials
    carry (lang, sum_tokens, sum_chars) only."""
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    ds = add_text_stats(read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "sum_tokens": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas(),
            "tok": t.column("n_tokens").to_numpy().astype(np.int64),
            "ch": t.column("n_chars").to_numpy().astype(np.int64)})
        g = df.groupby("lang", sort=False).agg(
            sum_tokens=("tok", "sum"), sum_chars=("ch", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["lang"], {"sum_tokens": ("sum_tokens", "sum"),
                                 "sum_chars": ("sum_chars", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lang" not in t.column_names:
            return pa.table({"lang": pa.array([], pa.string()),
                             "sum_tokens": pa.array([], pa.int64()),
                             "sum_chars": pa.array([], pa.int64()),
                             "fert_milli": pa.array([], pa.int64())})
        st = t.column("sum_tokens").to_numpy().astype(np.int64)
        sc = t.column("sum_chars").to_numpy().astype(np.int64)
        return pa.table({"lang": t.column("lang"),
                         "sum_tokens": pa.array(st, pa.int64()),
                         "sum_chars": pa.array(sc, pa.int64()),
                         "fert_milli": pa.array(st * 1000 // sc, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["lang", "sum_tokens", "sum_chars", "fert_milli"])


KANON_DEPTH = 6
KANON_CAP = 8


def q_k_anon(sf_dir: str):
    """Spatial k-anonymity audit (the privacy screen a location dataset
    release runs): each user's HOME cell is the depth-6 mode of their
    event cells (count desc, then lowest cell id — deterministic); the
    report histograms home cells by resident-user count, capped at
    KANON_CAP.  Every exchange is over aggregated tables: (user, cell)
    combiner counts -> user-sharded mode -> per-cell combiner counts ->
    bounded histogram."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("user_id", "cell", "n")})
        u = t.column("user_id").to_numpy().astype(np.int64)
        c6 = quadtree.at_depth(t.column("cell").to_numpy(), KANON_DEPTH)
        df = pd.DataFrame({"user_id": u, "cell": c6}) \
            .groupby(["user_id", "cell"], sort=False).size() \
            .reset_index(name="n")
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    uc = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     ["user_id", "cell"], {"n": ("n", "sum")})

    def home_of(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                                 "nu": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["user_id", "n", "cell"],
                            ascending=[True, False, True], kind="mergesort")
        home = df.drop_duplicates("user_id")
        g = home.groupby("cell", sort=False).size().reset_index(name="nu")
        g["nu"] = g["nu"].astype(np.int64)
        return g

    hc = sharded_agg(shard_apply(uc, ["user_id"], home_of),
                     ["cell"], {"nu": ("nu", "sum")})

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "nu" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("k", "n_cells", "n_users")})
        nu = t.column("nu").to_numpy().astype(np.int64)
        k = np.minimum(nu, KANON_CAP)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table({
            "k": pa.array(u, pa.int64()),
            "n_cells": pa.array(np.bincount(inv).astype(np.int64),
                                pa.int64()),
            "n_users": pa.array(np.bincount(inv, weights=nu)
                                .astype(np.int64), pa.int64())})

    return sharded_agg(hc.map_batches(hist, batch_format="pyarrow"),
                       ["k"], {"n_cells": ("n_cells", "sum"),
                               "n_users": ("n_users", "sum")}) \
        .select_columns(["k", "n_cells", "n_users"])


def q_tile_edge_census(sf_dir: str):
    """Tile-border census (the map-sheet edge-matching audit — how many
    features per tile sit on the boundary pixel ring and would need
    neighbor-tile context to render seamlessly): edge iff the depth-12
    pixel within the depth-8 tile touches the 16x16 ring.  Pure row
    function; combiner partials per tile."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "n_total", "n_edge")})
        cell = t.column("cell").to_numpy()
        tile = t.column("tile").to_numpy()
        ix, iy, _ = quadtree.decode(cell)
        px, py = ix & 15, iy & 15
        edge = ((px == 0) | (px == 15) | (py == 0) | (py == 15)) \
            .astype(np.int64)
        df = pd.DataFrame({"tile": tile, "edge": edge}) \
            .groupby("tile", sort=False).agg(
                n_total=("edge", "size"), n_edge=("edge", "sum")) \
            .reset_index()
        for c in ("n_total", "n_edge"):
            df[c] = df[c].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return sharded_agg(part, ["tile"], {"n_total": ("n_total", "sum"),
                                        "n_edge": ("n_edge", "sum")}) \
        .select_columns(["tile", "n_total", "n_edge"])


def q_audio_silence(sf_dir: str):
    """Silence-run detection per audio track (stages/audio.SilenceRuns).
    Row-pure; tracks with zero silent samples emit nothing."""
    from osmquadtreepostgis_ray.sources.audio import read_audio
    from osmquadtreepostgis_ray.stages.audio import SilenceRuns
    from osmquadtreepostgis_ray.util import worker_cached

    return read_audio(sf_dir).map_batches(
        worker_cached(SilenceRuns), batch_format="pyarrow",
        batch_size=AUDIO_BATCH)


# ------------------------- gravity lift / decayed counts / seam screen

def _ts_bounds(sf_dir: str):
    """Global (lo, hi) epoch-us bounds of events — the 2-scalar combiner
    reduce shared by q_time_split/q_decay_counts (driver holds two
    ints, never rows)."""
    ds = read_table(sf_dir, "events", columns=["ts"])

    def mm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        return pa.table({"lo": pa.array([ts.min()], pa.int64()),
                         "hi": pa.array([ts.max()], pa.int64())})

    bounds = [t for t in ray.get(ds.map_batches(
        mm, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and "lo" in t.column_names]
    return (int(min(t.column("lo").to_numpy().min() for t in bounds)),
            int(max(t.column("hi").to_numpy().max() for t in bounds)))


DECAY_HL_DIV = 8    # half-life = span/8 (ages span 0..8 half-lives)
DECAY_K = 32        # scores scaled by 2^K so the decay stays integer


def q_decay_counts(sf_dir: str):
    """Time-decayed event counts per tile (the freshness-weighted
    heatmap of a streaming leaderboard): each event contributes
    2^(K - age_half_lives) — an EXACT integer exponential decay (the
    float e^-lambda*t of the textbook formula is not cross-engine
    stable; halving per integer half-life is).  Global bounds are the
    2-scalar reduce; everything else is one combiner pass."""
    lo, hi = _ts_bounds(sf_dir)
    hl = (hi - lo) // DECAY_HL_DIV + 1

    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "score")})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        age = (hi - ts) // hl
        w = np.int64(1) << (DECAY_K - age)
        tile = t.column("tile").to_numpy()
        u, inv = np.unique(tile, return_inverse=True)
        score = np.zeros(len(u), np.int64)
        np.add.at(score, inv, w)    # int64-exact (not bincount weights)
        return pa.table({"tile": pa.array(u, pa.int64()),
                         "score": pa.array(score, pa.int64())})

    part = ds.map_batches(partial, batch_format="pyarrow")
    return sharded_agg(part, ["tile"], {"score": ("score", "sum")}) \
        .select_columns(["tile", "score"])


def q_od_gravity(sf_dir: str):
    """Gravity-model lift over the OD flow matrix (the
    observed-vs-expected screen of movement analytics): per (from, to)
    pair, lift_milli = n * total * 1000 // (o_total * d_total) — the
    exact integer form of n / (o*d/total).  Marginals are aggregated
    tile tables (bounded by occupied tiles), broadcast-joined onto the
    flow table as object-store refs (stages/joins.broadcast_join —
    never through the driver)."""
    from osmquadtreepostgis_ray.stages.joins import broadcast_join

    flows = q_od_flows(sf_dir).materialize()

    def marg(col: str, out: str):
        def p(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or col not in t.column_names:
                return pa.table({col: pa.array([], pa.int64()),
                                 out: pa.array([], pa.int64())})
            k = t.column(col).to_numpy().astype(np.int64)
            n = t.column("n").to_numpy().astype(np.int64)
            u, inv = np.unique(k, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, n)
            return pa.table({col: pa.array(u, pa.int64()),
                             out: pa.array(s, pa.int64())})
        return sharded_agg(flows.map_batches(p, batch_format="pyarrow"),
                           [col], {out: (out, "sum")}).materialize()

    om = marg("from_tile", "o_total")
    dm = marg("to_tile", "d_total")
    total = int(sum(int(t.column("o_total").to_numpy().sum())
                    for t in ray.get(om.to_arrow_refs())
                    if t.num_rows and "o_total" in t.column_names))

    j = broadcast_join(broadcast_join(flows, om, on="from_tile"),
                       dm, on="to_tile")

    def lift(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("from_tile", "to_tile", "n",
                                       "o_total", "d_total", "lift_milli")})
        n = t.column("n").to_numpy().astype(np.int64)
        o = t.column("o_total").to_numpy().astype(np.int64)
        d = t.column("d_total").to_numpy().astype(np.int64)
        return pa.table({"from_tile": t.column("from_tile"),
                         "to_tile": t.column("to_tile"),
                         "n": pa.array(n, pa.int64()),
                         "o_total": pa.array(o, pa.int64()),
                         "d_total": pa.array(d, pa.int64()),
                         "lift_milli": pa.array(n * total * 1000 // (o * d),
                                                pa.int64())})

    return j.map_batches(lift, batch_format="pyarrow") \
        .select_columns(["from_tile", "to_tile", "n", "o_total",
                         "d_total", "lift_milli"])


def q_seam_cols(sf_dir: str):
    """Lowest-energy straight seam column per image
    (stages/images.seam_cols_batch).  Row-pure; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import seam_cols_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        seam_cols_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


# --------------------- interval union / spatial reach / degree mixing

IVU_DUR_US = 7_200_000_000   # each event opens a 2-hour activity interval


def q_interval_union(sf_dir: str):
    """Per-user union length of activity intervals (the merged-coverage
    sweep behind billing/uptime/session-coverage analytics): each event
    opens [ts, ts + IVU_DUR_US); overlapping or touching intervals
    merge; output covered microseconds and island count.  One
    user-sharded exchange; the sweep is a whole-shard vectorized
    grouped cummax (no per-user loop)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "covered_us", "n_islands")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(s=g["ts"].astype("int64")) \
            .sort_values(["user_id", "s", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        e = s + IVU_DUR_US
        cm = g.assign(e=e).groupby("user_id", sort=False)["e"].cummax() \
            .to_numpy(np.int64)
        prev = np.r_[np.int64(0), cm[:-1]]
        first = np.r_[True, u[1:] != u[:-1]]
        new = first | (s > prev)
        isl = np.cumsum(new)
        # per island: first row holds min start (sorted); island end is
        # the cummax at its last row
        starts_idx = np.flatnonzero(new)
        ends_idx = np.r_[starts_idx[1:] - 1, len(s) - 1]
        length = cm[ends_idx] - s[starts_idx]
        iu = u[starts_idx]
        uu, inv = np.unique(iu, return_inverse=True)
        covered = np.zeros(len(uu), np.int64)
        np.add.at(covered, inv, length)
        n_isl = np.bincount(inv).astype(np.int64)
        return pd.DataFrame({"user_id": uu, "covered_us": covered,
                             "n_islands": n_isl})

    return shard_apply(ds, ["user_id"], sweep)


def q_user_extent(sf_dir: str):
    """Per-user spatial reach (bounding-box extent — the roaming-radius
    report): exact integer bbox and its area.  Combiner min/max
    partials; the shuffle carries one row per (batch, user)."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cols = ("user_id", "x0", "x1", "y0", "y1", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "x": t.column("lon_milli").to_numpy(),
                           "y": t.column("lat_milli").to_numpy()})
        g = df.groupby("user_id", sort=False).agg(
            x0=("x", "min"), x1=("x", "max"),
            y0=("y", "min"), y1=("y", "max"), n=("x", "size")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["user_id"],
                      {"x0": ("x0", "min"), "x1": ("x1", "max"),
                       "y0": ("y0", "min"), "y1": ("y1", "max"),
                       "n": ("n", "sum")})

    def area(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x0" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("user_id", "x0", "x1", "y0", "y1",
                                       "n", "bbox_area")})
        x0 = t.column("x0").to_numpy().astype(np.int64)
        x1 = t.column("x1").to_numpy().astype(np.int64)
        y0 = t.column("y0").to_numpy().astype(np.int64)
        y1 = t.column("y1").to_numpy().astype(np.int64)
        return t.append_column("bbox_area",
                               pa.array((x1 - x0) * (y1 - y0), pa.int64()))

    return agg.map_batches(area, batch_format="pyarrow") \
        .select_columns(["user_id", "x0", "x1", "y0", "y1", "n",
                         "bbox_area"])


def q_degree_mix(sf_dir: str):
    """Degree-assortativity ingredients of the document graph (the
    mixing-pattern screen — hub-hub vs hub-leaf wiring): over DIRECTED
    edges (both orientations of the chain+chord graph), the exact
    integer sums n_edges, sum(d_u*d_v), sum(d_u), sum(d_u^2) — Pearson
    assortativity is a pure rational of these.  Degrees attach to the
    data-scaled edge table via bucket hash joins (never a node-table
    broadcast); the final reduce is a 4-scalar combiner."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        d1 = ids[(ids >= 1) & (ids % 5 != 0)]
        d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
        a = np.concatenate([d1 - 1, d2 - 2])
        b = np.concatenate([d1, d2])
        return pa.table({"src": pa.array(np.r_[a, b], pa.int64()),
                         "dst": pa.array(np.r_[b, a], pa.int64())})

    es = docs.map_batches(edges, batch_format="pyarrow").materialize()

    def dpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        u, counts = np.unique(t.column("src").to_numpy(), return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "d": pa.array(counts.astype(np.int64), pa.int64())})

    deg = sharded_agg(es.map_batches(dpart, batch_format="pyarrow"),
                      ["v"], {"d": ("d", "sum")}).materialize()

    def as_key(name: str, dname: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "v" not in t.column_names:
                return pa.table({name: pa.array([], pa.int64()),
                                 dname: pa.array([], pa.int64())})
            return pa.table({name: t.column("v"), dname: t.column("d")})
        return deg.map_batches(f, batch_format="pyarrow")

    j1 = bucket_hash_join(es, as_key("src", "du"), "src")
    j2 = bucket_hash_join(j1, as_key("dst", "dv"), "dst")

    def sums(t: pa.Table) -> pa.Table:
        cols = ("n_edges", "sum_dd", "sum_d", "sum_d2")
        if t.num_rows == 0 or "du" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        du = t.column("du").to_numpy().astype(np.int64)
        dv = t.column("dv").to_numpy().astype(np.int64)
        return pa.table({"n_edges": pa.array([t.num_rows], pa.int64()),
                         "sum_dd": pa.array([int((du * dv).sum())], pa.int64()),
                         "sum_d": pa.array([int(du.sum())], pa.int64()),
                         "sum_d2": pa.array([int((du * du).sum())], pa.int64())})

    part = j2.map_batches(sums, batch_format="pyarrow")
    tabs = [t for t in ray.get(part.to_arrow_refs())
            if t.num_rows and "n_edges" in t.column_names]
    out = {c: int(sum(int(t.column(c).to_numpy().sum()) for t in tabs))
           for c in ("n_edges", "sum_dd", "sum_d", "sum_d2")}
    return pa.table({c: pa.array([v], pa.int64()) for c, v in out.items()})


# ------------------- trend regression / SCD-2 ranges / negative sampling

TREND_HOUR_US = 3_600_000_000


def q_trend_fit(sf_dir: str):
    """Per-user least-squares trend of value over time, kept RATIONAL
    (the regression-slope screen of drift analytics): with t = whole
    hours since the user's own first event and y = value cents,
    slope = slope_num / slope_den where slope_num = n*S(ty) - S(t)*S(y)
    and slope_den = n*S(t^2) - S(t)^2 — exact int64 (t <= span hours,
    y cents bounded; see magnitudes note).  One user-sharded exchange;
    per-user moments are C-level grouped sums."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "value"])

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n", "slope_num", "slope_den")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(tu=g["ts"].astype("int64"),
                     y=np.rint(g["value"].to_numpy() * 100).astype(np.int64))
        g["th"] = (g["tu"] - g.groupby("user_id", sort=False)["tu"]
                   .transform("min")) // TREND_HOUR_US
        g["ty"] = g["th"] * g["y"]
        g["t2"] = g["th"] * g["th"]
        a = g.groupby("user_id", sort=False).agg(
            n=("y", "size"), st=("th", "sum"), st2=("t2", "sum"),
            sy=("y", "sum"), sty=("ty", "sum")).reset_index()
        n = a["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": a["user_id"].to_numpy(np.int64),
            "n": n,
            "slope_num": n * a["sty"].to_numpy(np.int64)
            - a["st"].to_numpy(np.int64) * a["sy"].to_numpy(np.int64),
            "slope_den": n * a["st2"].to_numpy(np.int64)
            - a["st"].to_numpy(np.int64) ** 2})

    return shard_apply(ds, ["user_id"], fit)


def q_history_ranges(sf_dir: str):
    """SCD-type-2 history compaction per user (the slowly-changing-
    dimension build of warehouse ingestion): consecutive events with
    the same event_type collapse into one validity range; output per
    user is the range count, change count and total in-range span.
    One user-sharded exchange, vectorized run segmentation."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "event_type"])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": np.int64, "n_ranges": np.int64,
                "n_changes": np.int64, "sum_span_us": np.int64}
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=v)
                                 for c, v in cols.items()})
        g = g.assign(tu=g["ts"].astype("int64")) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["tu"].to_numpy(np.int64)
        v = g["event_type"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        brk = first | np.r_[True, v[1:] != v[:-1]]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:] - 1, len(t) - 1]
        span = t[ends] - t[starts]
        ru = u[starts]
        uu, inv = np.unique(ru, return_inverse=True)
        n_ranges = np.bincount(inv).astype(np.int64)
        sum_span = np.zeros(len(uu), np.int64)
        np.add.at(sum_span, inv, span)
        return pd.DataFrame({"user_id": uu, "n_ranges": n_ranges,
                             "n_changes": n_ranges - 1,
                             "sum_span_us": sum_span})

    return shard_apply(ds, ["user_id"], runs)


NEG_K = 3           # negatives kept per node
NEG_PROPOSE = 6     # hash proposals per node (>= K survive w.h.p.)
NEG_A = 2654435761
NEG_B = 40503


def q_link_negatives(sf_dir: str):
    """Deterministic negative sampling for link prediction (the
    contrastive-training companion of q_link_jaccard): each node
    proposes NEG_PROPOSE hash candidates, true edges are removed by a
    distributed ANTI join on the packed (src, dst) key (never an edge
    broadcast), and the first NEG_K survivors per node (by proposal
    index) are kept.  Hash products need doc_id * NEG_A < 2^63 —
    fine for catalog-sized id spaces; re-range ids first beyond that."""
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join

    docs = read_table(sf_dir, "documents", columns=["doc_id"]) \
        .materialize()

    tabs = [t for t in ray.get(docs.to_arrow_refs())
            if t.num_rows and "doc_id" in t.column_names]
    N = int(max(int(t.column("doc_id").to_numpy().max()) for t in tabs)) + 1
    SHIFT = np.int64(1) << np.int64(32)
    assert N < int(SHIFT)

    def cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("key", "src", "neg_dst", "j")})
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        src = np.repeat(ids, NEG_PROPOSE)
        j = np.tile(np.arange(NEG_PROPOSE, dtype=np.int64), len(ids))
        neg = (src * NEG_A + j * NEG_B + 1) % N
        keep = neg != src
        src, j, neg = src[keep], j[keep], neg[keep]
        return pa.table({"key": pa.array(src * SHIFT + neg, pa.int64()),
                         "src": pa.array(src, pa.int64()),
                         "neg_dst": pa.array(neg, pa.int64()),
                         "j": pa.array(j, pa.int64())})

    def ekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64())})
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        d1 = ids[(ids >= 1) & (ids % 5 != 0)]
        d2 = ids[(ids >= 2) & ((ids - 2) % 3 == 0)]
        a = np.concatenate([d1 - 1, d2 - 2])
        b = np.concatenate([d1, d2])
        src = np.r_[a, b]
        dst = np.r_[b, a]
        return pa.table({"key": pa.array(src * SHIFT + dst, pa.int64())})

    cands = docs.map_batches(cand, batch_format="pyarrow")
    edges = docs.map_batches(ekey, batch_format="pyarrow")
    anti = bucket_semi_join(cands, edges, "key", anti=True)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("src", "neg_dst", "j")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["src", "j"], kind="mergesort")
        g = g.groupby("src", sort=False).head(NEG_K)
        return g[["src", "neg_dst", "j"]].reset_index(drop=True)

    return shard_apply(anti, ["src"], topk)


# ------------------- disorder / revisit / cross-modal correlation ops

def q_inversions(sf_dir: str):
    """Per-user Kendall-tau disorder numerator (ordinal value/time
    concordance — drift screening without floats): the number of event
    pairs, in (ts, event_id) order, whose value-cents DECREASE, plus
    the tie count; tau is a pure rational of (n, n_inv, n_tie).  One
    user-sharded exchange; the pair scan runs chunked O(n^2) per user
    on the bounded per-user row count (documented: re-chunk by day at
    planetary per-user volumes)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "value"])

    def inv(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n", "n_inv", "n_tie")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(tu=g["ts"].astype("int64"),
                     y=np.rint(g["value"].to_numpy() * 100)
                     .astype(np.int64)) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        rows = []
        for uid, gg in g.groupby("user_id", sort=False):
            y = gg["y"].to_numpy(np.int64)
            n = len(y)
            # full pair matrix: per-user n is bounded (re-chunk by day
            # at planetary per-user volumes before this grows past RAM)
            m = y[:, None]
            upper = np.tri(n, k=-1, dtype=bool).T
            n_inv = int(((m > y[None, :]) & upper).sum())
            n_tie = int(((m == y[None, :]) & upper).sum())
            rows.append((uid, n, n_inv, n_tie))
        return pd.DataFrame(rows, columns=list(cols))

    return shard_apply(ds, ["user_id"], inv)


def q_revisits(sf_dir: str):
    """Per-user revisit analysis (first-seen cell dedup in TIME order —
    the exploration-vs-routine screen of mobility analytics): events
    whose depth-12 cell already appeared earlier in the user's
    timeline count as revisits.  One user-sharded exchange; first-seen
    flags via pandas grouped cumcount."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["event_id", "user_id", "ts", "cell"])

    def rv(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_events", "n_cells", "n_revisits")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(tu=g["ts"].astype("int64")) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        seen = g.groupby(["user_id", "cell"], sort=False).cumcount()
        g = g.assign(re=(seen > 0).astype(np.int64))
        a = g.groupby("user_id", sort=False).agg(
            n_events=("re", "size"), n_revisits=("re", "sum")).reset_index()
        nc = g.drop_duplicates(["user_id", "cell"]) \
            .groupby("user_id", sort=False).size()
        a["n_cells"] = nc.loc[a["user_id"]].to_numpy(np.int64)
        for c in ("n_events", "n_revisits", "n_cells"):
            a[c] = a[c].astype(np.int64)
        return a[["user_id", "n_events", "n_cells", "n_revisits"]]

    return shard_apply(ds, ["user_id"], rv)


def q_modal_corr(sf_dir: str):
    """Cross-modal correlation ingredients (image brightness vs audio
    loudness per document — the dataset-health screen of a paired
    multimodal corpus): x = per-image mean pixel, y = per-track
    mean |sample|, joined by doc id, reduced to the exact integer
    Pearson moments (n, sx, sy, sxy, sx2, sy2).  Each modality's stats
    come from its existing row-pure decode stage; the join is a bucket
    hash join on doc_id (both sides data-scaled); the final reduce is
    a 6-scalar combiner."""
    from osmquadtreepostgis_ray.sources.audio import read_audio
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.audio import AudioFeatures
    from osmquadtreepostgis_ray.stages.images import DecodeStats
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join
    from osmquadtreepostgis_ray.util import worker_cached

    img = read_images(sf_dir, with_bytes=True).map_batches(
        worker_cached(DecodeStats), batch_format="pyarrow",
        batch_size=IMG_BATCH)

    def ix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "image_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        ids = np.asarray([int(s[3:]) for s in
                          t.column("image_id").to_pylist()], np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "x": t.column("mean_pixel").cast(pa.int64())})

    aud = read_audio(sf_dir).map_batches(
        worker_cached(AudioFeatures), batch_format="pyarrow",
        batch_size=AUDIO_BATCH)

    def ay(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "audio_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        ids = np.asarray([int(s[3:]) for s in
                          t.column("audio_id").to_pylist()], np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "y": t.column("mean_abs").cast(pa.int64())})

    j = bucket_hash_join(img.map_batches(ix, batch_format="pyarrow"),
                         aud.map_batches(ay, batch_format="pyarrow"),
                         "doc_id")

    def moments(t: pa.Table) -> pa.Table:
        cols = ("n", "sx", "sy", "sxy", "sx2", "sy2")
        if t.num_rows == 0 or "x" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        x = t.column("x").to_numpy().astype(np.int64)
        y = t.column("y").to_numpy().astype(np.int64)
        vals = (t.num_rows, int(x.sum()), int(y.sum()),
                int((x * y).sum()), int((x * x).sum()), int((y * y).sum()))
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in zip(cols, vals)})

    part = j.map_batches(moments, batch_format="pyarrow")
    tabs = [t for t in ray.get(part.to_arrow_refs())
            if t.num_rows and "n" in t.column_names]
    out = {c: int(sum(int(t.column(c).to_numpy().sum()) for t in tabs))
           for c in ("n", "sx", "sy", "sxy", "sx2", "sy2")}
    return pa.table({c: pa.array([v], pa.int64()) for c, v in out.items()})


# ------------------- lang-id eval / cross-source contamination rollups

def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix (the classifier-eval table: labeled
    lang x n-gram-heuristic prediction): combiner counts over the
    bounded (lang, lang_pred) key space."""
    from osmquadtreepostgis_ray.stages.textstats import add_text_stats
    ds = add_text_stats(read_table(sf_dir, "documents",
                                   columns=["doc_id", "text", "lang"]))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "lang_pred": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pd.DataFrame({"lang": t.column("lang").to_pandas(),
                          "lang_pred": t.column("lang_pred").to_pandas()}) \
            .groupby(["lang", "lang_pred"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = ds.map_batches(partial, batch_format="pyarrow")
    return sharded_agg(part, ["lang", "lang_pred"], {"n": ("n", "sum")}) \
        .select_columns(["lang", "lang_pred", "n"])


def _docs_source(sf_dir: str, key: str):
    """documents projected to (key, source_<key>) for pair enrichment."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             f"source_{key}": pa.array([], pa.string())})
        return pa.table({key: t.column("doc_id"),
                         f"source_{key}": t.column("source")})

    return docs.map_batches(f, batch_format="pyarrow")


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix (which corpus sources share
    near-duplicate content — the dedup-audit rollup a mixture curator
    reads): MinHash-LSH near-dup pairs enriched with each side's source
    via bucket hash joins (pairs and documents are both data-scaled;
    no broadcast), pair key canonicalized to an unordered (source_a <=
    source_b) cell, counted.  Output is bounded by sources^2."""
    from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

    pairs = q_minhash_pairs(sf_dir).materialize()
    j1 = bucket_hash_join(pairs, _docs_source(sf_dir, "a"), "a") \
        .map_batches(lambda t: t, batch_format="pyarrow")  # pandas-block
    # output of the first join -> Arrow so the second join can read a
    # pyarrow schema (the CLAUDE.md lazy-schema/typed-block hazard)
    j = bucket_hash_join(j1, _docs_source(sf_dir, "b"), "b")

    def cellcount(t: pa.Table) -> pa.Table:
        cols = ("source_a", "source_b", "n_pairs")
        if t.num_rows == 0 or "source_a" not in t.column_names:
            return pa.table({"source_a": pa.array([], pa.string()),
                             "source_b": pa.array([], pa.string()),
                             "n_pairs": pa.array([], pa.int64())})
        sa = np.asarray(t.column("source_a").to_pylist(), dtype=object)
        sb = np.asarray(t.column("source_b").to_pylist(), dtype=object)
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        g = pd.DataFrame({"source_a": lo, "source_b": hi}) \
            .groupby(["source_a", "source_b"], sort=False).size() \
            .reset_index(name="n_pairs")
        g["n_pairs"] = g["n_pairs"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = j.map_batches(cellcount, batch_format="pyarrow")
    return sharded_agg(part, ["source_a", "source_b"],
                       {"n_pairs": ("n_pairs", "sum")}) \
        .select_columns(["source_a", "source_b", "n_pairs"])


def q_near_dup_rate(sf_dir: str):
    """Per-source near-duplicate participation rate (the dedup health
    metric: how much of each source is entangled in near-dup pairs):
    distinct doc ids over both pair sides, source-joined, rated per
    mille against per-source totals.  The per-source table is bounded,
    so totals broadcast; the dup-doc side stays sharded."""
    from osmquadtreepostgis_ray.stages.joins import broadcast_join

    pairs = q_minhash_pairs(sf_dir).materialize()

    def ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table({"doc_id": pa.array(np.unique(np.r_[a, b]),
                                            pa.int64())})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
        return g.drop_duplicates("doc_id")[["doc_id"]]

    dup_ids = shard_apply(pairs.map_batches(ids, batch_format="pyarrow"),
                          ["doc_id"], dedup)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def pad(t: pa.Table) -> pa.Table:
        # dup-marker rows: null source (the typed-union join pattern)
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        return t.append_column("source", pa.nulls(t.num_rows, pa.string()))

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "dup": pd.Series([], dtype=bool)})
        flag = g["source"].isna()
        dupids = set(g.loc[flag, "doc_id"].tolist())
        base = g[~flag]
        return pd.DataFrame({"source": base["source"],
                             "dup": base["doc_id"].isin(dupids)})

    withsrc = shard_apply(
        docs.union(dup_ids.map_batches(pad, batch_format="pyarrow")),
        ["doc_id"], mark)

    def rate_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        g = pd.DataFrame({"source": t.column("source").to_pandas(),
                          "dup": t.column("dup").to_numpy()}) \
            .groupby("source", sort=False).agg(
                n_docs=("dup", "size"), n_dup=("dup", "sum")).reset_index()
        for c in ("n_docs", "n_dup"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(withsrc.map_batches(rate_part, batch_format="pyarrow"),
                      ["source"], {"n_docs": ("n_docs", "sum"),
                                   "n_dup": ("n_dup", "sum")})

    def rate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64()),
                             "dup_permille": pa.array([], pa.int64())})
        nd = t.column("n_docs").to_numpy().astype(np.int64)
        du = t.column("n_dup").to_numpy().astype(np.int64)
        return t.append_column("dup_permille",
                               pa.array(du * 1000 // nd, pa.int64()))

    return agg.map_batches(rate, batch_format="pyarrow") \
        .select_columns(["source", "n_docs", "n_dup", "dup_permille"])


# ----------------- equalization / retrieval eval / box-filter screen

def q_hist_equalize(sf_dir: str):
    """Histogram-equalization audit per image
    (stages/images.hist_equalize_batch).  Row-pure; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import hist_equalize_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        hist_equalize_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_box5(sf_dir: str):
    """5x5 box-filter summary over the 16x16 thumbnails
    (stages/images.box5_batch).  Row-pure; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import box5_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        box5_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_crossmodal_recall(sf_dir: str, k: int = 5, nq: int = 8):
    """Cross-modal retrieval eval (recall@k against the same-document
    ground truth — the CLIP-eval loop over q_crossmodal_knn): one row
    (n_queries, hits_at_k).  q_crossmodal_knn already distributes the
    top-k merge (util.topk_per_key) and returns the BOUNDED nq x k
    table, so the recall itself is a driver-side scalar fold."""
    topk = q_crossmodal_knn(sf_dir, k=k, nq=nq)
    q = topk.column("query_id").to_numpy().astype(np.int64)
    d = topk.column("doc_id").to_numpy().astype(np.int64)
    uq = np.unique(q)
    hits = int(sum(1 for qq in uq if (d[q == qq] == qq).any()))
    return pa.table({"n_queries": pa.array([len(uq)], pa.int64()),
                     "hits_at_k": pa.array([hits], pa.int64())})


# ----------------- attribution / burstiness / character diversity ops

def q_first_last_touch(sf_dir: str):
    """First/last-touch attribution matrix (the marketing-attribution
    rollup): per user, the event_type of their first and last event in
    (ts, event_id) order; counted over the bounded (first, last) key
    space.  One user-sharded exchange with an in-shard combiner, so the
    final exchange carries type^2-bounded partials."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts", "event_type"])

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"first_type": pd.Series([], dtype=object),
                                 "last_type": pd.Series([], dtype=object),
                                 "n_users": pd.Series([], dtype=np.int64)})
        g = g.assign(tu=g["ts"].astype("int64")) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        last = np.r_[u[1:] != u[:-1], True]
        v = g["event_type"].to_numpy()
        out = pd.DataFrame({"first_type": v[first], "last_type": v[last]}) \
            .groupby(["first_type", "last_type"], sort=False).size() \
            .reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    part = shard_apply(ds, ["user_id"], fl)
    return sharded_agg(part, ["first_type", "last_type"],
                       {"n_users": ("n_users", "sum")}) \
        .select_columns(["first_type", "last_type", "n_users"])


def q_burstiness(sf_dir: str):
    """Per-user inter-arrival gap statistics (the burstiness/anomaly
    screen of event-stream QA): exact integer gap count, sum, min, max
    and sum of squares (gap seconds — squares of microsecond gaps would
    overflow int64 at month-long spans x thousands of events).  One
    user-sharded exchange; gaps are whole-shard vectorized diffs."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_gaps", "sum_gap_s", "min_gap_s",
                "max_gap_s", "sum_gap2_s")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.assign(tu=g["ts"].astype("int64")) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["tu"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gap = (np.diff(t) // 1_000_000)[same]
        gu = u[1:][same]
        rows = []
        for uid, lo, hi in zip(*_user_segments(gu)):
            seg = gap[lo:hi]
            rows.append((uid, len(seg), int(seg.sum()), int(seg.min()),
                         int(seg.max()), int((seg * seg).sum())))
        return pd.DataFrame(rows, columns=list(cols))

    return shard_apply(ds, ["user_id"], gaps)


def _user_segments(sorted_ids: np.ndarray):
    """(ids, starts, ends) of equal-value runs in a sorted id array."""
    if not len(sorted_ids):
        z = np.empty(0, np.int64)
        return z, z, z
    starts = np.flatnonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1]])
    ends = np.r_[starts[1:], len(sorted_ids)]
    return sorted_ids[starts], starts, ends


def q_char_simpson(sf_dir: str):
    """Character-level Simpson (collision) index numerator per document
    (the gibberish/repetition quality screen next to q_repetition, at
    character granularity): sum over characters of count^2 — exact
    int64, higher = more repetitive.  Row-pure vectorized byte
    bincounts; no shuffle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def simpson(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("doc_id", "n_chars", "sum_cnt2")})
        ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        lens = np.array([len(s) for s in texts], np.int64)
        buf = np.frombuffer("".join(texts).encode("latin-1"), np.uint8)
        off = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        hist = np.bincount(off * 256 + buf,
                           minlength=len(texts) * 256) \
            .reshape(len(texts), 256).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(lens, pa.int64()),
                         "sum_cnt2": pa.array((hist * hist).sum(axis=1),
                                              pa.int64())})

    return docs.map_batches(simpson, batch_format="pyarrow")


# ------------------- geofence dwell / vocab tail / place turnover ops

FENCE_AZONE = 100000 + 7     # the fence: admin zone 7 (always present)


def q_fence_dwell(sf_dir: str):
    """Geofence dwell accounting (the geofencing primitive of fleet /
    footfall analytics): per user, total time spanned by consecutive
    event pairs that BOTH fall inside the fence (admin zone 7) plus the
    number of inside-runs.  Membership is a pure row function of the
    integer geotag; one user-sharded exchange, vectorized pair logic."""
    from osmquadtreepostgis_ray.sources.zones import (ADMIN_H,
                                                      ADMIN_ID_BASE,
                                                      ADMIN_W, AX)

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id",
                                               "ts"])

    def dwell(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_inside", "n_runs", "dwell_us")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        lon, lat = geotag.event_lonlat_milli(g["user_id"].to_numpy(),
                                             g["event_id"].to_numpy())
        az = (lat // ADMIN_H) * AX + lon // ADMIN_W + ADMIN_ID_BASE
        g = g.assign(tu=g["ts"].astype("int64"),
                     inside=(az == FENCE_AZONE)) \
            .sort_values(["user_id", "tu", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["tu"].to_numpy(np.int64)
        ins = g["inside"].to_numpy()
        same = u[1:] == u[:-1]
        both = same & ins[1:] & ins[:-1]
        dt = np.where(both, np.diff(t), 0)
        first = np.r_[True, u[1:] != u[:-1]]
        run_start = ins & (first | np.r_[False, ~ins[:-1]])
        rows = []
        for uid, lo, hi in zip(*_user_segments(u)):
            n_in = int(ins[lo:hi].sum())
            if n_in == 0:
                continue
            rows.append((uid, n_in, int(run_start[lo:hi].sum()),
                         int(dt[lo:hi - 1].sum()) if hi - lo > 1 else 0))
        return pd.DataFrame(rows, columns=list(cols))

    return shard_apply(ds, ["user_id"], dwell)


VOCAB_TOPK = 100


def q_vocab_tail(sf_dir: str):
    """Zipf head coverage (how much of the token stream the top-K terms
    absorb — the vocabulary-truncation planning number): exact integer
    (total_tokens, topk_tokens, coverage_permille).  Term counts are a
    combiner aggregate; the global top-K is a per-shard top-K followed
    by one bounded (K x shards)-row merge — never a full-vocab global
    sort; the token total is a 1-scalar combiner over the same
    aggregated term table."""
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["text"])

    def tpart(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat = pc.list_flatten(pc.split_pattern(t.column("text"), " "))
        u, counts = np.unique(np.asarray(flat.to_pylist(), dtype=object),
                              return_counts=True)
        return pa.table({"term": pa.array(u, pa.string()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    terms = sharded_agg(docs.map_batches(tpart, batch_format="pyarrow"),
                        ["term"], {"n": ("n", "sum")}).materialize()

    def shard_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "term" not in t.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = t.select(["term", "n"]).to_pandas() \
            .sort_values(["n", "term"], ascending=[False, True],
                         kind="mergesort").head(VOCAB_TOPK)
        return pa.Table.from_pandas(df, preserve_index=False)

    def tot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table({"total": pa.array([], pa.int64())})
        return pa.table({"total": pa.array(
            [int(t.column("n").to_numpy().sum())], pa.int64())})

    tot_tabs = [x for x in ray.get(
        terms.map_batches(tot, batch_format="pyarrow").to_arrow_refs())
        if x.num_rows and "total" in x.column_names]
    total_tokens = int(sum(int(x.column("total").to_numpy().sum())
                           for x in tot_tabs))

    top_tabs = [x for x in ray.get(
        terms.map_batches(shard_top, batch_format="pyarrow")
        .to_arrow_refs()) if x.num_rows and "term" in x.column_names]
    cand = (pd.concat([x.to_pandas() for x in top_tabs])
            if top_tabs else pd.DataFrame({"term": [], "n": []}))
    cand = cand.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").head(VOCAB_TOPK)
    topk_tokens = int(cand["n"].sum())
    return pa.table({
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "topk_tokens": pa.array([topk_tokens], pa.int64()),
        "coverage_permille": pa.array(
            [topk_tokens * 1000 // max(total_tokens, 1)], pa.int64())})


def q_cell_turnover(sf_dir: str):
    """Place-popularity churn (per depth-8 tile: distinct users in the
    first vs second half of the time span, overlap, Jaccard permille —
    the venue-turnover screen): the global midpoint is the 2-scalar
    bounds reduce; per-(tile, user) early/late flags shrink in a
    combiner and combine across batches with MAX (max == OR on 0/1
    flags — a packed bitmask would need bit_or, which sharded_agg does
    not have); one bounded per-tile roll-up finishes."""
    lo, hi = _ts_bounds(sf_dir)
    mid = lo + (hi - lo) // 2

    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "ts", "tile"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "user_id", "e", "l")})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "user_id": t.column("user_id").to_numpy(),
                           "e": (ts < mid).astype(np.int64),
                           "l": (ts >= mid).astype(np.int64)})
        g = df.groupby(["tile", "user_id"], sort=False).agg(
            e=("e", "max"), l=("l", "max")).reset_index()
        for c in ("e", "l"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                        ["tile", "user_id"],
                        {"e": ("e", "max"), "l": ("l", "max")})

    def roll(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tile" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "n_early", "n_late",
                                       "n_both")})
        e = t.column("e").to_numpy().astype(np.int64)
        l_ = t.column("l").to_numpy().astype(np.int64)
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "e": e, "l": l_, "b": e * l_})
        g = df.groupby("tile", sort=False).agg(
            n_early=("e", "sum"), n_late=("l", "sum"),
            n_both=("b", "sum")).reset_index()
        for c in ("n_early", "n_late", "n_both"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(pairs.map_batches(roll, batch_format="pyarrow"),
                      ["tile"], {"n_early": ("n_early", "sum"),
                                 "n_late": ("n_late", "sum"),
                                 "n_both": ("n_both", "sum")})

    def jac(t: pa.Table) -> pa.Table:
        cols = ("tile", "n_early", "n_late", "n_both", "jaccard_permille")
        if t.num_rows == 0 or "tile" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        e = t.column("n_early").to_numpy().astype(np.int64)
        l_ = t.column("n_late").to_numpy().astype(np.int64)
        b = t.column("n_both").to_numpy().astype(np.int64)
        un = e + l_ - b
        return pa.table({"tile": t.column("tile"),
                         "n_early": pa.array(e, pa.int64()),
                         "n_late": pa.array(l_, pa.int64()),
                         "n_both": pa.array(b, pa.int64()),
                         "jaccard_permille": pa.array(
                             b * 1000 // np.maximum(un, 1), pa.int64())})

    return agg.map_batches(jac, batch_format="pyarrow") \
        .select_columns(["tile", "n_early", "n_late", "n_both",
                         "jaccard_permille"])


# ------------------- calendar lift / pyramid anomaly / co-visitation

DAY_US = 86_400_000_000


def q_weekend_lift(sf_dir: str):
    """Weekend-vs-weekday activity lift per tile (the calendar
    seasonality screen of footfall analytics): day-of-week from the
    epoch by pure integer arithmetic ((days + 4) % 7, Thursday-anchored
    like Unix so 0 = Sunday; weekend = {Sun, Sat} — fixed round 4, the
    old dow >= 5 test selected Fri+Sat), lift_permille = (n_weekend *
    5 * 1000) // (n_weekday * 2) — the 5:2 day-count normalization
    kept rational.  One combiner pass."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["ts", "tile"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "n_weekday", "n_weekend")})
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        dow = (ts // DAY_US + 4) % 7   # 0 = Sunday (epoch day 0 = Thu -> 4)
        we = ((dow == 0) | (dow == 6)).astype(np.int64)  # Sun + Sat
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "we": we})
        g = df.groupby("tile", sort=False).agg(
            n=("we", "size"), n_weekend=("we", "sum")).reset_index()
        g["n_weekday"] = (g["n"] - g["n_weekend"]).astype(np.int64)
        g["n_weekend"] = g["n_weekend"].astype(np.int64)
        return pa.Table.from_pandas(g[["tile", "n_weekday", "n_weekend"]],
                                    preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["tile"], {"n_weekday": ("n_weekday", "sum"),
                                 "n_weekend": ("n_weekend", "sum")})

    def lift(t: pa.Table) -> pa.Table:
        cols = ("tile", "n_weekday", "n_weekend", "lift_permille")
        if t.num_rows == 0 or "tile" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        wd = t.column("n_weekday").to_numpy().astype(np.int64)
        we = t.column("n_weekend").to_numpy().astype(np.int64)
        return pa.table({"tile": t.column("tile"),
                         "n_weekday": pa.array(wd, pa.int64()),
                         "n_weekend": pa.array(we, pa.int64()),
                         "lift_permille": pa.array(
                             we * 5 * 1000 // np.maximum(wd * 2, 1),
                             pa.int64())})

    return agg.map_batches(lift, batch_format="pyarrow") \
        .select_columns(["tile", "n_weekday", "n_weekend",
                         "lift_permille"])


def q_pyramid_anomaly(sf_dir: str):
    """Pyramid density anomaly (per depth-12 cell: its count vs 1/16 of
    its depth-10 parent — the multi-resolution hotspot/outlier screen):
    dev = 16 * n - n_parent, exact int.  The parent attaches with the
    adaptive_tiles owner/probe shard exchange over the AGGREGATED cell
    tables; raw events never enter it."""
    ds = prep_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(batch.column("cell").to_numpy(),
                                  return_counts=True)
        p10 = quadtree.at_depth(cells, 10)
        u, inv = np.unique(p10, return_inverse=True)
        n10 = np.bincount(inv, weights=counts).astype(np.int64)
        return pa.table({
            "depth": pa.array(np.r_[np.full(len(cells), 12, np.int64),
                                    np.full(len(u), 10, np.int64)],
                              pa.int64()),
            "cell": pa.array(np.r_[cells, u], pa.int64()),
            "n": pa.array(np.r_[counts.astype(np.int64), n10], pa.int64())})

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["depth", "cell"], {"n": ("n", "sum")})

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cell" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"key": z, "role": z, "cell": z, "n": z})
        d = t.column("depth").to_numpy().astype(np.int64)
        c = t.column("cell").to_numpy().astype(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        own = d == 10
        child = d == 12
        return pa.table({
            "key": pa.array(np.r_[c[own], quadtree.at_depth(c[child], 10)],
                            pa.int64()),
            "role": pa.array(np.r_[np.zeros(int(own.sum()), np.int64),
                                   np.ones(int(child.sum()), np.int64)],
                             pa.int64()),
            "cell": pa.array(np.r_[c[own], c[child]], pa.int64()),
            "n": pa.array(np.r_[n[own], n[child]], pa.int64())})

    def dev(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("cell", "n", "n_parent", "dev")
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        own = df[df["role"] == 0].set_index("key")["n"]
        ch = df[df["role"] == 1]
        npar = own.reindex(ch["key"]).to_numpy(np.int64)
        n = ch["n"].to_numpy(np.int64)
        return pd.DataFrame({"cell": ch["cell"].to_numpy(np.int64),
                             "n": n, "n_parent": npar,
                             "dev": 16 * n - npar})

    return shard_apply(agg.map_batches(fan, batch_format="pyarrow"),
                       ["key"], dev)


COVISIT_M = 10     # per-user top-M tiles enter the pair expansion


def q_covisit_tiles(sf_dir: str):
    """Tile co-visitation graph (the venue-recommendation signal:
    tiles frequently visited by the same user): each user's top-M
    tiles by visit count (ties -> lowest tile) expand to unordered
    pairs, counted across users.  The cap bounds the pair fanout at
    M^2/2 per user regardless of per-user volume — the scale guard a
    naive distinct-pairs expansion lacks.  Exchanges: (user, tile)
    combiner counts -> user-sharded top-M + pair expansion (in-shard
    pair combiner) -> pair-keyed sum."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "tile"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("user_id", "tile", "n")})
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "tile": t.column("tile").to_numpy()})
        g = df.groupby(["user_id", "tile"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    ut = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     ["user_id", "tile"], {"n": ("n", "sum")})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("tile_a", "tile_b", "n_users")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "n", "tile"],
                          ascending=[True, False, True], kind="mergesort")
        top = g.groupby("user_id", sort=False).head(COVISIT_M)
        out_a, out_b = [], []
        for _uid, lo, hi in zip(*_user_segments(
                top["user_id"].to_numpy(np.int64))):
            tiles = np.sort(top["tile"].to_numpy(np.int64)[lo:hi])
            if len(tiles) < 2:
                continue
            ii, jj = np.triu_indices(len(tiles), k=1)
            out_a.append(tiles[ii])
            out_b.append(tiles[jj])
        if not out_a:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        df = pd.DataFrame({"tile_a": np.concatenate(out_a),
                           "tile_b": np.concatenate(out_b)})
        c = df.groupby(["tile_a", "tile_b"], sort=False).size() \
            .reset_index(name="n_users")
        c["n_users"] = c["n_users"].astype(np.int64)
        return c

    part = shard_apply(ut, ["user_id"], pairs)
    return sharded_agg(part, ["tile_a", "tile_b"],
                       {"n_users": ("n_users", "sum")}) \
        .select_columns(["tile_a", "tile_b", "n_users"])


def q_letterbox(sf_dir: str):
    """Letterbox / pad-frame screen per image (2-px border vs interior
    brightness, exact ints; stages/images.letterbox_batch).  Row-pure
    decode; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import letterbox_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        letterbox_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_radial_profile(sf_dir: str):
    """Radial (vignetting) profile per codec format: decode -> bounded
    (fmt, ring, s, n) partials per batch (pixels never cross the
    shuffle) -> one 2 x RING_CAP-row grouped sum."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import radial_ring_partial

    part = read_images(sf_dir, with_bytes=True).map_batches(
        radial_ring_partial, batch_format="pyarrow", batch_size=IMG_BATCH)
    return sharded_agg(part, ["fmt", "ring"],
                       {"s": ("s", "sum"), "n": ("n", "sum")}) \
        .select_columns(["fmt", "ring", "s", "n"])


def q_quadrant_balance(sf_dir: str):
    """Quadrant brightness balance per image (exposure/crop-bias audit
    with argmax-first dominant quadrant; stages/images.quadrant_batch).
    Row-pure decode; no shuffle."""
    from osmquadtreepostgis_ray.sources.images import read_images
    from osmquadtreepostgis_ray.stages.images import quadrant_batch

    return read_images(sf_dir, with_bytes=True).map_batches(
        quadrant_batch, batch_format="pyarrow", batch_size=IMG_BATCH)


def q_script_census(sf_dir: str):
    """Character-class census per (lang, source) — the script/quality
    profile of a text corpus (vowel and whitespace rates expose
    boilerplate or non-linguistic content): C-level pyarrow regex
    counts per batch, bounded (lang, source) partials -> one small
    grouped sum."""
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = ("lang", "source", "n_docs", "n_chars", "n_vowels",
                "n_spaces")
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols[2:]}})
        txt = t.column("text")
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas(),
            "source": t.column("source").to_pandas(),
            "n_chars": pc.utf8_length(txt).to_numpy().astype(np.int64),
            "n_vowels": pc.count_substring_regex(txt, "[aeiou]")
            .to_numpy().astype(np.int64),
            "n_spaces": pc.count_substring(txt, " ")
            .to_numpy().astype(np.int64)})
        g = df.groupby(["lang", "source"], sort=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum"),
            n_vowels=("n_vowels", "sum"),
            n_spaces=("n_spaces", "sum")).reset_index()
        for c in cols[2:]:
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g[list(cols)], preserve_index=False)

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["lang", "source"],
                       {"n_docs": ("n_docs", "sum"),
                        "n_chars": ("n_chars", "sum"),
                        "n_vowels": ("n_vowels", "sum"),
                        "n_spaces": ("n_spaces", "sum")}) \
        .select_columns(["lang", "source", "n_docs", "n_chars",
                         "n_vowels", "n_spaces"])


PREFIX_K = 24     # boilerplate screen: exact-dup groups on first K chars


def q_prefix_dups(sf_dir: str):
    """Boilerplate-prefix duplicate groups (docs sharing their first
    PREFIX_K characters — the template/header dedup screen): per-batch
    (prefix, n, min_doc) combiner partials -> prefix-keyed grouped
    sum -> keep groups with n_docs > 1.  Prefix strings (not full
    texts) are all that crosses the shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "min_doc": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "prefix": pc.utf8_slice_codeunits(
                t.column("text"), 0, PREFIX_K).to_pandas(),
            "doc_id": t.column("doc_id").to_numpy()})
        g = df.groupby("prefix", sort=False).agg(
            n_docs=("doc_id", "size"),
            min_doc=("doc_id", "min")).reset_index()
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["min_doc"] = g["min_doc"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["prefix"], {"n_docs": ("n_docs", "sum"),
                                   "min_doc": ("min_doc", "min")})

    def keep_dups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_docs" not in t.column_names:
            return pa.table({"prefix": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "min_doc": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        return t.filter(pc.greater(t.column("n_docs"), 1))

    return agg.map_batches(keep_dups, batch_format="pyarrow") \
        .select_columns(["prefix", "n_docs", "min_doc"])


def q_dim_census(sf_dir: str):
    """Resolution / codec census over the image corpus (the curation
    shape audit: per (fmt, w, h) image count, total pixels, integer
    aspect ratio).  Metadata-only read — with_bytes=False never
    synthesizes pixel payloads (prune-at-the-read)."""
    from osmquadtreepostgis_ray.sources.images import read_images

    ds = read_images(sf_dir, with_bytes=False)

    def partial(t: pa.Table) -> pa.Table:
        cols = ("fmt", "w", "h", "n_images")
        if t.num_rows == 0 or "fmt" not in t.column_names:
            return pa.table({"fmt": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols[1:]}})
        df = pd.DataFrame({
            "fmt": t.column("fmt").to_pandas(),
            "w": t.column("w").to_numpy().astype(np.int64),
            "h": t.column("h").to_numpy().astype(np.int64)})
        g = df.groupby(["fmt", "w", "h"], sort=False).size() \
            .rename("n_images").reset_index()
        g["n_images"] = g["n_images"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["fmt", "w", "h"], {"n_images": ("n_images", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        cols = ("fmt", "w", "h", "n_images", "px_total", "aspect_permille")
        if t.num_rows == 0 or "w" not in t.column_names:
            return pa.table({"fmt": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols[1:]}})
        w = t.column("w").to_numpy().astype(np.int64)
        h = t.column("h").to_numpy().astype(np.int64)
        n = t.column("n_images").to_numpy().astype(np.int64)
        return pa.table({"fmt": t.column("fmt"),
                         "w": pa.array(w, pa.int64()),
                         "h": pa.array(h, pa.int64()),
                         "n_images": pa.array(n, pa.int64()),
                         "px_total": pa.array(n * w * h, pa.int64()),
                         "aspect_permille": pa.array(w * 1000 // h,
                                                     pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["fmt", "w", "h", "n_images", "px_total",
                         "aspect_permille"])


def q_benford(sf_dir: str):
    """Benford first-digit census of value cents per event_type (the
    fabricated-data / unit-mismatch screen): vectorized digit peel per
    batch (loop over magnitude, not rows), bounded (type, digit)
    partials -> one <= 5 x 9-row grouped sum.  Corpus values are
    2-dp >= 0.01, so cents >= 1 on both engines."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        while True:
            m = d >= 10
            if not m.any():
                break
            d[m] //= 10
        df = pd.DataFrame({"event_type": t.column("event_type").to_pandas(),
                           "digit": d})
        g = df.groupby(["event_type", "digit"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "digit"], {"n": ("n", "sum")}) \
        .select_columns(["event_type", "digit", "n"])


GAP_BUCKET_CAP = 42   # bit_length of a whole-second gap; span < 2^41 s


def q_gap_histogram(sf_dir: str):
    """Inter-event gap histogram (log2 buckets, the session-cadence
    census): per user, consecutive gaps in (ts, event_id) order in
    whole seconds; bucket = bit_length(gap_s) (0 for a 0-s gap) —
    exact int on both engines (no float log2).  User-sharded sort +
    diff emits bounded per-shard bucket partials; one tiny grouped
    sum finishes."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "event_id", "ts"])
    pow2 = 1 << np.arange(GAP_BUCKET_CAP, dtype=np.int64)

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        tu = g["ts"].astype("int64").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        gap_s = np.diff(tu) // 1_000_000
        same = np.diff(uid) == 0
        bucket = np.searchsorted(pow2, gap_s[same], side="right") \
            .astype(np.int64)
        u, n = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"bucket": u, "n": n.astype(np.int64)})

    part = shard_apply(ds, ["user_id"], hist)
    return sharded_agg(part, ["bucket"], {"n": ("n", "sum")}) \
        .select_columns(["bucket", "n"])


def q_user_cell_share(sf_dir: str):
    """Per-user dominant-cell concentration (home-location share, the
    k-anonymity / bot-behavior screen): each user's top cell by visit
    count (ties -> lowest cell) and its per-mille share of the user's
    events.  (user, cell) combiner counts -> user-sharded top-1."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("user_id", "cell", "n")})
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "cell": t.column("cell").to_numpy()})
        g = df.groupby(["user_id", "cell"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    uc = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     ["user_id", "cell"], {"n": ("n", "sum")})

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "top_cell", "n_top", "n_events",
                "share_permille")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "n", "cell"],
                          ascending=[True, False, True], kind="mergesort")
        tot = g.groupby("user_id", sort=False)["n"].sum()
        top = g.groupby("user_id", sort=False).head(1)
        n_ev = tot.reindex(top["user_id"]).to_numpy(np.int64)
        n_top = top["n"].to_numpy(np.int64)
        return pd.DataFrame({"user_id": top["user_id"].to_numpy(np.int64),
                             "top_cell": top["cell"].to_numpy(np.int64),
                             "n_top": n_top, "n_events": n_ev,
                             "share_permille": n_top * 1000 // n_ev})

    return shard_apply(uc, ["user_id"], top1)


def q_tile_distinct_users(sf_dir: str):
    """Exact distinct users per tile — the exact twin of the HLL
    sketch path (q_hll_sketch docstring: the sketch replaces THIS
    shuffle at 100 TB; keeping both documents the trade): per-batch
    (tile, user) dedupe so the shuffle carries unique pairs, then a
    tile-sharded nunique."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("tile", "user_id")})
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "user_id": t.column("user_id").to_numpy()}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def count(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"tile": pd.Series([], dtype=np.int64),
                                 "n_users": pd.Series([], dtype=np.int64)})
        out = g.groupby("tile", sort=False)["user_id"].nunique() \
            .rename("n_users").reset_index()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return shard_apply(pairs, ["tile"], count)


CUT_T = 192   # frames with > CUT_T changed pixels (of 256) are cuts


def q_video_cuts(sf_dir: str):
    """Shot-boundary detection per video (the scene-cut census a video
    curation pipeline runs before frame sampling): frame pairs whose
    changed-pixel count exceeds CUT_T are cuts; reports per-video cut
    count and first cut frame (-1 when none).  Frame diffs are row-pure
    (stages/images.frame_diff_batch); only (video, flag, f) partials
    cross the video-keyed shuffle."""
    from osmquadtreepostgis_ray.stages.images import (CUT_SENTINEL,
                                                      frame_diff_batch,
                                                      synth_videos_batch)

    vids = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth_videos_batch, batch_format="pyarrow")
    diffs = vids.map_batches(frame_diff_batch, batch_format="pyarrow",
                             batch_size=IMG_BATCH)

    def mark(t: pa.Table) -> pa.Table:
        cols = ("video_id", "is_cut", "cut_f")
        if t.num_rows == 0 or "video_id" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        f = t.column("f").to_numpy().astype(np.int64)
        cut = (t.column("n_changed").to_numpy() > CUT_T)
        return pa.table({
            "video_id": t.column("video_id"),
            "is_cut": pa.array(cut.astype(np.int64), pa.int64()),
            "cut_f": pa.array(np.where(cut, f, CUT_SENTINEL), pa.int64())})

    agg = sharded_agg(diffs.map_batches(mark, batch_format="pyarrow"),
                      ["video_id"], {"n_cuts": ("is_cut", "sum"),
                                     "first_cut": ("cut_f", "min")})

    def finish(t: pa.Table) -> pa.Table:
        cols = ("video_id", "n_cuts", "first_cut")
        if t.num_rows == 0 or "video_id" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        fc = t.column("first_cut").to_numpy().astype(np.int64)
        return pa.table({"video_id": t.column("video_id"),
                         "n_cuts": t.column("n_cuts").cast(pa.int64()),
                         "first_cut": pa.array(
                             np.where(fc == CUT_SENTINEL, -1, fc),
                             pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["video_id", "n_cuts", "first_cut"])


def q_source_ttr(sf_dir: str):
    """Type-token ratio per source (lexical-diversity audit — low TTR
    flags templated/boilerplate sources): distinct-word and token
    counts meet in exact per-mille.  Per-batch (source, word) dedupe +
    token counts; two tiny keyed shuffles (unique pairs, then a
    20-row source sum)."""
    ds = read_table(sf_dir, "documents", columns=["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "n_tok": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(t.column("text"))
        n = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks).to_pandas()
        src = np.repeat(t.column("source").to_pandas().to_numpy(), n)
        df = pd.DataFrame({"source": src, "w": flat})
        df = df[df["w"] != ""]
        g = df.groupby(["source", "w"], sort=False).size() \
            .rename("n_tok").reset_index()
        g["n_tok"] = g["n_tok"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    sw = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                     ["source", "w"], {"n_tok": ("n_tok", "sum")})

    def per_source(t: pa.Table) -> pa.Table:
        cols = ("source", "n_terms", "n_tokens")
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table({"source": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols[1:]}})
        df = pd.DataFrame({"source": t.column("source").to_pandas(),
                           "n_tok": t.column("n_tok").to_numpy()})
        g = df.groupby("source", sort=False).agg(
            n_terms=("n_tok", "size"), n_tokens=("n_tok", "sum")) \
            .reset_index()
        for c in cols[1:]:
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = sharded_agg(sw.map_batches(per_source, batch_format="pyarrow"),
                      ["source"], {"n_terms": ("n_terms", "sum"),
                                   "n_tokens": ("n_tokens", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        cols = ("source", "n_terms", "n_tokens", "ttr_permille")
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table({"source": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64())
                                for c in cols[1:]}})
        terms = t.column("n_terms").to_numpy().astype(np.int64)
        toks = t.column("n_tokens").to_numpy().astype(np.int64)
        return pa.table({"source": t.column("source"),
                         "n_terms": pa.array(terms, pa.int64()),
                         "n_tokens": pa.array(toks, pa.int64()),
                         "ttr_permille": pa.array(
                             terms * 1000 // np.maximum(toks, 1),
                             pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["source", "n_terms", "n_tokens", "ttr_permille"])


def q_dow_profile(sf_dir: str):
    """Traffic/value profile per (event_type, day-of-week) — the
    seasonality census behind sampling quotas: exact cents sums,
    bounded 5 x 7 partials per batch."""
    ds = read_table(sf_dir, "events",
                    columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "dow": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_value_cents": pa.array([], pa.int64())})
        tu = t.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "dow": (tu // DAY_US + 4) % 7,   # 0 = Sunday (Thu epoch -> 4)
            "cents": np.rint(t.column("value").to_numpy() * 100)
            .astype(np.int64)})
        g = df.groupby(["event_type", "dow"], sort=False).agg(
            n=("cents", "size"),
            sum_value_cents=("cents", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["sum_value_cents"] = g["sum_value_cents"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "dow"],
                       {"n": ("n", "sum"),
                        "sum_value_cents": ("sum_value_cents", "sum")}) \
        .select_columns(["event_type", "dow", "n", "sum_value_cents"])


OCC_DEPTHS = (8, 10, 12)   # quadtree occupancy profile resolutions


def q_occupancy_curve(sf_dir: str):
    """Quadtree occupancy curve (per depth: occupied cells, max and
    total per-cell count — the statistic the adaptive-tiles split rule
    reads): per-batch per-depth cell counts -> (depth, cell)-sharded
    sum -> a 3-row per-depth reduce.  Raw events collapse to unique
    cells in the first combiner; the shuffle carries cell partials."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        cols = ("depth", "cell", "n")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        c12 = t.column("cell").to_numpy()
        ds_, cs, ns = [], [], []
        for d in OCC_DEPTHS:
            u, n = np.unique(quadtree.at_depth(c12, d), return_counts=True)
            ds_.append(np.full(len(u), d, np.int64))
            cs.append(u.astype(np.int64))
            ns.append(n.astype(np.int64))
        return pa.table({"depth": pa.array(np.concatenate(ds_), pa.int64()),
                         "cell": pa.array(np.concatenate(cs), pa.int64()),
                         "n": pa.array(np.concatenate(ns), pa.int64())})

    per_cell = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                           ["depth", "cell"], {"n": ("n", "sum")})

    def per_depth(t: pa.Table) -> pa.Table:
        cols = ("depth", "n_cells", "max_cell_n", "n_events")
        if t.num_rows == 0 or "depth" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        df = pd.DataFrame({"depth": t.column("depth").to_numpy(),
                           "n": t.column("n").to_numpy()})
        g = df.groupby("depth", sort=False).agg(
            n_cells=("n", "size"), max_cell_n=("n", "max"),
            n_events=("n", "sum")).reset_index()
        for c in cols[1:]:
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return sharded_agg(per_cell.map_batches(per_depth,
                                            batch_format="pyarrow"),
                       ["depth"], {"n_cells": ("n_cells", "sum"),
                                   "max_cell_n": ("max_cell_n", "max"),
                                   "n_events": ("n_events", "sum")}) \
        .select_columns(["depth", "n_cells", "max_cell_n", "n_events"])


def q_active_days(sf_dir: str):
    """Engagement census: histogram of distinct active days per user
    (the retention-cohort input): per-batch (user, day) dedupe ->
    user-sharded distinct-day counts -> a tiny histogram sum."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("user_id", "day")})
        tu = t.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"user_id": t.column("user_id").to_numpy(),
                           "day": tu // DAY_US}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def ndays(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"n_days": pd.Series([], dtype=np.int64),
                                 "n_users": pd.Series([], dtype=np.int64)})
        per_user = g.groupby("user_id", sort=False)["day"].nunique()
        h = per_user.value_counts().rename("n_users").reset_index()
        h.columns = ["n_days", "n_users"]
        h["n_days"] = h["n_days"].astype(np.int64)
        h["n_users"] = h["n_users"].astype(np.int64)
        return h

    part = shard_apply(pairs, ["user_id"], ndays)
    return sharded_agg(part, ["n_days"], {"n_users": ("n_users", "sum")}) \
        .select_columns(["n_days", "n_users"])


def q_word_len_hist(sf_dir: str):
    """Token-length histogram per language (the tokenizer-shape audit:
    length spectra expose concatenation bugs and script mixing):
    C-level split + length per batch, bounded (lang, wlen) partials."""
    ds = read_table(sf_dir, "documents", columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = ("lang", "wlen", "n")
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "wlen": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(t.column("text"))
        nlist = pc.list_value_length(toks).to_numpy()
        flat = pc.list_flatten(toks)
        wlen = pc.utf8_length(flat).to_numpy().astype(np.int64)
        lang = np.repeat(t.column("lang").to_pandas().to_numpy(), nlist)
        keep = wlen > 0                      # str.split drops empties
        df = pd.DataFrame({"lang": lang[keep], "wlen": wlen[keep]})
        g = df.groupby(["lang", "wlen"], sort=False).size() \
            .rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g[list(cols)], preserve_index=False)

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["lang", "wlen"], {"n": ("n", "sum")}) \
        .select_columns(["lang", "wlen", "n"])


CHILD_DEPTH = 10   # child-occupancy census: depth-8 tiles, depth-10 kids


def q_child_occupancy(sf_dir: str):
    """Child-occupancy census (per depth-8 tile, how many of its 16
    depth-10 children are occupied — the direct input to a quadtree
    split rule; complements q_occupancy_curve/q_pyramid_anomaly):
    batch-level unique child cells -> cell-sharded dedupe -> per-tile
    child counts -> a <= 16-row histogram."""
    ds = prep_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c10": pa.array([], pa.int64())})
        u = np.unique(quadtree.at_depth(t.column("cell").to_numpy(),
                                        CHILD_DEPTH))
        return pa.table({"c10": pa.array(u.astype(np.int64), pa.int64())})

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    uniq = shard_apply(ds.map_batches(partial, batch_format="pyarrow"),
                       ["c10"], dedupe)

    def to_parent(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c10" not in t.column_names:
            return pa.table({"tile": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64())})
        c10 = t.column("c10").to_numpy()
        u, n = np.unique(quadtree.at_depth(c10, TILE_DEPTH),
                         return_counts=True)
        return pa.table({"tile": pa.array(u.astype(np.int64), pa.int64()),
                         "k": pa.array(n.astype(np.int64), pa.int64())})

    per_tile = sharded_agg(uniq.map_batches(to_parent,
                                            batch_format="pyarrow"),
                           ["tile"], {"k": ("k", "sum")})

    def hist(t: pa.Table) -> pa.Table:
        cols = ("n_children", "n_tiles")
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        u, n = np.unique(t.column("k").to_numpy(), return_counts=True)
        return pa.table({"n_children": pa.array(u.astype(np.int64),
                                                pa.int64()),
                         "n_tiles": pa.array(n.astype(np.int64),
                                             pa.int64())})

    return sharded_agg(per_tile.map_batches(hist, batch_format="pyarrow"),
                       ["n_children"], {"n_tiles": ("n_tiles", "sum")}) \
        .select_columns(["n_children", "n_tiles"])


PHASH_BITS = 48   # phash < 2^42; audit the low 48 bit positions


def q_phash_bits(sf_dir: str):
    """Per-bit balance of the perceptual hash (the hash-quality audit
    behind every banded/LSH near-dup op: a biased bit weakens its
    band): per-batch 48 vectorized popcounts, bounded partials (one
    row per bit position, zeros included)."""
    from osmquadtreepostgis_ray.sources.images import read_images

    ds = read_images(sf_dir, with_bytes=False)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "phash" not in t.column_names:
            return pa.table({"bit": pa.array([], pa.int64()),
                             "n_set": pa.array([], pa.int64())})
        ph = t.column("phash").to_numpy().astype(np.int64)
        ns = np.array([int(((ph >> k) & 1).sum())
                       for k in range(PHASH_BITS)], np.int64)
        return pa.table({"bit": pa.array(np.arange(PHASH_BITS, dtype=np.int64),
                                         pa.int64()),
                         "n_set": pa.array(ns, pa.int64())})

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["bit"], {"n_set": ("n_set", "sum")}) \
        .select_columns(["bit", "n_set"])


def q_caption_len_by_dims(sf_dir: str):
    """Caption-length profile per image resolution (the multimodal
    curation balance check: are small images systematically
    under-captioned?): metadata-only read (payloads never
    synthesized), bounded (w, h) partials."""
    from osmquadtreepostgis_ray.sources.images import read_images

    ds = read_images(sf_dir, with_bytes=False)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = ("w", "h", "n_images", "sum_chars", "max_chars")
        if t.num_rows == 0 or "caption" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        df = pd.DataFrame({
            "w": t.column("w").to_numpy().astype(np.int64),
            "h": t.column("h").to_numpy().astype(np.int64),
            "nc": pc.utf8_length(t.column("caption")).to_numpy()
            .astype(np.int64)})
        g = df.groupby(["w", "h"], sort=False).agg(
            n_images=("nc", "size"), sum_chars=("nc", "sum"),
            max_chars=("nc", "max")).reset_index()
        for c in cols[2:]:
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g[list(cols)], preserve_index=False)

    return sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       ["w", "h"], {"n_images": ("n_images", "sum"),
                                    "sum_chars": ("sum_chars", "sum"),
                                    "max_chars": ("max_chars", "max")}) \
        .select_columns(["w", "h", "n_images", "sum_chars", "max_chars"])


def q_tile_type_diversity(sf_dir: str):
    """Event-type diversity per tile, histogrammed (how mixed is each
    tile's activity — the land-use-mix analog): batch-level unique
    (tile, type) pairs -> pair-sharded dedupe -> per-tile distinct
    counts -> a <= 5-row histogram."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id",
                                      "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tile": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string())})
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "event_type":
                           t.column("event_type").to_pandas()}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    uniq = shard_apply(pairs, ["tile", "event_type"], dedupe)

    def per_tile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tile" not in t.column_names:
            return pa.table({"tile": pa.array([], pa.int64()),
                             "k": pa.array([], pa.int64())})
        u, n = np.unique(t.column("tile").to_numpy(), return_counts=True)
        return pa.table({"tile": pa.array(u.astype(np.int64), pa.int64()),
                         "k": pa.array(n.astype(np.int64), pa.int64())})

    per = sharded_agg(uniq.map_batches(per_tile, batch_format="pyarrow"),
                      ["tile"], {"k": ("k", "sum")})

    def hist(t: pa.Table) -> pa.Table:
        cols = ("n_types", "n_tiles")
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        u, n = np.unique(t.column("k").to_numpy(), return_counts=True)
        return pa.table({"n_types": pa.array(u.astype(np.int64),
                                             pa.int64()),
                         "n_tiles": pa.array(n.astype(np.int64),
                                             pa.int64())})

    return sharded_agg(per.map_batches(hist, batch_format="pyarrow"),
                       ["n_types"], {"n_tiles": ("n_tiles", "sum")}) \
        .select_columns(["n_types", "n_tiles"])


def q_travel_dist(sf_dir: str):
    """Per-user odometer (the trajectory-length census a movement
    corpus serves): events ordered (ts, event_id); each leg's L1
    milli-degree displacement |dlon| + |dlat| (exact int — the
    geodesic stand-in that stays parity-exact); output per user
    (n_legs, dist_l1, max_leg).  One user-sharded exchange, per-shard
    one sort + vectorized diffs (the q_sessionize plan); single-event
    users have no legs and are absent on both engines."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "event_id", "ts",
                         "lon_milli", "lat_milli"])

    def legs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_legs", "dist_l1", "max_leg")
        if len(g) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        lon = g["lon_milli"].to_numpy(np.int64)
        lat = g["lat_milli"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        leg = (np.abs(np.diff(lon)) + np.abs(np.diff(lat)))[same]
        out = (pd.DataFrame({"user_id": uid[1:][same], "leg": leg})
               .groupby("user_id", as_index=False)
               .agg(n_legs=("leg", "size"), dist_l1=("leg", "sum"),
                    max_leg=("leg", "max")))
        for c in ("n_legs", "dist_l1", "max_leg"):
            out[c] = out[c].astype(np.int64)
        return out

    return shard_apply(ds, ["user_id"], legs)


def _octant_of(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """Trig-free 8-sector bearing: integer sign + |dx| vs |dy|
    comparisons, the EXACT branch tree sql_bearing_hist repeats."""
    ax, ay = np.abs(dx), np.abs(dy)
    return np.select(
        [(dx >= 0) & (dy >= 0) & (ax >= ay),
         (dx >= 0) & (dy >= 0),
         (dx < 0) & (dy >= 0) & (ay > ax),
         (dx < 0) & (dy >= 0),
         (dx < 0) & (dy < 0) & (ax >= ay),
         (dx < 0) & (dy < 0),
         (dx >= 0) & (dy < 0) & (ay > ax)],
        [0, 1, 2, 3, 4, 5, 6], default=7).astype(np.int64)


def q_bearing_hist(sf_dir: str):
    """Global 8-sector movement-bearing histogram over per-user legs
    (ts, event_id order): octant from integer sign/magnitude
    comparisons — no trig, so the SQL twin's CASE tree is bit-equal.
    Zero-displacement legs are excluded.  Per-shard 8-bin partials;
    the 8-row global sum rides the guarded small reduce."""
    from osmquadtreepostgis_ray.util import reduce_small_or_shard

    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "event_id", "ts",
                         "lon_milli", "lat_milli"])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("sector", "n")
        if len(g) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        dx = np.diff(g["lon_milli"].to_numpy(np.int64))
        dy = np.diff(g["lat_milli"].to_numpy(np.int64))
        keep = (uid[1:] == uid[:-1]) & ((dx != 0) | (dy != 0))
        cnt = np.bincount(_octant_of(dx[keep], dy[keep]), minlength=8)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"sector": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    part = shard_apply(ds, ["user_id"], partial)

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("sector", as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return reduce_small_or_shard(part, ["sector"], total)


def q_dwell_move(sf_dir: str):
    """Per-user dwell/move time split: each consecutive-event gap
    (ts, event_id order) attributes to DWELL when both endpoints share
    a depth-CELL_DEPTH cell, else MOVE — the stay-point statistic of
    trajectory mining, exact integer microseconds.  Output per user:
    (n_dwell, n_move, dwell_us, move_us).  Same single user-sharded
    exchange as q_travel_dist."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["user_id", "event_id", "ts", "cell"])

    def split(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_dwell", "n_move", "dwell_us", "move_us")
        if len(g) < 2:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        cell = g["cell"].to_numpy(np.int64)
        same_u = uid[1:] == uid[:-1]
        gap = np.diff(ts)[same_u]
        dwell = (cell[1:] == cell[:-1])[same_u]
        df = pd.DataFrame({"user_id": uid[1:][same_u],
                           "dw": dwell.astype(np.int64),
                           "dus": np.where(dwell, gap, 0),
                           "mus": np.where(dwell, 0, gap)})
        out = df.groupby("user_id", as_index=False).agg(
            n_dwell=("dw", "sum"), n_legs=("dw", "size"),
            dwell_us=("dus", "sum"), move_us=("mus", "sum"))
        out["n_move"] = (out["n_legs"] - out["n_dwell"]).astype(np.int64)
        for c in ("n_dwell", "dwell_us", "move_us"):
            out[c] = out[c].astype(np.int64)
        return out[["user_id", "n_dwell", "n_move", "dwell_us", "move_us"]]

    return shard_apply(ds, ["user_id"], split)


TFIDF_TOP_K = 3


def q_tfidf_top(sf_dir: str, k: int = TFIDF_TOP_K):
    """Per-source top-k terms by integer tf-idf (the corpus-profiling
    screen before mixture weighting): words = whitespace split (empty
    tokens dropped, the string_split twin); tf per (source, word); df
    counted over per-doc DISTINCT words (each doc lives in one batch,
    so batch-level distinct is global); idf_milli = (1000 * n_docs) //
    df; score = tf * idf_milli; ties (score DESC, word ASC).  tf and
    df partials ride ONE word-sharded exchange (kind-tagged rows — a
    word's tf and df rows co-locate, no join needed); the final top-k
    is a source-sharded head — no driver vocabulary."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"])
    # count() on an untransformed parquet read is Ray's metadata fast
    # path (no data scan), so the second consumption below is the only
    # real read — not the CLAUDE.md lazy-fork re-execution hazard
    n_docs = docs.count()

    def pairs(t: pa.Table) -> pa.Table:
        cols = {"source": pd.Series([], dtype=object),
                "word": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "kind": pd.Series([], dtype=np.int64)}
        if t.num_rows == 0:
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        did = t.column("doc_id").to_numpy()
        words = pd.Series(t.column("text").to_pylist(), dtype=object) \
            .str.split(" ")
        lens = words.str.len().to_numpy()
        flat = np.concatenate([np.asarray(x, object) for x in words])
        rid = np.repeat(np.arange(len(words)), lens)
        ok = flat != ""
        df = pd.DataFrame({"source": src[rid[ok]],
                           "doc_id": did[rid[ok]].astype(np.int64),
                           "word": flat[ok]})
        tf = df.groupby(["source", "word"], as_index=False).size() \
            .rename(columns={"size": "n"})
        dfq = df.drop_duplicates(["word", "doc_id"]).groupby(
            "word", as_index=False).size().rename(columns={"size": "n"})
        out = pd.concat([tf.assign(kind=np.int64(0)),
                         dfq.assign(source="", kind=np.int64(1))],
                        ignore_index=True)[["source", "word", "n", "kind"]]
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    part = docs.map_batches(pairs, batch_format="pyarrow")

    def per_word(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("source", "word", "score")
        if not len(g):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "word": pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype=np.int64)})
        dfm = g[g["kind"] == 1].groupby("word")["n"].sum()
        tfm = g[g["kind"] == 0].groupby(["source", "word"],
                                        as_index=False)["n"].sum()
        dfv = tfm["word"].map(dfm).to_numpy(np.int64)
        idf = (1000 * np.int64(n_docs)) // dfv
        tfm["score"] = (tfm["n"].to_numpy(np.int64) * idf).astype(np.int64)
        return tfm[["source", "word", "score"]]

    scored = shard_apply(part, ["word"], per_word)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "rk": pd.Series([], dtype=np.int64),
                                 "word": pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["source", "score", "word"],
                          ascending=[True, False, True], kind="stable")
        out = g.groupby("source", sort=False).head(k).copy()
        out["rk"] = out.groupby("source", sort=False).cumcount() \
            .astype(np.int64) + 1
        return out[["source", "rk", "word", "score"]]

    return shard_apply(scored, ["source"], topk)


SAMPLE_PERMILLE = 37
SAMPLE_MIX = 2654435761  # Knuth multiplicative hash (fits HUGEINT twin)


def q_sample_permille(sf_dir: str, permille: int = SAMPLE_PERMILLE):
    """Deterministic stratified corpus sample (the reproducible
    train/eval draw every data pipeline needs): keep a document iff
    (doc_id * SAMPLE_MIX) % 2^32 % 1000 < permille — a pure function
    of the row, so the sample is identical across parallelism, resume,
    and engines (no RNG state anywhere).  Emits the kept (doc_id,
    source) plus per-source kept counts are derivable downstream;
    row-pure single pass, no shuffle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        h = (ids * np.uint64(SAMPLE_MIX)) % np.uint64(1 << 32)
        m = (h % np.uint64(1000)) < np.uint64(permille)
        return t.filter(pa.array(m))

    return docs.map_batches(keep, batch_format="pyarrow")


def q_trend_cells(sf_dir: str):
    """Per-tile OLS trend of event value over time, exact-integer form
    (the TILE-keyed, absolute-epoch sibling of q_trend_fit's per-user
    relative-hours regression): x = epoch DAY index, y = value cents;
    the tile carries the five
    raw sums (n, sx, sy, sxy, sxx) via combiner partials plus the
    closed-form slope numerator n*sxy - sx*sy and denominator
    n*sxx - sx^2 — emitted RAW (BIGINT) so no engine ever divides
    signed ints (the CLAUDE.md truncation-vs-floor hazard).  Magnitude
    bound: |num| < rows_per_tile^2 * max|x*y| ~ 2e9 * rows^2 — safe in
    int64 to ~2e6 rows/tile; past that, shrink the tile depth."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts", "value"]) \
        .select_columns(["tile", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cols = ("tile", "n", "sx", "sy", "sxy", "sxx")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        x = t.column("ts").cast(pa.int64()).to_numpy() // DAY_US
        y = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "n": np.int64(1), "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x})
        g = df.groupby("tile", as_index=False).sum()
        return pa.Table.from_pandas(g.astype(np.int64), preserve_index=False)

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["tile"], {"n": ("n", "sum"), "sx": ("sx", "sum"),
                                 "sy": ("sy", "sum"), "sxy": ("sxy", "sum"),
                                 "sxx": ("sxx", "sum")})

    def closed(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.int64)
        sx = t.column("sx").to_numpy().astype(np.int64)
        sy = t.column("sy").to_numpy().astype(np.int64)
        sxy = t.column("sxy").to_numpy().astype(np.int64)
        sxx = t.column("sxx").to_numpy().astype(np.int64)
        t = t.append_column("slope_num", pa.array(n * sxy - sx * sy,
                                                  pa.int64()))
        return t.append_column("slope_den", pa.array(n * sxx - sx * sx,
                                                     pa.int64()))

    return agg.map_batches(closed, batch_format="pyarrow")


SCD2_OPEN_US = np.int64(1) << 62


def q_scd2_intervals(sf_dir: str):
    """SCD2 validity intervals from the event change-log (the
    slowly-changing-dimension snapshot maintenance op; q_history_ranges
    is the compaction-stats sibling — this one emits the ROW-LEVEL
    [from, to) table a warehouse upsert actually writes): per user, rows
    ordered (ts, event_id) become (user_id, event_id, valid_from_us,
    valid_to_us) where valid_to is the next change's ts, the OPEN
    sentinel 2^62 for the latest row.  One user-sharded exchange +
    a vectorized shift — the lead() window re-expressed."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "event_id", "valid_from_us", "valid_to_us")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        nxt = np.r_[ts[1:], SCD2_OPEN_US]
        nxt[np.r_[uid[1:] != uid[:-1], True]] = SCD2_OPEN_US
        return pd.DataFrame({"user_id": uid, "event_id": eid,
                             "valid_from_us": ts, "valid_to_us": nxt})

    return shard_apply(ds, ["user_id"], intervals)


CHECKSUM_MIX = 0x9E3779B97F4A7C15  # golden-ratio odd mix, mod 2^61 below


def q_tile_checksum(sf_dir: str):
    """Per-tile content fingerprint (the anti-entropy check a resumable
    export verifies against: recompute after resume, diff per tile):
    order-invariant SUM of per-event mixed hashes mod 2^31, plus the
    row count.  2^31 (not 2^61) keeps every intermediate SUM inside
    int64 on both engines: a batch partial sums <= 2^20 rows * 2^31 <
    2^51, and the cross-batch fold sums <= #batches * 2^31 — no silent
    numpy wraparound vs DuckDB's non-wrapping HUGEINT.  Combiner
    partials; one bounded keyed aggregate."""
    M31 = np.int64(1 << 31)
    ds = prep_events(sf_dir, columns=["event_id", "user_id"]) \
        .select_columns(["tile", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        cols = ("tile", "n", "checksum")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        eid = t.column("event_id").to_numpy().astype(np.uint64)
        h = ((eid * np.uint64(CHECKSUM_MIX)) % np.uint64(1 << 31)) \
            .astype(np.int64)
        df = pd.DataFrame({"tile": t.column("tile").to_numpy(),
                           "n": np.int64(1), "h": h})
        g = df.groupby("tile", as_index=False).sum()
        g["h"] = (g["h"] % M31).astype(np.int64)
        return pa.table({"tile": pa.array(g["tile"].to_numpy(np.int64),
                                          pa.int64()),
                         "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                         "checksum": pa.array(g["h"].to_numpy(np.int64),
                                              pa.int64())})

    agg = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                      ["tile"], {"n": ("n", "sum"),
                                 "checksum": ("checksum", "sum")})

    def fold(t: pa.Table) -> pa.Table:
        c = t.column("checksum").to_numpy().astype(np.int64) % M31
        return pa.table({"tile": t.column("tile"), "n": t.column("n"),
                         "checksum": pa.array(c, pa.int64())})

    return agg.map_batches(fold, batch_format="pyarrow")


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_CHARS = 6  # 30 bits: 15 lon + 15 lat


def q_geohash_census(sf_dir: str):
    """Per-geohash event counts at 6-char precision — the base32
    string spatial index (the H3/S2/quadkey sibling ops teams actually
    exchange): lon bits at odd positions, lat at even, MSB-first,
    5-bit groups mapped through the standard alphabet.  Exact integer
    bit math on both engines (the SQL twin unrolls the same 30-bit
    interleave + 6 substr lookups); grouping is one sharded aggregate
    on the string key."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id"]) \
        .select_columns(["lon_milli", "lat_milli"])

    def enc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"geohash": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        gh = geohash_of(t.column("lon_milli").to_numpy(),
                        t.column("lat_milli").to_numpy())
        vc = pd.Series(gh).value_counts()
        return pa.table({"geohash": pa.array(vc.index.to_numpy(), pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64),
                                       pa.int64())})

    return sharded_agg(ds.map_batches(enc, batch_format="pyarrow"),
                       ["geohash"], {"n": ("n", "sum")})


def geohash_of(lon_milli: np.ndarray, lat_milli: np.ndarray,
               chars: int = GEOHASH_CHARS) -> np.ndarray:
    """Vectorized standard geohash strings — delegates to the single
    bit-plan definition site (functions/geohash.encode_any), validated
    against an interval-bisection reference in the property tests."""
    return geohash.encode_any(lon_milli, lat_milli, chars)


ACTIVE_WINDOW_US = 900_000_000  # 15 min


def q_active_span(sf_dir: str, window_us: int = ACTIVE_WINDOW_US):
    """Per-tile activity coverage via INTERVAL UNION (the classic
    gaps-and-islands op; the TILE-keyed sibling of q_interval_union's
    per-user sweep — different key, plus island count per tile, and
    the shared kernel is module-level for the property test): each
    event opens [ts, ts + window); per tile,
    overlapping windows merge and the output is island count + total
    covered microseconds — exact ints.  One tile-sharded exchange;
    per-shard a sort + running-max cummax (no pairwise interval
    join)."""
    ds = prep_events(sf_dir, columns=["event_id", "user_id", "ts"]) \
        .select_columns(["tile", "ts"])

    def union_len(g: pd.DataFrame) -> pd.DataFrame:
        return interval_union_stats(g, window_us)

    return shard_apply(ds, ["tile"], union_len)


def interval_union_stats(g: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """Per-tile island count + union length of [ts, ts + window)
    intervals — module-level so the property test can pit it against a
    brute per-tile interval merge."""
    cols = ("tile", "n_islands", "covered_us")
    if not len(g):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    g = g.sort_values(["tile", "ts"], kind="stable")
    tile = g["tile"].to_numpy(np.int64)
    s = g["ts"].astype("int64").to_numpy()
    e = s + window_us
    # running max end per tile: pandas grouped cummax is a C-level
    # SEGMENTED accumulate (an offset-per-segment trick on raw
    # epoch-µs ints would overflow int64 past ~1e4 segments)
    new_tile = np.r_[True, tile[1:] != tile[:-1]]
    seg_id = np.cumsum(new_tile) - 1
    run_end = pd.Series(e).groupby(seg_id).cummax().to_numpy(np.int64)
    brk = np.r_[True, (s[1:] > run_end[:-1]) | new_tile[1:]]
    firsts = np.flatnonzero(brk)
    lasts = np.r_[firsts[1:], len(s)] - 1
    covered = run_end[lasts] - s[firsts]
    out = (pd.DataFrame({"tile": tile[firsts], "cov": covered})
           .groupby("tile", as_index=False)
           .agg(n_islands=("cov", "size"), covered_us=("cov", "sum")))
    out["n_islands"] = out["n_islands"].astype(np.int64)
    out["covered_us"] = out["covered_us"].astype(np.int64)
    return out


SNM_WINDOW = 8
SNM_KEY_LEN = 12


def q_snm_pairs(sf_dir: str, w: int = SNM_WINDOW):
    """Sorted-neighborhood dedup blocking (the record-linkage classic
    the exact/minhash/simhash/ngram/embedding family still lacked):
    documents sort by a normalized blocking key (first SNM_KEY_LEN
    alphanumeric chars, lowercased) and every pair within a sliding
    rank window of w becomes a candidate (d1, d2, gap).

    Distributed plan: one global rank via the keyed_row_number prefix
    scan (single constant group — bounded driver state); each row then
    fans into its native rank-bucket rk//w AND the next bucket, so any
    pair with gap < w co-locates in the LATER row's native bucket —
    counted exactly once there; per-bucket expansion is a vectorized
    searchsorted sweep over <= 2w rows.  No quadratic corpus pass; the
    oracle twin is the row_number self-join."""
    from osmquadtreepostgis_ray.stages.window import keyed_row_number

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist(), dtype=object)
        bk = s.str.lower().str.replace(r"[^a-z0-9]", "", regex=True) \
            .str.slice(0, SNM_KEY_LEN)
        return pa.table({"g": pa.array(np.zeros(t.num_rows, np.int64),
                                       pa.int64()),
                         "bk": pa.array(bk.to_numpy(), pa.string()),
                         "doc_id": t.column("doc_id")})

    ranked, _tot = keyed_row_number(
        docs.map_batches(keyed, batch_format="pyarrow"),
        ["g"], ["bk", "doc_id"], rank_col="rk")

    def fanout(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rk" not in t.column_names:
            return pa.table({"b": pa.array([], pa.int64()),
                             "rk": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "native": pa.array([], pa.int64())})
        rk = t.column("rk").to_numpy()
        did = t.column("doc_id").to_numpy()
        b = rk // w
        return pa.table({
            "b": pa.array(np.r_[b, b + 1], pa.int64()),
            "rk": pa.array(np.r_[rk, rk], pa.int64()),
            "doc_id": pa.array(np.r_[did, did], pa.int64()),
            "native": pa.array(np.r_[np.ones(len(rk), np.int64),
                                     np.zeros(len(rk), np.int64)],
                               pa.int64())})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("d1", "d2", "gap")
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        # one sweep across ALL buckets in the shard: the composite key
        # b * 2^40 + rk makes per-bucket searchsorted global (ranks are
        # corpus-bounded < 2^40)
        g = g.sort_values(["b", "rk"], kind="stable")
        b = g["b"].to_numpy(np.int64)
        r = g["rk"].to_numpy(np.int64)
        d = g["doc_id"].to_numpy(np.int64)
        nat = g["native"].to_numpy(np.int64) == 1
        BIG = np.int64(1) << 40
        kb = b * BIG + r
        lo = np.searchsorted(kb, b * BIG + np.maximum(r - w + 1, 0))
        t = np.arange(len(r))
        cnt = np.where(nat, t - lo, 0)
        tot = int(cnt.sum())
        if not tot:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        y = np.repeat(t, cnt)
        starts = np.repeat(np.cumsum(cnt) - cnt, cnt)
        x = np.repeat(lo, cnt) + (np.arange(tot) - starts)
        return pd.DataFrame({"d1": d[x], "d2": d[y], "gap": r[y] - r[x]})

    fanned = ranked.map_batches(fanout, batch_format="pyarrow")
    return shard_apply(fanned, ["b"], expand)


KNN_HOLD = 5


def q_knn_confusion(sf_dir: str):
    """1-NN classification eval over the labeled embeddings (the
    supervised sibling of the recall@k gates — the screen a labeled
    corpus runs before trusting its labels): vec_id % KNN_HOLD == 0 is
    the deterministic holdout; each held-out vector takes the label of
    its nearest NON-holdout neighbor in the quantized-euclid metric
    (ties -> lowest vec_id, enforced per batch via the composite
    d2*2^21 + id argmin so no batch drops the global tie winner);
    output is the bounded labels² confusion matrix (true_label,
    pred_label, n).  Queries + their labels broadcast once; the corpus
    streams; the final 1-NN reduce is topk_per_key(k=1); the true
    labels attach driver-side to the nq-row final table only."""
    import duckdb

    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    from osmquadtreepostgis_ray.util import topk_per_key

    qdf = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"'{sf_dir}/embeddings.parquet' WHERE vec_id % {KNN_HOLD} = 0 "
        f"ORDER BY vec_id").df()
    qids = qdf["vec_id"].to_numpy(np.int64)
    qlab = qdf["label"].to_numpy(np.int64)
    Qm = np.floor(np.stack([np.asarray(v, np.float64)
                            for v in qdf["embedding"]])
                  * KM_SCALE).astype(np.int64) + KM_SHIFT
    bref = ray.put((Qm, qids))

    def scan(t: pa.Table) -> pa.Table:
        cols = ("query_id", "neighbor_id", "d2", "pred")
        QM, qi = ray.get(bref)
        keep = (t.column("vec_id").to_numpy() % KNN_HOLD) != 0
        t = t.filter(pa.array(keep))
        n = t.num_rows
        if n == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        flat = pc.list_flatten(t.column("embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // n
        C = (np.floor(flat * KM_SCALE).astype(np.int64) + KM_SHIFT) \
            .reshape(n, d)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        lab = t.column("label").to_numpy().astype(np.int64)
        dm = ((QM[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # composite keeps the (d2, id) tie order inside every batch so
        # the global merge sees the true winner; explicit raise (not
        # assert — stripped under python -O) like the fof packed key
        if ids.max() >= (1 << 21) or dm.max() >= (1 << 41):
            raise ValueError(
                "knn_confusion packed argmin needs ids < 2^21 and "
                "d2 < 2^41 to fit the int64 composite key")
        best = np.argmin(dm * np.int64(1 << 21) + ids[None, :], axis=1)
        return pa.table({
            "query_id": pa.array(qi, pa.int64()),
            "neighbor_id": pa.array(ids[best], pa.int64()),
            "d2": pa.array(dm[np.arange(len(qi)), best], pa.int64()),
            "pred": pa.array(lab[best], pa.int64())})

    partials = read_table(sf_dir, "embeddings",
                          columns=["vec_id", "embedding", "label"]) \
        .map_batches(scan, batch_format="pyarrow")
    top = topk_per_key(partials, "query_id",
                       ["query_id", "d2", "neighbor_id"],
                       [True, True, True], 1,
                       ["query_id", "neighbor_id", "d2", "pred"])
    final = top.to_pandas()
    final["true_label"] = final["query_id"].map(
        dict(zip(qids, qlab))).astype(np.int64)
    cm = final.groupby(["true_label", "pred"], as_index=False).size() \
        .rename(columns={"pred": "pred_label", "size": "n"})
    cm["n"] = cm["n"].astype(np.int64)
    return pa.Table.from_pandas(
        cm.sort_values(["true_label", "pred_label"]).reset_index(drop=True),
        preserve_index=False)


def q_trimmed_mean(sf_dir: str):
    """Robust trimmed aggregate per event_type (the outlier-resistant
    mean curation thresholds are tuned on): keep cents in
    [p10, p90] (quantile_disc bounds, ceil(p*n)-1 index parity as
    q_quantiles) and emit n_kept + sum_kept_cents — no division
    crosses engines.  Same distinct-value combiner as the quantile
    family; bounds AND the in-range sum come from the one (cents,
    count) table, so there is no second corpus pass."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cents"] = np.rint(df["value"] * 100).astype(np.int64)
        g = df.groupby(["event_type", "cents"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "cents"])
              .aggregate(Sum("cnt", alias_name="cnt")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents", kind="stable")
        c = g["cents"].to_numpy(np.int64)
        w = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(w)
        n = int(cum[-1])
        bounds = {}
        for name, p in (("lo", 0.1), ("hi", 0.9)):
            k = max(0, int(np.ceil(p * n)) - 1)          # quantile_disc
            bounds[name] = int(c[np.searchsorted(cum, k + 1, side="left")])
        m = (c >= bounds["lo"]) & (c <= bounds["hi"])
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_kept": np.array([int(w[m].sum())], np.int64),
            "sum_kept_cents": np.array([int((c[m] * w[m]).sum())],
                                       np.int64)})

    return (counts.groupby("event_type")
            .map_groups(pick, batch_format="pandas")
            .select_columns(["event_type", "n_kept", "sum_kept_cents"]))


def q_fof_count(sf_dir: str):
    """Friend-of-friend reach per node (exactly-distance-2 neighborhood
    size — the expansion statistic recommendation/2-hop retrieval
    plans on): over the link_jaccard edge set, count per node the
    DISTINCT nodes reachable in 2 hops that are neither the node
    itself nor a direct neighbor.  Composition of existing machinery:
    wedge_pairs (hub-guarded common-neighbor pairs) -> packed-key anti
    join against the edge set -> both-direction explode -> per-node
    sharded count."""
    from osmquadtreepostgis_ray.stages.graph import wedge_pairs
    from osmquadtreepostgis_ray.stages.joins import bucket_semi_join

    SHIFT = np.int64(1) << np.int64(31)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        i = t.column("doc_id").to_numpy().astype(np.int64)
        if len(i) and i.max() >= int(SHIFT):
            raise ValueError("fof packed keys need ids < 2^31")
        c1 = i[i >= 1]
        c2 = i[(i >= 2) & ((i - 2) % 3 == 0)]
        return pa.table({"a": pa.array(np.r_[c1 - 1, c2 - 2], pa.int64()),
                         "b": pa.array(np.r_[c1, c2], pa.int64())})

    e = docs.map_batches(edges, batch_format="pyarrow").materialize()

    def und(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        return pa.table({"u": pa.array(np.r_[a, b], pa.int64()),
                         "v": pa.array(np.r_[b, a], pa.int64())})

    u = e.map_batches(und, batch_format="pyarrow").materialize()
    pairs = sharded_agg(wedge_pairs(u), ["v1", "v2"],
                        {"common": ("c", "sum")})

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"key": pa.array(
            t.column("v1").to_numpy().astype(np.int64) * SHIFT
            + t.column("v2").to_numpy().astype(np.int64), pa.int64()),
            "v1": t.column("v1"), "v2": t.column("v2")})

    ekey = u.map_batches(
        lambda t: pa.table({"key": pa.array(
            np.minimum(t.column("u").to_numpy(), t.column("v").to_numpy())
            .astype(np.int64) * SHIFT
            + np.maximum(t.column("u").to_numpy(),
                         t.column("v").to_numpy()).astype(np.int64),
            pa.int64())}),
        batch_format="pyarrow")
    nonedges = bucket_semi_join(
        pairs.map_batches(keyed, batch_format="pyarrow"), ekey,
        on="key", anti=True)

    def explode(t: pa.Table) -> pa.Table:
        v1 = t.column("v1").to_numpy().astype(np.int64)
        v2 = t.column("v2").to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(np.r_[v1, v2], pa.int64()),
                         "one": pa.array(np.ones(2 * len(v1), np.int64),
                                         pa.int64())})

    return sharded_agg(nonedges.map_batches(explode, batch_format="pyarrow"),
                       ["node"], {"fof": ("one", "sum")})


def q_bpe_encode(sf_dir: str):
    """Apply the induced BPE vocabulary (q_bpe_merges' K merges) to the
    corpus — the tokenizer-application half of the induction loop: per
    source, word-occurrence count and total POST-MERGE token count
    (the statistic that prices a corpus in tokens under the trained
    vocab).  The merge table is K rows (driver-bounded); the unique
    (source, word) table encodes once — each word's sep-form runs the
    K canonical merges (bpe_merge_tokens) and its token count weights
    by occurrence; one sharded sum per source."""
    from osmquadtreepostgis_ray.functions.text import BPE_TOKEN_RE

    merges = q_bpe_merges(sf_dir).to_pylist()
    pairs = [(m["a"], m["b"]) for m in merges]

    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def wcount(t: pa.Table) -> pa.Table:
        src = pd.Series(t.column("source").to_pylist(), dtype=object)
        words = pd.Series(t.column("text").to_pylist(), dtype=object) \
            .str.findall(BPE_TOKEN_RE)
        lens = words.str.len().to_numpy()
        flat = np.concatenate([np.asarray(x, object) for x in words]) \
            if len(words) else np.empty(0, object)
        df = pd.DataFrame({"source": src.to_numpy()[
            np.repeat(np.arange(len(words)), lens)], "word": flat})
        g = df.groupby(["source", "word"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    swct = sharded_agg(docs.map_batches(wcount, batch_format="pyarrow"),
                       ["source", "word"], {"n": ("n", "sum")})

    def encode(t: pa.Table) -> pa.Table:
        cols = ("source", "n_words", "n_tokens")
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_words": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        w = pd.Series(t.column("word").to_pylist(), dtype=object)
        sep = " " + w.str.replace(r"(.)", r"\1 ", regex=True)
        for a, b in pairs:
            sep = bpe_merge_tokens(sep, a, b)
        ntok = sep.str.strip().str.split(" ").str.len() \
            .to_numpy(np.int64)
        n = t.column("n").to_numpy().astype(np.int64)
        g = (pd.DataFrame({"source": t.column("source").to_pylist(),
                           "nw": n, "nt": ntok * n})
             .groupby("source", as_index=False)
             .agg(n_words=("nw", "sum"), n_tokens=("nt", "sum")))
        for c in ("n_words", "n_tokens"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    part = swct.map_batches(encode, batch_format="pyarrow")

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", as_index=False).agg(
            n_words=("n_words", "sum"), n_tokens=("n_tokens", "sum"))
        for c in ("n_words", "n_tokens"):
            out[c] = out[c].astype(np.int64)
        return out

    from osmquadtreepostgis_ray.util import reduce_small_or_shard
    return reduce_small_or_shard(part, ["source"], total)


SEM_TAU_NUM = 2   # cosine threshold tau = 2/5 — exact rational so the
SEM_TAU_DEN = 5   # comparison is pure int64 on both engines
SEMDEDUP_MAX_CLUSTER = 200_000


def q_semantic_dedup(sf_dir: str, k: int = 4, iters: int = 3):
    """SemDeDup-shape per-cluster semantic dedup (Abbas et al. 2023):
    k-means buckets the embedding corpus (the kmeans_embed Lloyd,
    integer-exact), then WITHIN each cluster any vector whose cosine
    similarity to a lower-id cluster-mate reaches tau is marked a
    duplicate — the deterministic keep-lowest-id variant of the
    paper's per-cluster prune.  Output: (vec_id, cluster, kept).

    Exactness: similarity compares on the CENTERED quantized vectors
    (floor(x*1024), i.e. q - KM_SHIFT — the shift would park every
    vector in the positive orthant and saturate cosine), via the
    all-integer cross-multiplied test  dot >= 0  AND
    den^2 * dot^2 >= num^2 * |u|^2 * |v|^2  (tau = num/den); with
    d = 64, |x| < 1 the largest operand is 25 * (64 * 1024^2)^2 ~
    1.1e17 — inside int64 on numpy and DuckDB alike.  Zero-norm
    vectors never match anything.

    Scale shape: ONE exchange shards rows by cluster (shard_apply);
    within a cluster the pairwise test runs as blocked int matmuls
    (1024 x 8192 row/col tiles — peak transient 64 MB, never c x c
    or b x c at the cluster cap).  Per-cluster
    pairwise cost is the SemDeDup contract: k must scale with the
    corpus (k ~ n / target_cluster_size), enforced by a raise past
    SEMDEDUP_MAX_CLUSTER rows; the kmeans stage itself is the
    shuffle-free combiner loop of q_kmeans_embed."""
    from osmquadtreepostgis_ray.stages.cluster import (KM_SHIFT, _qmat,
                                                       kmeans_assign)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, cents, corpus = kmeans_assign(ds, k=k, iters=iters,
                                     return_centroids=True,
                                     return_corpus=True)
    cref = ray.put(cents)

    def tag(t: pa.Table, cref=cref) -> pa.Table:
        C = ray.get(cref)
        ids, Q = _qmat(t)
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)  # ties -> smallest cluster (ORDER BY d2, j)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "q": t.column("q")})

    # reuse the quantized corpus kmeans_assign already materialized —
    # a second raw read + quantize pass would double the stage's input
    # I/O at the 100-TB scale this pipeline targets
    tagged = corpus.map_batches(tag, batch_format="pyarrow")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cl, sub in g.groupby("cluster", sort=False):
            c = len(sub)
            if c > SEMDEDUP_MAX_CLUSTER:
                raise ValueError(
                    f"semantic_dedup cluster {cl} has {c} rows > "
                    f"{SEMDEDUP_MAX_CLUSTER}: k must scale with the "
                    f"corpus (SemDeDup k ~ n / target cluster size)")
            ids = sub["vec_id"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            Q = np.stack(sub["q"].to_numpy())[order].astype(np.int64) \
                - KM_SHIFT
            n2 = (Q * Q).sum(axis=1)
            dup = np.zeros(c, bool)
            num2 = SEM_TAU_NUM * SEM_TAU_NUM
            den2 = SEM_TAU_DEN * SEM_TAU_DEN
            # int64-range guard (CLAUDE.md: numpy wraps SILENTLY where
            # DuckDB HUGEINT raises): the largest operand is
            # max(num2, den2) * (d * m^2)^2 with m = max |q| — a loud
            # raise for wide / unnormalized embeddings, exact in
            # Python ints so the check itself cannot wrap
            m = int(np.abs(Q).max()) if c else 0
            bound = Q.shape[1] * m * m
            if max(num2, den2) * bound * bound >= 1 << 63:
                raise ValueError(
                    f"semantic_dedup rational-cosine operands exceed "
                    f"int64 at dim={Q.shape[1]}, max|q|={m}: shrink "
                    f"KM_SCALE or reduce the embedding width")
            for s in range(0, c, 1024):   # blocked rows ...
                e = min(s + 1024, c)
                rs = np.arange(s, e)[:, None]
                for cs in range(0, c, 8192):   # ... AND blocked cols:
                    ce = min(cs + 8192, c)     # peak transient is
                    G = Q[s:e] @ Q[cs:ce].T    # 1024x8192 int64 = 64MB,
                    hit = (G >= 0) & (          # never b x c at the
                        den2 * G * G >=         # 200k cluster cap
                        num2 * np.outer(n2[s:e], n2[cs:ce]))
                    hit &= (n2[s:e, None] > 0) & (n2[None, cs:ce] > 0)
                    # row u (index s+i) marks col v>u as duplicate
                    hit &= rs < np.arange(cs, ce)[None, :]
                    dup[cs:ce] |= hit.any(axis=0)
            out.append(pd.DataFrame({
                "vec_id": ids, "cluster": np.full(c, cl, np.int64),
                "kept": (~dup).astype(np.int64)}))
        if not out:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cluster": pd.Series([], dtype=np.int64),
                                 "kept": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    return shard_apply(tagged, ["cluster"], prune)
