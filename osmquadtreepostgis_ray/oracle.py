"""DuckDB oracle SQL for __ray_entry__.oracle_sql().

Every expression here is the exact integer-arithmetic twin of the Ray
kernels (functions/geotag.py, functions/quadtree.py, stages/routing.py),
generated programmatically so the bit-level definitions live in ONE
place per concept.  Tables are pre-registered DuckDB views over the same
parquet files the Ray queries read.
"""

from __future__ import annotations

from osmquadtreepostgis_ray.config import DEFAULT_FEATURE_KEYS
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.functions.tags import count_word_sql, hstore_leftover_sql
from osmquadtreepostgis_ray.functions.text import lang_id_sql
from osmquadtreepostgis_ray.queries import CELL_DEPTH, TILE_DEPTH
from osmquadtreepostgis_ray.sources import zones as Z
from osmquadtreepostgis_ray.stages.routing import route_sql_exprs


def _cell_expr(lon_milli: str, lat_milli: str, depth: int) -> str:
    """Milli-degree ints -> quadtree cell id (exact twin of
    quadtree.encode_ixy over geotag.milli_to_fixed)."""
    n = 1 << depth
    ix = f"((({lon_milli}) * 10000 * {n}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat_milli}) + 5000) * 10000 * {n}) // {quadtree.LAT_SPAN})"
    return quadtree.interleave_sql(ix, iy, depth)


def events_geo_cte(nq_filter: str = "") -> str:
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    ev AS (
        SELECT event_id, user_id, value,
               {lon} AS lon_milli, {lat} AS lat_milli,
               {_cell_expr(lon, lat, CELL_DEPTH)} AS cell,
               {_cell_expr(lon, lat, TILE_DEPTH)} AS tile
        FROM events {nq_filter}
    )"""


def sql_cell_histogram() -> str:
    return f"WITH {events_geo_cte()} SELECT cell, count(*)::BIGINT AS n FROM ev GROUP BY cell"


def sql_tile_assign() -> str:
    return f"WITH {events_geo_cte()} SELECT event_id, cell, tile FROM ev"


def sql_agg_cells() -> str:
    return (f"WITH {events_geo_cte()} SELECT tile, count(*)::BIGINT AS n, "
            f"sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_value_cents "
            f"FROM ev GROUP BY tile")


def sql_tile_bundle() -> str:
    """Twin of queries.q_tile_bundle: ordered string_agg per tile, md5
    over the identical canonical record encoding."""
    return f"""
    WITH {events_geo_cte()},
    r AS (
        SELECT tile, event_id,
               CAST(event_id AS VARCHAR) || ':' ||
               CAST(lon_milli AS VARCHAR) || ':' ||
               CAST(lat_milli AS VARCHAR) AS rec
        FROM ev
    ),
    b AS (
        SELECT tile, count(*)::BIGINT AS n,
               string_agg(rec, ';' ORDER BY event_id) AS blob
        FROM r GROUP BY tile
    )
    SELECT tile, n, CAST(length(blob) AS BIGINT) AS bytes_len,
           md5(blob) AS digest
    FROM b
    """


def sql_tile_quadkey() -> str:
    """Twin of queries.q_tile_quadkey: tile ix/iy recomputed from the
    milli coords (the _cell_expr internals), quadkey via the shared
    base-10 digit packing (quadtree.quadkey_sql), GROUP BY tile (ix/iy
    are functionally dependent on it)."""
    n = 1 << TILE_DEPTH
    qk = quadtree.quadkey_sql("ix", "iy", TILE_DEPTH)
    return f"""
    WITH {events_geo_cte()},
    t AS (
        SELECT tile,
               ((lon_milli * 10000 * {n}) // {quadtree.LON_SPAN}) AS ix,
               (((lat_milli + 5000) * 10000 * {n}) // {quadtree.LAT_SPAN}) AS iy
        FROM ev
    )
    SELECT tile, CAST({TILE_DEPTH} AS BIGINT) AS z,
           CAST(ix AS BIGINT) AS x, CAST(iy AS BIGINT) AS y,
           {qk} AS quadkey, count(*)::BIGINT AS n
    FROM t GROUP BY tile, ix, iy
    """


def sql_pip_zones() -> str:
    zid, keep = Z.zone_match_sql("lon_milli", "lat_milli")
    admin = Z.admin_zone_sql("lon_milli", "lat_milli")
    return f"""
    WITH {events_geo_cte()}
    SELECT event_id, zone_id, kind FROM (
        SELECT event_id, {zid} AS zone_id, 'grid' AS kind FROM ev WHERE {keep}
        UNION ALL
        SELECT event_id, {admin} AS zone_id, 'admin' AS kind FROM ev
    )"""


def sql_viewport() -> str:
    """Twin of queries.q_viewport: the plain half-open bbox predicate
    (the Ray side proves the partition PRUNE; values must match a full
    scan exactly)."""
    from osmquadtreepostgis_ray.queries import VIEWPORT
    lon0, lat0, lon1, lat1 = VIEWPORT
    return f"""
    WITH {events_geo_cte()}
    SELECT event_id, lon_milli, lat_milli FROM ev
    WHERE lon_milli >= {lon0} AND lon_milli < {lon1}
      AND lat_milli >= {lat0} AND lat_milli < {lat1}
    """


def sql_pip_anti() -> str:
    """Twin of queries.q_pip_anti: events whose grid cell has no kept
    zone (the NOT-EXISTS containment inversion; admin zones tile the
    domain and are excluded on both sides)."""
    _zid, keep = Z.zone_match_sql("lon_milli", "lat_milli")
    return f"""
    WITH {events_geo_cte()}
    SELECT event_id, lon_milli, lat_milli FROM ev WHERE NOT {keep}
    """


def sql_zone_border_dist(margin: int = 2000) -> str:
    """Twin of queries.q_zone_border_dist: min of the four edge offsets
    inside the containing admin rectangle (all operands nonnegative)."""
    return f"""
    WITH {events_geo_cte()},
    a AS (
        SELECT event_id,
               lon_milli // {Z.ADMIN_W} AS ax, lat_milli // {Z.ADMIN_H} AS ay,
               lon_milli - (lon_milli // {Z.ADMIN_W}) * {Z.ADMIN_W} AS dl,
               lat_milli - (lat_milli // {Z.ADMIN_H}) * {Z.ADMIN_H} AS db
        FROM ev
    )
    SELECT event_id,
           CAST(ay * {Z.AX} + ax + {Z.ADMIN_ID_BASE} AS BIGINT) AS zone_id,
           CAST(least(dl, {Z.ADMIN_W} - 1 - dl, db, {Z.ADMIN_H} - 1 - db)
                AS BIGINT) AS edge_dist,
           least(dl, {Z.ADMIN_W} - 1 - dl, db, {Z.ADMIN_H} - 1 - db)
               < {margin} AS near_border
    FROM a
    """


def sql_zone_distance() -> str:
    """Twin of queries.q_zone_distance: kept grid zones regenerated in
    SQL (same keep hash), point clamped into each closed-left/open-right
    box, arg-min by (dist_sq, zone_id) via row_number."""
    return f"""
    WITH {events_geo_cte()},
    g AS (
        SELECT CAST(i AS BIGINT) AS zone_id,
               (i % {Z.GX}) * {Z.GRID_W} AS x0,
               (i // {Z.GX}) * {Z.GRID_H} AS y0,
               (i % {Z.GX} + 1) * {Z.GRID_W} - 1 AS x1,
               (i // {Z.GX} + 1) * {Z.GRID_H} - 1 AS y1
        FROM (SELECT unnest(range(0, {Z.GX * Z.GY})) AS i)
        WHERE (i * {Z.GRID_KEEP_MULT}) % {Z.GRID_KEEP_MOD} < {Z.GRID_KEEP_LT}
    ),
    d AS (
        SELECT e.event_id, g.zone_id,
               (e.lon_milli - least(greatest(e.lon_milli, g.x0), g.x1))
             * (e.lon_milli - least(greatest(e.lon_milli, g.x0), g.x1))
             + (e.lat_milli - least(greatest(e.lat_milli, g.y0), g.y1))
             * (e.lat_milli - least(greatest(e.lat_milli, g.y0), g.y1))
               AS dist_sq
        FROM ev e CROSS JOIN g
    ),
    r AS (
        SELECT event_id, zone_id, dist_sq,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY dist_sq, zone_id) AS rn
        FROM d
    )
    SELECT event_id, zone_id, CAST(dist_sq AS BIGINT) AS dist_sq
    FROM r WHERE rn = 1
    """


def sql_knn(k: int = 5, nq: int = 10) -> str:
    return f"""
    WITH {events_geo_cte()},
    q AS (SELECT event_id AS query_id, lon_milli AS qx, lat_milli AS qy
          FROM ev WHERE event_id < {nq}),
    d AS (SELECT q.query_id, e.event_id AS neighbor_id,
                 (e.lon_milli - q.qx) * (e.lon_milli - q.qx)
               + (e.lat_milli - q.qy) * (e.lat_milli - q.qy) AS dist
          FROM q CROSS JOIN ev e WHERE e.event_id <> q.query_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY dist, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, dist, rank::BIGINT AS rank FROM r WHERE rank <= {k}
    """


def sql_embed_calibration() -> str:
    """Twin of queries.q_embed_calibration: parallel unnest zips the
    dimension index with the floor-1024 quantized value (the
    sql_kmeans_embed list_transform expression), then one GROUP BY
    dim."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    return f"""
    WITH q AS (
        SELECT CAST(unnest(range(0, len(embedding))) AS BIGINT) AS dim,
               unnest(list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)
                        + {KM_SHIFT})) AS v
        FROM embeddings
    )
    SELECT dim, count(*)::BIGINT AS n,
           CAST(min(v) AS BIGINT) AS min_q,
           CAST(max(v) AS BIGINT) AS max_q,
           CAST(sum(v) AS BIGINT) AS sum_q,
           CAST(1000 * sum(v) // count(*) AS BIGINT) AS mean_milli_q
    FROM q GROUP BY dim
    """


def sql_histogram_quantiles() -> str:
    """Twin of queries.q_histogram_quantiles: the same fixed-width
    bucketing, running-count window, smallest bucket whose cumulative
    count reaches the ceil-rank, reported as the bucket upper bound."""
    from osmquadtreepostgis_ray.queries import HIST_BUCKET_CENTS, HIST_MAX_BUCKET
    W, M = HIST_BUCKET_CENTS, HIST_MAX_BUCKET
    return f"""
    WITH h AS (
        SELECT event_type,
               least(CAST(round(value * 100) AS BIGINT) // {W}, {M}) AS bucket,
               count(*) AS n
        FROM events GROUP BY event_type, bucket
    ),
    c AS (
        SELECT event_type, bucket, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS tot
        FROM h
    )
    SELECT event_type, CAST(max(tot) AS BIGINT) AS n,
           CAST((min(CASE WHEN cum >= (tot * 500 + 999) // 1000
                          THEN bucket END) + 1) * {W} AS BIGINT) AS p50_cents_ub,
           CAST((min(CASE WHEN cum >= (tot * 950 + 999) // 1000
                          THEN bucket END) + 1) * {W} AS BIGINT) AS p95_cents_ub
    FROM c GROUP BY event_type
    """


def sql_snapshot_diff() -> str:
    """Twin of queries.q_snapshot_diff: the two snapshot predicates
    regenerated in SQL, FULL OUTER JOIN on the key, status from side
    presence + cents equality, absent sides as -1 (BIGINT)."""
    return """
    WITH old AS (
        SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE (event_id * 2654435761) % 10 < 8
    ),
    new AS (
        SELECT event_id,
               CAST(round(value * 100) AS BIGINT)
               + CASE WHEN event_id % 7 = 0 THEN 100 ELSE 0 END AS cents
        FROM events WHERE (event_id * 7919) % 10 < 9
    )
    SELECT COALESCE(o.event_id, n.event_id) AS event_id,
           CAST(COALESCE(o.cents, -1) AS BIGINT) AS old_cents,
           CAST(COALESCE(n.cents, -1) AS BIGINT) AS new_cents,
           CASE WHEN o.event_id IS NULL THEN 'added'
                WHEN n.event_id IS NULL THEN 'removed'
                WHEN o.cents = n.cents THEN 'same'
                ELSE 'changed' END AS status
    FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
    """


def sql_dedup_latest() -> str:
    return """
    SELECT user_id, event_type, event_id FROM (
        SELECT user_id, event_type, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """


def sql_window_hourly() -> str:
    return """
    SELECT user_id, (epoch_us(ts) // 3600000000)::BIGINT AS hour,
           count(*)::BIGINT AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_value_cents
    FROM events GROUP BY user_id, hour
    """


def sql_join_orders_customer() -> str:
    return """
    SELECT c_mktsegment, count(*)::BIGINT AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_price_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """


def sql_skew_join() -> str:
    """Twin of queries.q_skew_join — the salted partitioning must be
    invisible in the output (identical to a plain join + rollup)."""
    return """
    SELECT c_mktsegment, count(*)::BIGINT AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """


def sql_join_lineitem_part() -> str:
    return """
    SELECT p_brand, count(*)::BIGINT AS n,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """


def sql_sample_events(permille: int = 100) -> str:
    from osmquadtreepostgis_ray.queries import SAMPLE_MOD, SAMPLE_MULT
    return (f"SELECT event_id, user_id FROM events "
            f"WHERE (event_id * {SAMPLE_MULT}) % {SAMPLE_MOD} < {permille}")


def sql_sample_stratified(per_group: int = 20) -> str:
    from osmquadtreepostgis_ray.queries import SAMPLE_MOD, SAMPLE_MULT
    hk = f"((event_id * {SAMPLE_MULT}) % {SAMPLE_MOD}) * 10000000 + event_id"
    return f"""
    SELECT event_type, event_id FROM (
        SELECT event_type, event_id,
               row_number() OVER (PARTITION BY event_type ORDER BY {hk}) AS rn
        FROM events
    ) WHERE rn <= {per_group}
    """


def sql_sessionize(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
                    OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session
        FROM e
    )
    SELECT user_id, session::BIGINT AS session, count(*)::BIGINT AS n_events,
           (max(ts) - min(ts))::BIGINT AS span_us
    FROM s GROUP BY user_id, session
    """


def sql_distinct_users() -> str:
    return ("SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
            "FROM events GROUP BY event_type")


def sql_topk_per_segment(k: int = 3) -> str:
    return f"""
    SELECT c_mktsegment, o_orderkey, rank FROM (
        SELECT c_mktsegment, o_orderkey,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey DESC)::BIGINT AS rank
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rank <= {k}
    """


def sql_topk_orders() -> str:
    return ("SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10")


def sql_lineitem_pricing() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_e4,
           count(*)::BIGINT AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """


# ------------------------------------------------------------------ flagship

def images_cte() -> str:
    """The synthetic corpus as SQL: documents -> image rows with geotag,
    cell/tile, routing columns (twin of sources/images.py +
    stages/cells.py + stages/routing.py)."""
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql("phash")
    r = route_sql_exprs(caption_expr="text", phash_expr="phash")
    return f"""
    imgs0 AS (
        SELECT doc_id, text, {ph} AS phash,
               CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS w,
               CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 48 END AS h
        FROM documents
    ),
    imgs AS (
        SELECT doc_id, text, phash, w, h,
               {lon} AS lon_milli, {lat} AS lat_milli,
               {_cell_expr(lon, lat, CELL_DEPTH)} AS cell,
               {_cell_expr(lon, lat, TILE_DEPTH)} AS tile,
               {r['kind']} AS kind, {r['z_order']} AS z_order,
               {r['layer']} AS layer, {r['minzoom']} AS minzoom,
               {r['is_building']} AS is_building,
               {r['is_boundary']} AS is_boundary,
               {r['is_highway']} AS is_highway
        FROM imgs0
    )"""


def sql_flagship_point() -> str:
    kvs = ",\n           ".join(
        f"{count_word_sql('text', k)} AS kv_{k}" for k in DEFAULT_FEATURE_KEYS)
    hs = hstore_leftover_sql("imgs", "doc_id", "text", DEFAULT_FEATURE_KEYS)
    return f"""
    WITH {images_cte()},
    hs AS ({hs})
    SELECT i.doc_id AS osm_id, i.cell AS quadtree, i.tile AS tile,
           {kvs},
           hs.tags AS tags, i.minzoom AS minzoom
    FROM imgs i JOIN hs ON i.doc_id = hs.doc_id
    WHERE i.kind = 0
    """


def sql_flagship_counts() -> str:
    return f"""
    WITH {images_cte()}
    SELECT tbl, n FROM (
        SELECT 'point' AS tbl, count(*)::BIGINT AS n FROM imgs WHERE kind = 0
        UNION ALL SELECT 'line', count(*)::BIGINT FROM imgs WHERE kind = 1 AND NOT is_highway
        UNION ALL SELECT 'highway', count(*)::BIGINT FROM imgs WHERE is_highway
        UNION ALL SELECT 'polygon', count(*)::BIGINT FROM imgs WHERE kind = 2 AND NOT is_building
        UNION ALL SELECT 'building', count(*)::BIGINT FROM imgs WHERE is_building
        UNION ALL SELECT 'boundary', count(*)::BIGINT FROM imgs WHERE is_boundary
    )"""


def sql_union_lines() -> str:
    return f"""
    WITH {images_cte()}
    SELECT doc_id AS osm_id, tile, z_order FROM imgs WHERE kind = 1 AND NOT is_highway
    UNION ALL
    SELECT doc_id AS osm_id, tile, z_order FROM imgs WHERE is_highway
    """


def _footprint_cte() -> str:
    """Footprint box bounds per image (twin of geotag.footprint_milli),
    appended to images_cte as `fp` (join on doc_id)."""
    return f"""
    fp AS (
        SELECT doc_id,
               greatest(lon_milli - w, 0) AS x0,
               least(lon_milli + w, {geotag.LON_MOD - 1}) AS x1,
               greatest(lat_milli - h, 0) AS y0,
               least(lat_milli + h, {geotag.LAT_MOD - 1}) AS y1
        FROM imgs
    )"""


def sql_roads() -> str:
    """Twin of queries.q_roads (J1 planet_osm_roads analog,
    /root/reference osmquadtreepostgis/__init__.py:214-230): major
    highway rows UNION admin boundary rows with NULL/constant columns."""
    scan = count_word_sql("i.text", "scan")
    return f"""
    WITH {images_cte()},
    {_footprint_cte()}
    SELECT i.doc_id AS osm_id, i.cell AS quadtree, i.tile,
           i.z_order, CAST((f.x1 - f.x0) + (f.y1 - f.y0) AS DOUBLE) AS length,
           i.minzoom
    FROM imgs i JOIN fp f ON i.doc_id = f.doc_id
    WHERE i.is_highway AND (i.z_order >= 20 OR {scan} > 0)
    UNION ALL
    SELECT CAST(-i.doc_id AS BIGINT) AS osm_id, i.cell AS quadtree, i.tile,
           0::BIGINT AS z_order, CAST(NULL AS DOUBLE) AS length, i.minzoom
    FROM imgs i
    WHERE i.is_boundary AND i.doc_id > 0
    """


def sql_union_polygon() -> str:
    """Twin of queries.q_union_polygon (J3 planet_osm_polygon view,
    __init__.py:376-378): polygon UNION ALL building on shared columns;
    boundary-fanout rows negate ids in both branches (M9)."""
    neg = "CASE WHEN i.is_boundary THEN -i.doc_id ELSE i.doc_id END"
    area = "CAST((f.x1 - f.x0) * (f.y1 - f.y0) AS DOUBLE)"
    return f"""
    WITH {images_cte()},
    {_footprint_cte()}
    SELECT CAST({neg} AS BIGINT) AS osm_id, 1::BIGINT AS part, {area} AS area,
           i.cell AS quadtree, i.tile, i.minzoom
    FROM imgs i JOIN fp f ON i.doc_id = f.doc_id
    WHERE i.kind = 2 AND NOT i.is_building
    UNION ALL
    SELECT CAST({neg} AS BIGINT) AS osm_id, 1::BIGINT AS part, {area} AS area,
           i.cell AS quadtree, i.tile, i.minzoom
    FROM imgs i JOIN fp f ON i.doc_id = f.doc_id
    WHERE i.is_building
    """


def sql_polygon_point() -> str:
    """Twin of queries.q_polygon_point (J4 polygon_point view,
    __init__.py:368): the polygon table's non-geometry columns (the Ray
    side swaps way_point into the way slot; binary columns are excluded
    from the compare)."""
    kvs = ",\n           ".join(
        f"{count_word_sql('i.text', k)} AS kv_{k}" for k in DEFAULT_FEATURE_KEYS)
    hs = hstore_leftover_sql("imgs", "doc_id", "text", DEFAULT_FEATURE_KEYS)
    neg = "CASE WHEN i.is_boundary THEN -i.doc_id ELSE i.doc_id END"
    area = "CAST((f.x1 - f.x0) * (f.y1 - f.y0) AS DOUBLE)"
    return f"""
    WITH {images_cte()},
    {_footprint_cte()},
    hs AS ({hs})
    SELECT CAST({neg} AS BIGINT) AS osm_id, i.cell AS quadtree, i.tile, 1::BIGINT AS part,
           {area} AS area, {kvs},
           hs.tags AS tags, i.minzoom AS minzoom
    FROM imgs i JOIN fp f ON i.doc_id = f.doc_id
                JOIN hs ON i.doc_id = hs.doc_id
    WHERE i.kind = 2 AND NOT i.is_building
    """


def sql_lowzoom_counts(z: int = 12) -> str:
    return f"""
    WITH {images_cte()}
    SELECT tbl, n FROM (
        SELECT 'point' AS tbl, count(*) FILTER (minzoom <= {z})::BIGINT AS n FROM imgs WHERE kind = 0
        UNION ALL SELECT 'line', count(*) FILTER (minzoom <= {z})::BIGINT FROM imgs WHERE kind = 1 AND NOT is_highway
        UNION ALL SELECT 'highway', count(*) FILTER (minzoom <= {z})::BIGINT FROM imgs WHERE is_highway
        UNION ALL SELECT 'polygon', count(*) FILTER (minzoom <= {z})::BIGINT FROM imgs WHERE kind = 2 AND NOT is_building
        UNION ALL SELECT 'building', count(*) FILTER (minzoom <= {z})::BIGINT FROM imgs WHERE is_building
        UNION ALL SELECT 'boundary', count(*) FILTER (minzoom <= {z})::BIGINT FROM imgs WHERE is_boundary
    )"""


def sql_tile_cover() -> str:
    """Twin of queries.q_tile_cover (raster<->vector cover explode)."""
    from osmquadtreepostgis_ray.queries import COVER_DEPTH
    d = COVER_DEPTH
    n = 1 << d
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql("phash")

    def ix_of(mexpr: str) -> str:
        return f"((({mexpr}) * 10000 * {n}) // {quadtree.LON_SPAN})"

    def iy_of(mexpr: str) -> str:
        return f"(((({mexpr}) + 5000) * 10000 * {n}) // {quadtree.LAT_SPAN})"

    return f"""
    WITH i0 AS (
      SELECT doc_id, {ph} AS phash,
             CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS w,
             CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 48 END AS h
      FROM documents
    ),
    f AS (
      SELECT doc_id,
             greatest({lon} - w, 0) AS x0, least({lon} + w, {geotag.LON_MOD - 1}) AS x1,
             greatest({lat} - h, 0) AS y0, least({lat} + h, {geotag.LAT_MOD - 1}) AS y1
      FROM i0
    ),
    c AS (
      SELECT doc_id,
             {ix_of('x0')} AS ix0, {ix_of('x1')} AS ix1,
             {iy_of('y0')} AS iy0, {iy_of('y1')} AS iy1
      FROM f
    ),
    ex AS (SELECT doc_id, unnest(range(ix0, ix1 + 1)) AS ix, iy0, iy1 FROM c),
    ey AS (SELECT doc_id, ix, unnest(range(iy0, iy1 + 1)) AS iy FROM ex)
    SELECT doc_id, {quadtree.interleave_sql('ix', 'iy', d)} AS cover_cell FROM ey
    """


# ------------------------------------------------------------- assembly (A1-A4)

def assembly_members_cte() -> str:
    """Twin of stages/assembly.py member_table + part assignment."""
    ph = geotag.phash_sql("doc_id")
    hit = count_word_sql("text", "merge")
    return f"""
    m0 AS (
        SELECT doc_id, doc_id // 8 AS group_id, {ph} AS phash, {hit} AS hit
        FROM documents
    ),
    m AS (
        SELECT doc_id, group_id, hit,
               (phash % 360000) AS x, ((phash // 360000) % 170000) AS y,
               row_number() OVER (PARTITION BY group_id ORDER BY doc_id) - 1 AS seq,
               count(*) OVER (PARTITION BY group_id) AS k,
               max(hit) OVER (PARTITION BY group_id) AS maxhit
        FROM m0
    ),
    g AS (
        SELECT *, (maxhit > 0 AND k >= 3) AS closed,
               CASE WHEN k >= 6 THEN k // 2 ELSE k END AS half
        FROM m
    ),
    p AS (
        SELECT *,
            CASE WHEN closed AND k >= 6 AND seq >= half THEN 2 ELSE 1 END AS part,
            CASE WHEN closed AND k >= 6 AND seq >= half THEN seq - half ELSE seq END AS pseq,
            CASE WHEN closed AND k >= 6 THEN
                 (CASE WHEN seq >= half THEN k - half ELSE half END)
                 ELSE k END AS psize
        FROM g
    )"""


def sql_assembly() -> str:
    return f"""
    WITH {assembly_members_cte()},
    pts AS (
        SELECT group_id, group_id AS osm_id, 'point' AS kind,
               1 AS part, 1 AS n_points, 0 AS measure2
        FROM p WHERE k = 1
    ),
    lines AS (
        SELECT a.group_id, a.group_id AS osm_id, 'line' AS kind, 1 AS part,
               max(a.k) AS n_points,
               sum(abs(b.x - a.x) + abs(b.y - a.y)) AS measure2
        FROM p a JOIN p b ON b.group_id = a.group_id AND b.seq = a.seq + 1
        WHERE NOT a.closed AND a.k >= 2
        GROUP BY a.group_id
    ),
    ctr AS (
        -- outer (part 1) ring integer centroid + bbox of hole-candidate
        -- groups (twin of stages/assembly.py hole assignment)
        SELECT group_id,
               sum(x) FILTER (part = 1) // count(*) FILTER (part = 1) AS cx,
               sum(y) FILTER (part = 1) // count(*) FILTER (part = 1) AS cy,
               min(x) FILTER (part = 1) AS ax0, max(x) FILTER (part = 1) AS ax1,
               min(y) FILTER (part = 1) AS ay0, max(y) FILTER (part = 1) AS ay1
        FROM p WHERE closed AND k >= 6 GROUP BY group_id
    ),
    pt AS (
        -- hole groups (even group_id): part-2 ring shrinks toward the
        -- outer centroid ((3c + v) // 4: non-negative operands keep
        -- DuckDB's truncating // equal to numpy's floor //) and clips
        -- into the outer bbox
        SELECT p.*,
               (p.closed AND p.k >= 6 AND p.group_id % 2 = 0) AS hole_grp,
               CASE WHEN p.closed AND p.k >= 6 AND p.group_id % 2 = 0 AND p.part = 2
                    THEN least(greatest((3 * c.cx + p.x) // 4, c.ax0), c.ax1)
                    ELSE p.x END AS xt,
               CASE WHEN p.closed AND p.k >= 6 AND p.group_id % 2 = 0 AND p.part = 2
                    THEN least(greatest((3 * c.cy + p.y) // 4, c.ay0), c.ay1)
                    ELSE p.y END AS yt
        FROM p LEFT JOIN ctr c USING (group_id)
    ),
    polys0 AS (
        SELECT a.group_id, a.part, a.hole_grp, max(a.psize) AS psize,
               abs(sum(a.xt * b.yt - b.xt * a.yt)) AS area2
        FROM pt a JOIN pt b ON b.group_id = a.group_id AND b.part = a.part
                            AND b.pseq = (a.pseq + 1) % a.psize
        WHERE a.closed
        GROUP BY a.group_id, a.part, a.hole_grp
    ),
    polys AS (
        SELECT group_id, -group_id AS osm_id, 'polygon' AS kind, part,
               psize + 1 AS n_points, area2 AS measure2
        FROM polys0 WHERE NOT hole_grp
        UNION ALL
        -- hole groups: ONE PolygonPart — n_points spans both ring
        -- closures, doubled area = outer - hole
        SELECT group_id, -group_id, 'polygon', 1, sum(psize) + 2,
               sum(CASE WHEN part = 1 THEN area2 ELSE -area2 END)
        FROM polys0 WHERE hole_grp GROUP BY group_id
    )
    SELECT group_id, osm_id, kind, part::BIGINT AS part,
           n_points::BIGINT AS n_points, measure2::BIGINT AS measure2
    FROM (SELECT * FROM pts UNION ALL SELECT * FROM lines UNION ALL SELECT * FROM polys)
    """


def sql_relation_tags() -> str:
    from osmquadtreepostgis_ray.stages.assembly import N_ROUTES, ROUTE_STEP
    return f"""
    SELECT doc_id, string_agg(CAST(r AS VARCHAR), ',' ORDER BY r) AS routes
    FROM documents CROSS JOIN range({N_ROUTES}) t(r)
    WHERE (doc_id + r) % {ROUTE_STEP} = 0
    GROUP BY doc_id
    """


def sql_admin_levels() -> str:
    from osmquadtreepostgis_ray.stages.assembly import ADMIN_STEP, N_BOUNDARY
    return f"""
    SELECT doc_id,
           CAST(min(CASE WHEN (doc_id + b*b) % {ADMIN_STEP} = 0
                         THEN 2 + (b % 10) END) AS VARCHAR) AS min_admin_level,
           CAST(max(CASE WHEN (doc_id + b*b) % {ADMIN_STEP} = 0
                         THEN 2 + (b % 10) END) AS VARCHAR) AS max_admin_level
    FROM documents CROSS JOIN range({N_BOUNDARY}) t(b)
    GROUP BY doc_id
    """


def sql_parent_tags() -> str:
    fast = count_word_sql("text", "fast")
    slow = count_word_sql("text", "slow")
    return f"""
    SELECT doc_id, doc_id // 8 AS group_id,
           {fast} AS hit_fast, {slow} AS hit_slow,
           max({fast}) OVER (PARTITION BY doc_id // 8) AS parent_fast,
           max({slow}) OVER (PARTITION BY doc_id // 8) AS parent_slow
    FROM documents
    """


def sql_checkpoint() -> str:
    """Per-partition row counts of the checkpointed flagship point table
    (partition = tile's depth-4 ancestor: morton >> 2*(8-4), redepthed)."""
    return f"""
    WITH {images_cte()}
    SELECT ((tile // 64) // 256) * 64 + 4 AS part, count(*)::BIGINT AS "rows"
    FROM imgs WHERE kind = 0 GROUP BY 1
    """


# ------------------------------------------------------------------ documents

def sql_dedup_exact() -> str:
    return ("SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups "
            "FROM documents GROUP BY text")


def sql_lang_id() -> str:
    return f"SELECT doc_id, {lang_id_sql('text')} AS lang_pred FROM documents"


def sql_quality() -> str:
    stop = " + ".join(count_word_sql("text", w) for w in ("the", "a", "of", "and"))
    ntok = r"length(regexp_replace(text, '\S+', 'x', 'g')) - length(regexp_replace(text, '\s+', '', 'g'))"
    # n_tokens via token regex: count of \S+ runs
    ntok = r"(CASE WHEN trim(text) = '' THEN 0 ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', '')) + 1 END)"
    return f"""
    SELECT doc_id, {ntok}::BIGINT AS n_tokens, ({stop})::BIGINT AS stop_hits,
           (CASE WHEN {ntok} > 0 THEN (1000 * ({stop})) // {ntok} ELSE 0 END)::BIGINT AS stop_permille
    FROM documents
    """


def sql_hstore_tags() -> str:
    return hstore_leftover_sql("documents", "doc_id", "text", DEFAULT_FEATURE_KEYS)


def sql_token_bpe() -> str:
    from osmquadtreepostgis_ray.functions.text import bpe_token_count_sql
    bpe = bpe_token_count_sql("text")
    ntok = r"(CASE WHEN trim(text) = '' THEN 0 ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', '')) + 1 END)"
    return (f"SELECT source, sum({bpe})::BIGINT AS bpe_tokens, "
            f"sum({ntok})::BIGINT AS ws_tokens, count(*)::BIGINT AS docs "
            f"FROM documents GROUP BY source")


# whitespace token count (twin of functions/text.token_count)
_NTOK = r"(CASE WHEN trim(text) = '' THEN 0 ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) - length(replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', '')) + 1 END)"


def sql_token_totals() -> str:
    return (f"SELECT source, sum({_NTOK})::BIGINT AS tokens, count(*)::BIGINT AS docs "
            f"FROM documents GROUP BY source")


def sql_seq_pack(budget: int = 2048, shards: int = 32) -> str:
    """Twin of queries.q_seq_pack: the exclusive per-shard running token
    sum via a window frame; chunk/offset by truncating division (all
    operands non-negative — the CLAUDE.md `//` rule)."""
    return f"""
    WITH d AS (
        SELECT doc_id, doc_id % {shards} AS shard, {_NTOK} AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT shard, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS excl
        FROM d
    )
    SELECT CAST(shard AS BIGINT) AS shard, doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(excl // {budget} AS BIGINT) AS chunk,
           CAST(excl % {budget} AS BIGINT) AS tok_offset
    FROM r
    """


def sql_fingerprints() -> str:
    """Twin of functions/text.fingerprint: polynomial rolling hash of the
    utf-8 bytes mod 2^61-1 (corpus is ASCII, so ord(char) == byte)."""
    from osmquadtreepostgis_ray.functions.text import FP_BASE, FP_MOD
    return f"""
    SELECT doc_id, CAST(list_reduce(
        list_prepend(CAST(0 AS HUGEINT),
          list_transform(range(1, length(text) + 1),
                         i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
        (h, c) -> (h * {FP_BASE} + c) % {FP_MOD}) AS BIGINT) AS fingerprint
    FROM documents
    """


_M64 = 1 << 64


def _mulmod64(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 in HUGEINT without overflowing INT128:
    split expr into 32-bit halves (each partial product < 2^97)."""
    c = const % _M64
    return (f"((({expr}) % 4294967296) * {c} "
            f"+ (((({expr}) // 4294967296) * {c}) % {_M64}) * 4294967296) % {_M64}")


def _shingles_cte(k: int = 9) -> str:
    """Distinct hashed k-char shingles per doc, one row per (doc,
    shingle) — the exact HUGEINT twin of text.char_shingles (weighted
    byte sum mod 2^64; every corpus text is >= k chars, so the pad
    branch never fires — asserted by the length filter)."""
    mults = [pow(1099511628211, j, _M64) for j in range(k)]
    window = " + ".join(
        f"CAST(ord(substr(text, i + {j}, 1)) AS HUGEINT) * {m}"
        for j, m in enumerate(mults))
    return f"""
    sh0 AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, length(text) - {k - 2}),
            i -> ({window}) % {_M64}))) AS s
        FROM documents WHERE length(text) >= {k}
    )"""


def sql_minhash_pairs(num_hashes: int = 64, bands: int = 16,
                      sim_threshold: float = 0.5) -> str:
    """FULL-value twin of stages/dedup.minhash_candidates: 64 minhash
    permutations, 16 LSH band keys, bucket-sharing candidate pairs,
    signature-agreement estimate — all exact mod-2^64 integer math, so
    the (a, b, est_jaccard) output matches the Ray pipeline bit-for-bit."""
    from osmquadtreepostgis_ray.functions.text import _minhash_coeffs
    a, b = _minhash_coeffs(num_hashes)
    rows = num_hashes // bands
    bmult = [pow(0x9E3779B97F4A7C15, r + 1, _M64) for r in range(rows)]
    sig_cols = ",\n               ".join(
        f"min(({_mulmod64('s', int(a[h]))} + {int(b[h])}) % {_M64}) AS s{h}"
        for h in range(num_hashes))
    band_rows = []
    for bi in range(bands):
        key = " + ".join(_mulmod64(f"s{bi * rows + r}", bmult[r]) for r in range(rows))
        band_rows.append(f"SELECT doc_id, {bi} AS band, ({key}) % {_M64} AS key FROM sig")
    bands_sql = "\n        UNION ALL ".join(band_rows)
    agree = " + ".join(
        f"CASE WHEN x.s{h} = y.s{h} THEN 1 ELSE 0 END" for h in range(num_hashes))
    return f"""
    WITH {_shingles_cte()},
    sig AS (
        SELECT doc_id,
               {sig_cols}
        FROM sh0 GROUP BY doc_id
    ),
    bk AS (
        {bands_sql}
    ),
    cand AS (
        SELECT DISTINCT p.doc_id AS a, q.doc_id AS b
        FROM bk p JOIN bk q ON p.band = q.band AND p.key = q.key
                           AND p.doc_id < q.doc_id
    )
    SELECT c.a, c.b, (({agree}) / {float(num_hashes)}) AS est_jaccard
    FROM cand c JOIN sig x ON x.doc_id = c.a JOIN sig y ON y.doc_id = c.b
    WHERE ({agree}) >= {sim_threshold} * {num_hashes}
    """


def sql_simhash(k: int = 9, prefix_bits: int = 12) -> str:
    """FULL-value twin of stages/dedup.simhash_buckets: per-bit majority
    vote over each doc's distinct shingle hashes, packed to a signed
    int64 + top-prefix_bits bucket."""
    ones = ",\n               ".join(
        f"sum(CAST((s // {1 << j}) % 2 AS BIGINT)) AS o{j}" for j in range(64))
    packed = " + ".join(
        f"CASE WHEN 2 * o{j} > n THEN CAST({1 << j} AS HUGEINT) ELSE 0 END"
        for j in range(64))
    return f"""
    WITH {_shingles_cte(k)},
    bits AS (
        SELECT doc_id, count(*) AS n,
               {ones}
        FROM sh0 GROUP BY doc_id
    ),
    val AS (SELECT doc_id, ({packed}) AS v FROM bits)
    SELECT doc_id,
           CAST(CASE WHEN v >= {1 << 63} THEN v - {_M64} ELSE v END AS BIGINT) AS simhash,
           CAST(v // {1 << (64 - prefix_bits)} AS BIGINT) AS bucket
    FROM val
    """


def sql_embed_docs(dim: int = 32, k: int = 5, nq: int = 5) -> str:
    """Twin of the embedding-GENERATION + self-kNN pipeline
    (stages/embed.embed_documents + knn_embeddings): per-token FNV-1a
    hash -> slot/sign feature hashing, float64 L2 normalize, float32
    round (the Ray output dtype), cosine top-k.  The corpus has no
    leading/trailing/double whitespace (asserted by the build), so the
    single-space split matches utf8_split_whitespace."""
    basis = 0xCBF29CE484222325
    prime = 0x100000001B3
    slots = ", ".join(f"coalesce(sum(sgn) FILTER (slot = {j}), 0.0)" for j in range(dim))
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wh AS (
        SELECT doc_id, list_reduce(
            list_prepend(CAST({basis} AS HUGEINT),
                list_transform(range(1, length(w) + 1),
                               i -> CAST(ord(substr(w, i, 1)) AS HUGEINT))),
            (h, c) -> (xor(h, c) * {prime}) % {_M64}) AS h
        FROM toks
    ),
    contrib AS (
        SELECT doc_id, CAST(h % {dim} AS BIGINT) AS slot,
               CASE WHEN (h // 4294967296) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
        FROM wh
    ),
    emb0 AS (SELECT doc_id, [{slots}] AS v0 FROM contrib GROUP BY doc_id),
    emb AS (
        SELECT doc_id AS vec_id,
               list_transform(v0, x -> CAST(CAST(x / greatest(
                   sqrt(list_sum(list_transform(v0, y -> y * y))), 1e-30)
                   AS REAL) AS DOUBLE)) AS v
        FROM emb0
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {nq}),
    d AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                 list_dot_product(q.qv, e.v)
                 / sqrt(list_dot_product(e.v, e.v))
                 / sqrt(list_dot_product(q.qv, q.qv)) AS sim
          FROM q CROSS JOIN emb e WHERE e.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {k}
    """


def _sql_decoded_pixels() -> str:
    """Shared CTE prefix: documents -> per-pixel DECODED values.
    ``dec`` has (doc_id, image_id, w, h, idx, p) — the splitmix64
    counter PRNG, numpy-linspace gradient and qlossy re-quantization
    exactly as the Ray codecs (functions/codecs.py)."""
    ph = geotag.phash_sql("doc_id")
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    P = 0x100000001B3
    return f"""
    WITH img AS (
        SELECT doc_id, printf('img%012d', doc_id) AS image_id,
               CAST({ph} AS HUGEINT) AS phash,
               CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS w,
               CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 48 END AS h,
               CASE WHEN doc_id % 4 = 0 THEN 'qlossy' ELSE 'raw' END AS fmt
        FROM documents
    ),
    px0 AS (
        SELECT doc_id, image_id, w, h, fmt,
               unnest(range(0, w * h)) AS idx,
               ({_mulmod64('phash', P)}) AS sp
        FROM img
    ),
    px1 AS (SELECT *, (sp + idx + {C1}) % {_M64} AS v1 FROM px0),
    px2 AS (SELECT *, {_mulmod64(f'xor(v1, v1 // {1 << 30})', C2)} AS v2 FROM px1),
    px3 AS (SELECT *, {_mulmod64(f'xor(v2, v2 // {1 << 27})', C3)} AS v3 FROM px2),
    px4 AS (
        SELECT doc_id, image_id, w, h, fmt, idx,
               CAST(xor(v3, v3 // {1 << 31}) % 33 AS BIGINT) - 16 AS noise
        FROM px3
    ),
    px AS (
        SELECT doc_id, image_id, w, h, fmt, idx,
               floor(least(greatest(
                   ((CASE WHEN idx % w = w - 1 THEN 255.0
                          ELSE (idx % w) * (255.0 / (w - 1)) END)
                  + (CASE WHEN idx // w = h - 1 THEN 255.0
                          ELSE (idx // w) * (255.0 / (h - 1)) END)) / 2.0
                  + noise, 0.0), 255.0)) AS p
        FROM px4
    ),
    dec AS (
        SELECT doc_id, image_id, w, h, idx,
               CASE WHEN fmt = 'qlossy'
                    THEN least(CAST(p AS BIGINT) // 4 * 4 + 2, 255)
                    ELSE CAST(p AS BIGINT) END AS p
        FROM px
    )"""


def sql_image_decode() -> str:
    """Twin of the decode+PSNR+feature pipeline (stages/images.DecodeStats
    over sources/images synthesis): per-pixel splitmix64 counter PRNG
    (exact HUGEINT mod-2^64), gradient with numpy-linspace endpoint
    override, trunc-to-uint8, qlossy re-quantization — mean_pixel is
    exact because pixel sums are integers (< 2^53) in both engines.
    psnr_ok is TRUE by construction (raw is lossless; qlossy max error 2
    keeps PSNR >= 40 dB) — the Ray side MEASURES it, the oracle states
    the invariant."""
    return f"""{_sql_decoded_pixels()}
    SELECT image_id, TRUE AS psnr_ok,
           CAST(floor(avg(p)) AS BIGINT) AS mean_pixel,
           CAST(w AS BIGINT) AS w_out, CAST(h AS BIGINT) AS h_out
    FROM dec GROUP BY image_id, w, h, doc_id
    """


def sql_image_blur() -> str:
    """Twin of queries.q_image_blur: the 4-neighbor Laplacian as a
    5-offset contribution join over the decoded-pixel CTE (the
    sql_tile_sobel pattern); variance moments are exact int64 and
    var_milli's integer division has all-non-negative operands (n*s2 -
    s1^2 >= 0 by Cauchy-Schwarz), so DuckDB trunc == numpy floor."""
    from osmquadtreepostgis_ray.stages.images import LAP_SHARP_MILLI
    return f"""{_sql_decoded_pixels()},
    off AS (
        SELECT * FROM (VALUES (-1, 0, 1), (1, 0, 1), (0, -1, 1),
                              (0, 1, 1), (0, 0, -4)) o(dy, dx, k)
    ),
    l AS (
        SELECT d.image_id, d.w, d.h,
               (d.idx // d.w) - o.dy AS cy, (d.idx % d.w) - o.dx AS cx,
               sum(o.k * d.p) AS lp
        FROM dec d, off o
        GROUP BY d.image_id, d.w, d.h, cy, cx
    ),
    s AS (
        SELECT image_id, count(*) AS n_int, sum(lp) AS s1, sum(lp * lp) AS s2
        FROM l
        WHERE cy >= 1 AND cy <= h - 2 AND cx >= 1 AND cx <= w - 2
        GROUP BY image_id
    )
    SELECT image_id, n_int::BIGINT AS n_int,
           s1::BIGINT AS lap_s1, s2::BIGINT AS lap_s2,
           ((n_int * s2 - s1 * s1) * 1000 // (n_int * n_int))::BIGINT
               AS var_milli,
           (n_int * s2 - s1 * s1) * 1000 // (n_int * n_int)
               >= {LAP_SHARP_MILLI} AS is_sharp
    FROM s"""


def sql_image_augment() -> str:
    """Twin of queries.q_image_augment (stages/images.AugmentCrop):
    flip/crop parameters recomputed from the HUGEINT phash (exact — the
    phash is < 2^53 and nonnegative on both sides), the augmented-view
    membership expressed as a window predicate over source coordinates
    (flip just mirrors the x-window), and the position weight
    Y*cw + X + 1 rebuilt from source coords.  All-int aggregates, every
    integer division nonnegative (CLAUDE.md trunc==floor invariant)."""
    return f"""{_sql_decoded_pixels()},
    prm AS (
        SELECT d.doc_id, d.image_id, d.w, d.h, d.idx, d.p,
               d.w // 2 AS cw, d.h // 2 AS ch,
               CAST(i.phash % 2 AS BIGINT) AS flip,
               CAST((i.phash // 2) % (d.w - d.w // 2 + 1) AS BIGINT) AS ox,
               CAST((i.phash // 8) % (d.h - d.h // 2 + 1) AS BIGINT) AS oy
        FROM dec d JOIN img i USING (doc_id)
    ),
    c AS (
        SELECT image_id, flip, ox, oy, cw, ch, p,
               (idx // w) - oy AS yy,
               CASE WHEN flip = 1 THEN (w - 1 - ox) - (idx % w)
                    ELSE (idx % w) - ox END AS xx
        FROM prm
    )
    SELECT image_id, flip = 1 AS flipped, ox, oy,
           CAST(cw AS BIGINT) AS aug_w, CAST(ch AS BIGINT) AS aug_h,
           CAST(sum(p) AS BIGINT) AS aug_sum,
           CAST(sum(p * (yy * cw + xx + 1)) AS BIGINT) AS aug_wsum,
           CAST(sum(p) // (cw * ch) AS BIGINT) AS aug_mean
    FROM c
    WHERE yy >= 0 AND yy < ch AND xx >= 0 AND xx < cw
    GROUP BY image_id, flip, ox, oy, cw, ch
    """


def sql_crossmodal_knn(k: int = 5, nq: int = 8, ngram: int = 9) -> str:
    """Twin of queries.q_crossmodal_knn: image AHASH (ahash CTE) of the
    nq fixed query images vs every caption's SIMHASH (the sql_simhash
    bit-majority), hamming = bit_count(xor(..)) on the signed-int64 bit
    patterns (two's complement xor == uint64 xor), rank by (hamming,
    doc_id)."""
    ones = ",\n               ".join(
        f"sum(CAST((s // {1 << j}) % 2 AS BIGINT)) AS o{j}" for j in range(64))
    packed = " + ".join(
        f"CASE WHEN 2 * o{j} > n THEN CAST({1 << j} AS HUGEINT) ELSE 0 END"
        for j in range(64))
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()},
    {_shingles_cte(ngram)},
    bits AS (
        SELECT doc_id, count(*) AS n,
               {ones}
        FROM sh0 GROUP BY doc_id
    ),
    sval AS (SELECT doc_id, ({packed}) AS v FROM bits),
    sh AS (
        SELECT doc_id,
               CAST(CASE WHEN v >= {1 << 63} THEN v - {_M64} ELSE v END
                    AS BIGINT) AS simhash
        FROM sval
    ),
    qh AS (
        SELECT i.doc_id AS query_id, a.ahash
        FROM ah a JOIN img i USING (image_id) WHERE i.doc_id < {nq}
    )
    SELECT query_id, doc_id, hamming, "rank" FROM (
        SELECT q.query_id, s.doc_id,
               bit_count(xor(s.simhash, q.ahash))::BIGINT AS hamming,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY bit_count(xor(s.simhash, q.ahash)), s.doc_id
               )::BIGINT AS "rank"
        FROM sh s CROSS JOIN qh q
    ) WHERE "rank" <= {k}
    """


def sql_image_transcode() -> str:
    """Twin of queries.q_image_transcode (stages/images.TranscodeRLE):
    raw-format pixels quantized (// 4), run count = 1 + adjacent
    changes via LAG over the row-major pixel index; psnr_ok is TRUE by
    construction (quantizer max error 2 -> PSNR >= 40 dB; the Ray side
    MEASURES it per image — the sql_image_decode convention)."""
    return f"""{_sql_decoded_pixels()},
    raw AS (
        SELECT d.image_id, d.idx, d.p // 4 AS q, d.w * d.h AS n_px
        FROM dec d JOIN img i USING (doc_id) WHERE i.fmt = 'raw'
    ),
    chg AS (
        SELECT image_id, n_px,
               CASE WHEN lag(q) OVER w IS NULL THEN 1
                    WHEN q <> lag(q) OVER w THEN 1 ELSE 0 END AS c
        FROM raw WINDOW w AS (PARTITION BY image_id ORDER BY idx)
    )
    SELECT image_id, CAST(n_px AS BIGINT) AS n_px,
           CAST(sum(c) AS BIGINT) AS n_runs,
           CAST(3 * sum(c) AS BIGINT) AS enc_bytes,
           CAST(1000 * 3 * sum(c) // n_px AS BIGINT) AS ratio_permille,
           TRUE AS psnr_ok
    FROM chg GROUP BY image_id, n_px
    """


def sql_caption_stats_by_zone() -> str:
    """Twin of queries.q_caption_stats_by_zone: phash geotag -> admin
    zone formula, bounded grouped sums, exact milli mean."""
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql(f"({ph})")
    return f"""
    WITH d AS (
        SELECT CAST((({lat}) // {Z.ADMIN_H}) * {Z.AX}
                    + (({lon}) // {Z.ADMIN_W}) + {Z.ADMIN_ID_BASE}
               AS BIGINT) AS zone_id,
               n_chars
        FROM documents
    )
    SELECT zone_id, count(*)::BIGINT AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(1000 * sum(n_chars) // count(*) AS BIGINT) AS mean_chars_milli
    FROM d GROUP BY zone_id
    """


def sql_geo_dup_groups() -> str:
    """Twin of queries.q_geo_dup_groups: per-image ahash (ah CTE) keyed
    with the depth-2 cell of the phash-derived geotag (the same
    milli -> fixed -> morton chain as _cell_expr), grouped on the
    composite key, >= 2 filter."""
    from osmquadtreepostgis_ray.queries import GEO_DUP_DEPTH
    lon, lat = geotag.lonlat_milli_sql("phash")
    cell = _cell_expr(lon, lat, GEO_DUP_DEPTH)
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()},
    k AS (
        SELECT a.ahash, CAST({cell} AS BIGINT) AS cell, i.doc_id
        FROM ah a JOIN img i USING (image_id)
    )
    SELECT ahash, cell, count(*)::BIGINT AS n,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM k GROUP BY ahash, cell HAVING count(*) >= 2
    """


def sql_image_norm_stats() -> str:
    """Twin of queries.q_image_norm_stats: per-format exact pixel
    moments over the decoded-pixel CTE (DuckDB sums in HUGEINT, so the
    n*s2 product is exact int128 — the Ray side finishes in Python
    ints); every division has nonnegative operands (variance numerator
    >= 0 by Cauchy-Schwarz), so trunc == floor."""
    return f"""{_sql_decoded_pixels()}
    SELECT i.fmt,
           count(*)::BIGINT AS n_px,
           CAST(sum(d.p) AS BIGINT) AS sum_p,
           CAST(sum(d.p * d.p) AS BIGINT) AS sum_p2,
           CAST(1000 * sum(d.p) // count(*) AS BIGINT) AS mean_milli,
           CAST((count(*) * sum(d.p * d.p) - sum(d.p) * sum(d.p)) * 1000
                // (count(*) * count(*)) AS BIGINT) AS var_milli
    FROM dec d JOIN img i USING (doc_id)
    GROUP BY i.fmt
    """


def sql_crossmodal_align(ngram: int = 9) -> str:
    """Twin of queries.q_crossmodal_align (stages/images.CrossmodalAlign):
    per-row image AHASH (ah CTE) joined back to the doc's caption
    SIMHASH (the sql_simhash bit-majority inlined), hamming =
    bit_count(xor(..)) on the signed-int64 views (two's-complement xor
    == uint64 xor), aligned at the ALIGN_MAX_HAMMING threshold."""
    from osmquadtreepostgis_ray.stages.images import ALIGN_MAX_HAMMING
    ones = ",\n               ".join(
        f"sum(CAST((s // {1 << j}) % 2 AS BIGINT)) AS o{j}" for j in range(64))
    packed = " + ".join(
        f"CASE WHEN 2 * o{j} > n THEN CAST({1 << j} AS HUGEINT) ELSE 0 END"
        for j in range(64))
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()},
    {_shingles_cte(ngram)},
    bits AS (
        SELECT doc_id, count(*) AS n,
               {ones}
        FROM sh0 GROUP BY doc_id
    ),
    sval AS (SELECT doc_id, ({packed}) AS v FROM bits),
    sh AS (
        SELECT doc_id,
               CAST(CASE WHEN v >= {1 << 63} THEN v - {_M64} ELSE v END
                    AS BIGINT) AS simhash
        FROM sval
    )
    SELECT i.doc_id, i.image_id, a.ahash, s.simhash,
           bit_count(xor(s.simhash, a.ahash))::BIGINT AS hamming,
           bit_count(xor(s.simhash, a.ahash)) <= {ALIGN_MAX_HAMMING} AS aligned
    FROM img i JOIN ah a USING (image_id) JOIN sh s ON s.doc_id = i.doc_id
    """


def _sql_ahash_cte() -> str:
    """CTE suffix computing per-image ahash from ``dec`` (appendable
    after _sql_decoded_pixels): 8x8 integer block sums, bit set when
    64*block_sum > total_sum, packed LSB-first, signed-int64 view."""
    return f""",
    blk AS (
        SELECT image_id, w, h,
               ((idx // w) // (h // 8)) * 8 + ((idx % w) // (w // 8)) AS bit,
               SUM(p) AS bsum
        FROM dec GROUP BY image_id, w, h, bit
    ),
    tot AS (SELECT image_id, SUM(bsum) AS total FROM blk GROUP BY image_id),
    packed AS (
        SELECT b.image_id, b.w, b.h,
               SUM(CASE WHEN 64 * b.bsum > t.total
                        THEN CAST(1 AS HUGEINT) << CAST(b.bit AS INTEGER)
                        ELSE CAST(0 AS HUGEINT) END) AS v
        FROM blk b JOIN tot t USING (image_id)
        GROUP BY b.image_id, b.w, b.h
    ),
    ah AS (
        SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
               CAST(CASE WHEN v >= {1 << 63} THEN v - {_M64} ELSE v END AS BIGINT) AS ahash
        FROM packed
    )"""


def sql_image_ahash() -> str:
    """Twin of stages/images.AHash (perceptual average-hash feature
    extraction): decoded pixels -> 8x8 block sums -> 64-bit hash."""
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()}
    SELECT image_id, w, h, ahash FROM ah
    """


def sql_ahash_dups() -> str:
    """Twin of the perceptual exact-dup grouping (AHash -> groupby):
    images sharing a 64-bit average-hash, min-image_id representative.
    Linear output — the scale-sane form of perceptual dedup (pairwise
    hamming output is quadratic on adversarial corpora; see
    stages/images.ahash_neardup_pairs docstring)."""
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()}
    SELECT ahash, CAST(COUNT(*) AS BIGINT) AS n_dups, MIN(image_id) AS keep_id
    FROM ah GROUP BY ahash HAVING COUNT(*) >= 2
    """


def sql_ahash_neardup(max_hamming: int = 3) -> str:
    """Twin of stages/images.ahash_neardup_pairs.  The Ray side bands
    each hash into four 16-bit chunks and pairs only within shared
    chunks; with max_hamming <= 3 and 4 bands the pigeonhole guarantee
    makes the banded result EQUAL to this exhaustive self-join, so the
    oracle needs no banding."""
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()}
    SELECT a.image_id AS a, b.image_id AS b,
           bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
    FROM ah a JOIN ah b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}
    """


def _sql_video_pixels(stride: int) -> str:
    """Shared CTE chain: documents -> per-frame per-pixel values of the
    synthetic videos (stages/images.synth_videos_batch): 16x16 frames,
    n_frames = doc_id%4+2, frame f pixels = splitmix synth at seed
    phash+f.  Ends with ``vpx(video_id, frame_idx, idx, p)``."""
    ph = geotag.phash_sql("doc_id")
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    P = 0x100000001B3
    return f"""
    vid AS (
        SELECT doc_id AS video_id, CAST({ph} AS HUGEINT) AS phash,
               doc_id % 4 + 2 AS nf
        FROM documents
    ),
    fr AS (
        SELECT video_id, phash + unnest(range(0, nf, {stride})) AS seed,
               unnest(range(0, nf, {stride})) AS frame_idx
        FROM vid
    ),
    px0 AS (
        SELECT video_id, frame_idx, unnest(range(0, 256)) AS idx,
               ({_mulmod64('seed', P)}) AS sp
        FROM fr
    ),
    px1 AS (SELECT *, (sp + idx + {C1}) % {_M64} AS v1 FROM px0),
    px2 AS (SELECT *, {_mulmod64(f'xor(v1, v1 // {1 << 30})', C2)} AS v2 FROM px1),
    px3 AS (SELECT *, {_mulmod64(f'xor(v2, v2 // {1 << 27})', C3)} AS v3 FROM px2),
    vpx AS (
        SELECT video_id, frame_idx, idx,
               floor(least(greatest(
                   ((CASE WHEN idx % 16 = 15 THEN 255.0 ELSE (idx % 16) * (255.0 / 15) END)
                  + (CASE WHEN idx // 16 = 15 THEN 255.0 ELSE (idx // 16) * (255.0 / 15) END)) / 2.0
                  + CAST(xor(v3, v3 // {1 << 31}) % 33 AS BIGINT) - 16, 0.0), 255.0)) AS p
        FROM px3
    )"""


def sql_frame_sample(stride: int = 2) -> str:
    """Twin of the video frame-sampling pipeline (stages/images.
    FrameSample over synth_videos_batch): every stride-th frame's
    integer-exact mean over the shared video-pixel CTE."""
    return f"""
    WITH {_sql_video_pixels(stride)}
    SELECT video_id, frame_idx, CAST(floor(avg(p)) AS BIGINT) AS mean_pixel
    FROM vpx GROUP BY video_id, frame_idx
    """


def sql_dup_frames() -> str:
    """Twin of queries.q_dup_frames: consecutive-frame changed-pixel
    counts via a self-join of the stride-1 video-pixel CTE on
    (video, idx, frame+1)."""
    from osmquadtreepostgis_ray.stages.images import FRAMEDIFF_T
    return f"""
    WITH {_sql_video_pixels(1)}
    SELECT a.video_id, a.frame_idx AS f,
           sum(CASE WHEN abs(CAST(a.p AS BIGINT) - CAST(b.p AS BIGINT))
                         > {FRAMEDIFF_T} THEN 1 ELSE 0 END)::BIGINT AS n_changed
    FROM vpx a JOIN vpx b ON b.video_id = a.video_id AND b.idx = a.idx
                          AND b.frame_idx = a.frame_idx + 1
    GROUP BY 1, 2
    """


def sql_pixel_hist() -> str:
    """Twin of queries.q_pixel_hist: 16-bin decoded-pixel histogram per
    codec format over the shared decoded-pixel CTE."""
    return f"""{_sql_decoded_pixels()}
    SELECT CASE WHEN doc_id % 4 = 0 THEN 'qlossy' ELSE 'raw' END AS fmt,
           p // 16 AS bin, count(*)::BIGINT AS n
    FROM dec GROUP BY 1, 2
    """


def sql_glcm() -> str:
    """Twin of queries.q_glcm: horizontal co-occurrence of
    GLCM_LEVELS-quantized decoded pixels (same-row neighbor join)."""
    return f"""{_sql_decoded_pixels()}
    SELECT CASE WHEN a.doc_id % 4 = 0 THEN 'qlossy' ELSE 'raw' END AS fmt,
           a.p // 64 AS la, b.p // 64 AS lb, count(*)::BIGINT AS n
    FROM dec a JOIN dec b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
    WHERE a.idx % a.w <> a.w - 1
    GROUP BY 1, 2, 3
    """


def sql_codec_sse() -> str:
    """Twin of queries.q_codec_sse: per-image squared codec error —
    clean pre-codec pixel (px CTE) minus the decoded stored pixel (the
    dec CASE recomputed over px so no self-join is needed)."""
    return f"""{_sql_decoded_pixels()},
    e AS (
        SELECT image_id, w, h,
               CAST(p AS BIGINT)
               - (CASE WHEN fmt = 'qlossy'
                       THEN least(CAST(p AS BIGINT) // 4 * 4 + 2, 255)
                       ELSE CAST(p AS BIGINT) END) AS d
        FROM px
    )
    SELECT image_id, sum(d * d)::BIGINT AS sse,
           CAST(w * h AS BIGINT) AS n_px
    FROM e GROUP BY image_id, w, h
    """


def sql_embed_knn(k: int = 5, nq: int = 5) -> str:
    dd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
    WITH e AS (SELECT vec_id, {dd} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {nq}),
    d AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                 list_dot_product(q.qv, e.v)
                 / sqrt(list_dot_product(e.v, e.v))
                 / sqrt(list_dot_product(q.qv, q.qv)) AS sim
          FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {k}
    """


def sql_embed_knn_ivf(k: int = 5, nq: int = 5, nprobe: int = 6,
                      n_centroids: int = 16) -> str:
    """Twin of the PRUNED IVF path (queries.q_embed_knn_ivf): centroids =
    first 16 of vec_id%31==0; every vector assigned to its argmax-cosine
    centroid (ties -> lowest index, matching np.argmax); each query
    probes its nprobe nearest buckets; exact top-k over the union of
    probed buckets only."""
    dd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    cos = ("list_dot_product(c.cv, e.v) / sqrt(list_dot_product(c.cv, c.cv))"
           " / sqrt(list_dot_product(e.v, e.v))")
    return f"""
    WITH e AS (SELECT vec_id, {dd} AS v FROM embeddings),
    c AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
        FROM e WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT {n_centroids}
    ),
    sims AS (
        SELECT e.vec_id, c.cidx, {cos} AS sim FROM e CROSS JOIN c
    ),
    assign AS (
        SELECT vec_id, cidx AS bucket FROM (
            SELECT vec_id, cidx,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cidx) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    probed AS (
        SELECT DISTINCT cidx AS bucket FROM (
            SELECT s.cidx,
                   row_number() OVER (PARTITION BY s.vec_id
                                      ORDER BY s.sim DESC, s.cidx) AS rn
            FROM sims s WHERE s.vec_id < {nq}
        ) WHERE rn <= {nprobe}
    ),
    sub AS (
        SELECT e.vec_id, e.v FROM e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN probed p ON p.bucket = a.bucket
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {nq}),
    d AS (SELECT q.query_id, s.vec_id AS neighbor_id,
                 list_dot_product(q.qv, s.v)
                 / sqrt(list_dot_product(s.v, s.v))
                 / sqrt(list_dot_product(q.qv, q.qv)) AS sim
          FROM q CROSS JOIN sub s WHERE s.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {k}
    """


def sql_embed_knn_lsh(k: int = 5, nq: int = 5, planes: int = 6,
                      max_hamming: int = 2, dim: int = 64) -> str:
    """Twin of the PRUNED multi-probe LSH path (queries.q_embed_knn_lsh):
    the seeded hyperplane coefficients are inlined as SQL list literals,
    each vector's bucket is its 6 sign bits, queries probe every bucket
    within `max_hamming` bit flips (xor against the literal flip set),
    and the exact top-k runs over the probed union only — so the
    formerly rows-only query is now hash-gated like embed_knn_ivf.
    Sign-flip risk (numpy BLAS vs DuckDB summation order on a
    near-zero dot) is negligible on this corpus (|dot| ~ O(1))."""
    import itertools

    from osmquadtreepostgis_ray.stages.embed import _hyperplanes
    H = _hyperplanes(planes, dim)
    flips = [0]
    for r in range(1, max_hamming + 1):
        flips += [sum(1 << c for c in combo)
                  for combo in itertools.combinations(range(planes), r)]

    def hlit(p: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in H[p]) + "]"

    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(v, {hlit(p)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes))
    flips_lit = ", ".join(f"({f})" for f in flips)
    dd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
    WITH e AS (SELECT vec_id, {dd} AS v FROM embeddings),
    b AS (SELECT vec_id, v, ({bucket_expr}) AS bucket FROM e),
    flips(f) AS (VALUES {flips_lit}),
    probed AS (SELECT DISTINCT xor(bucket, f) AS bucket
               FROM b CROSS JOIN flips WHERE vec_id < {nq}),
    sub AS (SELECT b.vec_id, b.v FROM b JOIN probed p ON p.bucket = b.bucket),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {nq}),
    d AS (SELECT q.query_id, s.vec_id AS neighbor_id,
                 list_dot_product(q.qv, s.v)
                 / sqrt(list_dot_product(s.v, s.v))
                 / sqrt(list_dot_product(q.qv, q.qv)) AS sim
          FROM q CROSS JOIN sub s WHERE s.vec_id <> q.query_id),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
          FROM d)
    SELECT query_id, neighbor_id, rank::BIGINT AS rank FROM r WHERE rank <= {k}
    """


def _sql_json_props() -> str:
    from osmquadtreepostgis_ray.stages.jsonview import json_props_sql
    return json_props_sql()


def sql_ngram_dups(n: int = 3, t_permille: int = 600) -> str:
    """Twin of stages/dedup.ngram_jaccard_pairs: gram identity is the
    space-joined word n-gram string (the Ray side hashes it FNV-64;
    equality of hashes == equality of strings modulo negligible
    collision), Jaccard compared and floored in exact integers."""
    return rf"""
    WITH t AS (
      SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(list_transform(range(1, len(w) - {n - 2}),
             i -> {" || ' ' || ".join(f"w[i + {j}]" for j in range(n))})) AS gram
      FROM t WHERE len(w) >= {n}
      UNION ALL
      SELECT doc_id, concat_ws(' ', {", ".join(f"coalesce(w[{j + 1}], '')" for j in range(n))})
      FROM t WHERE len(w) < {n}
    ),
    gd AS (SELECT DISTINCT doc_id, gram FROM g),
    sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM gd GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS i
      FROM gd a JOIN gd b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.a, p.b, ((1000 * p.i) // (sa.n + sb.n - p.i))::BIGINT AS jac_permille
    FROM pairs p JOIN sz sa ON sa.doc_id = p.a JOIN sz sb ON sb.doc_id = p.b
    WHERE 1000 * p.i >= {t_permille} * (sa.n + sb.n - p.i)
    """


def sql_embed_neardup() -> str:
    """Twin of queries.q_embed_neardup: the corpus is random (max cosine
    ~0.5 << 0.9), so only the injected exact-duplicate twins pair up."""
    from osmquadtreepostgis_ray.queries import NEARDUP_TWIN_OFFSET, NEARDUP_TWIN_STEP
    return f"""
    SELECT vec_id AS a, vec_id + {NEARDUP_TWIN_OFFSET} AS b, 1000::BIGINT AS sim_permille
    FROM embeddings WHERE vec_id % {NEARDUP_TWIN_STEP} = 0
    """




def _sql_decoded_samples() -> str:
    """Shared CTE prefix: documents -> per-sample DECODED audio values.
    ``adec`` has (doc_id, audio_id, ns, idx, d) — integer sawtooth +
    splitmix64 counter noise, q8 mid-bucket dequantization, exactly as
    sources/audio.py (all shift/div operands non-negative)."""
    ph = geotag.phash_sql("doc_id")
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    P = 0x100000001B3
    return f"""
    WITH aud AS (
        SELECT doc_id, printf('aud%012d', doc_id) AS audio_id,
               CAST({ph} AS HUGEINT) AS phash,
               1024 * (doc_id % 3 + 1) AS ns,
               CASE WHEN doc_id % 5 = 0 THEN 'q8' ELSE 'pcm16' END AS fmt
        FROM documents
    ),
    as0 AS (
        SELECT doc_id, audio_id, ns, fmt,
               unnest(range(0, ns)) AS idx,
               ({_mulmod64('phash', P)}) AS sp
        FROM aud
    ),
    as1 AS (SELECT *, (sp + idx + {C1}) % {_M64} AS v1 FROM as0),
    as2 AS (SELECT *, {_mulmod64(f'xor(v1, v1 // {1 << 30})', C2)} AS v2 FROM as1),
    as3 AS (SELECT *, {_mulmod64(f'xor(v2, v2 // {1 << 27})', C3)} AS v3 FROM as2),
    araw AS (
        SELECT doc_id, audio_id, ns, fmt, idx,
               (idx % 256) * 128 - 16384
               + CAST(xor(v3, v3 // {1 << 31}) % 4097 AS BIGINT) - 2048 AS s
        FROM as3
    ),
    adec AS (
        SELECT doc_id, audio_id, ns, idx,
               CASE WHEN fmt = 'q8'
                    THEN ((s + 32768) // 256) * 256 - 32768 + 128
                    ELSE s END AS d
        FROM araw
    )"""


def sql_audio_features() -> str:
    """Twin of stages/audio.AudioFeatures: exact integer mean-abs floor
    and peak; snr_ok TRUE by construction (pcm16 lossless; q8 error
    <= 128 keeps SNR >= 40 dB) — the Ray side MEASURES it."""
    return f"""{_sql_decoded_samples()}
    SELECT audio_id, TRUE AS snr_ok,
           CAST(SUM(abs(d)) // ns AS BIGINT) AS mean_abs,
           CAST(MAX(abs(d)) AS BIGINT) AS peak,
           CAST(ns AS BIGINT) AS n_samples
    FROM adec GROUP BY audio_id, ns
    """


def sql_audio_windows(window: int = 256, stride: int = 2) -> str:
    """Twin of stages/audio.WindowEnergy: 1->N window explode, exact
    |s| sums, every stride-th window kept."""
    return f"""{_sql_decoded_samples()}
    SELECT audio_id, CAST(idx // {window} AS BIGINT) AS win_idx,
           CAST(SUM(abs(d)) AS BIGINT) AS sum_abs
    FROM adec GROUP BY audio_id, idx // {window}
    HAVING (idx // {window}) % {stride} = 0
    """


def sql_asof_join() -> str:
    """Twin of stages/joins.asof_join over the update-stream derivation
    in queries.q_asof_join: DuckDB's native ASOF JOIN (backward,
    inclusive, inner)."""
    return """
    WITH upd AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               epoch_us(ts) % 100000 AS cents
        FROM events WHERE event_id % 10 = 0
    ),
    ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_id % 10 <> 0
    )
    SELECT e.event_id, e.user_id, u.cents AS asof_cents,
           CAST(e.ts_us - u.ts_us AS BIGINT) AS lag_us
    FROM ev e ASOF JOIN upd u ON e.user_id = u.user_id AND e.ts_us >= u.ts_us
    """


def sql_range_join() -> str:
    """Twin of stages/joins.interval_join over the supplier-band
    derivation in queries.q_range_join (DuckDB IEJoin)."""
    return """
    WITH p AS (
        SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
    ),
    iv AS (
        SELECT s_suppkey,
               (CAST(round(s_acctbal * 100) AS BIGINT) + 100000) * 20 AS lo_cents
        FROM supplier
    )
    SELECT o_orderkey, s_suppkey, price_cents, lo_cents
    FROM p JOIN iv
      ON price_cents >= lo_cents AND price_cents < lo_cents + 100000
    """


def sql_chunk_docs(chunk_tokens: int = 32, overlap: int = 8) -> str:
    """Twin of stages/textstats.chunk_documents: whitespace-token chunks
    of `chunk_tokens` with `overlap`, count = ceil(n / stride).  DuckDB
    list slices are 1-based inclusive and clamp at the end, matching
    Arrow list_slice's [start, stop) with the +1 shift."""
    stride = chunk_tokens - overlap
    return f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks, n,
               unnest(range(0, (n + {stride} - 1) // {stride})) AS k
        FROM t
    )
    SELECT doc_id, k AS chunk_idx,
           CAST(least({chunk_tokens}, n - k * {stride}) AS BIGINT) AS n_tokens,
           array_to_string(toks[k * {stride} + 1 : k * {stride} + {chunk_tokens}], ' ')
               AS chunk_text
    FROM c
    """


def sql_window_sliding(width_hours: int = 3) -> str:
    """Twin of queries.q_window_sliding: trailing RANGE window over the
    sparse hourly axis."""
    return f"""
    WITH hourly AS (
        SELECT user_id, (epoch_us(ts) // 3600000000)::BIGINT AS hour,
               count(*)::BIGINT AS n,
               sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS c
        FROM events GROUP BY user_id, hour
    )
    SELECT user_id, hour,
           CAST(sum(n) OVER w AS BIGINT) AS n_win,
           CAST(sum(c) OVER w AS BIGINT) AS sum_cents_win
    FROM hourly
    WINDOW w AS (PARTITION BY user_id ORDER BY hour
                 RANGE BETWEEN {width_hours - 1} PRECEDING AND CURRENT ROW)
    """


def sql_quantiles() -> str:
    """Twin of queries.q_quantiles (quantile_disc on exact cents)."""
    return """
    WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type, count(*)::BIGINT AS n,
           quantile_disc(cents, 0.25) AS p25,
           quantile_disc(cents, 0.50) AS p50,
           quantile_disc(cents, 0.75) AS p75
    FROM e GROUP BY event_type
    """


def sql_quantiles_cont() -> str:
    """Twin of queries.q_quantiles_cont: the interpolated quantile
    built from order statistics over the grouped distinct-value cumsum
    — searchsorted-left == MIN(cents) WHERE running_count >= k+1; all
    operands non-negative so // truncation equals numpy floor."""
    from osmquadtreepostgis_ray.queries import QCONT_PERMILLE
    ql = ", ".join(str(q) for q in QCONT_PERMILLE)
    return f"""
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
               count(*) AS cnt
        FROM events GROUP BY event_type, cents
    ),
    cum AS (
        SELECT event_type, cents,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS hc
        FROM c
    ),
    tot AS (SELECT event_type, sum(cnt) AS n FROM c GROUP BY event_type),
    pos AS (
        SELECT t.event_type, q.qpm,
               (t.n - 1) * q.qpm // 1000 AS k,
               (t.n - 1) * q.qpm % 1000 AS rem, t.n
        FROM tot t, (SELECT unnest([{ql}]) AS qpm) q
    ),
    vlo AS (
        SELECT p.event_type, p.qpm, min(c.cents) AS v
        FROM pos p JOIN cum c ON c.event_type = p.event_type
                              AND c.hc >= p.k + 1
        GROUP BY p.event_type, p.qpm
    ),
    vhi AS (
        SELECT p.event_type, p.qpm, min(c.cents) AS v
        FROM pos p JOIN cum c ON c.event_type = p.event_type
                              AND c.hc >= least(p.k + 1, p.n - 1) + 1
        GROUP BY p.event_type, p.qpm
    )
    SELECT p.event_type, CAST(p.qpm AS BIGINT) AS qpm,
           (vlo.v * (1000 - p.rem) + vhi.v * p.rem)::BIGINT AS interp_milli
    FROM pos p
    JOIN vlo ON vlo.event_type = p.event_type AND vlo.qpm = p.qpm
    JOIN vhi ON vhi.event_type = p.event_type AND vhi.qpm = p.qpm
    """


def sql_rank_ties() -> str:
    """Twin of queries.q_rank_ties (native RANK window)."""
    return """
    WITH e AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_id, event_type, cents,
           RANK() OVER (PARTITION BY event_type ORDER BY cents)::BIGINT AS rnk
    FROM e
    """


def sql_pagerank(iters: int = 2) -> str:
    """Twin of queries.q_pagerank: the same 2 damped iterations
    unrolled; every operand non-negative so DuckDB's truncating //
    equals numpy's floor (the shared-division rule)."""
    from osmquadtreepostgis_ray.stages.graph import (PR_DAMP_DEN, PR_DAMP_NUM,
                                                     PR_SCALE)
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    sql = f"""
    WITH le AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS (SELECT src, dst FROM le UNION SELECT dst AS src, src AS dst FROM le),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    pr0 AS (SELECT src AS node, {PR_SCALE}::BIGINT AS pr FROM deg)"""
    prev = "pr0"
    for i in range(1, iters + 1):
        sql += f""",
    in{i} AS (
        SELECT e.dst AS node, sum({prev}.pr // deg.d) AS inbox
        FROM e JOIN {prev} ON {prev}.node = e.src
               JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    ),
    pr{i} AS (
        SELECT n.node,
               ({base} + ({PR_DAMP_NUM} * COALESCE(i.inbox, 0)) // {PR_DAMP_DEN})::BIGINT AS pr
        FROM pr0 n LEFT JOIN in{i} i ON i.node = n.node
    )"""
        prev = f"pr{i}"
    return sql + f"""
    SELECT node, pr FROM {prev}"""


def sql_ntile(tiles: int = 4) -> str:
    """Twin of queries.q_ntile (ANSI NTILE over exact cents order)."""
    return f"""
    SELECT event_id, event_type,
           ntile({tiles}) OVER (
               PARTITION BY event_type
               ORDER BY CAST(round(value * 100) AS BIGINT), event_id
           )::BIGINT AS tile
    FROM events
    """


def sql_semi_join(anti: bool = False) -> str:
    """Twin of stages/joins.bucket_semi_join over customer/orders."""
    op = "NOT EXISTS" if anti else "EXISTS"
    return f"""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE {op} (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
    """


def sql_bloom_semi() -> str:
    """Twin of queries.q_bloom_semi: the bloom prefilter is exact-
    transparent, so the oracle is the plain semi join."""
    return """
    SELECT l_orderkey, l_partkey, l_linenumber::BIGINT AS l_linenumber
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM part p
                  WHERE p.p_partkey = l.l_partkey AND p.p_size = 1)
    """


def sql_transitions() -> str:
    """Twin of queries.q_transitions (LEAD window per user)."""
    return """
    WITH o AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    )
    SELECT from_type, to_type, count(*)::BIGINT AS n
    FROM o WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type"""


def sql_heavy_hitters(phi: float = 0.008) -> str:
    """Twin of queries.q_heavy_hitters: exact phi-heavy hitters (the CM
    sketch is candidate-generation only; the engine's output is exact)."""
    return f"""
    SELECT user_id, count(*)::BIGINT AS n FROM events
    GROUP BY user_id
    HAVING count(*) >= ceil({phi} * (SELECT count(*) FROM events))
    """


def sql_pivot() -> str:
    """Twin of queries.q_pivot (FILTER conditional aggregation)."""
    cols = [("n_urgent", "1-URGENT"), ("n_high", "2-HIGH"),
            ("n_medium", "3-MEDIUM"), ("n_notspec", "4-NOT SPECIFIED"),
            ("n_low", "5-LOW")]
    sel = ",\n           ".join(
        f"CAST(count(*) FILTER (o_orderpriority = '{p}') AS BIGINT) AS {c}"
        for c, p in cols)
    return f"""
    SELECT c_mktsegment,
           {sel}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """


def sql_image_resize(ow: int = 8, oh: int = 8) -> str:
    """Twin of queries.q_image_resize: nearest-neighbor index map
    yi=(y*h)//oh, xi=(x*w)//ow over decoded pixels, exact integer mean
    of the resized grid."""
    return f"""{_sql_decoded_pixels()},
    rimg AS (SELECT DISTINCT image_id, w, h FROM dec),
    rp AS (
        SELECT image_id, w, h, unnest(range(0, {ow * oh})) AS rp
        FROM rimg
    ),
    sel AS (
        SELECT image_id,
               (((rp // {ow}) * h) // {oh}) * w + (((rp % {ow}) * w) // {ow}) AS idx
        FROM rp
    )
    SELECT s.image_id,
           CAST(floor(avg(d.p)) AS BIGINT) AS mean_pixel,
           CAST({ow} AS BIGINT) AS w_out, CAST({oh} AS BIGINT) AS h_out
    FROM sel s JOIN dec d ON d.image_id = s.image_id AND d.idx = s.idx
    GROUP BY s.image_id
    """


def sql_multimodal_fusion() -> str:
    """Twin of queries.q_multimodal_fusion: the three modality twins
    joined on doc_id (WITH-in-subquery)."""
    return f"""
    SELECT t.doc_id, t.n_tokens, t.stop_permille,
           i.ahash, a.mean_abs, a.peak
    FROM ({sql_quality()}) t
    JOIN (SELECT CAST(substr(image_id, 4) AS BIGINT) AS doc_id, ahash
          FROM ({sql_image_ahash()})) i ON i.doc_id = t.doc_id
    JOIN (SELECT CAST(substr(audio_id, 4) AS BIGINT) AS doc_id, mean_abs, peak
          FROM ({sql_audio_features()})) a ON a.doc_id = t.doc_id
    """


def sql_top_terms(k: int = 3) -> str:
    """Twin of queries.q_top_terms (tf/df keyword ranking)."""
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY w),
    r AS (
        SELECT tf.doc_id, tf.w AS term, tf.tf, df.df,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rank
        FROM tf JOIN df USING (w)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {k}
    """


def sql_json_extract() -> str:
    """Twin of queries.q_json_extract (json_extract_string on props)."""
    return """
    SELECT event_type,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
           COUNT(*)::BIGINT AS n,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k
    FROM events GROUP BY event_type
    """


def sql_unpivot() -> str:
    """Twin of queries.q_unpivot: the long-form grouped counts."""
    return """
    SELECT c_mktsegment, o_orderpriority AS priority, count(*)::BIGINT AS cnt
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment, o_orderpriority
    """


def sql_intersect_keys() -> str:
    """Twin of queries.q_intersect_keys (INTERSECT)."""
    return """
    SELECT DISTINCT user_id FROM events
    INTERSECT
    SELECT c_custkey AS user_id FROM customer
    """


def sql_sequence_packing(capacity: int = 64) -> str:
    """Twin of stages/textstats.sequence_packing over chunk_docs:
    exclusive prefix sum via a ROWS window, contiguous-fill bins."""
    return f"""
    WITH c AS ({sql_chunk_docs()}),
    s AS (
        SELECT doc_id, chunk_idx, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM c
    )
    SELECT doc_id, chunk_idx, n_tokens,
           CAST(before // {capacity} AS BIGINT) AS bin_id,
           CAST(before % {capacity} AS BIGINT) AS offset_in_bin
    FROM s
    """


def sql_outliers() -> str:
    """Twin of queries.q_outliers (per-type p75 threshold filter)."""
    return """
    WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    th AS (SELECT event_type, quantile_disc(cents, 0.75) AS p75
           FROM e GROUP BY event_type)
    SELECT e.event_type, count(*)::BIGINT AS n_outliers
    FROM e JOIN th USING (event_type)
    WHERE e.cents > th.p75
    GROUP BY e.event_type
    """


def sql_moments() -> str:
    """Twin of queries.q_moments (exact integer second moments)."""
    return """
    WITH e AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS x,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
        FROM events
    )
    SELECT event_type, count(*)::BIGINT AS n,
           SUM(x)::BIGINT AS sum_x, SUM(y)::BIGINT AS sum_y,
           SUM(x * y)::BIGINT AS sum_xy,
           SUM(x * x)::BIGINT AS sum_x2, SUM(y * y)::BIGINT AS sum_y2
    FROM e GROUP BY event_type
    """


def sql_zonal_stats() -> str:
    """Twin of queries.q_zonal_stats: the PIP pair twin joined back to
    event cents, grouped per zone."""
    return f"""
    SELECT p.zone_id, p.kind, count(*)::BIGINT AS n,
           SUM(CAST(round(e.value * 100) AS BIGINT))::BIGINT AS sum_cents
    FROM ({sql_pip_zones()}) p
    JOIN events e USING (event_id)
    GROUP BY p.zone_id, p.kind
    """


def sql_pushdown_filter() -> str:
    """Twin of queries.q_pushdown_filter."""
    return """
    SELECT event_type, count(*)::BIGINT AS n
    FROM events WHERE user_id < 50 GROUP BY event_type
    """


def sql_except_keys() -> str:
    """Twin of queries.q_except_keys (EXCEPT)."""
    return """
    SELECT c_custkey AS user_id FROM customer
    EXCEPT
    SELECT user_id FROM events
    """


def sql_rollup() -> str:
    """Twin of queries.q_rollup (per-segment + grand total union)."""
    return """
    SELECT c_mktsegment, count(*)::BIGINT AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sum_price_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    UNION ALL
    SELECT '__ALL__', count(*)::BIGINT,
           sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
    FROM orders JOIN customer ON o_custkey = c_custkey
    """


def sql_neardup_clusters() -> str:
    """Twin of stages/cluster.connected_components over the synthetic
    near-dup edge graph (queries.q_neardup_clusters): recursive-CTE
    min-label transitive closure.  `//` operands are non-negative on
    both sides (CLAUDE.md integer-division invariant)."""
    return """
    WITH RECURSIVE e0 AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 7 < 3
        UNION ALL
        SELECT doc_id AS a, doc_id // 2 AS b FROM documents
        WHERE doc_id % 11 = 0 AND doc_id > 0
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM e0
        UNION
        SELECT b AS src, a AS dst FROM e0
    ),
    walk(v, l) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.dst, w.l FROM walk w JOIN sym e ON e.src = w.v
    )
    SELECT CAST(v AS BIGINT) AS node, CAST(MIN(l) AS BIGINT) AS component
    FROM walk GROUP BY v
    """


def sql_dbscan(eps: int = 1500, min_pts: int = 4) -> str:
    """Twin of queries.q_dbscan (stages/cluster.dbscan): eps-pairs via
    self-join, core = degree+1 >= min_pts, components = recursive-CTE
    min-label closure over core-core edges (+ core self edges so
    isolated cores keep their own label), border = MIN component among
    eps-reachable cores, noise = -1."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH RECURSIVE ev AS (
        SELECT event_id, {lon} AS x, {lat} AS y FROM events
    ),
    pairs AS (
        SELECT a.event_id AS a, b.event_id AS b
        FROM ev a JOIN ev b
          ON b.x BETWEEN a.x - {eps} AND a.x + {eps}
         AND b.y BETWEEN a.y - {eps} AND a.y + {eps}
         AND a.event_id <> b.event_id
         AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps * eps}
    ),
    core AS (
        SELECT a AS id FROM pairs GROUP BY a HAVING count(*) + 1 >= {min_pts}
    ),
    ce AS (
        SELECT p.a AS src, p.b AS dst FROM pairs p
        JOIN core ca ON ca.id = p.a
        JOIN core cb ON cb.id = p.b
        UNION ALL
        SELECT id, id FROM core
    ),
    walk(v, l) AS (
        SELECT src, src FROM ce
        UNION
        SELECT e.dst, w.l FROM walk w JOIN ce e ON e.src = w.v
    ),
    comp AS (SELECT v AS node, MIN(l) AS component FROM walk GROUP BY v),
    border AS (
        SELECT p.a AS id, MIN(c.component) AS lbl
        FROM pairs p
        JOIN comp c ON c.node = p.b
        LEFT JOIN core k ON k.id = p.a
        WHERE k.id IS NULL
        GROUP BY p.a
    ),
    lab AS (
        SELECT node AS id, component AS lbl FROM comp
        UNION ALL
        SELECT id, lbl FROM border
    )
    SELECT e.event_id, CAST(COALESCE(l.lbl, -1) AS BIGINT) AS label
    FROM ev e LEFT JOIN lab l ON l.id = e.event_id
    """


def sql_idw(radius: int = 2500) -> str:
    """Twin of queries.q_idw (stages/spatialstats.idw_grid): DISTINCT
    depth-6 cell centers (exact in quarter-milli: widths 22500/11250)
    range-joined to events with the integer linear kernel R^2 - d^2;
    LEFT join keeps occupied cells whose own events sit farther than R
    from the center."""
    lon, lat = geotag.event_lonlat_milli_sql()
    r4 = 4 * radius
    r2 = r4 * r4
    return f"""
    WITH ev AS (
        SELECT 4 * ({lon}) AS x4, 4 * (({lat}) + 5000) AS y4,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    ctr AS (
        SELECT ix, iy, ix * 22500 + 11250 AS cx4, iy * 11250 + 5625 AS cy4
        FROM (SELECT DISTINCT x4 // 22500 AS ix, y4 // 11250 AS iy FROM ev)
    ),
    w AS (
        SELECT c.ix, c.iy, e.cents,
               {r2} - ((e.x4 - c.cx4) * (e.x4 - c.cx4)
                       + (e.y4 - c.cy4) * (e.y4 - c.cy4)) AS wt
        FROM ctr c JOIN ev e
          ON e.x4 BETWEEN c.cx4 - {r4} AND c.cx4 + {r4}
         AND e.y4 BETWEEN c.cy4 - {r4} AND c.cy4 + {r4}
         AND (e.x4 - c.cx4) * (e.x4 - c.cx4)
             + (e.y4 - c.cy4) * (e.y4 - c.cy4) < {r2}
    )
    SELECT CAST(c.ix AS BIGINT) AS ix, CAST(c.iy AS BIGINT) AS iy,
           CAST(COALESCE(a.cnt, 0) AS BIGINT) AS n_src,
           CAST(COALESCE(a.num, 0) AS BIGINT) AS num,
           CAST(COALESCE(a.den, 0) AS BIGINT) AS den
    FROM ctr c LEFT JOIN (
        SELECT ix, iy, count(*) AS cnt, sum(cents * wt) AS num,
               sum(wt) AS den
        FROM w GROUP BY ix, iy) a USING (ix, iy)
    """


def sql_moran() -> str:
    """Twin of queries.q_moran (stages/spatialstats.moran): per-cell
    counts, n-scaled deviations, equi-join on the four rook offsets."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH ev AS (SELECT ({lon}) * 64 // 360000 AS ix,
                       (({lat}) + 5000) * 64 // 180000 AS iy FROM events),
    c AS (SELECT ix, iy, count(*)::BIGINT AS n FROM ev GROUP BY ix, iy),
    s AS (SELECT count(*)::BIGINT AS nc, sum(n)::BIGINT AS tot FROM c),
    d AS (SELECT ix, iy, s.nc * c.n - s.tot AS dev FROM c, s),
    adj AS (
        SELECT a.dev AS da, b.dev AS db
        FROM d a
        JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) o(dx, dy) ON true
        JOIN d b ON b.ix = a.ix + o.dx AND b.iy = a.iy + o.dy
    )
    SELECT (SELECT nc FROM s) AS n_cells,
           CAST((SELECT count(*) FROM adj) AS BIGINT) AS w_pairs,
           CAST(COALESCE((SELECT sum(da * db) FROM adj), 0) AS BIGINT) AS num,
           (SELECT CAST(sum(dev * dev) AS BIGINT) FROM d) AS den
    """


def sql_zonal_mode() -> str:
    """Twin of queries.q_zonal_mode: per-zone type counts over the PIP
    pair twin, rank 1 by (count DESC, type ASC)."""
    return f"""
    SELECT zone_id, kind, event_type AS mode_type, n AS n_mode FROM (
        SELECT p.zone_id, p.kind, e.event_type, count(*)::BIGINT AS n,
               row_number() OVER (PARTITION BY p.zone_id, p.kind
                                  ORDER BY count(*) DESC, e.event_type) AS rk
        FROM ({sql_pip_zones()}) p JOIN events e USING (event_id)
        GROUP BY p.zone_id, p.kind, e.event_type
    ) WHERE rk = 1
    """


def sql_hotspot() -> str:
    """Twin of queries.q_hotspot (stages/spatialstats.hotspot_gi):
    per-cell counts, queen-neighborhood (incl self) equi-join on the
    nine offsets."""
    lon, lat = geotag.event_lonlat_milli_sql()
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
    WITH ev AS (SELECT ({lon}) * 64 // 360000 AS ix,
                       (({lat}) + 5000) * 64 // 180000 AS iy FROM events),
    c AS (SELECT ix, iy, count(*)::BIGINT AS n FROM ev GROUP BY ix, iy)
    SELECT a.ix, a.iy, a.n,
           CAST(sum(b.n) AS BIGINT) AS nbr_sum,
           count(*)::BIGINT AS nbr_cnt
    FROM c a
    JOIN (VALUES {offs}) o(dx, dy) ON true
    JOIN c b ON b.ix = a.ix + o.dx AND b.iy = a.iy + o.dy
    GROUP BY a.ix, a.iy, a.n
    """


def sql_od_flows() -> str:
    """Twin of queries.q_od_flows: LEAD tile per user in (ts, event_id)
    order, grouped transition counts."""
    return f"""
    WITH {events_geo_cte()},
    o AS (
        SELECT tile AS from_tile,
               lead(tile) OVER (PARTITION BY ev.user_id
                                ORDER BY e.ts, ev.event_id) AS to_tile
        FROM ev JOIN events e USING (event_id)
    )
    SELECT from_tile, to_tile, count(*)::BIGINT AS n
    FROM o WHERE to_tile IS NOT NULL
    GROUP BY from_tile, to_tile"""


def sql_staypoints(d: int = 100_000, min_pts: int = 3) -> str:
    """Twin of queries.q_staypoints: LAG step-distance break flags ->
    windowed run ids -> per-run aggregates, HAVING count >= min_pts."""
    return f"""
    WITH {events_geo_cte()},
    o AS (
        SELECT ev.user_id, ev.event_id, lon_milli AS x, lat_milli AS y,
               e.ts,
               lag(lon_milli) OVER w AS px, lag(lat_milli) OVER w AS py
        FROM ev JOIN events e USING (event_id)
        WINDOW w AS (PARTITION BY ev.user_id ORDER BY e.ts, ev.event_id)
    ),
    f AS (
        SELECT *, CASE WHEN px IS NULL
                        OR (x - px) * (x - px) + (y - py) * (y - py)
                           > {d * d} THEN 1 ELSE 0 END AS brk
        FROM o
    ),
    r AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS rid
        FROM f
    )
    SELECT user_id,
           first(event_id ORDER BY ts, event_id) AS start_event_id,
           count(*)::BIGINT AS n_pts,
           date_diff('microsecond', min(ts), max(ts))::BIGINT AS dur_us,
           sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y
    FROM r GROUP BY user_id, rid HAVING count(*) >= {min_pts}
    """


def sql_hilbert() -> str:
    """Twin of queries.q_hilbert: the same xy2d rounds unrolled as a
    CTE chain (functions/hilbert.xy2d_sql — ONE definition site)."""
    from osmquadtreepostgis_ray.functions import hilbert
    lon, lat = geotag.event_lonlat_milli_sql()
    ctes = hilbert.xy2d_sql(f"((({lon}) * 256) // 360000)",
                            f"(((({lat}) + 5000) * 256) // 180000)",
                            8, "events", "event_id")
    per_bucket = (4 ** 8) // 256
    return (f"WITH {ctes} SELECT event_id, d AS hilbert, "
            f"d // {per_bucket} AS bucket FROM h8")


def sql_bpe_pairs() -> str:
    """Twin of queries.q_bpe_pairs: BPE pre-tokens via the shared regex,
    lateral generate_series over each word's adjacent positions."""
    return r"""
    WITH w AS (
        SELECT unnest(regexp_extract_all(
            text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS word
        FROM documents
    ),
    i AS (
        SELECT word, unnest(generate_series(1, length(word) - 1)) AS i
        FROM w WHERE length(word) >= 2
    ),
    p AS (
        SELECT substring(word, CAST(i AS INTEGER), 1) AS a,
               substring(word, CAST(i AS INTEGER) + 1, 1) AS b
        FROM i
    )
    SELECT a, b, count(*)::BIGINT AS n FROM p GROUP BY a, b
    """


def _bpe_chain_cte() -> str:
    """Shared WITH-body for the BPE twins: unique-word table, K
    unrolled merge rounds (pair counts -> argmax -> canonical
    run-parity merge), `word` carried through every level so encode
    twins can join back to per-source occurrences."""
    from osmquadtreepostgis_ray.functions.text import BPE_TOKEN_RE
    from osmquadtreepostgis_ray.queries import BPE_MERGE_ROUNDS

    levels = []
    for r in range(1, BPE_MERGE_ROUNDS + 1):
        prev_w = "w0" if r == 1 else f"w{r - 1}"
        levels.append(f"""
    p{r} AS MATERIALIZED (
        SELECT arr[i] AS a, arr[i + 1] AS b, sum(n)::BIGINT AS n
        FROM (
            SELECT arr, n,
                   unnest(generate_series(1, len(arr) - 1)) AS i
            FROM (SELECT string_split(trim(s), ' ') AS arr, n
                  FROM {prev_w}) t
            WHERE len(arr) >= 2
        ) GROUP BY 1, 2
    ),
    m{r} AS MATERIALIZED (
        SELECT CAST({r} AS BIGINT) AS round, a, b, n
        FROM p{r} ORDER BY n DESC, a, b LIMIT 1
    ),
    tk{r} AS MATERIALIZED (
        SELECT wid, word, n, generate_subscripts(arr, 1) AS pos,
               unnest(arr) AS sym
        FROM (SELECT wid, word, n, string_split(trim(s), ' ') AS arr
              FROM {prev_w})
    ),
    oc{r} AS (
        SELECT t.wid, t.pos
        FROM (SELECT wid, pos, sym,
                     lead(sym) OVER (PARTITION BY wid
                                     ORDER BY pos) AS nxt
              FROM tk{r}) t, m{r} m
        WHERE t.sym = m.a AND t.nxt = m.b
    ),
    kp{r} AS MATERIALIZED (
        SELECT wid, pos FROM (
            SELECT wid, pos,
                   row_number() OVER (PARTITION BY wid, grp
                                      ORDER BY pos) AS i
            FROM (SELECT wid, pos,
                         pos - row_number() OVER (PARTITION BY wid
                                                  ORDER BY pos) AS grp
                  FROM oc{r})
        ) WHERE i % 2 = 1
    ),
    w{r} AS MATERIALIZED (
        SELECT t.wid AS wid, t.word AS word, t.n AS n,
               ' ' || string_agg(
                   CASE WHEN k.pos IS NOT NULL THEN m.a || m.b
                        ELSE t.sym END, ' ' ORDER BY t.pos) || ' ' AS s
        FROM tk{r} t
        CROSS JOIN m{r} m
        LEFT JOIN kp{r} k  ON k.wid = t.wid AND k.pos = t.pos
        LEFT JOIN kp{r} kd ON kd.wid = t.wid AND kd.pos = t.pos - 1
        WHERE kd.pos IS NULL
        GROUP BY t.wid, t.word, t.n
        -- pair supply exhausted before round K: m{r} is empty, the
        -- CROSS JOIN would zero every later level while the Ray side
        -- breaks out early and still prices the corpus — pass the
        -- previous level through unchanged instead
        UNION ALL
        SELECT wid, word, n, s FROM {prev_w}
        WHERE NOT EXISTS (SELECT 1 FROM m{r})
    )""")
    return f"""wct AS (
        SELECT word, count(*)::BIGINT AS n FROM (
            SELECT unnest(regexp_extract_all(
                text, '{BPE_TOKEN_RE}')) AS word
            FROM documents)
        GROUP BY 1
    ),
    w0 AS (
        SELECT row_number() OVER (ORDER BY word) AS wid, word, n,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s
        FROM wct
    ),{','.join(levels)}"""


def sql_bpe_merges() -> str:
    """Twin of queries.q_bpe_merges: the K merge rounds unrolled as
    MATERIALIZED CTE levels (the sql_blobs/sql_hilbert pattern) —
    round r counts adjacent symbol pairs over the space-separated word
    forms, picks the (n DESC, a, b) argmax, and applies the CANONICAL
    greedy merge with window functions: occurrence runs via the
    pos - row_number gaps-and-islands key, even offsets kept, kept
    position's successor dropped, words re-agg'd with string_agg
    ORDER BY pos (matching queries.bpe_merge_tokens exactly)."""
    from osmquadtreepostgis_ray.queries import BPE_MERGE_ROUNDS
    union = "\n    UNION ALL ".join(
        f"SELECT round, a, b, n FROM m{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1))
    return f"""
    WITH {_bpe_chain_cte()}
    {union}
    """


def sql_spacetime_cube() -> str:
    """Twin of queries.q_spacetime_cube: hour from epoch microseconds
    (shared no-calendar definition), per-tile permille share."""
    return f"""
    WITH {events_geo_cte()},
    c AS (
        SELECT tile, (epoch_us(e.ts) // 3600000000) % 24 AS hour,
               count(*)::BIGINT AS n
        FROM ev JOIN events e USING (event_id)
        GROUP BY 1, 2
    ),
    t AS (SELECT tile, sum(n) AS tot FROM c GROUP BY tile)
    SELECT c.tile, CAST(c.hour AS BIGINT) AS hour, c.n,
           CAST((1000 * c.n) // t.tot AS BIGINT) AS permille
    FROM c JOIN t USING (tile)
    """


def sql_colocation(t_us: int = 14_400_000_000) -> str:
    """Twin of queries.q_colocation: depth-6 cell + time-window self
    join, event pairs counted once in (ts, event_id) order, grouped by
    the unordered user pair."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS t,
               ({lon}) * 64 // 360000 AS ix,
               (({lat}) + 5000) * 64 // 180000 AS iy
        FROM events
    )
    SELECT least(a.user_id, b.user_id) AS ua,
           greatest(a.user_id, b.user_id) AS ub,
           count(*)::BIGINT AS n
    FROM p a JOIN p b
      ON a.ix = b.ix AND a.iy = b.iy
     AND (b.t > a.t OR (b.t = a.t AND b.event_id > a.event_id))
     AND b.t - a.t <= {t_us}
     AND a.user_id <> b.user_id
    GROUP BY 1, 2
    """


def sql_headings() -> str:
    """Twin of queries.q_headings: LAG step deltas, the SAME eight
    mutually exclusive octant predicates (numpy's where-chain order is
    safe to mirror as CASE because the predicates are disjoint)."""
    return f"""
    WITH {events_geo_cte()},
    o AS (
        SELECT ev.user_id, lon_milli AS x, lat_milli AS y,
               lag(lon_milli) OVER w AS px, lag(lat_milli) OVER w AS py
        FROM ev JOIN events e USING (event_id)
        WINDOW w AS (PARTITION BY ev.user_id ORDER BY e.ts, ev.event_id)
    ),
    d AS (
        SELECT user_id, x - px AS dx, y - py AS dy,
               abs(x - px) AS ax, abs(y - py) AS ay
        FROM o WHERE px IS NOT NULL
    )
    SELECT user_id, CAST(CASE
        WHEN dx > 0 AND dy >= 0 AND ax > ay THEN 0
        WHEN dy > 0 AND dx > 0 AND ay >= ax THEN 1
        WHEN dy > 0 AND dx <= 0 AND ay > ax THEN 2
        WHEN dx < 0 AND dy > 0 AND ax >= ay THEN 3
        WHEN dx < 0 AND dy <= 0 AND ax > ay THEN 4
        WHEN dy < 0 AND dx < 0 AND ay >= ax THEN 5
        WHEN dy < 0 AND dx >= 0 AND ay > ax THEN 6
        WHEN dx > 0 AND dy < 0 AND ax >= ay THEN 7
        ELSE -1 END AS BIGINT) AS octant,
        count(*)::BIGINT AS n
    FROM d GROUP BY 1, 2
    """


def sql_thin(k: int = 2) -> str:
    """Twin of queries.q_thin: per-cell smallest-k event ids."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH ev AS (
        SELECT event_id, ({lon}) * 64 // 360000 AS ix,
               (({lat}) + 5000) * 64 // 180000 AS iy
        FROM events
    )
    SELECT ix, iy, event_id FROM (
        SELECT ix, iy, event_id,
               row_number() OVER (PARTITION BY ix, iy
                                  ORDER BY event_id) AS rk
        FROM ev
    ) WHERE rk <= {k}
    """


def sql_split_leakage_safe(train_permille: int = 800) -> str:
    """Twin of queries.q_split_leakage_safe: recursive-CTE components
    LEFT-joined onto documents (isolated docs label themselves), split
    by the Knuth hash of the component (same constants as
    sql_sample_events)."""
    from osmquadtreepostgis_ray.queries import SAMPLE_MOD, SAMPLE_MULT
    return f"""
    WITH RECURSIVE e0 AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 7 < 3
        UNION ALL
        SELECT doc_id AS a, doc_id // 2 AS b FROM documents
        WHERE doc_id % 11 = 0 AND doc_id > 0
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM e0
        UNION
        SELECT b AS src, a AS dst FROM e0
    ),
    walk(v, l) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.dst, w.l FROM walk w JOIN sym e ON e.src = w.v
    ),
    comp AS (SELECT v AS node, MIN(l) AS component FROM walk GROUP BY v)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           CASE WHEN (COALESCE(c.component, d.doc_id) * {SAMPLE_MULT})
                     % {SAMPLE_MOD} < {train_permille}
                THEN 'train' ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """




# --------------------------------------------------- round-2 widening ops

def sql_cube_counts() -> str:
    return """
    SELECT lang, source, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars
    FROM documents GROUP BY CUBE(lang, source)
    """


def sql_mode_user_type() -> str:
    return """
    WITH c AS (
        SELECT user_id, event_type, count(*)::BIGINT AS n
        FROM events GROUP BY user_id, event_type
    ),
    r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM c
    )
    SELECT user_id, event_type AS mode_type, n AS mode_n FROM r WHERE rn = 1
    """


def sql_sample_weighted(scale_div: int = 5) -> str:
    from osmquadtreepostgis_ray.queries import SAMPLE_MOD, SAMPLE_MULT
    return f"""
    SELECT doc_id, n_chars::BIGINT AS n_chars FROM documents
    WHERE (doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD}
          < least(n_chars // {scale_div}, {SAMPLE_MOD})
    """


def sql_corr_components() -> str:
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH b AS (
        SELECT (event_id % 5)::BIGINT AS bucket,
               CAST(round(value * 100) AS BIGINT) AS x,
               {lat}::BIGINT AS y
        FROM events
    )
    SELECT bucket, count(*)::BIGINT AS n, sum(x)::BIGINT AS sum_x,
           sum(y)::BIGINT AS sum_y, sum(x * y)::BIGINT AS sum_xy,
           sum(x * x)::BIGINT AS sum_x2, sum(y * y)::BIGINT AS sum_y2
    FROM b GROUP BY bucket
    """


def sql_nn_join() -> str:
    from osmquadtreepostgis_ray.sources.zones import (
        GRID_H, GRID_KEEP_LT, GRID_KEEP_MOD, GRID_KEEP_MULT, GRID_W, GX, GY)
    return f"""
    WITH {events_geo_cte()},
    cent AS (
        SELECT i::BIGINT AS zone_id,
               ((i % {GX}) * {GRID_W} + {GRID_W // 2})::BIGINT AS cx,
               ((i // {GX}) * {GRID_H} + {GRID_H // 2})::BIGINT AS cy
        FROM range(0, {GX * GY}) t(i)
        WHERE (i * {GRID_KEEP_MULT}) % {GRID_KEEP_MOD} < {GRID_KEEP_LT}
    ),
    d AS (
        SELECT ev.event_id, cent.zone_id,
               (ev.lon_milli - cent.cx) * (ev.lon_milli - cent.cx)
             + (ev.lat_milli - cent.cy) * (ev.lat_milli - cent.cy) AS d2,
               row_number() OVER (PARTITION BY ev.event_id
                                  ORDER BY (ev.lon_milli - cent.cx) * (ev.lon_milli - cent.cx)
                                         + (ev.lat_milli - cent.cy) * (ev.lat_milli - cent.cy),
                                           cent.zone_id) AS rn
        FROM ev CROSS JOIN cent
    )
    SELECT event_id, zone_id AS nn_zone, d2::BIGINT AS d2 FROM d WHERE rn = 1
    """


def sql_running_total() -> str:
    return """
    SELECT o_orderkey,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
           AS run_cents
    FROM orders
    """



def way_segments_cte() -> str:
    """Twin of queries.way_segments: member chains -> segments (shared
    by segment_intersections / densify / line_raster / map_match)."""
    return f"""{assembly_members_cte()},
    seg AS (
        SELECT a.doc_id AS seg_id, a.group_id AS gid,
               a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        FROM m a JOIN m b ON b.group_id = a.group_id AND b.seq = a.seq + 1
        WHERE NOT (a.x = b.x AND a.y = b.y)
    )"""


def dense_points_sql(k: int) -> str:
    """Exact-integer segment interpolation (twin of queries._densify):
    every operand non-negative so DuckDB trunc `//` == numpy floor."""
    return f"""
    dense AS (
        SELECT seg_id, gid, js.j,
               (x1 * ({k} - js.j) + x2 * js.j) // {k} AS px,
               (y1 * ({k} - js.j) + y2 * js.j) // {k} AS py
        FROM seg CROSS JOIN (SELECT unnest(generate_series(0, {k})) AS j) js
    )"""


def sql_densify() -> str:
    from osmquadtreepostgis_ray.queries import DENSIFY_K
    return f"""
    WITH {way_segments_cte()}, {dense_points_sql(DENSIFY_K)}
    SELECT seg_id, j, px, py FROM dense
    """


def sql_line_raster() -> str:
    from osmquadtreepostgis_ray.queries import DENSIFY_K, RASTER_N
    return f"""
    WITH {way_segments_cte()}, {dense_points_sql(DENSIFY_K)},
    dc AS (
        SELECT DISTINCT seg_id,
               px * {RASTER_N} // {geotag.LON_MOD} AS cx,
               (py + 5000) * {RASTER_N} // 180000 AS cy
        FROM dense
    )
    SELECT cx, cy, count(*)::BIGINT AS n FROM dc GROUP BY cx, cy
    """


def sql_map_match() -> str:
    from osmquadtreepostgis_ray.queries import (DENSIFY_K, MM_EVENT_MOD,
                                                MM_GID_MOD, MM_RID_W)
    return f"""
    WITH {way_segments_cte()}, {dense_points_sql(DENSIFY_K)},
    road AS (
        SELECT seg_id * {MM_RID_W} + j AS rid, px, py
        FROM dense WHERE gid % {MM_GID_MOD} = 0
    ),
    {events_geo_cte()},
    pts AS (
        SELECT event_id, lon_milli AS ex, lat_milli AS ey
        FROM ev WHERE event_id % {MM_EVENT_MOD} = 0
    ),
    d AS (
        SELECT event_id, rid,
               (ex - px) * (ex - px) + (ey - py) * (ey - py) AS d2
        FROM pts CROSS JOIN road
    )
    SELECT event_id, rid, d2 FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY d2, rid) AS rk
        FROM d
    ) WHERE rk = 1
    """


def sql_geohash() -> str:
    from osmquadtreepostgis_ray.functions import geohash
    code, chars = geohash.encode_sql("lon_milli", "lat_milli")
    return f"""
    WITH {events_geo_cte()},
    c AS (SELECT ({code}) AS code FROM ev)
    SELECT ({chars}) AS gh, count(*)::BIGINT AS n FROM c GROUP BY 1
    """


def sql_segment_intersections() -> str:
    return f"""
    WITH {way_segments_cte()}
    SELECT s.seg_id AS a_seg, t.seg_id AS b_seg
    FROM seg s JOIN seg t ON s.gid < t.gid
    WHERE sign((s.x2 - s.x1) * (t.y1 - s.y1) - (s.y2 - s.y1) * (t.x1 - s.x1))
        * sign((s.x2 - s.x1) * (t.y2 - s.y1) - (s.y2 - s.y1) * (t.x2 - s.x1)) < 0
      AND sign((t.x2 - t.x1) * (s.y1 - t.y1) - (t.y2 - t.y1) * (s.x1 - t.x1))
        * sign((t.x2 - t.x1) * (s.y2 - t.y1) - (t.y2 - t.y1) * (s.x2 - t.x1)) < 0
    """


def sql_triangles() -> str:
    return """
    WITH e AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM documents WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id - 2, doc_id FROM documents
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    t AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    c AS (
        SELECT x AS node FROM t
        UNION ALL SELECT y FROM t
        UNION ALL SELECT z FROM t
    )
    SELECT node, count(*)::BIGINT AS n_tri FROM c GROUP BY node
    """



def sql_hex_bin() -> str:
    from osmquadtreepostgis_ray.queries import HEX_C, HEX_NCOLS, HEX_R
    C, R = HEX_C, HEX_R
    half = C // 2
    return f"""
    WITH {events_geo_cte()},
    cand AS (
        SELECT event_id, lon_milli AS x, lat_milli AS y,
               (lat_milli // {R}) AS j0
        FROM ev
    ),
    d AS (
        SELECT *,
            ((j0 % 2) * {half}) AS o0,
            (((j0 + 1) % 2) * {half}) AS o1
        FROM cand
    ),
    e AS (
        SELECT *,
            ((2 * (x - o0) + {C}) // {2 * C}) AS i0,
            ((2 * (x - o1) + {C}) // {2 * C}) AS i1
        FROM d
    ),
    f AS (
        SELECT *,
            (x - (i0 * {C} + o0)) * (x - (i0 * {C} + o0))
              + (y - j0 * {R}) * (y - j0 * {R}) AS d20,
            (x - (i1 * {C} + o1)) * (x - (i1 * {C} + o1))
              + (y - (j0 + 1) * {R}) * (y - (j0 + 1) * {R}) AS d21
        FROM e
    )
    SELECT (CASE WHEN d20 <= d21 THEN j0 * {HEX_NCOLS} + i0
                 ELSE (j0 + 1) * {HEX_NCOLS} + i1 END)::BIGINT AS hex_id,
           count(*)::BIGINT AS n
    FROM f GROUP BY 1
    """



def sql_pip_holes() -> str:
    from osmquadtreepostgis_ray.queries import PIP_HOLES_GROUPS
    return f"""
    WITH {events_geo_cte()},
    {assembly_members_cte()},
    r AS (
        SELECT group_id, part, pseq, psize, x, y
        FROM p WHERE group_id < {PIP_HOLES_GROUPS} AND closed
    ),
    os AS (
        SELECT group_id, sum(x) // count(*) AS cx, sum(y) // count(*) AS cy,
               min(x) AS bx0, max(x) AS bx1, min(y) AS by0, max(y) AS by1
        FROM r WHERE part = 1 GROUP BY group_id
    ),
    v AS (
        SELECT r.group_id, r.part, r.pseq, r.psize,
            CASE WHEN r.part = 2 AND r.group_id % 2 = 0
                 THEN least(greatest((3 * os.cx + r.x) // 4, os.bx0), os.bx1)
                 ELSE r.x END AS vx,
            CASE WHEN r.part = 2 AND r.group_id % 2 = 0
                 THEN least(greatest((3 * os.cy + r.y) // 4, os.by0), os.by1)
                 ELSE r.y END AS vy
        FROM r LEFT JOIN os ON os.group_id = r.group_id
    ),
    e AS (
        SELECT a.group_id, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
        FROM v a JOIN v b ON b.group_id = a.group_id AND b.part = a.part
         AND b.pseq = CASE WHEN a.pseq + 1 = a.psize THEN 0 ELSE a.pseq + 1 END
    ),
    cr AS (
        SELECT ev.event_id, e.group_id,
            CASE WHEN ((e.y1 > ev.lat_milli) <> (e.y2 > ev.lat_milli))
                 AND ((  (e.y2 - e.y1) > 0
                       AND (e.x1 - ev.lon_milli) * (e.y2 - e.y1)
                         + (ev.lat_milli - e.y1) * (e.x2 - e.x1) > 0)
                   OR (  (e.y2 - e.y1) < 0
                       AND (e.x1 - ev.lon_milli) * (e.y2 - e.y1)
                         + (ev.lat_milli - e.y1) * (e.x2 - e.x1) < 0))
                 THEN 1 ELSE 0 END AS c
        FROM ev CROSS JOIN e
    )
    SELECT event_id, group_id FROM cr
    GROUP BY event_id, group_id HAVING sum(c) % 2 = 1
    """



def sql_dense_rank() -> str:
    return """
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           dense_rank() OVER (PARTITION BY event_type
                              ORDER BY CAST(round(value * 100) AS BIGINT))
               ::BIGINT AS drank
    FROM events
    """


def sql_lag_delta() -> str:
    return """
    WITH w AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev
        FROM events
    )
    SELECT event_id, user_id, (ts_us - prev)::BIGINT AS delta_us
    FROM w WHERE prev IS NOT NULL
    """


def sql_outer_join() -> str:
    return """
    WITH l AS (
        SELECT o_custkey AS custkey, count(*)::BIGINT AS n_odd
        FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey
    ),
    r AS (
        SELECT o_custkey AS custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents3
        FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_custkey
    )
    SELECT COALESCE(l.custkey, r.custkey)::BIGINT AS custkey,
           COALESCE(l.n_odd, 0)::BIGINT AS n_odd,
           COALESCE(r.cents3, 0)::BIGINT AS cents3
    FROM l FULL OUTER JOIN r ON l.custkey = r.custkey
    """



def sql_ahash_neardup_sampled(max_hamming: int = 3, mod: int = 10) -> str:
    """sql_ahash_neardup restricted to the deterministic 1-in-mod doc
    sample (doc_id parses back out of image_id = img%012d)."""
    return f"""{_sql_decoded_pixels()}{_sql_ahash_cte()}
    SELECT a.image_id AS a, b.image_id AS b,
           bit_count(xor(a.ahash, b.ahash))::BIGINT AS hamming
    FROM ah a JOIN ah b ON a.image_id < b.image_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}
      AND CAST(substr(a.image_id, 4) AS BIGINT) % {mod} = 0
      AND CAST(substr(b.image_id, 4) AS BIGINT) % {mod} = 0
    """


ORACLES: dict[str, str] = {}




def _word_tokens_cte() -> str:
    """Whitespace tokens of documents.text with a per-doc consecutive
    ordinal j (empties from boundary whitespace dropped — str.split()
    twin of functions/text._token_hash_segments)."""
    return """
    toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents),
    rawt AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i FROM toks),
    t AS (SELECT doc_id, w,
                 row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
          FROM rawt WHERE w <> '')"""


def sql_repetition() -> str:
    """Twin of queries.q_repetition: bigrams via the consecutive-ordinal
    self-join; dup_permille uses the same non-negative // division."""
    return f"""
    WITH {_word_tokens_cte()},
    bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
           FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.j = a.j + 1)
    SELECT d.doc_id,
           count(g)::BIGINT AS n_grams,
           count(DISTINCT g)::BIGINT AS n_distinct,
           (CASE WHEN count(g) > 0
                 THEN (1000 * (count(g) - count(DISTINCT g))) // count(g)
                 ELSE 0 END)::BIGINT AS dup_permille
    FROM documents d LEFT JOIN bg ON d.doc_id = bg.doc_id
    GROUP BY d.doc_id"""


def sql_decontaminate() -> str:
    return f"""
    WITH {_word_tokens_cte()},
    tg AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
           FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.j = a.j + 1
                    JOIN t c ON a.doc_id = c.doc_id AND c.j = a.j + 2),
    bench AS (SELECT DISTINCT g FROM tg WHERE doc_id % 50 = 0),
    corp AS (SELECT DISTINCT doc_id, g FROM tg WHERE doc_id % 50 <> 0),
    hits AS (SELECT corp.doc_id, count(*) AS n
             FROM corp JOIN bench USING (g) GROUP BY corp.doc_id)
    SELECT d.doc_id, coalesce(h.n, 0)::BIGINT AS n_shared,
           (CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id"""


def sql_pii_redact() -> str:
    from osmquadtreepostgis_ray.functions.text import (
        PII_EMAIL_RE, PII_PHONE_RE, pii_inject_sql)
    return f"""
    WITH p AS (SELECT doc_id, {pii_inject_sql()} AS t FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{PII_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{PII_PHONE_RE}'))::BIGINT AS n_phones,
           regexp_replace(regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PII_PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM p"""




def sql_tile_pyramid() -> str:
    """Twin of queries.q_tile_pyramid.  Grouping raw events at each
    depth equals the engine's leaf-rollup because floor-division
    composes: floor(x*2^d/S) == floor(x*2^12/S) >> (12-d) for the
    non-negative fixed coords (geotag.py guarantees >= 0)."""
    from osmquadtreepostgis_ray.queries import PYRAMID_DEPTHS
    lon, lat = geotag.event_lonlat_milli_sql()
    parts = [(f"SELECT CAST({d} AS BIGINT) AS depth, "
              f"{_cell_expr(lon, lat, d)} AS cell, count(*)::BIGINT AS n "
              f"FROM events GROUP BY cell")
             for d in PYRAMID_DEPTHS]
    return " UNION ALL ".join(parts)


def sql_radius_join(radius_milli: int = 2000, query_mod: int = 101) -> str:
    lon, lat = geotag.event_lonlat_milli_sql()
    r2 = radius_milli * radius_milli
    return f"""
    WITH ev AS (SELECT event_id, {lon} AS x, {lat} AS y FROM events),
    q AS (SELECT event_id AS query_id, x AS qx, y AS qy FROM ev
          WHERE event_id % {query_mod} = 0)
    SELECT q.query_id, e.event_id,
           ((e.x - q.qx) * (e.x - q.qx) + (e.y - q.qy) * (e.y - q.qy))::BIGINT AS dist2
    FROM q CROSS JOIN ev e
    WHERE e.event_id <> q.query_id
      AND (e.x - q.qx) * (e.x - q.qx) + (e.y - q.qy) * (e.y - q.qy) <= {r2}"""


def sql_rect_join() -> str:
    """Twin of queries.q_rect_join: image footprint boxes (inclusive ->
    half-open via +1) x zone boxes, overlap pairs with exact
    intersection area.  Zones generated from the same pure-id formulas
    as sources/zones.zones_table."""
    return f"""
    WITH {images_cte()},
    {_footprint_cte()},
    zs AS (
        SELECT zid AS zone_id, 'grid' AS kind,
               (zid % {Z.GX}) * {Z.GRID_W} AS zx0,
               (zid // {Z.GX}) * {Z.GRID_H} AS zy0,
               (zid % {Z.GX} + 1) * {Z.GRID_W} AS zx1,
               (zid // {Z.GX} + 1) * {Z.GRID_H} AS zy1
        FROM (SELECT unnest(range(0, {Z.GX * Z.GY})) AS zid)
        WHERE (zid * {Z.GRID_KEEP_MULT}) % {Z.GRID_KEEP_MOD} < {Z.GRID_KEEP_LT}
        UNION ALL
        SELECT aid + {Z.ADMIN_ID_BASE} AS zone_id, 'admin' AS kind,
               (aid % {Z.AX}) * {Z.ADMIN_W} AS zx0,
               (aid // {Z.AX}) * {Z.ADMIN_H} AS zy0,
               (aid % {Z.AX} + 1) * {Z.ADMIN_W} AS zx1,
               (aid // {Z.AX} + 1) * {Z.ADMIN_H} AS zy1
        FROM (SELECT unnest(range(0, {Z.AX * Z.AY})) AS aid)
    )
    SELECT f.doc_id, z.zone_id, z.kind,
           ((least(f.x1 + 1, z.zx1) - greatest(f.x0, z.zx0))
            * (least(f.y1 + 1, z.zy1) - greatest(f.y0, z.zy0)))::BIGINT AS inter_area
    FROM fp f JOIN zs z
      ON f.x0 < z.zx1 AND z.zx0 < f.x1 + 1
     AND f.y0 < z.zy1 AND z.zy0 < f.y1 + 1"""


def sql_dup_spans(k: int = 9) -> str:
    """Twin of queries.q_dup_spans over the shared exact-shingle CTE:
    shingles in >= 2 docs are duplicated; per-doc duplicated count and
    exact permille fraction."""
    return f"""
    WITH {_shingles_cte(k)},
    tot AS (SELECT doc_id, count(*) AS n_grams FROM sh0 GROUP BY doc_id),
    d AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) >= 2),
    dup AS (SELECT sh0.doc_id, count(*) AS dup_grams
            FROM sh0 JOIN d USING (s) GROUP BY sh0.doc_id)
    SELECT t.doc_id, dup.dup_grams::BIGINT AS dup_grams,
           t.n_grams::BIGINT AS n_grams,
           (1000 * dup.dup_grams // t.n_grams)::BIGINT AS dup_permille
    FROM dup JOIN tot t USING (doc_id)"""


def sql_dup_span_runs(k: int = 9) -> str:
    """Twin of queries.q_dup_span_runs: positional k-gram hashes (the
    _shingles_cte formula WITHOUT list_distinct — every occurrence),
    suffix-adjacency via lead() over (s ORDER BY doc_id, pos), maximal
    diagonal runs via the lag-break + running-sum window, spans of
    run_len + k - 1 chars, reduced per ordered doc pair."""
    mults = [pow(1099511628211, j, _M64) for j in range(k)]
    window = " + ".join(
        f"CAST(ord(substr(text, i + {j}, 1)) AS HUGEINT) * {m}"
        for j, m in enumerate(mults))
    return f"""
    WITH shp AS (
        SELECT doc_id, i AS pos, ({window}) % {_M64} AS s
        FROM (SELECT doc_id, text,
                     unnest(range(1, length(text) - {k - 2})) AS i
              FROM documents WHERE length(text) >= {k})
    ),
    adj AS (
        SELECT doc_id AS d1, pos AS p1,
               lead(doc_id) OVER w AS d2, lead(pos) OVER w AS p2
        FROM shp WINDOW w AS (PARTITION BY s ORDER BY doc_id, pos)
    ),
    cand AS (
        SELECT d1, d2, p2 - p1 AS diag, p1
        FROM adj WHERE d2 IS NOT NULL AND d1 <> d2
    ),
    marked AS (
        SELECT d1, d2, diag, p1,
               CASE WHEN lag(p1) OVER w2 = p1 - 1 THEN 0 ELSE 1 END AS brk
        FROM cand WINDOW w2 AS (PARTITION BY d1, d2, diag ORDER BY p1)
    ),
    runs AS (
        SELECT d1, d2, diag,
               sum(brk) OVER (PARTITION BY d1, d2, diag
                              ORDER BY p1 ROWS UNBOUNDED PRECEDING) AS rid
        FROM marked
    ),
    spans AS (
        SELECT d1, d2, count(*) + {k - 1} AS chars
        FROM runs GROUP BY d1, d2, diag, rid
    )
    SELECT d1, d2, count(*)::BIGINT AS n_spans,
           sum(chars)::BIGINT AS span_chars,
           max(chars)::BIGINT AS max_span
    FROM spans GROUP BY 1, 2
    """


def sql_tile_mosaic(thumb: int = 8) -> str:
    """Twin of queries.q_tile_mosaic: decoded pixels -> nearest-neighbor
    thumb x thumb resize (the sql_image_resize index map) -> per-tile
    pixel-wise sum/count/floor-mean.  Tile recomputed from doc_id via
    the shared phash/geotag expressions."""
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql(f"({ph})")
    return f"""{_sql_decoded_pixels()},
    tl AS (
        SELECT doc_id, {_cell_expr(lon, lat, TILE_DEPTH)} AS tile
        FROM documents
    ),
    rimg AS (SELECT DISTINCT doc_id, w, h FROM dec),
    rp AS (
        SELECT doc_id, w, h, unnest(range(0, {thumb * thumb})) AS rp
        FROM rimg
    ),
    sel AS (
        SELECT doc_id, rp,
               (((rp // {thumb}) * h) // {thumb}) * w
               + (((rp % {thumb}) * w) // {thumb}) AS idx
        FROM rp
    )
    SELECT t.tile, (s.rp // {thumb})::BIGINT AS py, (s.rp % {thumb})::BIGINT AS px,
           sum(d.p)::BIGINT AS pixel_sum,
           count(*)::BIGINT AS n_images,
           (sum(d.p) // count(*))::BIGINT AS mean_pixel
    FROM sel s
    JOIN dec d ON d.doc_id = s.doc_id AND d.idx = s.idx
    JOIN tl t ON t.doc_id = s.doc_id
    GROUP BY t.tile, py, px"""


def sql_ann_recall(k: int = 5) -> str:
    """Twin of queries.q_ann_recall: intersect the brute and pruned-IVF
    top-k twins per query."""
    return f"""
    SELECT b.query_id,
           count(i.neighbor_id)::BIGINT AS n_hit,
           ((1000 * count(i.neighbor_id)) // {k})::BIGINT AS recall_permille
    FROM ({sql_embed_knn(k)}) b
    LEFT JOIN ({sql_embed_knn_ivf(k)}) i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id"""


def sql_hard_negatives() -> str:
    """Twin of queries.q_hard_negatives: exhaustive argmax-cosine
    neighbor per vector, ties to smallest nn_id; rank identity only."""
    dd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
    WITH e AS (SELECT vec_id, {dd} AS v FROM embeddings),
    d AS (SELECT a.vec_id, b.vec_id AS nn_id,
                 list_dot_product(a.v, b.v)
                 / sqrt(list_dot_product(a.v, a.v))
                 / sqrt(list_dot_product(b.v, b.v)) AS sim
          FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
    r AS (SELECT vec_id, nn_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, nn_id) AS rn
          FROM d)
    SELECT vec_id, nn_id FROM r WHERE rn = 1"""


def sql_tile_sobel() -> str:
    """Twin of queries.q_tile_sobel: the 3x3 Sobel expressed as a
    9-offset contribution join over the decoded-pixel CTE — a pixel at
    (y, x) adds k(dy, dx) * p to center (y - dy, x - dx); interior
    centers always receive all 9 contributions."""
    from osmquadtreepostgis_ray.stages.images import SOBEL_EDGE_THRESH
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql(f"({ph})")
    return f"""{_sql_decoded_pixels()},
    tl AS (
        SELECT doc_id, {_cell_expr(lon, lat, TILE_DEPTH)} AS tile
        FROM documents
    ),
    off AS (
        SELECT o1.dy AS dy, o2.dx AS dx,
               o2.dx * (2 - abs(o1.dy)) AS kx,
               o1.dy * (2 - abs(o2.dx)) AS ky
        FROM (SELECT unnest([-1, 0, 1]) AS dy) o1,
             (SELECT unnest([-1, 0, 1]) AS dx) o2
    ),
    g AS (
        SELECT d.doc_id, d.w, d.h,
               (d.idx // d.w) - o.dy AS cy, (d.idx % d.w) - o.dx AS cx,
               sum(o.kx * d.p) AS gx, sum(o.ky * d.p) AS gy
        FROM dec d, off o
        GROUP BY d.doc_id, d.w, d.h, cy, cx
    ),
    s AS (
        SELECT doc_id, sum(abs(gx) + abs(gy)) AS grad,
               sum(CASE WHEN abs(gx) + abs(gy) >= {SOBEL_EDGE_THRESH}
                   THEN 1 ELSE 0 END) AS edges
        FROM g
        WHERE cy >= 1 AND cy <= h - 2 AND cx >= 1 AND cx <= w - 2
        GROUP BY doc_id
    )
    SELECT t.tile, sum(s.grad)::BIGINT AS grad_sum,
           sum(s.edges)::BIGINT AS edge_px, count(*)::BIGINT AS n_images
    FROM s JOIN tl t USING (doc_id) GROUP BY t.tile"""


def sql_mosaic_pyramid(thumb: int = 8) -> str:
    """Twin of queries.q_mosaic_pyramid: the tile_mosaic aggregate at
    every pyramid depth (tile recomputed per depth; resize shared)."""
    from osmquadtreepostgis_ray.queries import MOSAIC_DEPTHS
    ph = geotag.phash_sql("doc_id")
    lon, lat = geotag.lonlat_milli_sql(f"({ph})")
    case = ("CASE d " + " ".join(
        f"WHEN {d} THEN {_cell_expr(lon, lat, d)}" for d in MOSAIC_DEPTHS)
        + " END")
    dl = ", ".join(str(d) for d in MOSAIC_DEPTHS)
    return f"""{_sql_decoded_pixels()},
    tl AS (
        SELECT doc_id, CAST(d AS BIGINT) AS depth, {case} AS tile
        FROM documents, (SELECT unnest([{dl}]) AS d)
    ),
    rimg AS (SELECT DISTINCT doc_id, w, h FROM dec),
    rp AS (
        SELECT doc_id, w, h, unnest(range(0, {thumb * thumb})) AS rp
        FROM rimg
    ),
    sel AS (
        SELECT doc_id, rp,
               (((rp // {thumb}) * h) // {thumb}) * w
               + (((rp % {thumb}) * w) // {thumb}) AS idx
        FROM rp
    )
    SELECT t.depth, t.tile,
           (s.rp // {thumb})::BIGINT AS py, (s.rp % {thumb})::BIGINT AS px,
           sum(d.p)::BIGINT AS pixel_sum,
           count(*)::BIGINT AS n_images,
           (sum(d.p) // count(*))::BIGINT AS mean_pixel
    FROM sel s
    JOIN dec d ON d.doc_id = s.doc_id AND d.idx = s.idx
    JOIN tl t ON t.doc_id = s.doc_id
    GROUP BY t.depth, t.tile, py, px"""


def sql_hll_sketch() -> str:
    """Exact twin of queries.q_hll_sketch: splitmix64 in HUGEINT mod
    2^64 (chained CTEs via sketch.splitmix_sql_ctes), register = top 6
    bits, rho = 58 - bitlen(w) + 1 with bitlen via DuckDB's minimal
    bin() string (w = 0 -> 59)."""
    from osmquadtreepostgis_ray.functions.sketch import HLL_WBITS, splitmix_sql_ctes
    ctes, last = splitmix_sql_ctes("events", "user_id", _mulmod64,
                                   carry="event_type")
    return f"""
    WITH {ctes.lstrip()},
    r AS (SELECT event_type, CAST(h // {1 << HLL_WBITS} AS BIGINT) AS register,
                 CAST(h % {1 << HLL_WBITS} AS BIGINT) AS w FROM {last})
    SELECT event_type, register,
           max(CASE WHEN w = 0 THEN {HLL_WBITS + 1}
                    ELSE {HLL_WBITS} - length(bin(w)) + 1 END)::BIGINT AS rho
    FROM r GROUP BY event_type, register"""




def sql_kmeans_embed(k: int = 4, iters: int = 3,
                     vexpr: str | None = None,
                     emit: str = "assign") -> str:
    """Unrolled-CTE Lloyd twin of stages/cluster.kmeans_assign: same
    floor(x*1024)+1024 quantization, per-dim exploded distance sums,
    row_number tie-break on (d2, j), integer-mean centroid update with
    empty-cluster carry-over (coalesce).  ``vexpr`` overrides the
    quantized-vector expression (sql_embed_pq slices subspaces)."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    if vexpr is None:
        vexpr = ("list_transform(embedding, "
                 f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
                 f" + {KM_SHIFT})")
    ctes = [
        f"qv AS (SELECT vec_id, {vexpr} AS v FROM embeddings)",
        "e AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM qv)",
        (f"c0 AS (SELECT vec_id AS j, generate_subscripts(v, 1) AS i, unnest(v) AS x "
         f"FROM qv WHERE vec_id < {k})"),
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        ctes.append(
            f"d{t} AS (SELECT e.vec_id, c.j, "
            f"sum((e.x - c.x) * (e.x - c.x)) AS d2 "
            f"FROM e JOIN {prev} c USING (i) GROUP BY e.vec_id, c.j)")
        ctes.append(
            f"a{t} AS (SELECT vec_id, j, d2 FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn "
            f"FROM d{t}) WHERE rn = 1)")
        if t < iters:
            ctes.append(
                f"s{t} AS (SELECT a.j, e.i, sum(e.x) // count(*) AS x "
                f"FROM e JOIN a{t} a USING (vec_id) GROUP BY a.j, e.i)")
            ctes.append(
                f"c{t} AS (SELECT c.j, c.i, coalesce(s.x, c.x) AS x "
                f"FROM {prev} c LEFT JOIN s{t} s ON c.j = s.j AND c.i = s.i)")
    body = ",\n    ".join(ctes)
    if emit == "centroids":
        # the codebook the final assign pass used (what a PQ encoder
        # stores) — c{iters-1} is exactly kmeans_assign's `cents`
        return (f"WITH {body}\n    "
                f"SELECT j::BIGINT AS j, i::BIGINT AS i, x::BIGINT AS x "
                f"FROM c{iters - 1}")
    return (f"WITH {body}\n    "
            f"SELECT vec_id, j::BIGINT AS cluster, d2::BIGINT AS d2 FROM a{iters}")




def sql_embed_pq(m: int = 4, k: int = 4, iters: int = 3) -> str:
    """Twin of queries.q_embed_pq: one Lloyd block (sql_kmeans_embed)
    per subspace over the list_slice'd quantized vector, UNION ALL with
    the subspace tag.  Slice-then-quantize == quantize-then-slice
    (floor is elementwise), so slicing the quantized list is exact."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    q = ("list_transform(embedding, "
         f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
         f" + {KM_SHIFT})")
    blocks = []
    for s in range(m):
        vexpr = (f"list_slice({q}, {s} * (len(embedding) // {m}) + 1, "
                 f"({s} + 1) * (len(embedding) // {m}))")
        blocks.append(
            f"SELECT vec_id, CAST({s} AS BIGINT) AS subspace, cluster, d2 "
            f"FROM ({sql_kmeans_embed(k, iters, vexpr=vexpr)})")
    return "\n    UNION ALL\n    ".join(blocks)


def sql_embed_knn_pq(k: int = 5, nq: int = 5, m: int = 4,
                     kc: int = 4, iters: int = 3) -> str:
    """Twin of queries.q_embed_knn_pq: per-subspace centroids (the
    Lloyd CTE with emit='centroids') and codes (the assign emit), a
    per-query LUT join, approx distance = sum of the m LUT entries,
    row_number rank with tie -> lowest neighbor."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    q = ("list_transform(embedding, "
         f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
         f" + {KM_SHIFT})")
    pieces = []
    for s in range(m):
        vex = (f"list_slice({q}, {s} * (len(embedding) // {m}) + 1, "
               f"({s} + 1) * (len(embedding) // {m}))")
        pieces.append(
            f"cent{s} AS (SELECT * FROM "
            f"({sql_kmeans_embed(kc, iters, vexpr=vex, emit='centroids')}))")
        pieces.append(
            f"code{s} AS (SELECT vec_id, cluster FROM "
            f"({sql_kmeans_embed(kc, iters, vexpr=vex)}))")
        pieces.append(
            f"qd{s} AS (SELECT vec_id AS qid, generate_subscripts(v, 1) AS i, "
            f"unnest(v) AS qx FROM (SELECT vec_id, {vex} AS v FROM embeddings "
            f"WHERE vec_id < {nq}))")
        pieces.append(
            f"lut{s} AS (SELECT q.qid, c.j, "
            f"sum((q.qx - c.x) * (q.qx - c.x)) AS d2 "
            f"FROM qd{s} q JOIN cent{s} c USING (i) GROUP BY q.qid, c.j)")
        pieces.append(
            f"ct{s} AS (SELECT l.qid, a.vec_id, l.d2 "
            f"FROM code{s} a JOIN lut{s} l ON l.j = a.cluster)")
    union = " UNION ALL ".join(f"SELECT * FROM ct{s}" for s in range(m))
    body = ",\n    ".join(pieces)
    return f"""
    WITH {body},
    tot AS (
        SELECT qid, vec_id, sum(d2) AS approx
        FROM ({union}) GROUP BY qid, vec_id
    ),
    r AS (
        SELECT qid AS query_id, vec_id AS neighbor_id, approx,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY approx, vec_id) AS rn
        FROM tot WHERE vec_id <> qid
    )
    SELECT query_id, neighbor_id, CAST(approx AS BIGINT) AS approx_d2,
           rn::BIGINT AS rank
    FROM r WHERE rn <= {k}
    """


def sql_embed_knn_quant(k: int = 5, nq: int = 5) -> str:
    """Twin of queries.q_embed_knn_quant: exact quantized-euclid brute
    top-k via a dim-exploded distance join."""
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    q = ("list_transform(embedding, "
         f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
         f" + {KM_SHIFT})")
    return f"""
    WITH e AS (SELECT vec_id, {q} AS v FROM embeddings),
    ed AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
           FROM e),
    qd AS (SELECT vec_id AS qid, i, x AS qx FROM ed WHERE vec_id < {nq}),
    d AS (SELECT q.qid, e.vec_id,
                 sum((q.qx - e.x) * (q.qx - e.x)) AS d2
          FROM qd q JOIN ed e USING (i)
          WHERE e.vec_id <> q.qid
          GROUP BY q.qid, e.vec_id),
    r AS (SELECT qid AS query_id, vec_id AS neighbor_id, d2,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY d2, vec_id) AS rn
          FROM d)
    SELECT query_id, neighbor_id, CAST(d2 AS BIGINT) AS d2,
           rn::BIGINT AS rank
    FROM r WHERE rn <= {k}
    """


def sql_pq_recall(k: int = 5, nq: int = 5) -> str:
    """Twin of queries.q_pq_recall: intersect the exact quantized-euclid
    and ADC top-k twins per query (the sql_ann_recall shape)."""
    return f"""
    SELECT b.query_id,
           count(a.neighbor_id)::BIGINT AS n_hit,
           ((1000 * count(a.neighbor_id)) // {k})::BIGINT AS recall_permille
    FROM ({sql_embed_knn_quant(k, nq)}) b
    LEFT JOIN ({sql_embed_knn_pq(k, nq)}) a
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
    GROUP BY b.query_id"""


def sql_inverted_index() -> str:
    return f"""
    WITH {_word_tokens_cte()},
    u AS (SELECT DISTINCT doc_id, w FROM t)
    SELECT w AS term, count(*)::BIGINT AS df,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
    FROM u GROUP BY w"""


def sql_collocations(topk: int = 20) -> str:
    return f"""
    WITH {_word_tokens_cte()},
    uni AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY w),
    tot AS (SELECT sum(c)::BIGINT AS n FROM uni),
    bg AS (SELECT a.w AS w1, b.w AS w2, count(*)::BIGINT AS c_xy
           FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.j = a.j + 1
           GROUP BY a.w, b.w),
    sc AS (SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
                  (1000 * c_xy * (SELECT n FROM tot)) // (u1.c * u2.c) AS score
           FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w)
    SELECT w1, w2, c_xy, c_x, c_y, score::BIGINT AS score
    FROM sc ORDER BY score DESC, w1, w2 LIMIT {topk}"""


def sql_fuzzy_join() -> str:
    return """
    SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
           levenshtein(a.c_name, b.c_name)::BIGINT AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1"""




def sql_image_patches() -> str:
    return _sql_decoded_pixels() + """
    SELECT image_id, ((idx // w) // 8)::BIGINT AS py, ((idx % w) // 8)::BIGINT AS px,
           (sum(p) // 64)::BIGINT AS patch_mean
    FROM dec GROUP BY image_id, py, px"""


def sql_rasterize() -> str:
    lon, lat = geotag.event_lonlat_milli_sql()
    n12 = 1 << 12
    ix = f"((({lon}) * 10000 * {n12}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {n12}) // {quadtree.LAT_SPAN})"
    return f"""
    SELECT {_cell_expr(lon, lat, 8)} AS tile,
           ({iy} % 16)::BIGINT AS py, ({ix} % 16)::BIGINT AS px,
           count(*)::BIGINT AS n
    FROM events GROUP BY tile, py, px"""


def sql_raster_blur() -> str:
    """Twin of queries.q_raster_blur: per-global-pixel counts, 3x3
    neighbor scatter (domain-clipped), re-owned to tiles by pixel
    coords."""
    lon, lat = geotag.event_lonlat_milli_sql()
    G = 1 << CELL_DEPTH
    ix = f"((({lon}) * 10000 * {G}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {G}) // {quadtree.LAT_SPAN})"
    tile = quadtree.interleave_sql("(gx // 16)", "(gy // 16)", TILE_DEPTH)
    return f"""
    WITH r AS (
        SELECT {ix} AS gx, {iy} AS gy, count(*) AS n
        FROM events GROUP BY gx, gy
    ),
    nb AS (
        SELECT r.gx + o.dx AS gx, r.gy + o.dy AS gy, r.n
        FROM r, (SELECT unnest([-1, 0, 1]) AS dx) o1,
             (SELECT unnest([-1, 0, 1]) AS dy) o2,
             LATERAL (SELECT o1.dx AS dx, o2.dy AS dy) o
        WHERE r.gx + o.dx >= 0 AND r.gx + o.dx < {G}
          AND r.gy + o.dy >= 0 AND r.gy + o.dy < {G}
    )
    SELECT {tile} AS tile, (gy % 16)::BIGINT AS py, (gx % 16)::BIGINT AS px,
           sum(n)::BIGINT AS blur_sum
    FROM nb GROUP BY tile, py, px"""


def sql_dissolve() -> str:
    """Twin of queries.q_dissolve: same-count 4-adjacent raster cells
    merge into components; recursive min-label propagation (only labels
    smaller than the target node propagate, so the fixpoint table stays
    near-linear on the sparse grid)."""
    lon, lat = geotag.event_lonlat_milli_sql()
    G = 1 << CELL_DEPTH
    ix = f"((({lon}) * 10000 * {G}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {G}) // {quadtree.LAT_SPAN})"
    return f"""
    WITH RECURSIVE r AS (
        SELECT {ix} AS gx, {iy} AS gy, count(*) AS n
        FROM events GROUP BY gx, gy
    ),
    c AS (SELECT gy * {G} + gx AS id, gx, gy, n FROM r),
    e AS (
        SELECT a.id AS a, b.id AS b FROM c a JOIN c b
          ON b.n = a.n AND ((b.gx = a.gx + 1 AND b.gy = a.gy)
                            OR (b.gx = a.gx AND b.gy = a.gy + 1))
    ),
    es AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
    reach AS (
        SELECT id AS node, id AS lab FROM c
        UNION
        SELECT es.b AS node, reach.lab
        FROM reach JOIN es ON es.a = reach.node
        WHERE reach.lab < es.b
    ),
    comp AS (SELECT node, min(lab) AS comp FROM reach GROUP BY node)
    SELECT comp, count(*)::BIGINT AS n_cells, sum(c.n)::BIGINT AS sum_n
    FROM comp JOIN c ON c.id = comp.node GROUP BY comp"""


def sql_trajectories() -> str:
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH ev AS (SELECT user_id, ts, event_id, {lon} AS x, {lat} AS y FROM events),
    o AS (SELECT user_id, x, y,
                 lag(x) OVER w AS px, lag(y) OVER w AS py,
                 row_number() OVER w AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, (count(*) - 1)::BIGINT AS n_steps,
           coalesce(sum((x - px) * (x - px) + (y - py) * (y - py)), 0)::BIGINT AS sum_step2,
           coalesce(max((x - px) * (x - px) + (y - py) * (y - py)), 0)::BIGINT AS max_step2,
           (arg_max(x, rn) - arg_min(x, rn))::BIGINT AS net_dx,
           (arg_max(y, rn) - arg_min(y, rn))::BIGINT AS net_dy
    FROM o GROUP BY user_id"""


def sql_vocab_coverage(top_v: int = 20) -> str:
    """Twin of queries.q_vocab_coverage: whitespace tokens (empties
    dropped), vocab = top-V by (count desc, word asc), per-doc OOV count
    + permille.  `//` truncation == floor: all operands non-negative."""
    return f"""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
                  FROM documents),
    t AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM t GROUP BY w)
              ORDER BY c DESC, w LIMIT {top_v}),
    per AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
                   sum(CASE WHEN w IN (SELECT w FROM vocab) THEN 0 ELSE 1 END)::BIGINT AS oov_tokens
            FROM t GROUP BY doc_id)
    SELECT doc_id, n_tokens, oov_tokens,
           ((1000 * oov_tokens) // n_tokens)::BIGINT AS oov_permille
    FROM per"""


def sql_domain_cap(cap: int = 100) -> str:
    """Twin of queries.q_domain_cap: row_number per source by doc_id."""
    return f"""
    SELECT doc_id, source, rk FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        FROM documents) WHERE rk <= {cap}"""


def sql_mixture_quotas(target: int = 1000) -> str:
    """Twin of queries.q_mixture_quotas: exact largest-remainder
    apportionment of `target` over (source, lang) counts.  Tie-break on
    equal remainders is (source, lang) asc, same as the Ray sort."""
    return f"""
    WITH g AS (SELECT source, lang, count(*)::BIGINT AS cnt
               FROM documents GROUP BY source, lang),
    tot AS (SELECT sum(cnt)::BIGINT AS total FROM g),
    b AS (SELECT source, lang, cnt,
                 ({target} * cnt) // total AS base,
                 ({target} * cnt) % total AS rem
          FROM g, tot),
    r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source, lang) AS rk
          FROM b),
    s AS (SELECT sum(base)::BIGINT AS sb FROM b)
    SELECT source, lang, cnt,
           (base + CASE WHEN rk <= {target} - sb THEN 1 ELSE 0 END)::BIGINT AS quota
    FROM r, s"""


def sql_retention() -> str:
    """Twin of queries.q_retention: distinct active days per user,
    cohort = first day, count users per (cohort_day, day_offset)."""
    return """
    WITH d AS (SELECT DISTINCT user_id,
                      (epoch_us(ts) // 86400000000)::BIGINT AS day
               FROM events),
    f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT f.cohort_day, (d.day - f.cohort_day)::BIGINT AS day_offset,
           count(*)::BIGINT AS users
    FROM d JOIN f USING (user_id) GROUP BY 1, 2"""


def sql_funnel() -> str:
    """Twin of queries.q_funnel: each step's first qualifying event must
    STRICTLY follow the user's previous step time."""
    return """
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
    t1 AS (SELECT user_id, min(ts) AS t FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN t1 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts > t1.t GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN t2 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > t2.t GROUP BY e.user_id),
    t4 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN t3 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > t3.t GROUP BY e.user_id)
    SELECT CAST(1 AS BIGINT) AS step, count(*)::BIGINT AS users FROM t1
    UNION ALL SELECT CAST(2 AS BIGINT), count(*)::BIGINT FROM t2
    UNION ALL SELECT CAST(3 AS BIGINT), count(*)::BIGINT FROM t3
    UNION ALL SELECT CAST(4 AS BIGINT), count(*)::BIGINT FROM t4"""


def sql_mixture_sample(target: int = 1000) -> str:
    """Twin of queries.q_mixture_sample: rank docs within (source, lang)
    and keep rk <= quota from the largest-remainder apportionment."""
    return f"""
    WITH r AS (SELECT doc_id, source, lang,
                      row_number() OVER (PARTITION BY source, lang
                                         ORDER BY doc_id) AS rk
               FROM documents)
    SELECT r.doc_id, r.source, r.lang, r.rk::BIGINT AS rk
    FROM r JOIN ({sql_mixture_quotas(target)}) q USING (source, lang)
    WHERE r.rk <= q.quota"""


def sql_epoch_shuffle(seed: int = 1) -> str:
    """Twin of queries.q_epoch_shuffle."""
    h = f"((doc_id * {geotag.PHASH_MULT} + {seed}) % {geotag.PHASH_MOD})"
    return f"""
    SELECT doc_id,
           (row_number() OVER (ORDER BY {h}, doc_id) - 1)::BIGINT AS pos
    FROM documents"""


def sql_cluster_dedup_sample() -> str:
    """Twin of queries.q_cluster_dedup_sample: one representative (the
    min-label component id) per near-dup component, plus every doc not
    in the edge graph."""
    return """
    WITH RECURSIVE e0 AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents WHERE doc_id % 7 < 3
        UNION ALL
        SELECT doc_id AS a, doc_id // 2 AS b FROM documents
        WHERE doc_id % 11 = 0 AND doc_id > 0
    ),
    sym AS (
        SELECT a AS src, b AS dst FROM e0
        UNION
        SELECT b AS src, a AS dst FROM e0
    ),
    walk(v, l) AS (
        SELECT src, src FROM sym
        UNION
        SELECT e.dst, w.l FROM walk w JOIN sym e ON e.src = w.v
    ),
    comp AS (SELECT v AS node, MIN(l) AS component FROM walk GROUP BY v)
    SELECT DISTINCT CAST(component AS BIGINT) AS doc_id FROM comp
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) FROM documents
    WHERE doc_id NOT IN (SELECT node FROM comp)"""


def build_oracles() -> dict[str, str]:
    return {
        "cell_histogram": sql_cell_histogram(),
        "tile_assign": sql_tile_assign(),
        "agg_cells": sql_agg_cells(),
        "pip_zones": sql_pip_zones(),
        "tile_quadkey": sql_tile_quadkey(),
        "tile_bundle": sql_tile_bundle(),
        "pip_anti": sql_pip_anti(),
        "viewport": sql_viewport(),
        "zone_distance": sql_zone_distance(),
        "zone_border_dist": sql_zone_border_dist(),
        "snapshot_diff": sql_snapshot_diff(),
        "embed_calibration": sql_embed_calibration(),
        "histogram_quantiles": sql_histogram_quantiles(),
        "embed_pq": sql_embed_pq(),
        "embed_knn_pq": sql_embed_knn_pq(),
        "embed_knn_quant": sql_embed_knn_quant(),
        "pq_recall": sql_pq_recall(),
        "pip_zones_partitioned": sql_pip_zones(),
        "zonal_stats": sql_zonal_stats(),
        "pushdown_filter": sql_pushdown_filter(),
        "knn_brute": sql_knn(),
        "knn_cellring": sql_knn(),
        "dedup_latest": sql_dedup_latest(),
        "window_hourly": sql_window_hourly(),
        "join_orders_customer": sql_join_orders_customer(),
        "skew_join": sql_skew_join(),
        "join_lineitem_part": sql_join_lineitem_part(),
        "topk_orders": sql_topk_orders(),
        "distinct_users": sql_distinct_users(),
        "sessionize": sql_sessionize(),
        "sample_events": sql_sample_events(),
        "sample_stratified": sql_sample_stratified(),
        "topk_per_segment": sql_topk_per_segment(),
        "lineitem_pricing": sql_lineitem_pricing(),
        "flagship_point": sql_flagship_point(),
        "flagship_counts": sql_flagship_counts(),
        "union_lines": sql_union_lines(),
        "roads": sql_roads(),
        "union_polygon": sql_union_polygon(),
        "polygon_point": sql_polygon_point(),
        "lowzoom_counts": sql_lowzoom_counts(),
        "tile_cover": sql_tile_cover(),
        "json_props": _sql_json_props(),
        "assembly": sql_assembly(),
        "relation_tags": sql_relation_tags(),
        "admin_levels": sql_admin_levels(),
        "parent_tags": sql_parent_tags(),
        "checkpoint": sql_checkpoint(),
        "segment_intersections": sql_segment_intersections(),
        "triangles": sql_triangles(),
        "pip_holes": sql_pip_holes(),
        "dense_rank": sql_dense_rank(),
        "lag_delta": sql_lag_delta(),
        "outer_join": sql_outer_join(),
        "ahash_neardup": sql_ahash_neardup_sampled(),
        "hex_bin": sql_hex_bin(),
        "cube_counts": sql_cube_counts(),
        "mode_user_type": sql_mode_user_type(),
        "sample_weighted": sql_sample_weighted(),
        "corr_components": sql_corr_components(),
        "nn_join": sql_nn_join(),
        "running_total": sql_running_total(),
        "dedup_exact": sql_dedup_exact(),
        "lang_id": sql_lang_id(),
        "quality": sql_quality(),
        "hstore_tags": sql_hstore_tags(),
        "token_totals": sql_token_totals(),
        "token_bpe": sql_token_bpe(),
        "fingerprints": sql_fingerprints(),
        "embed_docs": sql_embed_docs(),
        "image_decode": sql_image_decode(),
        "image_blur": sql_image_blur(),
        "image_augment": sql_image_augment(),
        "blockiness": sql_blockiness(),
        "grad_orient": sql_grad_orient(),
        "kmv_sketch": sql_kmv_sketch(),
        "link_jaccard": sql_link_jaccard(),
        "flow_accum": sql_flow_accum(),
        "crossmodal_align": sql_crossmodal_align(),
        "image_norm_stats": sql_image_norm_stats(),
        "image_transcode": sql_image_transcode(),
        "geo_dup_groups": sql_geo_dup_groups(),
        "caption_stats_by_zone": sql_caption_stats_by_zone(),
        "crossmodal_knn": sql_crossmodal_knn(),
        "frame_sample": sql_frame_sample(),
        "minhash_pairs": sql_minhash_pairs(),
        "simhash": sql_simhash(),
        "embed_knn": sql_embed_knn(),
        "embed_knn_ivf": sql_embed_knn_ivf(),
        "ann_recall": sql_ann_recall(),
        "embed_knn_ivf_exhaustive": sql_embed_knn(),
        "embed_knn_lsh": sql_embed_knn_lsh(),
        "embed_knn_lsh_exhaustive": sql_embed_knn(),
        "embed_neardup": sql_embed_neardup(),
        "ngram_dups": sql_ngram_dups(),
        "image_ahash": sql_image_ahash(),
        "ahash_dups": sql_ahash_dups(),
        "image_resize": sql_image_resize(),
        "multimodal_fusion": sql_multimodal_fusion(),
        "neardup_clusters": sql_neardup_clusters(),
        "dbscan": sql_dbscan(),
        "idw": sql_idw(),
        "moran": sql_moran(),
        "seq_pack": sql_seq_pack(),
        "zonal_mode": sql_zonal_mode(),
        "hotspot": sql_hotspot(),
        "od_flows": sql_od_flows(),
        "staypoints": sql_staypoints(),
        "hilbert": sql_hilbert(),
        "bpe_pairs": sql_bpe_pairs(),
        "bpe_merges": sql_bpe_merges(),
        "travel_dist": sql_travel_dist(),
        "bearing_hist": sql_bearing_hist(),
        "dwell_move": sql_dwell_move(),
        "tfidf_top": sql_tfidf_top(),
        "sample_permille": sql_sample_permille(),
        "trend_cells": sql_trend_cells(),
        "scd2_intervals": sql_scd2_intervals(),
        "tile_checksum": sql_tile_checksum(),
        "geohash_census": sql_geohash_census(),
        "active_span": sql_active_span(),
        "snm_pairs": sql_snm_pairs(),
        "knn_confusion": sql_knn_confusion(),
        "trimmed_mean": sql_trimmed_mean(),
        "fof_count": sql_fof_count(),
        "semantic_dedup": sql_semantic_dedup(),
        "bpe_encode": sql_bpe_encode(),
        "spacetime_cube": sql_spacetime_cube(),
        "colocation": sql_colocation(),
        "headings": sql_headings(),
        "thin": sql_thin(),
        "densify": sql_densify(),
        "line_raster": sql_line_raster(),
        "map_match": sql_map_match(),
        "geohash": sql_geohash(),
        "pixel_hist": sql_pixel_hist(),
        "late_events": sql_late_events(),
        "moving_window": sql_moving_window(),
        "lm_score": sql_lm_score(),
        "kcore": sql_kcore(),
        "traj_hausdorff": sql_traj_hausdorff(),
        "mmr_select": sql_mmr_select(),
        "otsu": sql_otsu(),
        "morphology": sql_morphology(),
        "blobs": sql_blobs(),
        "hex_ring": sql_hex_ring(),
        "ripley_k": sql_ripley_k(),
        "sssp_hops": sql_sssp_hops(),
        "dist_raster": sql_dist_raster(),
        "fuzzy_decontam": sql_fuzzy_decontam(),
        "curriculum": sql_curriculum(),
        "centroids": sql_centroids(),
        "skyline": sql_skyline(),
        "windowed_topk": sql_windowed_topk(),
        "sinuosity": sql_sinuosity(),
        "zone_gini": sql_zone_gini(),
        "changepoint": sql_changepoint(),
        "glcm": sql_glcm(),
        "codec_sse": sql_codec_sse(),
        "dup_frames": sql_dup_frames(),
        "split_leakage_safe": sql_split_leakage_safe(),
        "audio_features": sql_audio_features(),
        "audio_windows": sql_audio_windows(),
        "asof_join": sql_asof_join(),
        "range_join": sql_range_join(),
        "chunk_docs": sql_chunk_docs(),
        "top_terms": sql_top_terms(),
        "json_extract": sql_json_extract(),
        "sequence_packing": sql_sequence_packing(),
        "window_sliding": sql_window_sliding(),
        "quantiles": sql_quantiles(),
        "quantiles_cont": sql_quantiles_cont(),
        "rank_ties": sql_rank_ties(),
        "outliers": sql_outliers(),
        "moments": sql_moments(),
        "semi_join": sql_semi_join(False),
        "anti_join": sql_semi_join(True),
        "bloom_semi": sql_bloom_semi(),
        "heavy_hitters": sql_heavy_hitters(),
        "transitions": sql_transitions(),
        "ntile": sql_ntile(),
        "pagerank": sql_pagerank(),
        "pivot": sql_pivot(),
        "unpivot": sql_unpivot(),
        "intersect_keys": sql_intersect_keys(),
        "except_keys": sql_except_keys(),
        "rollup": sql_rollup(),
        "repetition": sql_repetition(),
        "decontaminate": sql_decontaminate(),
        "pii_redact": sql_pii_redact(),
        "tile_pyramid": sql_tile_pyramid(),
        "radius_join": sql_radius_join(),
        "rect_join": sql_rect_join(),
        "tile_mosaic": sql_tile_mosaic(),
        "tile_sobel": sql_tile_sobel(),
        "dup_spans": sql_dup_spans(),
        "dup_span_runs": sql_dup_span_runs(),
        "mosaic_pyramid": sql_mosaic_pyramid(),
        "raster_blur": sql_raster_blur(),
        "dissolve": sql_dissolve(),
        "hard_negatives": sql_hard_negatives(),
        "hll_sketch": sql_hll_sketch(),
        "kmeans_embed": sql_kmeans_embed(),
        "inverted_index": sql_inverted_index(),
        "collocations": sql_collocations(),
        "fuzzy_join": sql_fuzzy_join(),
        "image_patches": sql_image_patches(),
        "rasterize": sql_rasterize(),
        "trajectories": sql_trajectories(),
        "vocab_coverage": sql_vocab_coverage(),
        "domain_cap": sql_domain_cap(),
        "mixture_quotas": sql_mixture_quotas(),
        "retention": sql_retention(),
        "funnel": sql_funnel(),
        "mixture_sample": sql_mixture_sample(),
        "cluster_dedup_sample": sql_cluster_dedup_sample(),
        "epoch_shuffle": sql_epoch_shuffle(),
        "slope_aspect": sql_slope_aspect(),
        "lbp": sql_lbp(),
        "median3x3": sql_median3x3(),
        "variogram": sql_variogram(),
        "time_split": sql_time_split(),
        "temperature_mix": sql_temperature_mix(),
        "saliency_crop": sql_saliency_crop(),
        "local_moran": sql_local_moran(),
        "adaptive_tiles": sql_adaptive_tiles(),
        "zone_overlay": sql_zone_overlay(),
        "contour_cells": sql_contour_cells(),
        "chaikin": sql_chaikin(),
        "visual_words": sql_visual_words(),
        "image_dhash": sql_image_dhash(),
        "len_histogram": sql_len_histogram(),
        "fertility": sql_fertility(),
        "k_anon": sql_k_anon(),
        "tile_edge_census": sql_tile_edge_census(),
        "audio_silence": sql_audio_silence(),
        "decay_counts": sql_decay_counts(),
        "od_gravity": sql_od_gravity(),
        "seam_cols": sql_seam_cols(),
        "interval_union": sql_interval_union(),
        "user_extent": sql_user_extent(),
        "degree_mix": sql_degree_mix(),
        "trend_fit": sql_trend_fit(),
        "history_ranges": sql_history_ranges(),
        "link_negatives": sql_link_negatives(),
        "inversions": sql_inversions(),
        "revisits": sql_revisits(),
        "modal_corr": sql_modal_corr(),
        "lang_confusion": sql_lang_confusion(),
        "source_overlap": sql_source_overlap(),
        "near_dup_rate": sql_near_dup_rate(),
        "hist_equalize": sql_hist_equalize(),
        "box5": sql_box5(),
        "crossmodal_recall": sql_crossmodal_recall(),
        "first_last_touch": sql_first_last_touch(),
        "burstiness": sql_burstiness(),
        "char_simpson": sql_char_simpson(),
        "fence_dwell": sql_fence_dwell(),
        "vocab_tail": sql_vocab_tail(),
        "cell_turnover": sql_cell_turnover(),
        "weekend_lift": sql_weekend_lift(),
        "pyramid_anomaly": sql_pyramid_anomaly(),
        "covisit_tiles": sql_covisit_tiles(),
        "letterbox": sql_letterbox(),
        "radial_profile": sql_radial_profile(),
        "quadrant_balance": sql_quadrant_balance(),
        "script_census": sql_script_census(),
        "prefix_dups": sql_prefix_dups(),
        "dim_census": sql_dim_census(),
        "benford": sql_benford(),
        "gap_histogram": sql_gap_histogram(),
        "user_cell_share": sql_user_cell_share(),
        "tile_distinct_users": sql_tile_distinct_users(),
        "video_cuts": sql_video_cuts(),
        "source_ttr": sql_source_ttr(),
        "dow_profile": sql_dow_profile(),
        "occupancy_curve": sql_occupancy_curve(),
        "active_days": sql_active_days(),
        "word_len_hist": sql_word_len_hist(),
        "child_occupancy": sql_child_occupancy(),
        "phash_bits": sql_phash_bits(),
        "caption_len_by_dims": sql_caption_len_by_dims(),
        "tile_type_diversity": sql_tile_type_diversity(),
    }


def sql_late_events() -> str:
    """Twin of queries.q_late_events: running event-time max over the
    synthetic bounded-disorder arrival order (ROWS window up to the
    previous arrival), same jitter constants."""
    from osmquadtreepostgis_ray.queries import LATE_DELAY_US, LATE_THRESH_US
    arr = (f"epoch_us(ts) + (event_id * {geotag.PHASH_MULT} + 7) "
           f"% {LATE_DELAY_US}")
    return f"""
    WITH x AS (
        SELECT event_id, user_id, epoch_us(ts) AS tu,
               max(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY {arr}, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
        FROM events)
    SELECT event_id, user_id, (mx - tu)::BIGINT AS late_by_us
    FROM x WHERE mx - tu > {LATE_THRESH_US}
    """


def sql_moving_window() -> str:
    """Twin of queries.q_moving_window: 3-row ROWS-frame sum/count of
    value cents per user in (ts, event_id) order."""
    return """
    WITH x AS (
        SELECT event_id, user_id, epoch_us(ts) AS tu,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
    SELECT event_id,
           CAST(sum(cents) OVER w AS BIGINT) AS w3_sum_cents,
           CAST(count(*) OVER w AS BIGINT) AS w3_n
    FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """


def sql_lm_score() -> str:
    """Twin of queries.q_lm_score: corpus bigram counts by STRING (the
    Ray side keys by 64-bit gram hash — the same collision-freedom the
    repetition/decontamination twins already lean on), per-doc mass =
    sum of corpus counts over the doc's adjacent pairs."""
    return f"""
    WITH {_word_tokens_cte()},
    bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS g
           FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.j = a.j + 1),
    bc AS (SELECT g, count(*)::BIGINT AS c FROM bg GROUP BY g),
    per AS (SELECT bg.doc_id, count(*)::BIGINT AS n_pairs,
                   sum(bc.c)::BIGINT AS mass
            FROM bg JOIN bc USING (g) GROUP BY bg.doc_id)
    SELECT d.doc_id,
           coalesce(per.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
           coalesce(per.mass, CAST(0 AS BIGINT)) AS mass,
           CASE WHEN coalesce(per.n_pairs, 0) > 0
                THEN (100 * per.mass) // per.n_pairs
                ELSE CAST(0 AS BIGINT) END AS score_centi
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


def sql_kcore() -> str:
    """Twin of queries.q_kcore: the peel unrolled to the SAME
    KCORE_ROUNDS bound the Ray kernel asserts convergence within
    (chained CTEs, one per round — the unrolled-Lloyd pattern)."""
    from osmquadtreepostgis_ray.queries import KCORE_K, KCORE_ROUNDS
    rounds = []
    for i in range(KCORE_ROUNDS):
        rounds.append(f"""
    d{i} AS (SELECT es.u AS v, count(*)::BIGINT AS deg
             FROM es JOIN a{i} x ON es.u = x.v JOIN a{i} y ON es.v = y.v
             GROUP BY es.u),
    a{i + 1} AS (SELECT v FROM d{i} WHERE deg >= {KCORE_K})""")
    last = KCORE_ROUNDS - 1
    return f"""
    WITH e0 AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 1 AND doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id - 2, doc_id FROM documents
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    es AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
    a0 AS (SELECT DISTINCT u AS v FROM es),{','.join(rounds)}
    SELECT v AS node, deg FROM d{last} WHERE deg >= {KCORE_K}
    """


def sql_traj_hausdorff() -> str:
    """Twin of queries.q_traj_hausdorff: nested MAX(MIN(d2)) aggregation
    over the sampled-user point cross join."""
    from osmquadtreepostgis_ray.queries import TRAJ_MOD
    return f"""
    WITH {events_geo_cte()},
    pts AS (
        SELECT user_id, event_id, lon_milli AS x, lat_milli AS y
        FROM ev WHERE user_id % {TRAJ_MOD} = 0
    ),
    mind AS (
        SELECT a.user_id AS ua, b.user_id AS ub, a.event_id,
               min((a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y)) AS md
        FROM pts a JOIN pts b ON b.user_id <> a.user_id
        GROUP BY 1, 2, 3
    )
    SELECT ua, ub, max(md)::BIGINT AS h2 FROM mind GROUP BY ua, ub
    """


def sql_mmr_select() -> str:
    """Twin of queries.q_mmr_select: the greedy MMR unrolled to MMR_K
    single-row selection CTEs (relevance d2q minus min distance to the
    selected prefix, tie to the smallest vec_id), same floor-1024
    quantization as the kmeans/PQ family."""
    from osmquadtreepostgis_ray.queries import MMR_K, MMR_QID
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    vexpr = ("list_transform(embedding, "
             f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
             f" + {KM_SHIFT})")
    ctes = [
        f"qv AS (SELECT vec_id, {vexpr} AS v FROM embeddings)",
        "e AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM qv)",
        f"qe AS (SELECT i, x FROM e WHERE vec_id = {MMR_QID})",
        ("dq AS (SELECT e.vec_id, CAST(sum((e.x - qe.x) * (e.x - qe.x)) "
         "AS BIGINT) AS d2q FROM e JOIN qe USING (i) GROUP BY e.vec_id)"),
        (f"sel1 AS (SELECT vec_id FROM dq WHERE vec_id <> {MMR_QID} "
         f"ORDER BY d2q, vec_id LIMIT 1)"),
        "selU1 AS (SELECT vec_id FROM sel1)",
    ]
    for t in range(2, MMR_K + 1):
        ctes.append(
            f"p{t} AS (SELECT e1.vec_id AS v, e2.vec_id AS s, "
            f"CAST(sum((e1.x - e2.x) * (e1.x - e2.x)) AS BIGINT) AS d2 "
            f"FROM e e1 JOIN e e2 USING (i) "
            f"WHERE e2.vec_id IN (SELECT vec_id FROM selU{t - 1}) "
            f"GROUP BY 1, 2)")
        ctes.append(f"m{t} AS (SELECT v AS vec_id, min(d2) AS mind "
                    f"FROM p{t} GROUP BY v)")
        ctes.append(
            f"sel{t} AS (SELECT dq.vec_id FROM dq JOIN m{t} USING (vec_id) "
            f"WHERE dq.vec_id <> {MMR_QID} "
            f"AND dq.vec_id NOT IN (SELECT vec_id FROM selU{t - 1}) "
            f"ORDER BY dq.d2q - m{t}.mind, dq.vec_id LIMIT 1)")
        ctes.append(f"selU{t} AS (SELECT vec_id FROM selU{t - 1} "
                    f"UNION ALL SELECT vec_id FROM sel{t})")
    finals = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS step, vec_id FROM sel{t}"
        for t in range(1, MMR_K + 1))
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


def sql_otsu() -> str:
    """Twin of queries.q_otsu: 16-bin histogram per image, between-class
    score fl(A^2)/(n0*n1) with A exact in BIGINT — identical int64 ->
    double rounding and one identical division on both engines, ties to
    the smallest threshold (see stages/images.otsu_batch)."""
    return f"""{_sql_decoded_pixels()},
    hist AS (
        SELECT image_id, p // 16 AS b, count(*)::BIGINT AS n
        FROM dec GROUP BY 1, 2
    ),
    tot AS (SELECT image_id, sum(n)::BIGINT AS npx,
                   sum(n * b)::BIGINT AS s FROM hist GROUP BY 1),
    th AS (SELECT unnest(range(0, 15)) AS t),
    agg AS (
        SELECT h.image_id, th.t, sum(h.n)::BIGINT AS n0,
               sum(h.n * h.b)::BIGINT AS s0
        FROM hist h JOIN th ON h.b <= th.t
        GROUP BY 1, 2
    ),
    sc AS (
        SELECT a.image_id, a.t, a.n0, (tot.npx - a.n0) AS n1,
               (a.s0 * (tot.npx - a.n0) - (tot.s - a.s0) * a.n0) AS a2
        FROM agg a JOIN tot USING (image_id)
        WHERE a.n0 > 0 AND (tot.npx - a.n0) > 0
    ),
    best AS (
        SELECT image_id, t, n1,
               row_number() OVER (PARTITION BY image_id
                   ORDER BY CAST(a2 * a2 AS DOUBLE)
                            / CAST(n0 * n1 AS DOUBLE) DESC, t) AS rk
        FROM sc
    )
    SELECT i.image_id, coalesce(b.t, CAST(-1 AS BIGINT)) AS otsu_bin,
           coalesce(b.n1, CAST(0 AS BIGINT)) AS fg_n
    FROM img i LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (image_id)
    """


def sql_morphology() -> str:
    """Twin of queries.q_morphology: 3x3 erosion (interior, full window)
    and dilation (clipped window) counts on the p >= 128 mask, via an
    equi-join on explicit neighbor offsets (no range self-join)."""
    return f"""{_sql_decoded_pixels()},
    m AS (
        SELECT image_id, w, h, idx // w AS r, idx % w AS c,
               CASE WHEN p >= 128 THEN 1 ELSE 0 END AS b
        FROM dec
    ),
    off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                                  (1,-1),(1,0),(1,1)) AS o(dr, dc)),
    nbr AS (
        SELECT a.image_id, a.r, a.c, a.h, a.w,
               min(nb.b) AS mn, max(nb.b) AS mx
        FROM m a CROSS JOIN off o
        JOIN m nb ON nb.image_id = a.image_id
                 AND nb.r = a.r + o.dr AND nb.c = a.c + o.dc
        GROUP BY 1, 2, 3, 4, 5
    ),
    ec AS (SELECT image_id, count(*)::BIGINT AS n FROM nbr
           WHERE mn = 1 AND r >= 1 AND r <= h - 2
             AND c >= 1 AND c <= w - 2 GROUP BY 1),
    dc AS (SELECT image_id, count(*)::BIGINT AS n FROM nbr
           WHERE mx = 1 GROUP BY 1)
    SELECT i.image_id, coalesce(ec.n, CAST(0 AS BIGINT)) AS eroded_n,
           coalesce(dc.n, CAST(0 AS BIGINT)) AS dilated_n
    FROM img i LEFT JOIN ec USING (image_id) LEFT JOIN dc USING (image_id)
    """


def sql_blobs() -> str:
    """Twin of queries.q_blobs: 4-connected min-label propagation on the
    p >= BLOB_FG mask, unrolled to exactly BLOB_ROUNDS Jacobi rounds —
    the Ray kernel RAISES if it hasn't converged by then, so both
    engines always compare the same fixpoint."""
    from osmquadtreepostgis_ray.stages.images import BLOB_FG, BLOB_ROUNDS
    rounds = []
    prev = "mk"
    for i in range(1, BLOB_ROUNDS + 1):
        # MATERIALIZED: each round is referenced twice (a and b) — an
        # inlined chain doubles the plan per round (2^96 scans)
        rounds.append(
            f"r{i} AS MATERIALIZED (SELECT a.image_id, a.r, a.c, "
            f"least(a.lb, coalesce(min(b.lb), a.lb)) AS lb "
            f"FROM r{i - 1 if i > 1 else ''} a CROSS JOIN off o "
            f"LEFT JOIN {prev} b ON b.image_id = a.image_id "
            f"AND b.r = a.r + o.dr AND b.c = a.c + o.dc "
            f"GROUP BY a.image_id, a.r, a.c, a.lb)")
        prev = f"r{i}"
    # first round reads from mk, later rounds from r{i-1}
    rounds[0] = rounds[0].replace("FROM r a", "FROM mk a")
    return f"""{_sql_decoded_pixels()},
    mk AS (SELECT image_id, idx // w AS r, idx % w AS c, idx AS lb
           FROM dec WHERE p >= {BLOB_FG}),
    off AS (SELECT * FROM (VALUES (-1, 0), (1, 0), (0, -1), (0, 1))
            AS o(dr, dc)),
    {','.join(rounds)},
    comp AS (SELECT image_id, lb, count(*)::BIGINT AS sz
             FROM r{BLOB_ROUNDS} GROUP BY 1, 2),
    stats AS (SELECT image_id, count(*)::BIGINT AS n_blobs,
                     max(sz)::BIGINT AS max_blob, sum(sz)::BIGINT AS fg_n
              FROM comp GROUP BY 1)
    SELECT i.image_id, coalesce(s.n_blobs, CAST(0 AS BIGINT)) AS n_blobs,
           coalesce(s.max_blob, CAST(0 AS BIGINT)) AS max_blob,
           coalesce(s.fg_n, CAST(0 AS BIGINT)) AS fg_n
    FROM img i LEFT JOIN stats s USING (image_id)
    """


def sql_hex_ring() -> str:
    """Twin of queries.q_hex_ring: the hex_bin aggregate scattered to
    its ring-1 neighborhood (parity-dependent odd-r offsets, lattice
    bounds), re-aggregated per receiving cell."""
    from osmquadtreepostgis_ray.queries import HEX_NCOLS, HEXRING_OFF
    offs = ", ".join(f"({par}, {di}, {dj})"
                     for par, lst in HEXRING_OFF.items()
                     for di, dj in lst)
    return f"""
    WITH hx AS ({sql_hex_bin()}),
    d AS (SELECT hex_id, n, hex_id // {HEX_NCOLS} AS j,
                 hex_id % {HEX_NCOLS} AS i FROM hx),
    off AS (SELECT * FROM (VALUES {offs}) AS o(par, di, dj)),
    sc AS (
        SELECT (d.j + o.dj) * {HEX_NCOLS} + (d.i + o.di) AS hex_id, d.n
        FROM d JOIN off o ON o.par = d.j % 2
        WHERE d.i + o.di >= 0 AND d.i + o.di < {HEX_NCOLS}
          AND d.j + o.dj >= 0
    )
    SELECT hex_id, sum(n)::BIGINT AS sm_n FROM sc GROUP BY 1
    """


def sql_ripley_k() -> str:
    """Twin of queries.q_ripley_k: brute ordered-pair counts per radius
    over the RIPLEY_MOD-sampled event geotags."""
    from osmquadtreepostgis_ray.queries import RIPLEY_MOD, RIPLEY_R
    radii = ", ".join(f"({r})" for r in RIPLEY_R)
    return f"""
    WITH {events_geo_cte()},
    pts AS (
        SELECT event_id, lon_milli AS x, lat_milli AS y
        FROM ev WHERE user_id % {RIPLEY_MOD} = 0
    ),
    rad AS (SELECT * FROM (VALUES {radii}) AS r(r))
    SELECT CAST(rad.r AS BIGINT) AS r, count(*)::BIGINT AS n_pairs
    FROM pts a JOIN pts b ON b.event_id <> a.event_id
    CROSS JOIN rad
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= CAST(rad.r AS BIGINT) * rad.r
    GROUP BY 1
    """


def sql_sssp_hops() -> str:
    """Twin of queries.q_sssp_hops: multi-source BFS unrolled to the
    SAME SSSP_ROUNDS bound the Ray kernel asserts convergence within.
    MATERIALIZED rounds — each is referenced twice (self + neighbor)."""
    from osmquadtreepostgis_ray.queries import SSSP_ROUNDS, SSSP_SRC_MOD
    INF = 1 << 40
    rounds = []
    for i in range(1, SSSP_ROUNDS + 1):
        prev = f"r{i - 1}" if i > 1 else "d0"
        rounds.append(
            f"r{i} AS MATERIALIZED (SELECT a.v, "
            f"least(a.d, coalesce(min(nb.d + 1), a.d)) AS d "
            f"FROM {prev} a LEFT JOIN es e ON e.v = a.v "
            f"LEFT JOIN {prev} nb ON nb.v = e.u "
            f"GROUP BY a.v, a.d)")
    return f"""
    WITH e0 AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 1 AND doc_id % 5 <> 0
        UNION ALL
        SELECT doc_id - 2, doc_id FROM documents
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    es AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0),
    d0 AS MATERIALIZED (
        SELECT DISTINCT u AS v,
               CASE WHEN u % {SSSP_SRC_MOD} = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST({INF} AS BIGINT) END AS d
        FROM es),
    {','.join(rounds)}
    SELECT v AS node, d AS dist FROM r{SSSP_ROUNDS} WHERE d < {INF}
    """


def sql_dist_raster() -> str:
    """Twin of queries.q_dist_raster: min Manhattan distance from every
    grid cell to the line_raster road-cell set (closed form — on an
    obstacle-free grid 4-neighbor BFS distance IS min-L1)."""
    from osmquadtreepostgis_ray.queries import RASTER_N
    return f"""
    WITH lr AS ({sql_line_raster()}),
    gx AS (SELECT unnest(range(0, {RASTER_N})) AS cx),
    gy AS (SELECT unnest(range(0, {RASTER_N})) AS cy),
    grid AS (SELECT cx, cy FROM gx CROSS JOIN gy)
    SELECT g.cx, g.cy,
           min(abs(g.cx - r.cx) + abs(g.cy - r.cy))::BIGINT AS dist
    FROM grid g CROSS JOIN lr r
    GROUP BY 1, 2
    """


def sql_fuzzy_decontam() -> str:
    """Twin of queries.q_fuzzy_decontam: best-Jaccard benchmark match
    per corpus doc with any shared 3-gram — double-division ordering
    (identical int64 -> double rounding both engines, bench_id tie),
    exact-integer flag."""
    from osmquadtreepostgis_ray.queries import FDECON_DEN, FDECON_NUM
    return f"""
    WITH {_word_tokens_cte()},
    tg AS (SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
           FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.j = a.j + 1
                    JOIN t c ON a.doc_id = c.doc_id AND c.j = a.j + 2),
    cg AS (SELECT DISTINCT doc_id, g FROM tg WHERE doc_id % 50 <> 0),
    bg AS (SELECT DISTINCT doc_id AS bench_id, g FROM tg
           WHERE doc_id % 50 = 0),
    cs AS (SELECT doc_id, count(*)::BIGINT AS nc FROM cg GROUP BY 1),
    bs AS (SELECT bench_id, count(*)::BIGINT AS nb FROM bg GROUP BY 1),
    it AS (SELECT c.doc_id, b.bench_id, count(*)::BIGINT AS inter_n
           FROM cg c JOIN bg b USING (g) GROUP BY 1, 2),
    ju AS (SELECT it.doc_id, it.bench_id, it.inter_n,
                  cs.nc + bs.nb - it.inter_n AS union_n
           FROM it JOIN cs USING (doc_id) JOIN bs USING (bench_id)),
    rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(inter_n AS DOUBLE) / union_n DESC, bench_id)
               AS rn
           FROM ju)
    SELECT doc_id, bench_id, inter_n, union_n,
           (CASE WHEN {FDECON_DEN} * inter_n >= {FDECON_NUM} * union_n
                 THEN 1 ELSE 0 END)::BIGINT AS flagged
    FROM rk WHERE rn = 1
    """


def sql_curriculum() -> str:
    """Twin of queries.q_curriculum: token-count difficulty buckets,
    round-robin interleaved global position."""
    from osmquadtreepostgis_ray.queries import CURR_EASY, CURR_MED
    return f"""
    WITH d AS (SELECT doc_id,
                      CASE WHEN {_NTOK} < {CURR_EASY} THEN 0
                           WHEN {_NTOK} < {CURR_MED} THEN 1
                           ELSE 2 END AS bucket
               FROM documents),
    r AS (SELECT doc_id, bucket,
                 row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                 - 1 AS rn
          FROM d)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(3 * rn + bucket AS BIGINT) AS pos
    FROM r
    """


def sql_centroids() -> str:
    """Twin of queries.q_centroids: SIGNED shoelace + 6A-scaled centroid
    numerators over the pseq ring order (no abs, no division — both
    engines traverse ascending pseq, so orientation matches)."""
    return f"""
    WITH {assembly_members_cte()},
    e AS (
        SELECT a.group_id, a.part,
               sum(a.x * b.y - b.x * a.y) AS a2,
               sum((a.x + b.x) * (a.x * b.y - b.x * a.y)) AS cxn,
               sum((a.y + b.y) * (a.x * b.y - b.x * a.y)) AS cyn
        FROM p a JOIN p b ON b.group_id = a.group_id AND b.part = a.part
                          AND b.pseq = (a.pseq + 1) % a.psize
        WHERE a.closed AND NOT (a.k >= 6 AND a.group_id % 2 = 0)
        GROUP BY 1, 2
    )
    SELECT -group_id AS osm_id, CAST(part AS BIGINT) AS part,
           a2::BIGINT AS a2, cxn::BIGINT AS cxn, cyn::BIGINT AS cyn
    FROM e
    """


def sql_skyline() -> str:
    """Twin of queries.q_skyline: NOT EXISTS dominance anti-join on
    maximize-(n_tokens, stop_permille)."""
    stop = " + ".join(count_word_sql("text", w)
                      for w in ("the", "a", "of", "and"))
    sp = f"(CASE WHEN {_NTOK} > 0 THEN (1000 * ({stop})) // {_NTOK} ELSE 0 END)"
    return f"""
    WITH d AS (SELECT doc_id, {_NTOK}::BIGINT AS nt, {sp}::BIGINT AS sp
               FROM documents)
    SELECT a.doc_id, a.nt AS n_tokens, a.sp AS stop_permille
    FROM d a
    WHERE NOT EXISTS (
        SELECT 1 FROM d b
        WHERE b.nt >= a.nt AND b.sp >= a.sp
          AND (b.nt > a.nt OR b.sp > a.sp))
    """


def sql_windowed_topk() -> str:
    """Twin of queries.q_windowed_topk: per-hour top-k event types,
    count-desc / type-asc ties."""
    from osmquadtreepostgis_ray.queries import WTOPK_K
    return f"""
    WITH c AS (
        SELECT (epoch_us(ts) // 3600000000)::BIGINT AS hour, event_type,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY hour
              ORDER BY n DESC, event_type) AS rank FROM c)
    SELECT hour, event_type, n, rank::BIGINT AS rank
    FROM r WHERE rank <= {WTOPK_K}
    """


def sql_sinuosity() -> str:
    """Twin of queries.q_sinuosity: L1 path over consecutive seq plus
    L1 endpoint chord for open way groups."""
    return f"""
    WITH {assembly_members_cte()},
    lg AS (SELECT DISTINCT group_id, k FROM p WHERE k >= 2),
    pth AS (
        SELECT a.group_id,
               sum(abs(b.x - a.x) + abs(b.y - a.y)) AS path_l1
        FROM p a
        JOIN p b ON b.group_id = a.group_id AND b.seq = a.seq + 1
        JOIN lg ON lg.group_id = a.group_id
        GROUP BY a.group_id
    ),
    ch AS (
        SELECT f.group_id, abs(l.x - f.x) + abs(l.y - f.y) AS chord_l1
        FROM lg
        JOIN p f ON f.group_id = lg.group_id AND f.seq = 0
        JOIN p l ON l.group_id = lg.group_id AND l.seq = lg.k - 1
    )
    SELECT lg.group_id AS gid, pth.path_l1::BIGINT AS path_l1,
           ch.chord_l1::BIGINT AS chord_l1
    FROM lg
    JOIN pth ON pth.group_id = lg.group_id
    JOIN ch ON ch.group_id = lg.group_id
    """


def sql_zone_gini() -> str:
    """Twin of queries.q_zone_gini: the sorted-rank Gini numerator
    Σ(2·rn − n − 1)·c per zone (tie order cancels in the sum)."""
    return f"""
    WITH j AS (
        SELECT p.zone_id, p.kind, CAST(round(e.value * 100) AS BIGINT) AS c
        FROM ({sql_pip_zones()}) p JOIN events e USING (event_id)
    ),
    w AS (SELECT zone_id, kind, c,
                 row_number() OVER (PARTITION BY zone_id, kind
                                    ORDER BY c) AS rn,
                 count(*) OVER (PARTITION BY zone_id, kind) AS n
          FROM j)
    SELECT zone_id, kind, max(n)::BIGINT AS n, sum(c)::BIGINT AS sum_cents,
           sum((2 * rn - n - 1) * c)::BIGINT AS gini2
    FROM w GROUP BY zone_id, kind
    """


def sql_changepoint() -> str:
    """Twin of queries.q_changepoint: per-user max |n·S_i − i·S_n| over
    positions 1..n-1 in (ts, event_id) order, ties to smallest i."""
    return """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
                      CAST(round(value * 100) AS BIGINT) AS c
               FROM events),
    w AS (SELECT user_id,
                 row_number() OVER (PARTITION BY user_id
                     ORDER BY tsu, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 sum(c) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
                 sum(c) OVER (PARTITION BY user_id) AS stot
          FROM e),
    d AS (SELECT user_id, i AS pos, abs(n * s - i * stot) AS dev
          FROM w WHERE i < n),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id
              ORDER BY dev DESC, pos) AS rk FROM d)
    SELECT user_id, pos::BIGINT AS pos, dev::BIGINT AS dev
    FROM r WHERE rk = 1
    """


def sql_blockiness() -> str:
    """Twin of queries.q_blockiness (stages/images.blockiness_stats):
    horizontal + vertical neighbor-pair |diff| via two idx self-joins
    over the decoded-pixel CTE, split on 8-aligned boundary pairs.
    Both milli divisions have non-negative operands and the subtraction
    happens after each floor division — DuckDB trunc == numpy floor."""
    from osmquadtreepostgis_ray.stages.images import BLOCKY_SCORE_MILLI
    return f"""{_sql_decoded_pixels()},
    pr AS (
        SELECT d1.image_id, abs(d1.p - d2.p) AS df,
               ((d1.idx % d1.w) % 8 = 7) AS bnd
        FROM dec d1 JOIN dec d2
          ON d1.doc_id = d2.doc_id AND d2.idx = d1.idx + 1
        WHERE d1.idx % d1.w < d1.w - 1
        UNION ALL
        SELECT d1.image_id, abs(d1.p - d2.p),
               ((d1.idx // d1.w) % 8 = 7)
        FROM dec d1 JOIN dec d2
          ON d1.doc_id = d2.doc_id AND d2.idx = d1.idx + d1.w
        WHERE d1.idx // d1.w < d1.h - 1
    ),
    s AS (
        SELECT image_id,
               CAST(sum(df) FILTER (bnd) AS BIGINT) AS b_sum,
               CAST(count(*) FILTER (bnd) AS BIGINT) AS b_cnt,
               CAST(sum(df) FILTER (NOT bnd) AS BIGINT) AS i_sum,
               CAST(count(*) FILTER (NOT bnd) AS BIGINT) AS i_cnt
        FROM pr GROUP BY image_id
    )
    SELECT image_id, b_sum, b_cnt, i_sum, i_cnt,
           (b_sum * 1000 // b_cnt - i_sum * 1000 // i_cnt)::BIGINT
               AS score_milli,
           b_sum * 1000 // b_cnt - i_sum * 1000 // i_cnt
               >= {BLOCKY_SCORE_MILLI} AS is_blocky
    FROM s"""


def sql_grad_orient() -> str:
    """Twin of queries.q_grad_orient (stages/images.grad_orient_stats):
    central-difference gx, gy as a 4-offset contribution join (the
    sql_image_blur pattern, with per-offset kx/ky coefficients), octant
    code as pure boolean arithmetic — no atan2 on either side."""
    return f"""{_sql_decoded_pixels()},
    off AS (
        SELECT * FROM (VALUES (0, 1, 1, 0), (0, -1, -1, 0),
                              (1, 0, 0, 1), (-1, 0, 0, -1))
            o(dy, dx, kx, ky)
    ),
    g AS (
        SELECT d.image_id, d.w, d.h,
               (d.idx // d.w) - o.dy AS cy, (d.idx % d.w) - o.dx AS cx,
               sum(o.kx * d.p) AS gx, sum(o.ky * d.p) AS gy
        FROM dec d, off o
        GROUP BY d.image_id, d.w, d.h, cy, cx
    ),
    i AS (
        SELECT image_id,
               CASE WHEN gx = 0 AND gy = 0 THEN 8
                    ELSE CAST(gx > 0 AS INT) + 2 * CAST(gy > 0 AS INT)
                         + 4 * CAST(abs(gx) >= abs(gy) AS INT) END AS code
        FROM g
        WHERE cy >= 1 AND cy <= h - 2 AND cx >= 1 AND cx <= w - 2
    )
    SELECT image_id,
           CAST(count(*) FILTER (code = 0) AS BIGINT) AS o0,
           CAST(count(*) FILTER (code = 1) AS BIGINT) AS o1,
           CAST(count(*) FILTER (code = 2) AS BIGINT) AS o2,
           CAST(count(*) FILTER (code = 3) AS BIGINT) AS o3,
           CAST(count(*) FILTER (code = 4) AS BIGINT) AS o4,
           CAST(count(*) FILTER (code = 5) AS BIGINT) AS o5,
           CAST(count(*) FILTER (code = 6) AS BIGINT) AS o6,
           CAST(count(*) FILTER (code = 7) AS BIGINT) AS o7,
           CAST(count(*) FILTER (code = 8) AS BIGINT) AS flat,
           CAST(count(*) AS BIGINT) AS n_int
    FROM i GROUP BY image_id"""


def sql_kmv_sketch(k: int = 32) -> str:
    """Twin of queries.q_kmv_sketch: splitmix64 in HUGEINT mod 2^64
    (sketch.splitmix_sql_ctes), kh = h mod 2^63 (top bit dropped —
    same transform, same ordering), k smallest DISTINCT per type via
    row_number."""
    from osmquadtreepostgis_ray.functions.sketch import splitmix_sql_ctes
    ctes, last = splitmix_sql_ctes("events", "user_id", _mulmod64,
                                   carry="event_type")
    return f"""
    WITH {ctes.lstrip()},
    d AS (SELECT DISTINCT event_type,
                 CAST(h % {1 << 63} AS BIGINT) AS kh FROM {last}),
    r AS (SELECT event_type, kh, row_number() OVER (
              PARTITION BY event_type ORDER BY kh) AS rnk FROM d)
    SELECT event_type, CAST(rnk AS BIGINT) AS rnk, kh
    FROM r WHERE rnk <= {k}"""


def sql_link_jaccard() -> str:
    """Twin of queries.q_link_jaccard: same chain+closure edge set as
    sql_triangles, undirected neighbor table, common-neighbor pairs via
    the shared-center self-join, NOT EXISTS edge filter, exact milli
    Jaccard (non-negative floor division both sides)."""
    return """
    WITH docs AS (SELECT doc_id FROM documents),
    e AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM docs WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id - 2, doc_id FROM docs
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    u AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, count(*)::BIGINT AS deg FROM u GROUP BY u),
    w AS (
        SELECT u1.v AS v1, u2.v AS v2, count(*)::BIGINT AS common
        FROM u u1 JOIN u u2 ON u1.u = u2.u AND u1.v < u2.v
        GROUP BY 1, 2
    ),
    nw AS (
        SELECT w.* FROM w
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.a = w.v1 AND e.b = w.v2)
    )
    SELECT v1, v2, common, d1.deg AS deg1, d2.deg AS deg2,
           (common * 1000 // (d1.deg + d2.deg - common))::BIGINT
               AS jaccard_milli
    FROM nw JOIN deg d1 ON d1.u = nw.v1 JOIN deg d2 ON d2.u = nw.v2
    """


def sql_flow_accum() -> str:
    """Twin of queries.q_flow_accum: global-pixel counts (the
    sql_raster_blur r CTE), steepest-descent D8 target via
    row_number over (nv, v), recursive path table (terminates because
    counts strictly decrease along flow edges), acc = path visits."""
    lon, lat = geotag.event_lonlat_milli_sql()
    G = 1 << CELL_DEPTH
    ix = f"((({lon}) * 10000 * {G}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {G}) // {quadtree.LAT_SPAN})"
    return f"""
    WITH RECURSIVE r AS (
        SELECT {ix} AS gx, {iy} AS gy, count(*) AS n
        FROM events GROUP BY gx, gy
    ),
    c AS (SELECT gy * {G} + gx AS id, gx, gy, n FROM r),
    o AS (SELECT * FROM (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
                                (0, 1), (1, -1), (1, 0), (1, 1)) t(dy, dx)),
    cand AS (
        SELECT a.id AS u, a.n AS nu, b.id AS v, b.n AS nv
        FROM c a, o JOIN c b
          ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
    ),
    fl AS (
        SELECT u, v, row_number() OVER (PARTITION BY u
                   ORDER BY nv, v) AS rk
        FROM cand WHERE nv < nu
    ),
    f AS (SELECT u, v FROM fl WHERE rk = 1),
    p AS (
        SELECT id AS u, id AS reach FROM c
        UNION ALL
        SELECT p.u, f.v FROM p JOIN f ON f.u = p.reach
    ),
    a AS (SELECT reach AS id, count(*) AS acc FROM p GROUP BY reach)
    SELECT c.id, c.n::BIGINT AS n,
           coalesce(f.v, c.id)::BIGINT AS tgt,
           a.acc::BIGINT AS acc,
           f.u IS NULL AS is_sink
    FROM c JOIN a ON a.id = c.id LEFT JOIN f ON f.u = c.id"""


def sql_slope_aspect() -> str:
    """Twin of queries.q_slope_aspect: global-pixel counts (the
    sql_raster_blur r CTE), four LEFT self-joins for the cardinal
    neighbors (absent = 0 via coalesce), pure-integer 4-way aspect.
    The -1 flat sentinel is cast to BIGINT (the CLAUDE.md INT32-literal
    comparator hazard)."""
    lon, lat = geotag.event_lonlat_milli_sql()
    G = 1 << CELL_DEPTH
    ix = f"((({lon}) * 10000 * {G}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {G}) // {quadtree.LAT_SPAN})"
    return f"""
    WITH r AS (
        SELECT {ix} AS gx, {iy} AS gy, count(*) AS n
        FROM events GROUP BY gx, gy
    ),
    g AS (
        SELECT r.gx, r.gy, r.n,
               coalesce(e.n, 0) - coalesce(w.n, 0) AS dzdx,
               coalesce(nn.n, 0) - coalesce(ss.n, 0) AS dzdy
        FROM r
        LEFT JOIN r e  ON e.gx  = r.gx + 1 AND e.gy  = r.gy
        LEFT JOIN r w  ON w.gx  = r.gx - 1 AND w.gy  = r.gy
        LEFT JOIN r nn ON nn.gx = r.gx     AND nn.gy = r.gy + 1
        LEFT JOIN r ss ON ss.gx = r.gx     AND ss.gy = r.gy - 1
    )
    SELECT gx::BIGINT AS gx, gy::BIGINT AS gy, n::BIGINT AS n,
           dzdx::BIGINT AS dzdx, dzdy::BIGINT AS dzdy,
           (dzdx * dzdx + dzdy * dzdy)::BIGINT AS slope2,
           CAST(CASE WHEN dzdx = 0 AND dzdy = 0 THEN -1
                     WHEN abs(dzdx) >= abs(dzdy)
                          THEN CASE WHEN dzdx > 0 THEN 0 ELSE 2 END
                     ELSE CASE WHEN dzdy > 0 THEN 1 ELSE 3 END
                END AS BIGINT) AS aspect
    FROM g"""


def sql_lbp() -> str:
    """Twin of queries.q_lbp (stages/images.lbp_partial): the decoded
    16x16 thumbnails' interior pixels, 8-neighbor >=-center indicator
    sum per center (== the LBP code's popcount), histogrammed per
    image."""
    from osmquadtreepostgis_ray.stages.images import LBP_DIM
    D = LBP_DIM
    return f"""{_sql_decoded_pixels()},
    ctr AS (
        SELECT image_id, idx // w AS y, idx % w AS x, p
        FROM dec WHERE w = {D} AND h = {D}
    ),
    off AS (
        SELECT * FROM (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
                              (0, 1), (1, -1), (1, 0), (1, 1)) o(dy, dx)
    ),
    code AS (
        SELECT c.image_id, c.y, c.x,
               sum(CASE WHEN nb.p >= c.p THEN 1 ELSE 0 END) AS ones
        FROM ctr c
        JOIN off o ON TRUE
        JOIN ctr nb ON nb.image_id = c.image_id
                   AND nb.y = c.y + o.dy AND nb.x = c.x + o.dx
        WHERE c.y BETWEEN 1 AND {D - 2} AND c.x BETWEEN 1 AND {D - 2}
        GROUP BY c.image_id, c.y, c.x
    )
    SELECT image_id, ones::BIGINT AS ones, count(*)::BIGINT AS n_px
    FROM code GROUP BY image_id, ones"""


def sql_median3x3() -> str:
    """Twin of queries.q_median3x3 (stages/images.median3x3_batch):
    quantile_disc(0.5) of each interior pixel's 9-neighborhood — for 9
    values DuckDB's discrete quantile is the 5th smallest, exactly
    numpy's np.partition(...)[4] — summarized per image."""
    from osmquadtreepostgis_ray.stages.images import LBP_DIM
    D = LBP_DIM
    offs = ", ".join(f"({dy}, {dx})" for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1))
    return f"""{_sql_decoded_pixels()},
    ctr AS (
        SELECT image_id, idx // w AS y, idx % w AS x, p
        FROM dec WHERE w = {D} AND h = {D}
    ),
    off AS (SELECT * FROM (VALUES {offs}) o(dy, dx)),
    med AS (
        SELECT c.image_id, c.y, c.x, quantile_disc(nb.p, 0.5) AS m
        FROM ctr c
        JOIN off o ON TRUE
        JOIN ctr nb ON nb.image_id = c.image_id
                   AND nb.y = c.y + o.dy AND nb.x = c.x + o.dx
        WHERE c.y BETWEEN 1 AND {D - 2} AND c.x BETWEEN 1 AND {D - 2}
        GROUP BY c.image_id, c.y, c.x
    )
    SELECT image_id, sum(m)::BIGINT AS med_sum, min(m)::BIGINT AS med_min,
           max(m)::BIGINT AS med_max, count(*)::BIGINT AS n_ctr
    FROM med GROUP BY image_id"""


def sql_variogram() -> str:
    """Twin of queries.q_variogram: brute ordered-pair scan over the
    RIPLEY_MOD-sampled event geotags, banded by squared distance
    (lo exclusive / hi inclusive, first band lo = -1 so d2 = 0 lands in
    band 0 exactly like np.searchsorted side='left')."""
    from osmquadtreepostgis_ray.queries import RIPLEY_MOD, RIPLEY_R
    lows = [-1] + [r * r for r in RIPLEY_R[:-1]]
    bands = ", ".join(f"({r}, {lo}, {r * r})"
                      for r, lo in zip(RIPLEY_R, lows))
    return f"""
    WITH {events_geo_cte()},
    pts AS (
        SELECT event_id, lon_milli AS x, lat_milli AS y,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM ev WHERE user_id % {RIPLEY_MOD} = 0
    ),
    bands AS (SELECT * FROM (VALUES {bands}) b(r, lo, hi)),
    p AS (
        SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
               (a.v - b.v) * (a.v - b.v) AS dv2
        FROM pts a JOIN pts b ON b.event_id <> a.event_id
    )
    SELECT CAST(b.r AS BIGINT) AS r, count(*)::BIGINT AS n_pairs,
           sum(dv2)::BIGINT AS sum_sq
    FROM p JOIN bands b ON p.d2 > b.lo AND p.d2 <= b.hi
    GROUP BY 1"""


def sql_time_split() -> str:
    """Twin of queries.q_time_split: global epoch-us bounds via a
    scalar CTE, thresholds as exact integer tenths of the span (span
    >= 0 so DuckDB trunc-divide == numpy floor)."""
    from osmquadtreepostgis_ray.queries import TS_SPLIT_TENTHS
    k1, k2 = TS_SPLIT_TENTHS
    return f"""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    l AS (
        SELECT event_type,
               CASE WHEN epoch_us(ts) < b.lo + ((b.hi - b.lo) * {k1}) // 10
                    THEN 'train'
                    WHEN epoch_us(ts) < b.lo + ((b.hi - b.lo) * {k2}) // 10
                    THEN 'embargo'
                    ELSE 'test' END AS split
        FROM events, b
    )
    SELECT split, event_type, count(*)::BIGINT AS n
    FROM l GROUP BY split, event_type"""


def sql_temperature_mix(target: int = 1000) -> str:
    """Twin of queries.q_temperature_mix: isqrt weights via
    floor(sqrt()) — exact at these magnitudes (see the Ray docstring) —
    and floor quotas against the global weight sum."""
    return f"""
    WITH c AS (
        SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs,
               CAST(floor(sqrt(n_docs)) AS BIGINT) AS w
        FROM c
    ),
    t AS (SELECT sum(w) AS tw FROM w)
    SELECT lang, n_docs, w.w AS w,
           (({target} * w.w) // t.tw)::BIGINT AS quota
    FROM w, t"""


def sql_saliency_crop() -> str:
    """Twin of queries.q_saliency_crop (stages/images.saliency_crop_batch):
    central differences as a 4-offset contribution join over the
    decoded-pixel CTE, |dx|+|dy| energies summed per quadrant of the
    center pixel, winner by (energy DESC, quad) — numpy argmax's
    first-max tie rule."""
    return f"""{_sql_decoded_pixels()},
    g AS (
        SELECT d.image_id, d.w, d.h,
               (d.idx // d.w) - o.dy AS cy, (d.idx % d.w) - o.dx AS cx,
               sum(o.kx * d.p) AS dxv, sum(o.ky * d.p) AS dyv
        FROM dec d
        JOIN (VALUES (0, 1, 1, 0), (0, -1, -1, 0),
                     (1, 0, 0, 1), (-1, 0, 0, -1)) o(dy, dx, kx, ky)
          ON TRUE
        GROUP BY d.image_id, d.w, d.h, cy, cx
    ),
    e AS (
        SELECT image_id, w, h, cy, cx, abs(dxv) + abs(dyv) AS en
        FROM g
        WHERE cy >= 1 AND cy <= h - 2 AND cx >= 1 AND cx <= w - 2
    ),
    qd AS (
        SELECT image_id,
               CASE WHEN cy >= h // 2 THEN 2 ELSE 0 END
             + CASE WHEN cx >= w // 2 THEN 1 ELSE 0 END AS quad,
               sum(en) AS energy
        FROM e GROUP BY image_id, quad
    ),
    r AS (
        SELECT image_id, quad, energy,
               row_number() OVER (PARTITION BY image_id
                                  ORDER BY energy DESC, quad) AS rk
        FROM qd
    )
    SELECT image_id, quad::BIGINT AS quad, energy::BIGINT AS energy
    FROM r WHERE rk = 1"""


def sql_local_moran() -> str:
    """Twin of queries.q_local_moran: the sql_hotspot queen-join CTE
    plus the global (N, S) scalar CTE; lisa_num in exact integers with
    dev = N*n - S."""
    lon, lat = geotag.event_lonlat_milli_sql()
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
    WITH ev AS (SELECT ({lon}) * 64 // 360000 AS ix,
                       (({lat}) + 5000) * 64 // 180000 AS iy FROM events),
    c AS (SELECT ix, iy, count(*)::BIGINT AS n FROM ev GROUP BY ix, iy),
    h AS (
        SELECT a.ix, a.iy, a.n,
               CAST(sum(b.n) AS BIGINT) AS nbr_sum,
               count(*)::BIGINT AS nbr_cnt
        FROM c a
        JOIN (VALUES {offs}) o(dx, dy) ON true
        JOIN c b ON b.ix = a.ix + o.dx AND b.iy = a.iy + o.dy
        GROUP BY a.ix, a.iy, a.n
    ),
    s AS (SELECT count(*)::BIGINT AS nc, sum(n)::BIGINT AS tot FROM c)
    SELECT h.ix, h.iy, h.n,
           ((s.nc * h.n - s.tot)
            * (s.nc * (h.nbr_sum - h.n) - (h.nbr_cnt - 1) * s.tot))::BIGINT
               AS lisa_num
    FROM h, s"""


def sql_adaptive_tiles() -> str:
    """Twin of queries.q_adaptive_tiles: the multi-depth count union
    (sql_tile_pyramid expression per ADAPT_DEPTHS), parent lookup as a
    self-join on the exact cell-id arithmetic (cell = (morton<<6)|depth,
    parent 2 levels up = ((cell // 64) // 16) * 64 + depth - 2 — all
    operands non-negative, trunc == floor)."""
    from osmquadtreepostgis_ray.queries import ADAPT_DEPTHS, ADAPT_MAX
    lon, lat = geotag.event_lonlat_milli_sql()
    T = ADAPT_MAX
    top, bottom = ADAPT_DEPTHS[0], ADAPT_DEPTHS[-1]
    parts = [(f"SELECT CAST({d} AS BIGINT) AS depth, "
              f"{_cell_expr(lon, lat, d)} AS cell, count(*)::BIGINT AS n "
              f"FROM events GROUP BY cell")
             for d in ADAPT_DEPTHS]
    pyr = " UNION ALL ".join(parts)
    parent = "((c.cell // 64) // 16) * 64 + (c.depth - 2)"
    return f"""
    WITH pyr AS ({pyr})
    SELECT c.depth, c.cell, c.n, FALSE AS overflow
    FROM pyr c LEFT JOIN pyr p ON p.cell = {parent}
    WHERE c.n <= {T} AND (c.depth = {top} OR p.n > {T})
    UNION ALL
    SELECT c.depth, c.cell, c.n, TRUE AS overflow
    FROM pyr c JOIN pyr p ON p.cell = {parent}
    WHERE c.depth = {bottom} AND c.n > {T} AND p.n > {T}"""


def sql_zone_overlay() -> str:
    """Twin of queries.q_zone_overlay: zone ids by integer division of
    the milli geotag (all operands non-negative), grid-zone keep rule,
    exact rectangle-intersection areas recomputed per aggregated pair."""
    from osmquadtreepostgis_ray.sources.zones import (
        ADMIN_H, ADMIN_ID_BASE, ADMIN_W, AX, GRID_H, GRID_KEEP_LT,
        GRID_KEEP_MOD, GRID_KEEP_MULT, GRID_W, GX)
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH ev AS (
        SELECT (({lat}) // {GRID_H}) * {GX} + ({lon}) // {GRID_W} AS gzone,
               (({lat}) // {ADMIN_H}) * {AX} + ({lon}) // {ADMIN_W}
                   + {ADMIN_ID_BASE} AS azone
        FROM events
    ),
    c AS (
        SELECT gzone, azone, count(*)::BIGINT AS n
        FROM ev
        WHERE (gzone * {GRID_KEEP_MULT}) % {GRID_KEEP_MOD} < {GRID_KEEP_LT}
        GROUP BY gzone, azone
    )
    SELECT gzone, azone, n,
           (least((gzone % {GX}) * {GRID_W} + {GRID_W},
                  ((azone - {ADMIN_ID_BASE}) % {AX}) * {ADMIN_W} + {ADMIN_W})
            - greatest((gzone % {GX}) * {GRID_W},
                       ((azone - {ADMIN_ID_BASE}) % {AX}) * {ADMIN_W}))
         * (least((gzone // {GX}) * {GRID_H} + {GRID_H},
                  ((azone - {ADMIN_ID_BASE}) // {AX}) * {ADMIN_H} + {ADMIN_H})
            - greatest((gzone // {GX}) * {GRID_H},
                       ((azone - {ADMIN_ID_BASE}) // {AX}) * {ADMIN_H}))
               AS inter_area
    FROM c"""


def sql_contour_cells() -> str:
    """Twin of queries.q_contour_cells: distinct-pixel counts, window
    anchors as the DISTINCT 4-offset scatter (domain-clipped to
    [0, G-2]), 4 corner LEFT joins -> occupancy code census."""
    from osmquadtreepostgis_ray.queries import CONTOUR_T
    lon, lat = geotag.event_lonlat_milli_sql()
    G = 1 << CELL_DEPTH
    ix = f"((({lon}) * 10000 * {G}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {G}) // {quadtree.LAT_SPAN})"
    return f"""
    WITH r AS (
        SELECT {ix} AS gx, {iy} AS gy, count(*) AS n
        FROM events GROUP BY gx, gy
    ),
    a AS (
        SELECT DISTINCT r.gx - o.dx AS ax, r.gy - o.dy AS ay
        FROM r JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) o(dx, dy)
          ON TRUE
        WHERE r.gx - o.dx BETWEEN 0 AND {G - 2}
          AND r.gy - o.dy BETWEEN 0 AND {G - 2}
    ),
    code AS (
        SELECT (CASE WHEN coalesce(c00.n, 0) > {CONTOUR_T} THEN 1 ELSE 0 END)
             + (CASE WHEN coalesce(c01.n, 0) > {CONTOUR_T} THEN 2 ELSE 0 END)
             + (CASE WHEN coalesce(c10.n, 0) > {CONTOUR_T} THEN 4 ELSE 0 END)
             + (CASE WHEN coalesce(c11.n, 0) > {CONTOUR_T} THEN 8 ELSE 0 END)
                 AS code
        FROM a
        LEFT JOIN r c00 ON c00.gx = a.ax     AND c00.gy = a.ay
        LEFT JOIN r c01 ON c01.gx = a.ax + 1 AND c01.gy = a.ay
        LEFT JOIN r c10 ON c10.gx = a.ax     AND c10.gy = a.ay + 1
        LEFT JOIN r c11 ON c11.gx = a.ax + 1 AND c11.gy = a.ay + 1
    )
    SELECT code::BIGINT AS code, count(*)::BIGINT AS n_cells
    FROM code GROUP BY code"""


def sql_chaikin() -> str:
    """Twin of queries.q_chaikin: LEAD pair per user in (ts, event_id)
    order, two emitted points per pair via a 2-row VALUES join, x4
    integer coordinates."""
    return f"""
    WITH {events_geo_cte()},
    o AS (
        SELECT ev.user_id, lon_milli AS x, lat_milli AS y,
               row_number() OVER w - 1 AS pos,
               lead(lon_milli) OVER w AS x1, lead(lat_milli) OVER w AS y1
        FROM ev JOIN events e USING (event_id)
        WINDOW w AS (PARTITION BY ev.user_id ORDER BY e.ts, ev.event_id)
    )
    SELECT user_id, (2 * pos + s.k)::BIGINT AS seq,
           (CASE WHEN s.k = 0 THEN 3 * x + x1 ELSE x + 3 * x1 END)::BIGINT
               AS qx4,
           (CASE WHEN s.k = 0 THEN 3 * y + y1 ELSE y + 3 * y1 END)::BIGINT
               AS qy4
    FROM o JOIN (VALUES (0), (1)) s(k) ON TRUE
    WHERE x1 IS NOT NULL"""


def sql_visual_words() -> str:
    """Twin of queries.q_visual_words: sub-block sums from the
    decoded-pixel CTE by pure idx arithmetic, word assembly as the
    4^s-weighted quantized sums, distinct-image counting per word."""
    return f"""{_sql_decoded_pixels()},
    sb AS (
        SELECT image_id,
               ((idx // w) // 8) * (w // 8) + (idx % w) // 8 AS patch,
               (((idx // w) % 8) // 4) * 2 + ((idx % w) % 8) // 4 AS s,
               sum(p) AS ssum
        FROM dec GROUP BY image_id, patch, s
    ),
    pw AS (
        SELECT image_id, patch,
               sum((ssum // 1024)
                   * (CASE s WHEN 0 THEN 1 WHEN 1 THEN 4
                             WHEN 2 THEN 16 ELSE 64 END)) AS word
        FROM sb GROUP BY image_id, patch
    )
    SELECT word::BIGINT AS word, count(*)::BIGINT AS n_patches,
           count(DISTINCT image_id)::BIGINT AS n_images
    FROM pw GROUP BY word"""


def sql_image_dhash() -> str:
    """Twin of queries.q_image_dhash (stages/images.dhash_batch): exact
    8x8 block sums, adjacent-column self-join, bits packed with integer
    shifts."""
    return f"""{_sql_decoded_pixels()},
    bs AS (
        SELECT image_id,
               (idx // w) // (h // 8) AS br,
               (idx % w) // (w // 8) AS bc,
               sum(p) AS s
        FROM dec GROUP BY image_id, br, bc
    )
    SELECT a.image_id,
           sum(CASE WHEN b.s > a.s
                    THEN CAST(1 AS BIGINT) << (a.br * 7 + a.bc)
                    ELSE 0 END)::BIGINT AS dhash,
           sum(CASE WHEN b.s > a.s THEN 1 ELSE 0 END)::BIGINT AS nbits
    FROM bs a JOIN bs b ON b.image_id = a.image_id
                       AND b.br = a.br AND b.bc = a.bc + 1
    GROUP BY a.image_id"""


def sql_len_histogram() -> str:
    """Twin of queries.q_len_histogram: power-of-two bucket join (exact
    integer bounds — never floor(log2) floats)."""
    from osmquadtreepostgis_ray.queries import LEN_HIST_MAX_BIT
    vals = ", ".join(f"({k}, {1 << k}, {1 << (k + 1)})"
                     for k in range(LEN_HIST_MAX_BIT))
    return f"""
    WITH b AS (SELECT * FROM (VALUES {vals}) t(bucket, lo, hi))
    SELECT CAST(b.bucket AS BIGINT) AS bucket,
           count(*)::BIGINT AS n_docs,
           sum(d.n_chars)::BIGINT AS sum_chars
    FROM documents d JOIN b ON d.n_chars >= b.lo AND d.n_chars < b.hi
    GROUP BY b.bucket"""


def sql_fertility() -> str:
    """Twin of queries.q_fertility: whitespace-token totals vs n_chars
    per lang, floor-divided at milli precision (all non-negative)."""
    return """
    SELECT lang,
           sum(len(string_split(text, ' ')))::BIGINT AS sum_tokens,
           sum(n_chars)::BIGINT AS sum_chars,
           (sum(len(string_split(text, ' '))) * 1000
            // sum(n_chars))::BIGINT AS fert_milli
    FROM documents GROUP BY lang"""


def sql_k_anon() -> str:
    """Twin of queries.q_k_anon: depth-6 cell per event, per-user mode
    (count DESC, cell ASC), per-cell resident counts, capped
    histogram."""
    from osmquadtreepostgis_ray.queries import KANON_CAP, KANON_DEPTH
    lon, lat = geotag.event_lonlat_milli_sql()
    cell = _cell_expr(lon, lat, KANON_DEPTH)
    return f"""
    WITH ev AS (SELECT user_id, {cell} AS cell FROM events),
    uc AS (SELECT user_id, cell, count(*) AS n FROM ev
           GROUP BY user_id, cell),
    home AS (
        SELECT user_id, cell FROM (
            SELECT user_id, cell,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY n DESC, cell) AS rk
            FROM uc) WHERE rk = 1
    ),
    hc AS (SELECT cell, count(*)::BIGINT AS nu FROM home GROUP BY cell)
    SELECT least(nu, {KANON_CAP})::BIGINT AS k,
           count(*)::BIGINT AS n_cells, sum(nu)::BIGINT AS n_users
    FROM hc GROUP BY 1"""


def sql_tile_edge_census() -> str:
    """Twin of queries.q_tile_edge_census: depth-12 pixel ring test by
    pure integer arithmetic on the same fixed-point exprs."""
    lon, lat = geotag.event_lonlat_milli_sql()
    n12 = 1 << 12
    ix = f"((({lon}) * 10000 * {n12}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {n12}) // {quadtree.LAT_SPAN})"
    tile = _cell_expr(lon, lat, TILE_DEPTH)
    return f"""
    WITH ev AS (
        SELECT {tile} AS tile, ({ix}) % 16 AS px, ({iy}) % 16 AS py
        FROM events
    )
    SELECT tile, count(*)::BIGINT AS n_total,
           sum(CASE WHEN px = 0 OR px = 15 OR py = 0 OR py = 15
                    THEN 1 ELSE 0 END)::BIGINT AS n_edge
    FROM ev GROUP BY tile"""


def sql_audio_silence() -> str:
    """Twin of queries.q_audio_silence (stages/audio.SilenceRuns):
    gaps-and-islands over the decoded samples (idx - row_number is
    constant within a silent run); tracks with no silent sample have no
    rows on either engine."""
    from osmquadtreepostgis_ray.stages.audio import SILENCE_T
    return f"""{_sql_decoded_samples()},
    sil AS (
        SELECT audio_id, idx FROM adec WHERE abs(d) <= {SILENCE_T}
    ),
    isl AS (
        SELECT audio_id,
               idx - row_number() OVER (PARTITION BY audio_id
                                        ORDER BY idx) AS grp
        FROM sil
    ),
    r AS (SELECT audio_id, grp, count(*) AS len
          FROM isl GROUP BY audio_id, grp)
    SELECT audio_id, count(*)::BIGINT AS n_runs,
           max(len)::BIGINT AS max_run, sum(len)::BIGINT AS n_silent
    FROM r GROUP BY audio_id"""


def sql_decay_counts() -> str:
    """Twin of queries.q_decay_counts: scalar bounds CTE, the exact
    integer halving decay (1 << (K - age_half_lives)); every operand
    non-negative."""
    from osmquadtreepostgis_ray.queries import DECAY_HL_DIV, DECAY_K
    lon, lat = geotag.event_lonlat_milli_sql()
    tile = _cell_expr(lon, lat, TILE_DEPTH)
    return f"""
    WITH b AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    )
    SELECT {tile} AS tile,
           sum(CAST(1 AS BIGINT)
               << ({DECAY_K} - (b.hi - epoch_us(ts))
                                // ((b.hi - b.lo) // {DECAY_HL_DIV} + 1)))
               ::BIGINT AS score
    FROM events, b GROUP BY tile"""


def sql_od_gravity() -> str:
    """Twin of queries.q_od_gravity: the sql_od_flows derivation plus
    marginal/total CTEs and the exact integer lift."""
    return f"""
    WITH {events_geo_cte()},
    o0 AS (
        SELECT tile AS from_tile,
               lead(tile) OVER (PARTITION BY ev.user_id
                                ORDER BY e.ts, ev.event_id) AS to_tile
        FROM ev JOIN events e USING (event_id)
    ),
    f AS (
        SELECT from_tile, to_tile, count(*)::BIGINT AS n
        FROM o0 WHERE to_tile IS NOT NULL
        GROUP BY from_tile, to_tile
    ),
    om AS (SELECT from_tile, sum(n)::BIGINT AS o_total FROM f GROUP BY 1),
    dm AS (SELECT to_tile, sum(n)::BIGINT AS d_total FROM f GROUP BY 1),
    t AS (SELECT sum(n)::BIGINT AS total FROM f)
    SELECT f.from_tile, f.to_tile, f.n, om.o_total, dm.d_total,
           (f.n * t.total * 1000 // (om.o_total * dm.d_total))::BIGINT
               AS lift_milli
    FROM f JOIN om USING (from_tile) JOIN dm USING (to_tile), t"""


def sql_seam_cols() -> str:
    """Twin of queries.q_seam_cols (stages/images.seam_cols_batch):
    horizontal central differences as a 2-offset contribution join,
    |.| summed per column, winner by (energy ASC, column ASC)."""
    return f"""{_sql_decoded_pixels()},
    g AS (
        SELECT d.image_id, d.w, (d.idx % d.w) - o.dx AS cx,
               d.idx // d.w AS cy, sum(o.kx * d.p) AS dxv
        FROM dec d JOIN (VALUES (1, 1), (-1, -1)) o(dx, kx) ON TRUE
        GROUP BY d.image_id, d.w, cx, cy
    ),
    e AS (
        SELECT image_id, cx, sum(abs(dxv)) AS en
        FROM g WHERE cx >= 1 AND cx <= w - 2
        GROUP BY image_id, cx
    ),
    r AS (
        SELECT image_id, cx, en,
               row_number() OVER (PARTITION BY image_id
                                  ORDER BY en, cx) AS rk
        FROM e
    )
    SELECT image_id, cx::BIGINT AS min_col, en::BIGINT AS min_energy
    FROM r WHERE rk = 1"""


def sql_interval_union() -> str:
    """Twin of queries.q_interval_union: running-max window over prior
    interval ends, break flags -> island ids -> per-island extents."""
    from osmquadtreepostgis_ray.queries import IVU_DUR_US
    return f"""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s,
               epoch_us(ts) + {IVU_DUR_US} AS e
        FROM events
    ),
    x AS (
        SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm
        FROM iv
    ),
    y AS (
        SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk
        FROM x
    ),
    z AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY s, event_id) AS isl
        FROM y
    ),
    g AS (
        SELECT user_id, isl, max(e) - min(s) AS len
        FROM z GROUP BY user_id, isl
    )
    SELECT user_id, sum(len)::BIGINT AS covered_us,
           count(*)::BIGINT AS n_islands
    FROM g GROUP BY user_id"""


def sql_user_extent() -> str:
    """Twin of queries.q_user_extent: exact integer bbox per user."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH ev AS (SELECT user_id, {lon} AS x, {lat} AS y FROM events)
    SELECT user_id, min(x)::BIGINT AS x0, max(x)::BIGINT AS x1,
           min(y)::BIGINT AS y0, max(y)::BIGINT AS y1,
           count(*)::BIGINT AS n,
           ((max(x) - min(x)) * (max(y) - min(y)))::BIGINT AS bbox_area
    FROM ev GROUP BY user_id"""


def sql_degree_mix() -> str:
    """Twin of queries.q_degree_mix: directed chain+chord edges, degree
    self-join, 4 exact integer sums."""
    return """
    WITH e0 AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 1 AND doc_id % 5 <> 0
    ),
    e1 AS (
        SELECT doc_id - 2 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    es AS (
        SELECT a AS src, b AS dst FROM e0
        UNION ALL SELECT b, a FROM e0
        UNION ALL SELECT a, b FROM e1
        UNION ALL SELECT b, a FROM e1
    ),
    deg AS (SELECT src AS v, count(*) AS d FROM es GROUP BY src)
    SELECT count(*)::BIGINT AS n_edges,
           sum(du.d * dv.d)::BIGINT AS sum_dd,
           sum(du.d)::BIGINT AS sum_d,
           sum(du.d * du.d)::BIGINT AS sum_d2
    FROM es JOIN deg du ON du.v = es.src JOIN deg dv ON dv.v = es.dst"""


def sql_trend_fit() -> str:
    """Twin of queries.q_trend_fit: per-user hour offsets from the
    user's own min event time, exact integer regression moments."""
    from osmquadtreepostgis_ray.queries import TREND_HOUR_US
    return f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tu,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    m AS (SELECT user_id, min(tu) AS mt FROM e GROUP BY user_id),
    t AS (
        SELECT e.user_id, (e.tu - m.mt) // {TREND_HOUR_US} AS th, e.y
        FROM e JOIN m USING (user_id)
    )
    SELECT user_id, count(*)::BIGINT AS n,
           (count(*) * sum(th * y) - sum(th) * sum(y))::BIGINT AS slope_num,
           (count(*) * sum(th * th) - sum(th) * sum(th))::BIGINT AS slope_den
    FROM t GROUP BY user_id"""


def sql_history_ranges() -> str:
    """Twin of queries.q_history_ranges: LAG change flags -> windowed
    run ids -> per-run extents -> per-user rollup."""
    return """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tu, event_type
        FROM events
    ),
    x AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ),
    z AS (
        SELECT *, sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY tu, event_id) AS run
        FROM x
    ),
    g AS (
        SELECT user_id, run, max(tu) - min(tu) AS span
        FROM z GROUP BY user_id, run
    )
    SELECT user_id, count(*)::BIGINT AS n_ranges,
           (count(*) - 1)::BIGINT AS n_changes,
           sum(span)::BIGINT AS sum_span_us
    FROM g GROUP BY user_id"""


def sql_link_negatives() -> str:
    """Twin of queries.q_link_negatives: hash proposals, NOT EXISTS
    anti join against the directed chain+chord edges, first NEG_K by
    proposal index."""
    from osmquadtreepostgis_ray.queries import (NEG_A, NEG_B, NEG_K,
                                                NEG_PROPOSE)
    js = ", ".join(f"({j})" for j in range(NEG_PROPOSE))
    return f"""
    WITH nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
    cand AS (
        SELECT d.doc_id AS src, v.j,
               (d.doc_id * {NEG_A} + v.j * {NEG_B} + 1) % nn.n AS neg_dst
        FROM documents d, (VALUES {js}) v(j), nn
        WHERE (d.doc_id * {NEG_A} + v.j * {NEG_B} + 1) % nn.n <> d.doc_id
    ),
    e0 AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 1 AND doc_id % 5 <> 0
    ),
    e1 AS (
        SELECT doc_id - 2 AS a, doc_id AS b FROM documents
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    es AS (
        SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
        UNION ALL SELECT a, b FROM e1 UNION ALL SELECT b, a FROM e1
    ),
    surv AS (
        SELECT c.* FROM cand c WHERE NOT EXISTS (
            SELECT 1 FROM es WHERE es.src = c.src AND es.dst = c.neg_dst)
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY src ORDER BY j) AS rk
        FROM surv
    )
    SELECT src, neg_dst, CAST(j AS BIGINT) AS j FROM r WHERE rk <= {NEG_K}"""


def sql_inversions() -> str:
    """Twin of queries.q_inversions: per-user ordered pair self-join,
    strict (ts, event_id) order; single-event users join in with
    coalesce-0 pair counts."""
    return """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tu,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    c AS (SELECT user_id, count(*)::BIGINT AS n FROM e GROUP BY user_id),
    p AS (
        SELECT a.user_id,
               sum(CASE WHEN a.y > b.y THEN 1 ELSE 0 END)::BIGINT AS n_inv,
               sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)::BIGINT AS n_tie
        FROM e a JOIN e b ON b.user_id = a.user_id
             AND (a.tu < b.tu OR (a.tu = b.tu AND a.event_id < b.event_id))
        GROUP BY a.user_id
    )
    SELECT c.user_id, c.n, coalesce(p.n_inv, 0)::BIGINT AS n_inv,
           coalesce(p.n_tie, 0)::BIGINT AS n_tie
    FROM c LEFT JOIN p USING (user_id)"""


def sql_revisits() -> str:
    """Twin of queries.q_revisits: per-(user, cell) visit rank in time
    order; rank 1 = first sighting, rank > 1 = revisit."""
    return f"""
    WITH {events_geo_cte()},
    r AS (
        SELECT ev.user_id,
               row_number() OVER (PARTITION BY ev.user_id, ev.cell
                                  ORDER BY e.ts, ev.event_id) AS rn
        FROM ev JOIN events e USING (event_id)
    )
    SELECT user_id, count(*)::BIGINT AS n_events,
           (count(*) FILTER (rn = 1))::BIGINT AS n_cells,
           (count(*) FILTER (rn > 1))::BIGINT AS n_revisits
    FROM r GROUP BY user_id"""


def sql_modal_corr() -> str:
    """Twin of queries.q_modal_corr: BOTH decoded-media CTE prefixes
    spliced into one WITH (the audio chain's leading WITH stripped),
    per-doc image mean pixel x audio mean |sample|, exact Pearson
    moments."""
    audio_part = _sql_decoded_samples().lstrip()
    assert audio_part.startswith("WITH")
    return f"""{_sql_decoded_pixels()},
    {audio_part[4:]},
    xm AS (
        SELECT doc_id, CAST(floor(avg(p)) AS BIGINT) AS x
        FROM dec GROUP BY image_id, doc_id
    ),
    ym AS (
        SELECT doc_id, CAST(sum(abs(d)) // ns AS BIGINT) AS y
        FROM adec GROUP BY audio_id, doc_id, ns
    ),
    j AS (SELECT xm.x, ym.y FROM xm JOIN ym USING (doc_id))
    SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
           sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
           sum(x * x)::BIGINT AS sx2, sum(y * y)::BIGINT AS sy2
    FROM j"""


def sql_lang_confusion() -> str:
    """Twin of queries.q_lang_confusion: labeled lang x the n-gram
    heuristic prediction (functions/text.lang_id_sql)."""
    return (f"SELECT lang, {lang_id_sql('text')} AS lang_pred, "
            f"count(*)::BIGINT AS n FROM documents GROUP BY lang, lang_pred")


def sql_source_overlap() -> str:
    """Twin of queries.q_source_overlap: the full minhash-pair oracle as
    a subquery, each side source-joined, cell canonicalized unordered."""
    return f"""
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*)::BIGINT AS n_pairs
    FROM ({sql_minhash_pairs()}) mp
    JOIN documents da ON da.doc_id = mp.a
    JOIN documents db ON db.doc_id = mp.b
    GROUP BY 1, 2"""


def sql_near_dup_rate() -> str:
    """Twin of queries.q_near_dup_rate: distinct pair participants,
    per-source rate in permille."""
    return f"""
    WITH ids AS (
        SELECT DISTINCT doc_id FROM (
            SELECT a AS doc_id FROM ({sql_minhash_pairs()}) mp
            UNION ALL
            SELECT b FROM ({sql_minhash_pairs()}) mp2
        )
    ),
    d AS (
        SELECT dd.source,
               CASE WHEN ids.doc_id IS NULL THEN 0 ELSE 1 END AS dup
        FROM documents dd LEFT JOIN ids ON ids.doc_id = dd.doc_id
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(dup)::BIGINT AS n_dup,
           (sum(dup) * 1000 // count(*))::BIGINT AS dup_permille
    FROM d GROUP BY source"""


def sql_hist_equalize() -> str:
    """Twin of queries.q_hist_equalize: per-image value histogram,
    window cumsum, the classic integer LUT — (cf - cfmin) >= 0 and
    npx > cfmin on this corpus so trunc == floor."""
    return f"""{_sql_decoded_pixels()},
    h AS (SELECT image_id, p, count(*) AS c FROM dec GROUP BY image_id, p),
    cf AS (
        SELECT image_id, p, c,
               sum(c) OVER (PARTITION BY image_id ORDER BY p) AS cdf
        FROM h
    ),
    mn AS (
        SELECT image_id, min(cdf) AS cfmin, sum(c) AS npx
        FROM cf GROUP BY image_id
    ),
    lut AS (
        SELECT c.image_id, c.c,
               CASE WHEN m.npx = m.cfmin THEN 0
                    ELSE ((c.cdf - m.cfmin) * 255) // (m.npx - m.cfmin)
               END AS q
        FROM cf c JOIN mn m USING (image_id)
    )
    SELECT image_id, sum(q * c)::BIGINT AS eq_sum, min(q)::BIGINT AS eq_min,
           max(q)::BIGINT AS eq_max, sum(c)::BIGINT AS n_px
    FROM lut GROUP BY image_id"""


def sql_box5() -> str:
    """Twin of queries.q_box5 (stages/images.box5_batch): 25-offset
    contribution join over the 16x16 thumbnails."""
    from osmquadtreepostgis_ray.stages.images import LBP_DIM
    D = LBP_DIM
    offs = ", ".join(f"({dy}, {dx})" for dy in range(-2, 3)
                     for dx in range(-2, 3))
    return f"""{_sql_decoded_pixels()},
    ctr AS (
        SELECT image_id, idx // w AS y, idx % w AS x, p
        FROM dec WHERE w = {D} AND h = {D}
    ),
    bs AS (
        SELECT c.image_id, c.y, c.x, sum(nb.p) AS s
        FROM ctr c
        JOIN (VALUES {offs}) o(dy, dx) ON TRUE
        JOIN ctr nb ON nb.image_id = c.image_id
                   AND nb.y = c.y + o.dy AND nb.x = c.x + o.dx
        WHERE c.y BETWEEN 2 AND {D - 3} AND c.x BETWEEN 2 AND {D - 3}
        GROUP BY c.image_id, c.y, c.x
    )
    SELECT image_id, sum(s)::BIGINT AS box_sum, min(s)::BIGINT AS box_min,
           max(s)::BIGINT AS box_max
    FROM bs GROUP BY image_id"""


def sql_crossmodal_recall(k: int = 5, nq: int = 8) -> str:
    """Twin of queries.q_crossmodal_recall: the crossmodal top-k oracle
    as a subquery, same-doc ground truth."""
    return f"""
    SELECT count(DISTINCT query_id)::BIGINT AS n_queries,
           count(DISTINCT CASE WHEN query_id = doc_id THEN query_id
                          END)::BIGINT AS hits_at_k
    FROM ({sql_crossmodal_knn(k=k, nq=nq)}) t"""


def sql_first_last_touch() -> str:
    """Twin of queries.q_first_last_touch: first/last value windows in
    (ts, event_id) order, one row per user, counted."""
    return """
    WITH o AS (
        SELECT user_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS last_type,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT first_type, last_type, count(*)::BIGINT AS n_users
    FROM o WHERE rn = 1 GROUP BY first_type, last_type"""


def sql_burstiness() -> str:
    """Twin of queries.q_burstiness: LAG gaps in whole seconds (the
    int64-headroom scaling), single-event users have no gap row on
    either engine."""
    return """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu FROM events),
    g AS (
        SELECT user_id,
               (tu - lag(tu) OVER (PARTITION BY user_id
                                   ORDER BY tu, event_id)) // 1000000
                   AS gap
        FROM e
    )
    SELECT user_id, count(*)::BIGINT AS n_gaps,
           sum(gap)::BIGINT AS sum_gap_s, min(gap)::BIGINT AS min_gap_s,
           max(gap)::BIGINT AS max_gap_s,
           sum(gap * gap)::BIGINT AS sum_gap2_s
    FROM g WHERE gap IS NOT NULL GROUP BY user_id"""


def sql_char_simpson() -> str:
    """Twin of queries.q_char_simpson: per-character counts via range
    unnest (ASCII corpus), collision numerator."""
    return """
    WITH ch AS (
        SELECT doc_id,
               unnest(list_transform(range(1, length(text) + 1),
                                     i -> substr(text, i, 1))) AS c
        FROM documents
    ),
    cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c)
    SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
           coalesce(sum(cc.n * cc.n), 0)::BIGINT AS sum_cnt2
    FROM documents d LEFT JOIN cc USING (doc_id)
    GROUP BY d.doc_id, d.text"""


def sql_fence_dwell() -> str:
    """Twin of queries.q_fence_dwell: fence membership by integer zone
    arithmetic, LEAD pair dwell, run starts via LAG."""
    from osmquadtreepostgis_ray.queries import FENCE_AZONE
    from osmquadtreepostgis_ray.sources.zones import (ADMIN_H,
                                                      ADMIN_ID_BASE,
                                                      ADMIN_W, AX)
    lon, lat = geotag.event_lonlat_milli_sql()
    inside = (f"((({lat}) // {ADMIN_H}) * {AX} + ({lon}) // {ADMIN_W} "
              f"+ {ADMIN_ID_BASE} = {FENCE_AZONE})")
    return f"""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS tu, {inside} AS ins
        FROM events
    ),
    o AS (
        SELECT user_id, tu, ins,
               lead(tu) OVER w AS nt, lead(ins) OVER w AS ni,
               lag(ins) OVER w AS pi
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    )
    SELECT user_id,
           sum(CASE WHEN ins THEN 1 ELSE 0 END)::BIGINT AS n_inside,
           sum(CASE WHEN ins AND (pi IS NULL OR NOT pi)
                    THEN 1 ELSE 0 END)::BIGINT AS n_runs,
           coalesce(sum(CASE WHEN ins AND ni THEN nt - tu END), 0)::BIGINT
               AS dwell_us
    FROM o GROUP BY user_id
    HAVING sum(CASE WHEN ins THEN 1 ELSE 0 END) > 0"""


def sql_vocab_tail() -> str:
    """Twin of queries.q_vocab_tail: term counts, top-K by
    (n DESC, term ASC), permille coverage."""
    from osmquadtreepostgis_ray.queries import VOCAB_TOPK
    return f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tc AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    tot AS (SELECT sum(n) AS t FROM tc),
    top AS (SELECT n FROM tc ORDER BY n DESC, w LIMIT {VOCAB_TOPK})
    SELECT tot.t::BIGINT AS total_tokens,
           (SELECT sum(n) FROM top)::BIGINT AS topk_tokens,
           ((SELECT sum(n) FROM top) * 1000 // tot.t)::BIGINT
               AS coverage_permille
    FROM tot"""


def sql_cell_turnover() -> str:
    """Twin of queries.q_cell_turnover: scalar midpoint CTE, per-(tile,
    user) early/late flags via conditional MAX, per-tile Jaccard."""
    return f"""
    WITH {events_geo_cte()},
    b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
          FROM events),
    u AS (
        SELECT tile, ev.user_id,
               max(CASE WHEN epoch_us(e.ts)
                        < b.lo + (b.hi - b.lo) // 2
                        THEN 1 ELSE 0 END) AS e,
               max(CASE WHEN epoch_us(e.ts)
                        >= b.lo + (b.hi - b.lo) // 2
                        THEN 1 ELSE 0 END) AS l
        FROM ev JOIN events e USING (event_id), b
        GROUP BY tile, ev.user_id
    )
    SELECT tile, sum(e)::BIGINT AS n_early, sum(l)::BIGINT AS n_late,
           sum(e * l)::BIGINT AS n_both,
           (sum(e * l) * 1000
            // greatest(sum(e) + sum(l) - sum(e * l), 1))::BIGINT
               AS jaccard_permille
    FROM u GROUP BY tile"""


def sql_weekend_lift() -> str:
    """Twin of queries.q_weekend_lift: Thursday-anchored integer
    day-of-week, 5:2-normalized rational lift."""
    from osmquadtreepostgis_ray.queries import DAY_US
    return f"""
    WITH {events_geo_cte()},
    w AS (
        SELECT tile,
               CASE WHEN ((epoch_us(e.ts) // {DAY_US} + 4) % 7) IN (0, 6)
                    THEN 1 ELSE 0 END AS we
        FROM ev JOIN events e USING (event_id)
    )
    SELECT tile, sum(1 - we)::BIGINT AS n_weekday,
           sum(we)::BIGINT AS n_weekend,
           (sum(we) * 5000 // greatest(sum(1 - we) * 2, 1))::BIGINT
               AS lift_permille
    FROM w GROUP BY tile"""


def sql_pyramid_anomaly() -> str:
    """Twin of queries.q_pyramid_anomaly: depth-12 counts, parent roll
    via the exact cell-id arithmetic, 16x deviation."""
    return f"""
    WITH {events_geo_cte()},
    c12 AS (SELECT cell, count(*) AS n FROM ev GROUP BY cell),
    c10 AS (
        SELECT ((cell // 64) // 16) * 64 + 10 AS p, sum(n) AS np
        FROM c12 GROUP BY p
    )
    SELECT c12.cell, c12.n::BIGINT AS n, c10.np::BIGINT AS n_parent,
           (16 * c12.n - c10.np)::BIGINT AS dev
    FROM c12 JOIN c10 ON c10.p = ((c12.cell // 64) // 16) * 64 + 10"""


def sql_covisit_tiles() -> str:
    """Twin of queries.q_covisit_tiles: per-user top-M tiles by
    (n DESC, tile ASC), unordered pair expansion, counted."""
    from osmquadtreepostgis_ray.queries import COVISIT_M
    return f"""
    WITH {events_geo_cte()},
    ut AS (SELECT user_id, tile, count(*) AS n FROM ev
           GROUP BY user_id, tile),
    r AS (
        SELECT user_id, tile,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, tile) AS rk
        FROM ut
    ),
    top AS (SELECT user_id, tile FROM r WHERE rk <= {COVISIT_M})
    SELECT a.tile AS tile_a, b.tile AS tile_b, count(*)::BIGINT AS n_users
    FROM top a JOIN top b ON b.user_id = a.user_id AND b.tile > a.tile
    GROUP BY tile_a, tile_b"""


def sql_letterbox() -> str:
    """Twin of queries.q_letterbox: conditional border/interior sums
    over the decoded-pixel CTE; framed keeps the half-mean comparison
    in exact integers on both engines."""
    from osmquadtreepostgis_ray.stages.images import LETTERBOX_B
    B = LETTERBOX_B
    brd = (f"(idx % w) < {B} OR (idx % w) >= w - {B} "
           f"OR (idx // w) < {B} OR (idx // w) >= h - {B}")
    return f"""{_sql_decoded_pixels()},
    s AS (
        SELECT image_id,
               sum(CASE WHEN {brd} THEN p ELSE 0 END)::BIGINT AS border_sum,
               sum(CASE WHEN {brd} THEN 0 ELSE p END)::BIGINT AS inner_sum,
               sum(CASE WHEN {brd} THEN 1 ELSE 0 END)::BIGINT AS n_border,
               sum(CASE WHEN {brd} THEN 0 ELSE 1 END)::BIGINT AS n_inner
        FROM dec GROUP BY image_id
    )
    SELECT image_id, border_sum, inner_sum, n_border, n_inner,
           CAST(CASE WHEN border_sum * n_inner * 2 < inner_sum * n_border
                THEN 1 ELSE 0 END AS BIGINT) AS framed
    FROM s"""


def sql_radial_profile() -> str:
    """Twin of queries.q_radial_profile: depth-from-edge Chebyshev
    rings (all operands non-negative, so DuckDB // == numpy floor)."""
    from osmquadtreepostgis_ray.stages.images import RING_CAP
    return f"""{_sql_decoded_pixels()}
    SELECT CASE WHEN doc_id % 4 = 0 THEN 'qlossy' ELSE 'raw' END AS fmt,
           least(least(least(idx % w, w - 1 - idx % w),
                       least(idx // w, h - 1 - idx // w)) // 2,
                 {RING_CAP - 1}) AS ring,
           sum(p)::BIGINT AS s, count(*)::BIGINT AS n
    FROM dec GROUP BY 1, 2"""


def sql_quadrant_balance() -> str:
    """Twin of queries.q_quadrant_balance: half-plane conditional sums;
    the dominant CASE chain replicates numpy argmax's first-max-wins
    tie rule."""
    qq = {"q00": "2 * (idx // w) < h AND 2 * (idx % w) < w",
          "q01": "2 * (idx // w) < h AND 2 * (idx % w) >= w",
          "q10": "2 * (idx // w) >= h AND 2 * (idx % w) < w",
          "q11": "2 * (idx // w) >= h AND 2 * (idx % w) >= w"}
    sums = ",\n               ".join(
        f"sum(CASE WHEN {c} THEN p ELSE 0 END)::BIGINT AS {k}"
        for k, c in qq.items())
    return f"""{_sql_decoded_pixels()},
    s AS (
        SELECT image_id,
               {sums}
        FROM dec GROUP BY image_id
    )
    SELECT image_id, q00, q01, q10, q11,
           CAST(CASE WHEN q00 >= q01 AND q00 >= q10 AND q00 >= q11 THEN 0
                     WHEN q01 >= q10 AND q01 >= q11 THEN 1
                     WHEN q10 >= q11 THEN 2
                     ELSE 3 END AS BIGINT) AS dominant
    FROM s"""


def sql_script_census() -> str:
    """Twin of queries.q_script_census: regex-strip length deltas (the
    corpus is ASCII, so length == utf8_length on both engines)."""
    return """
    SELECT lang, source, count(*)::BIGINT AS n_docs,
           sum(length(text))::BIGINT AS n_chars,
           sum(length(text)
               - length(regexp_replace(text, '[aeiou]', '', 'g')))::BIGINT
               AS n_vowels,
           sum(length(text)
               - length(replace(text, ' ', '')))::BIGINT AS n_spaces
    FROM documents GROUP BY lang, source"""


def sql_prefix_dups() -> str:
    """Twin of queries.q_prefix_dups: substr prefix groups with more
    than one member."""
    from osmquadtreepostgis_ray.queries import PREFIX_K
    return f"""
    WITH g AS (
        SELECT substr(text, 1, {PREFIX_K}) AS prefix,
               count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS min_doc
        FROM documents GROUP BY 1
    )
    SELECT prefix, n_docs, min_doc FROM g WHERE n_docs > 1"""


def sql_dim_census() -> str:
    """Twin of queries.q_dim_census: the corpus dims/fmt rules
    (doc_id % 3 dims, % 4 fmt) as in _sql_decoded_pixels's img CTE;
    aspect division has non-negative operands."""
    return """
    WITH img AS (
        SELECT CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32
               ELSE 64 END AS w,
               CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32
               ELSE 48 END AS h,
               CASE WHEN doc_id % 4 = 0 THEN 'qlossy' ELSE 'raw' END AS fmt
        FROM documents
    )
    SELECT fmt, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
           count(*)::BIGINT AS n_images,
           (count(*) * w * h)::BIGINT AS px_total,
           CAST(w * 1000 // h AS BIGINT) AS aspect_permille
    FROM img GROUP BY fmt, w, h"""


def sql_benford() -> str:
    """Twin of queries.q_benford: leading digit of value cents via
    VARCHAR substr (exact; corpus values are 2-dp >= 0.01)."""
    return """
    SELECT event_type,
           CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*)::BIGINT AS n
    FROM events GROUP BY 1, 2"""


def sql_gap_histogram() -> str:
    """Twin of queries.q_gap_histogram: LAG whole-second gaps per user
    in (ts, event_id) order; bit_length bucket via an exact power-of-2
    range join (no float log2)."""
    from osmquadtreepostgis_ray.queries import GAP_BUCKET_CAP
    rows = ", ".join(f"({k}, {1 << (k - 1)}, {(1 << k) - 1})"
                     for k in range(1, GAP_BUCKET_CAP))
    return f"""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS tu,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
        FROM events
    ),
    g AS (
        SELECT (tu - prev) // 1000000 AS gap_s FROM o
        WHERE prev IS NOT NULL
    ),
    b AS (
        SELECT CASE WHEN gap_s = 0 THEN 0 ELSE p.k END AS bucket
        FROM g LEFT JOIN (VALUES {rows}) p(k, lo, hi)
          ON g.gap_s BETWEEN p.lo AND p.hi
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, count(*)::BIGINT AS n
    FROM b GROUP BY bucket"""


def sql_user_cell_share() -> str:
    """Twin of queries.q_user_cell_share: per-user top cell by
    (n DESC, cell ASC) with exact per-mille share (operands
    non-negative, so DuckDB // == numpy floor)."""
    return f"""
    WITH {events_geo_cte()},
    uc AS (SELECT user_id, cell, count(*) AS n FROM ev
           GROUP BY user_id, cell),
    tot AS (SELECT user_id, sum(n) AS n_events FROM uc GROUP BY user_id),
    r AS (
        SELECT user_id, cell, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, cell) AS rk
        FROM uc
    )
    SELECT r.user_id, r.cell AS top_cell, r.n::BIGINT AS n_top,
           t.n_events::BIGINT AS n_events,
           CAST(r.n * 1000 // t.n_events AS BIGINT) AS share_permille
    FROM r JOIN tot t ON t.user_id = r.user_id
    WHERE r.rk = 1"""


def sql_tile_distinct_users() -> str:
    """Twin of queries.q_tile_distinct_users: exact COUNT(DISTINCT)
    per tile (the sketchless twin of sql_hll_sketch)."""
    return f"""
    WITH {events_geo_cte()}
    SELECT tile, count(DISTINCT user_id)::BIGINT AS n_users
    FROM ev GROUP BY tile"""


def sql_video_cuts() -> str:
    """Twin of queries.q_video_cuts: frame-pair changed-pixel counts
    (the sql_dup_frames join) thresholded at CUT_T; first_cut -1 when
    no pair exceeds it."""
    from osmquadtreepostgis_ray.queries import CUT_T
    return f"""
    WITH d AS ({sql_dup_frames()})
    SELECT video_id,
           sum(CASE WHEN n_changed > {CUT_T} THEN 1 ELSE 0 END)::BIGINT
               AS n_cuts,
           coalesce(min(CASE WHEN n_changed > {CUT_T} THEN f END),
                    -1)::BIGINT AS first_cut
    FROM d GROUP BY video_id"""


def sql_source_ttr() -> str:
    """Twin of queries.q_source_ttr: distinct words vs whitespace
    tokens per source (the _word_tokens_cte split semantics); the
    per-mille division has non-negative operands."""
    return f"""
    WITH {_word_tokens_cte()},
    sw AS (
        SELECT d.source, t.w, count(*) AS n_tok
        FROM t JOIN documents d ON d.doc_id = t.doc_id
        GROUP BY d.source, t.w
    ),
    s AS (
        SELECT source, count(*)::BIGINT AS n_terms,
               sum(n_tok)::BIGINT AS n_tokens
        FROM sw GROUP BY source
    )
    SELECT source, n_terms, n_tokens,
           CAST(n_terms * 1000 // greatest(n_tokens, 1) AS BIGINT)
               AS ttr_permille
    FROM s"""


def sql_dow_profile() -> str:
    """Twin of queries.q_dow_profile: same epoch-day dow convention as
    sql_weekend_lift (0 = Sunday: epoch day 0 was a Thursday, +4 -> 4),
    exact cents."""
    return """
    SELECT event_type,
           CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
           count(*)::BIGINT AS n,
           sum(CAST(round(value * 100) AS BIGINT))::BIGINT
               AS sum_value_cents
    FROM events GROUP BY 1, 2"""


def sql_occupancy_curve() -> str:
    """Twin of queries.q_occupancy_curve: per-depth occupied-cell
    counts over the three OCC_DEPTHS resolutions (UNION ALL of
    depth-rollup aggregates)."""
    from osmquadtreepostgis_ray.queries import OCC_DEPTHS
    lon, lat = geotag.event_lonlat_milli_sql()
    parts = []
    for d in OCC_DEPTHS:
        parts.append(f"""
        SELECT CAST({d} AS BIGINT) AS depth, count(*)::BIGINT AS n_cells,
               max(n)::BIGINT AS max_cell_n, sum(n)::BIGINT AS n_events
        FROM (SELECT {_cell_expr(lon, lat, d)} AS cell, count(*) AS n
              FROM events GROUP BY 1)""")
    return " UNION ALL ".join(parts)


def sql_active_days() -> str:
    """Twin of queries.q_active_days: distinct epoch-days per user,
    histogrammed."""
    return """
    WITH ud AS (
        SELECT user_id,
               count(DISTINCT epoch_us(ts) // 86400000000) AS n_days
        FROM events GROUP BY user_id
    )
    SELECT CAST(n_days AS BIGINT) AS n_days, count(*)::BIGINT AS n_users
    FROM ud GROUP BY n_days"""


def sql_word_len_hist() -> str:
    """Twin of queries.q_word_len_hist: token lengths over the
    whitespace-token CTE, joined back for lang."""
    return f"""
    WITH {_word_tokens_cte()}
    SELECT d.lang, CAST(length(t.w) AS BIGINT) AS wlen,
           count(*)::BIGINT AS n
    FROM t JOIN documents d ON d.doc_id = t.doc_id
    GROUP BY 1, 2"""


def sql_child_occupancy() -> str:
    """Twin of queries.q_child_occupancy: distinct depth-10 cells ->
    per depth-8 tile child counts -> histogram."""
    from osmquadtreepostgis_ray.queries import CHILD_DEPTH
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH c AS (
        SELECT DISTINCT {_cell_expr(lon, lat, CHILD_DEPTH)} AS c10,
               {_cell_expr(lon, lat, TILE_DEPTH)} AS tile
        FROM events
    ),
    pt AS (SELECT tile, count(DISTINCT c10) AS k FROM c GROUP BY tile)
    SELECT CAST(k AS BIGINT) AS n_children, count(*)::BIGINT AS n_tiles
    FROM pt GROUP BY k"""


def sql_phash_bits() -> str:
    """Twin of queries.q_phash_bits: phash is non-negative (< 2^42 by
    construction), so (phash // 2^k) % 2 is the exact bit on both
    engines."""
    from osmquadtreepostgis_ray.queries import PHASH_BITS
    ph = geotag.phash_sql("doc_id")
    ks = ", ".join(f"({k})" for k in range(PHASH_BITS))
    return f"""
    WITH img AS (SELECT {ph} AS phash FROM documents),
    bits AS (SELECT * FROM (VALUES {ks}) b(k))
    SELECT CAST(b.k AS BIGINT) AS bit,
           sum((i.phash // power(2, b.k)::BIGINT) % 2)::BIGINT AS n_set
    FROM img i CROSS JOIN bits b
    GROUP BY b.k"""


def sql_caption_len_by_dims() -> str:
    """Twin of queries.q_caption_len_by_dims: the corpus dims rule
    (doc_id % 3) with caption = documents.text."""
    return """
    SELECT CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32
                ELSE 64 END AS BIGINT) AS w,
           CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32
                ELSE 48 END AS BIGINT) AS h,
           count(*)::BIGINT AS n_images,
           sum(length(text))::BIGINT AS sum_chars,
           max(length(text))::BIGINT AS max_chars
    FROM documents GROUP BY 1, 2"""


def sql_tile_type_diversity() -> str:
    """Twin of queries.q_tile_type_diversity: distinct event types per
    tile, histogrammed."""
    return f"""
    WITH {events_geo_cte()},
    tt AS (SELECT e.tile, count(DISTINCT ev2.event_type) AS k
           FROM ev e JOIN events ev2 ON ev2.event_id = e.event_id
           GROUP BY e.tile)
    SELECT CAST(k AS BIGINT) AS n_types, count(*)::BIGINT AS n_tiles
    FROM tt GROUP BY k"""


def sql_travel_dist() -> str:
    """Twin of queries.q_travel_dist: lag window over (user ORDER BY
    ts, event_id), L1 milli-degree legs, exact BIGINTs."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH pts AS (
        SELECT user_id, event_id, ts, {lon} AS lon, {lat} AS lat
        FROM events
    ),
    lg AS (
        SELECT user_id,
               lon - lag(lon) OVER w AS dx,
               lat - lag(lat) OVER w AS dy
        FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, count(*)::BIGINT AS n_legs,
           sum(abs(dx) + abs(dy))::BIGINT AS dist_l1,
           max(abs(dx) + abs(dy))::BIGINT AS max_leg
    FROM lg WHERE dx IS NOT NULL GROUP BY 1"""


def sql_bearing_hist() -> str:
    """Twin of queries.q_bearing_hist: the identical trig-free octant
    CASE tree over per-user legs; zero legs excluded."""
    lon, lat = geotag.event_lonlat_milli_sql()
    return f"""
    WITH pts AS (
        SELECT user_id, event_id, ts, {lon} AS lon, {lat} AS lat
        FROM events
    ),
    lg AS (
        SELECT user_id,
               lon - lag(lon) OVER w AS dx,
               lat - lag(lat) OVER w AS dy
        FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    mv AS (
        SELECT dx, dy, abs(dx) AS ax, abs(dy) AS ay FROM lg
        WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)
    )
    SELECT CAST(CASE
        WHEN dx >= 0 AND dy >= 0 AND ax >= ay THEN 0
        WHEN dx >= 0 AND dy >= 0 THEN 1
        WHEN dx < 0 AND dy >= 0 AND ay > ax THEN 2
        WHEN dx < 0 AND dy >= 0 THEN 3
        WHEN dx < 0 AND dy < 0 AND ax >= ay THEN 4
        WHEN dx < 0 AND dy < 0 THEN 5
        WHEN dx >= 0 AND dy < 0 AND ay > ax THEN 6
        ELSE 7 END AS BIGINT) AS sector,
        count(*)::BIGINT AS n
    FROM mv GROUP BY 1"""


def sql_dwell_move() -> str:
    """Twin of queries.q_dwell_move: the shared events_geo_cte cell,
    lag over (user ORDER BY ts, event_id), dwell = same-cell gap."""
    return f"""
    WITH {events_geo_cte()},
    p AS (
        SELECT ev.user_id, ev.event_id, e.ts, ev.cell
        FROM ev JOIN events e USING (event_id)
    ),
    lg AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap,
               CASE WHEN cell = lag(cell) OVER w THEN 1 ELSE 0 END AS dw
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, sum(dw)::BIGINT AS n_dwell,
           (count(*) - sum(dw))::BIGINT AS n_move,
           sum(CASE WHEN dw = 1 THEN gap ELSE 0 END)::BIGINT AS dwell_us,
           sum(CASE WHEN dw = 0 THEN gap ELSE 0 END)::BIGINT AS move_us
    FROM lg WHERE gap IS NOT NULL GROUP BY 1"""


def sql_tfidf_top(k: int = 3) -> str:
    """Twin of queries.q_tfidf_top: whitespace split, integer
    idf_milli = (1000 * n_docs) // df, row_number ties (score DESC,
    word ASC)."""
    return f"""
    WITH w AS (
        SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    w2 AS (SELECT * FROM w WHERE word <> ''),
    tf AS (SELECT source, word, count(*)::BIGINT AS tf
           FROM w2 GROUP BY 1, 2),
    df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df
           FROM w2 GROUP BY 1),
    nd AS (SELECT count(*)::BIGINT AS n FROM documents),
    sc AS (
        SELECT tf.source, tf.word,
               (tf.tf * ((1000 * nd.n) // df.df))::BIGINT AS score
        FROM tf JOIN df USING (word) CROSS JOIN nd
    ),
    r AS (SELECT source, word, score,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY score DESC, word) AS rk
          FROM sc)
    SELECT source, CAST(rk AS BIGINT) AS rk, word, score
    FROM r WHERE rk <= {k}"""


def sql_sample_permille() -> str:
    """Twin of queries.q_sample_permille: the same multiplicative
    hash gate (products < 2^63, so BIGINT math == the uint64 kernel)."""
    from osmquadtreepostgis_ray.queries import SAMPLE_MIX, SAMPLE_PERMILLE
    return f"""
    SELECT doc_id, source FROM documents
    WHERE ((doc_id * {SAMPLE_MIX}) % 4294967296) % 1000
          < {SAMPLE_PERMILLE}"""


def sql_trend_cells() -> str:
    """Twin of queries.q_trend_cells: epoch-day x, cent y, five raw
    sums + closed-form slope num/den, every aggregate cast BIGINT."""
    return f"""
    WITH {events_geo_cte()},
    p AS (
        SELECT ev.tile,
               epoch_us(e.ts) // 86400000000 AS x,
               CAST(round(e.value * 100) AS BIGINT) AS y
        FROM ev JOIN events e USING (event_id)
    ),
    s AS (
        SELECT tile, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
               sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
               sum(x * x)::BIGINT AS sxx
        FROM p GROUP BY tile
    )
    SELECT tile, n, sx, sy, sxy, sxx,
           (n * sxy - sx * sy)::BIGINT AS slope_num,
           (n * sxx - sx * sx)::BIGINT AS slope_den
    FROM s"""


def sql_scd2_intervals() -> str:
    """Twin of queries.q_scd2_intervals: lead() per user with the
    2^62 open sentinel."""
    open_us = 1 << 62
    return f"""
    SELECT user_id, event_id,
           epoch_us(ts)::BIGINT AS valid_from_us,
           coalesce(lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id),
               {open_us})::BIGINT AS valid_to_us
    FROM events"""


def sql_tile_checksum() -> str:
    """Twin of queries.q_tile_checksum: HUGEINT product reduced mod
    2^31 per event, summed per tile, folded mod 2^31 — order-invariant
    by construction, every intermediate inside int64 (see the query
    docstring's overflow bound)."""
    from osmquadtreepostgis_ray.queries import CHECKSUM_MIX
    m31 = 1 << 31
    return f"""
    WITH {events_geo_cte()},
    h AS (
        SELECT tile,
               CAST((CAST(event_id AS HUGEINT) * {CHECKSUM_MIX})
                    % {m31} AS BIGINT) AS hv
        FROM ev
    )
    SELECT tile, count(*)::BIGINT AS n,
           CAST(sum(CAST(hv AS HUGEINT)) % {m31} AS BIGINT) AS checksum
    FROM h GROUP BY tile"""


def sql_geohash_census() -> str:
    """Twin of queries.q_geohash_census: the identical 30-bit
    lon-odd/lat-even interleave unrolled, 6 substr alphabet lookups."""
    from osmquadtreepostgis_ray.queries import (GEOHASH_ALPHABET,
                                                GEOHASH_CHARS)
    lon, lat = geotag.event_lonlat_milli_sql()
    bits = 15
    n = 1 << bits
    ix = f"((({lon}) * 10000 * {n}) // {quadtree.LON_SPAN})"
    iy = f"(((({lat}) + 5000) * 10000 * {n}) // {quadtree.LAT_SPAN})"
    terms = []
    for b in range(bits):
        terms.append(f"(({ix} >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"(({iy} >> {b}) & 1) * {1 << (2 * b)}")
    g = "(" + " + ".join(terms) + ")"
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({g}) >> {5 * (GEOHASH_CHARS - 1 - c)}) & 31 AS INTEGER)"
        f" + 1, 1)"
        for c in range(GEOHASH_CHARS))
    return f"""
    SELECT {chars} AS geohash, count(*)::BIGINT AS n
    FROM events GROUP BY 1"""


def sql_active_span() -> str:
    """Twin of queries.q_active_span: gaps-and-islands via running-max
    window end, island = break where start > previous running end."""
    from osmquadtreepostgis_ray.queries import ACTIVE_WINDOW_US
    return f"""
    WITH {events_geo_cte()},
    p AS (
        SELECT ev.tile, epoch_us(e.ts) AS s,
               epoch_us(e.ts) + {ACTIVE_WINDOW_US} AS e
        FROM ev JOIN events e USING (event_id)
    ),
    o AS (
        SELECT tile, s, e,
               max(e) OVER (PARTITION BY tile ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_end
        FROM p
    ),
    m AS (
        SELECT tile, s, e,
               CASE WHEN prev_end IS NULL OR s > prev_end
                    THEN 1 ELSE 0 END AS brk
        FROM o
    ),
    isl AS (
        SELECT tile, s, e,
               sum(brk) OVER (PARTITION BY tile ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS iid
        FROM m
    ),
    g AS (SELECT tile, iid, min(s) AS st, max(e) AS en
          FROM isl GROUP BY 1, 2)
    SELECT tile, count(*)::BIGINT AS n_islands,
           sum(en - st)::BIGINT AS covered_us
    FROM g GROUP BY 1"""


def sql_snm_pairs() -> str:
    """Twin of queries.q_snm_pairs: the row_number self-join over the
    same normalized blocking key (ASCII corpus, so byte order ==
    pandas/Ray string sort order)."""
    from osmquadtreepostgis_ray.queries import SNM_KEY_LEN, SNM_WINDOW
    return f"""
    WITH k AS (
        SELECT doc_id,
               substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                      1, {SNM_KEY_LEN}) AS bk
        FROM documents
    ),
    r AS (SELECT doc_id,
                 row_number() OVER (ORDER BY bk, doc_id) - 1 AS rk
          FROM k)
    SELECT a.doc_id AS d1, b.doc_id AS d2, (b.rk - a.rk)::BIGINT AS gap
    FROM r a JOIN r b ON b.rk > a.rk AND b.rk < a.rk + {SNM_WINDOW}"""


def sql_knn_confusion() -> str:
    """Twin of queries.q_knn_confusion: quantized-euclid 1-NN per
    held-out vector via the dim-exploded distance join, confusion
    counted per (true, predicted) label."""
    from osmquadtreepostgis_ray.queries import KNN_HOLD
    from osmquadtreepostgis_ray.stages.cluster import KM_SCALE, KM_SHIFT
    q = ("list_transform(embedding, "
         f"x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
         f" + {KM_SHIFT})")
    return f"""
    WITH e AS (SELECT vec_id, label, {q} AS v FROM embeddings),
    ed AS (SELECT vec_id, label, generate_subscripts(v, 1) AS i,
                  unnest(v) AS x
           FROM e),
    qd AS (SELECT vec_id AS qid, label AS tl, i, x AS qx
           FROM ed WHERE vec_id % {KNN_HOLD} = 0),
    d AS (SELECT q.qid, q.tl, e.vec_id, e.label AS pl,
                 sum((q.qx - e.x) * (q.qx - e.x)) AS d2
          FROM qd q JOIN ed e USING (i)
          WHERE e.vec_id % {KNN_HOLD} <> 0
          GROUP BY q.qid, q.tl, e.vec_id, e.label),
    r AS (SELECT qid, tl, pl,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY d2, vec_id) AS rn
          FROM d)
    SELECT CAST(tl AS BIGINT) AS true_label,
           CAST(pl AS BIGINT) AS pred_label, count(*)::BIGINT AS n
    FROM r WHERE rn = 1 GROUP BY 1, 2"""


def sql_trimmed_mean() -> str:
    """Twin of queries.q_trimmed_mean: quantile_disc p10/p90 bounds,
    in-range count + cent sum (no division)."""
    return """
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    b AS (
        SELECT event_type, quantile_disc(cents, 0.1) AS lo,
               quantile_disc(cents, 0.9) AS hi
        FROM c GROUP BY 1
    )
    SELECT c.event_type, count(*)::BIGINT AS n_kept,
           sum(c.cents)::BIGINT AS sum_kept_cents
    FROM c JOIN b USING (event_type)
    WHERE c.cents BETWEEN b.lo AND b.hi
    GROUP BY 1"""


def sql_fof_count() -> str:
    """Twin of queries.q_fof_count: the sql_link_jaccard edge set,
    distinct 2-hop non-edge pairs, exploded to per-node counts."""
    return """
    WITH docs AS (SELECT doc_id FROM documents),
    e AS (
        SELECT doc_id - 1 AS a, doc_id AS b FROM docs WHERE doc_id >= 1
        UNION ALL
        SELECT doc_id - 2, doc_id FROM docs
        WHERE doc_id >= 2 AND (doc_id - 2) % 3 = 0
    ),
    u AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    w AS (
        SELECT DISTINCT u1.v AS v1, u2.v AS v2
        FROM u u1 JOIN u u2 ON u1.u = u2.u AND u1.v < u2.v
    ),
    nw AS (
        SELECT w.* FROM w
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.a = w.v1 AND e.b = w.v2)
    ),
    x AS (SELECT v1 AS node FROM nw UNION ALL SELECT v2 FROM nw)
    SELECT node, count(*)::BIGINT AS fof FROM x GROUP BY 1"""


def sql_bpe_encode() -> str:
    """Twin of queries.q_bpe_encode: the shared K-round merge chain
    (word carried through), post-merge token length per unique word,
    weighted by per-source occurrences."""
    from osmquadtreepostgis_ray.functions.text import BPE_TOKEN_RE
    from osmquadtreepostgis_ray.queries import BPE_MERGE_ROUNDS
    return f"""
    WITH {_bpe_chain_cte()},
    swct AS (
        SELECT source, word, count(*)::BIGINT AS n FROM (
            SELECT source, unnest(regexp_extract_all(
                text, '{BPE_TOKEN_RE}')) AS word
            FROM documents)
        GROUP BY 1, 2
    ),
    tl AS (
        SELECT word, len(string_split(trim(s), ' '))::BIGINT AS ntok
        FROM w{BPE_MERGE_ROUNDS}
    )
    SELECT s.source, sum(s.n)::BIGINT AS n_words,
           sum(s.n * t.ntok)::BIGINT AS n_tokens
    FROM swct s JOIN tl t USING (word)
    GROUP BY 1"""


def sql_semantic_dedup(k: int = 4, iters: int = 3) -> str:
    """Twin of queries.q_semantic_dedup: the unrolled Lloyd CTE
    (sql_kmeans_embed body) supplies cluster assignments; centered
    quantized vectors (floor(x*1024) — no shift) give integer-exact
    pairwise dots via the per-dim join, restricted to same-cluster
    id-ordered pairs; the dup test is the cross-multiplied rational
    cosine  dot >= 0 AND den^2*dot^2 >= num^2*n2u*n2v  (all BIGINT,
    max operand ~1.1e17), zero-norm vectors excluded."""
    from osmquadtreepostgis_ray.queries import SEM_TAU_DEN, SEM_TAU_NUM
    base = sql_kmeans_embed(k, iters)
    body = base[len("WITH "):base.rindex("SELECT vec_id")].rstrip()
    num2 = SEM_TAU_NUM * SEM_TAU_NUM
    den2 = SEM_TAU_DEN * SEM_TAU_DEN
    return f"""
    WITH {body},
    asg AS (SELECT vec_id, j AS cluster FROM a{iters}),
    cv AS (
        SELECT vec_id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS v
        FROM embeddings
    ),
    ce AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
           FROM cv),
    nrm AS (SELECT vec_id, sum(x * x)::BIGINT AS n2 FROM ce GROUP BY 1),
    pr AS (
        SELECT a1.vec_id AS u, a2.vec_id AS v
        FROM asg a1 JOIN asg a2
          ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
    ),
    dots AS (
        SELECT p.u, p.v, sum(e1.x * e2.x)::BIGINT AS dot
        FROM pr p
        JOIN ce e1 ON e1.vec_id = p.u
        JOIN ce e2 ON e2.vec_id = p.v AND e2.i = e1.i
        GROUP BY p.u, p.v
    ),
    dup AS (
        SELECT DISTINCT d.v AS vec_id
        FROM dots d
        JOIN nrm nu ON nu.vec_id = d.u
        JOIN nrm nv ON nv.vec_id = d.v
        WHERE nu.n2 > 0 AND nv.n2 > 0 AND d.dot >= 0
          AND {den2} * d.dot * d.dot >= {num2} * nu.n2 * nv.n2
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS kept
    FROM asg a LEFT JOIN dup USING (vec_id)"""
