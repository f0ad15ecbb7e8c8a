import numpy as np
import pyarrow as pa
import pytest

from osmquadtreepostgis_ray import queries as Q
from osmquadtreepostgis_ray.functions import ewkb
from osmquadtreepostgis_ray.pipelines.flagship import output_tables


def test_flagship_tables_schema_and_rows(sf_dir):
    tables = output_tables(sf_dir)
    assert set(tables) == {"point", "line", "polygon", "highway", "building", "boundary"}
    pt = tables["point"].to_pandas()
    assert len(pt) > 0
    assert {"osm_id", "quadtree", "tile", "tags", "minzoom", "way"} <= set(pt.columns)
    # EWKB geometry is parseable with srid 3857
    t, srid, _ = ewkb.parse(pt["way"].iloc[0])
    assert (t, srid) == (ewkb.WKB_POINT, 3857)
    bd = tables["boundary"].to_pandas()
    if len(bd):
        assert (bd["osm_id"] <= 0).all()  # M9 negation (doc_id 0 -> 0)
        t, srid, rings = ewkb.parse(bd["way"].iloc[0])
        assert t == ewkb.WKB_POLYGON and len(rings[0]) == 5


def test_tile_assign_invariant_under_parallelism(sf_dir):
    a = Q.q_tile_assign(sf_dir).to_pandas().sort_values("event_id").reset_index(drop=True)
    b = (Q.prep_events(sf_dir).repartition(13)
         .select_columns(["event_id", "cell", "tile"])
         .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert a.equals(b)


def test_knn_cellring_equals_brute(sf_dir):
    br = Q.q_knn_brute(sf_dir).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    cr = Q.q_knn_cellring(sf_dir).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert br[["query_id", "neighbor_id", "dist", "rank"]].equals(
        cr[["query_id", "neighbor_id", "dist", "rank"]])


def test_pip_zone_pairs_against_bruteforce(sf_dir):
    from osmquadtreepostgis_ray.functions.geometry import points_in_polygon
    from osmquadtreepostgis_ray.sources.zones import zone_rings, zones_table
    got = Q.q_pip_zones(sf_dir).to_pandas()
    ev = Q.prep_events(sf_dir).select_columns(["event_id", "lon", "lat"]).to_pandas()
    pts = ev[["lon", "lat"]].to_numpy()
    want = set()
    for row in zones_table().to_pylist():
        hit = points_in_polygon(pts, zone_rings(row))
        for i in np.flatnonzero(hit):
            want.add((int(ev["event_id"].iloc[i]), int(row["zone_id"])))
    assert set(zip(got["event_id"], got["zone_id"])) == want


def test_image_decode_psnr_invariant(sf_dir):
    df = Q.q_image_decode(sf_dir).to_pandas()
    assert len(df) == 500
    assert df["psnr_ok"].all()


def test_merge_latest_source(sf_dir):
    import ray.data
    from osmquadtreepostgis_ray.sources.tables import merge_latest
    base = ray.data.from_items([
        {"k": 1, "v": "old", "ver": 1}, {"k": 2, "v": "keep", "ver": 1}])
    chg = ray.data.from_items([{"k": 1, "v": "new", "ver": 2}])
    out = merge_latest(base, chg, key="k", version="ver").to_pandas()
    assert dict(zip(out["k"], out["v"])) == {1: "new", 2: "keep"}


def test_entry_smoke():
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E
    ds = E.entry()
    df = ds.to_pandas()
    assert len(df) >= 0
    assert "osm_id" in df.columns
