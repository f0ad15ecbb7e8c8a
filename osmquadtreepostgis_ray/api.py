"""Top-level user API — signature-parity with the reference's driver
entry points (/root/reference osmquadtreepostgis/__init__.py:465-516 and
:560-591), re-targeted at directory-of-parquet outputs:

  write_to_table_dir  <->  write_to_postgis(prfx, box, connstr, ...)
  write_to_csvfile    <->  write_to_csvfile(prfx, box, outfnprfx, ...)

`sf_dir` plays the role of the reference's pbf prefix (the input corpus
location); the PostGIS connection becomes an output directory of
checkpointed parquet (state/checkpoint.py); `connstring='null'` keeps
the reference's dry-run counting semantics (S4).
"""

from __future__ import annotations

from osmquadtreepostgis_ray.config import EngineParams, Style, load_style


def _params(stylefn: Style | str | None, extended: bool, split_multipolygons: bool,
            validate_geometry: bool) -> EngineParams:
    """``stylefn`` mirrors the reference parameter of the same name
    (osmquadtreepostgis/__init__.py:465): a style FILE path (JSON,
    config.load_style), or an already-built Style, or None for the
    default style."""
    if isinstance(stylefn, str):
        stylefn = load_style(stylefn)
    return EngineParams(style=stylefn or Style(), extended=extended,
                        split_multipolygons=split_multipolygons,
                        validate_geometry=validate_geometry)


def write_to_table_dir(sf_dir: str, out_dir: str | None = None, *,
                       stylefn: Style | str | None = None, extended: bool = True,
                       split_multipolygons: bool = True, validate_geometry: bool = True,
                       part_depth: int = 4, max_rows_per_part: int | None = None):
    """The write_to_postgis analog: route+project the corpus into the 6
    extended tables and write checkpointed, resumable partitioned
    parquet.  ``out_dir=None`` (== the reference's ``connstring='null'``)
    runs the dry-run counting sink instead and returns per-table
    (rows, bytes).  Returns the lineage+metrics table otherwise."""
    p = _params(stylefn, extended, split_multipolygons, validate_geometry)
    if out_dir is None:
        from osmquadtreepostgis_ray.pipelines.flagship import output_tables
        from osmquadtreepostgis_ray.sinks import null_sink_counts
        return null_sink_counts(output_tables(sf_dir, p))
    from osmquadtreepostgis_ray.pipelines.flagship import export_resumable
    return export_resumable(sf_dir, out_dir, p, part_depth=part_depth)


def validate_geometry(rings, round_2dp: bool = False):
    """One-shot geometry oracle — the analog of the reference's pybind
    `validate_geometry(ele, round)` helper
    (/root/reference/src/postgis_python.cpp:396-402): repair rings (F7),
    optionally round coords to 2dp (F6), and return
    ``(polygon_ewkb, point_on_surface_ewkb)``."""
    import numpy as np

    from osmquadtreepostgis_ray.functions import ewkb
    from osmquadtreepostgis_ray.functions.geometry import (point_on_surface, polygon_area,
                                                           repair_rings)

    # full F7 repair: self-intersecting rings are split at their crossing
    # points into simple pieces (the buffer(0,16) parity path,
    # /root/reference/src/validategeoms.cpp:64-82); a figure-eight input
    # yields multiple polygons — the largest-area one is returned, as the
    # reference keeps the dominant part for the single-geometry helper
    polys = repair_rings([np.asarray(r, dtype=np.float64) for r in rings])
    if not polys:
        return None, None
    fixed = max(polys, key=polygon_area)
    if round_2dp:
        fixed = [np.round(r, 2) for r in fixed]
    pos = point_on_surface(fixed)
    return ewkb.polygon(fixed), ewkb.point(float(pos[0]), float(pos[1]))


def assemble_documents(sf_dir: str, *, split_multipolygons: bool = True,
                       validate_geometry: bool = True):
    """The geometry-assembly entry point (A1/A2 + M8/M9) — where the
    reference's `split_multipolygons` / `validate_geometry` flags take
    effect (write_to_postgis consumes them inside GeometryProcess,
    /root/reference/src/processpostgis.cpp:83-118):

    - split_multipolygons=False merges a multipolygon's parts into one
      row (the reference's !split path, src/postgiswriter.cpp:1125);
    - validate_geometry=False keeps degenerate/error rings in the output
      stream instead of dropping them to the error channel.

    The flagship footprint pipeline never consumes these flags because
    its geometries are synthesized axis-aligned boxes — always valid,
    never multi-part — so `write_to_table_dir` accepts them only for
    signature parity and passes them through EngineParams."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.sources.tables import read_table
    from osmquadtreepostgis_ray.stages.assembly import assemble

    ds = assemble(read_table(sf_dir, "documents", columns=["doc_id", "text"]),
                  split_parts=split_multipolygons)
    if validate_geometry:
        ds = ds.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("kind"), "error")),
            batch_format="pyarrow")
    return ds


def write_to_csvfile(sf_dir: str, outfnprfx: str | None = None, *,
                     stylefn: Style | str | None = None, extended: bool = True,
                     split_multipolygons: bool = True, validate_geometry: bool = True,
                     header: bool = True):
    """The write_to_csvfile analog (S3): one <prfx><table>.csv.gz per
    routed output table, reference COPY framing (sinks.py).
    ``outfnprfx=None`` mirrors the reference's block-capture mode and
    returns the materialized tables instead of writing."""
    p = _params(stylefn, extended, split_multipolygons, validate_geometry)
    from osmquadtreepostgis_ray.pipelines.flagship import output_tables
    tables = output_tables(sf_dir, p)
    if outfnprfx is None:
        return {name: ds.to_pandas() for name, ds in tables.items()}  # S7 capture
    from osmquadtreepostgis_ray.sinks import write_csv_gz
    return write_csv_gz(tables, outfnprfx, header=header)
