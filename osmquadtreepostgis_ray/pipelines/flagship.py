"""The flagship pipeline — the engine's write_to_postgis analog
(osmquadtreepostgis/__init__.py:465-516):

    read corpus -> cell encode -> route -> project -> 6 output tables

expressed as one lazy Ray Data graph per output table: a shared
upstream (read + cells + routing, computed once per branch at execution
time) with zero-copy Arrow filter branches, mirroring the reference's
CsvBlock table routing (src/postgiswriter.cpp:1079-1152) without its
serial writer channels.

Image payload bytes never enter this graph (with_bytes=False): the
projection ships only (id, caption, dims, phash) — the 'wide rows with
binary payloads' rule of SURVEY.md §7.3.  The PSNR-validated decode path
lives in stages/images.py.
"""

from __future__ import annotations

import ray.data

from osmquadtreepostgis_ray.config import EngineParams
from osmquadtreepostgis_ray.sources.images import read_images
from osmquadtreepostgis_ray.spec import build_table_specs
from osmquadtreepostgis_ray.stages.cells import encode_cells_batch
from osmquadtreepostgis_ray.stages.project import ProjectTable
from osmquadtreepostgis_ray.stages.routing import route_batch


def _maybe_timed(name: str, fn, p: EngineParams):
    """G3 hook: wrap a stage UDF with per-stage wait/exec recording when
    params.collect_metrics is on (state/metrics.py, the Prog analog)."""
    if not p.collect_metrics:
        return fn
    from osmquadtreepostgis_ray.state.metrics import timed_stage
    return timed_stage(name, fn, flush_every=p.metrics_flush_every)


def routed_corpus(sf_dir: str, params: EngineParams | None = None,
                  repeat: int = 1) -> ray.data.Dataset:
    """Corpus with cells + routing columns (shared upstream)."""
    p = params or EngineParams()

    def prep(batch):
        return route_batch(encode_cells_batch(batch, p), p)

    # batch_size=None: batch == block.  A fixed batch_size makes Ray
    # COALESCE small blocks into few batches (measured: the sf0.1
    # corpus collapsed to 6 tasks at batch_size=16384, capping the tile
    # stage's scaling); block size — governed by the reader /
    # DataContext target block size — is the right batch granularity
    # for this payload-free projection at any scale.
    return read_images(sf_dir, with_bytes=False, repeat=repeat,
                       parallelism=p.read_parallelism).map_batches(
        _maybe_timed("cells+route", prep, p),
        batch_format="pyarrow", batch_size=None)


def output_tables(sf_dir: str, params: EngineParams | None = None,
                  alloc=None) -> dict[str, ray.data.Dataset]:
    """name -> lazy Dataset of the projected output table.  ``alloc``
    is the M3 hook: 'default' / 'extended' / callable(name, batch)->mask."""
    from osmquadtreepostgis_ray.stages.routing import resolve_alloc
    p = params or EngineParams()
    specs = build_table_specs(p.style, extended=p.extended)
    routed = routed_corpus(sf_dir, p)
    alloc_fn = resolve_alloc(alloc if alloc is not None
                             else ("extended" if p.extended else "default"))
    out: dict[str, ray.data.Dataset] = {}
    for name, spec in specs.items():
        filt = alloc_fn(name)
        negate = name == "boundary"

        def branch(batch, _filt=filt, _spec=spec, _neg=negate):
            sel = _filt(batch)
            # boundary-fanout rows also negate in the polygon table (M9)
            if _spec.name in ("polygon", "building") and sel.num_rows:
                import pyarrow as pa
                import pyarrow.compute as pc
                bnd = sel.column("is_boundary")
                pos = ProjectTable(_spec, False, p)(sel.filter(pc.invert(bnd)))
                neg = ProjectTable(_spec, True, p)(sel.filter(bnd))
                return pa.concat_tables([pos, neg])
            return ProjectTable(_spec, _neg, p)(sel)

        out[name] = routed.map_batches(branch, batch_format="pyarrow",
                                       batch_size=None)
    return out


def all_tables_union(sf_dir: str, params: EngineParams | None = None,
                     repeat: int = 1) -> ray.data.Dataset:
    """See tables_union_of — this form reads the corpus from sf_dir."""
    p = params or EngineParams()
    return tables_union_of(
        read_images(sf_dir, with_bytes=False, repeat=repeat,
                    parallelism=p.read_parallelism), p)


def tables_union_of(docs: ray.data.Dataset, params: EngineParams | None = None) -> ray.data.Dataset:
    """SINGLE-PASS variant: one Dataset carrying every routed output row
    with a `tbl` tag column over the union schema (missing columns
    null).  The per-table branch graphs in `output_tables` each re-read
    and re-route the corpus — fine for lazy per-table consumers, wrong
    for a full export at 100 TB.  This is the full-export path: read and
    route ONCE, project all 6 tables per batch, concat with nulls.
    Mirrors the reference's CsvBlock (one encoded batch holding all
    tables' rows, src/postgiswriter.hpp:35-81)."""
    import pyarrow as pa

    from osmquadtreepostgis_ray.stages.routing import table_filter

    p = params or EngineParams()
    specs = build_table_specs(p.style, extended=p.extended)
    union_names: list[str] = ["tbl"]
    union_fields: dict[str, object] = {}
    for spec in specs.values():
        for f in spec.arrow_schema():
            if f.name not in union_fields:
                union_fields[f.name] = f.type
                union_names.append(f.name)
    union_schema = pa.schema([("tbl", pa.string())] +
                             [(n, union_fields[n]) for n in union_names[1:]])

    def project_all(batch: pa.Table) -> pa.Table:
        outs = []
        for name, spec in specs.items():
            filt = table_filter(name, extended=p.extended)
            sel = filt(batch)
            negate = name == "boundary"
            if spec.name in ("polygon", "building") and sel.num_rows:
                import pyarrow.compute as pc
                bnd = sel.column("is_boundary")
                proj = pa.concat_tables([
                    ProjectTable(spec, False, p)(sel.filter(pc.invert(bnd))),
                    ProjectTable(spec, True, p)(sel.filter(bnd)),
                ])
            else:
                proj = ProjectTable(spec, negate, p)(sel)
            cols = [pa.array([name] * proj.num_rows, pa.string())]
            for n in union_names[1:]:
                cols.append(proj.column(n) if n in proj.column_names
                            else pa.nulls(proj.num_rows, union_fields[n]))
            outs.append(pa.Table.from_arrays(cols, schema=union_schema))
        return pa.concat_tables(outs)

    def prep(batch):
        return route_batch(encode_cells_batch(batch, p), p)

    # batch == block (see routed_corpus): keeps task count = block
    # count instead of coalescing the whole corpus into a handful of
    # 16k-row batches
    return docs.map_batches(_maybe_timed("cells+route", prep, p),
                            batch_format="pyarrow", batch_size=None) \
        .map_batches(_maybe_timed("project_all", project_all, p),
                     batch_format="pyarrow", batch_size=None)


def export_resumable(sf_dir: str, out_dir: str, params: EngineParams | None = None,
                     part_depth: int = 4):
    """The production export: read+route+project ONCE (all_tables_union),
    write quadtree-partitioned parquet with per-partition lineage +
    metrics manifests — a killed run resumes skipping completed
    partitions (state/checkpoint.py).  Returns the metrics table."""
    from osmquadtreepostgis_ray.state.checkpoint import resumable_write
    return resumable_write(all_tables_union(sf_dir, params), out_dir,
                           key_col="tile", part_depth=part_depth)


def write_outputs(sf_dir: str, out_dir: str, params: EngineParams | None = None) -> dict[str, int]:
    """Materialize every table to partitioned parquet; returns row counts
    (the CsvBlockCount analog, src/postgiswriter.cpp:1338-1360)."""
    counts = {}
    for name, ds in output_tables(sf_dir, params).items():
        ds.write_parquet(f"{out_dir}/{name}")
        import pyarrow.parquet as pq
        import glob
        counts[name] = sum(pq.read_metadata(f).num_rows
                           for f in glob.glob(f"{out_dir}/{name}/*.parquet"))
    return counts
