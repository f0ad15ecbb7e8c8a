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
from osmquadtreepostgis_ray.stages.routing import route_batch, table_filter


def routed_corpus(sf_dir: str, params: EngineParams | None = None) -> ray.data.Dataset:
    """Corpus with cells + routing columns (shared upstream)."""
    p = params or EngineParams()

    def prep(batch):
        return route_batch(encode_cells_batch(batch, p), p)

    return read_images(sf_dir, with_bytes=False).map_batches(
        prep, batch_format="pyarrow", batch_size=p.batch_size)


def output_tables(sf_dir: str, params: EngineParams | None = None) -> dict[str, ray.data.Dataset]:
    """name -> lazy Dataset of the projected output table."""
    p = params or EngineParams()
    specs = build_table_specs(p.style, extended=p.extended)
    routed = routed_corpus(sf_dir, p)
    out: dict[str, ray.data.Dataset] = {}
    for name, spec in specs.items():
        filt = table_filter(name, extended=p.extended)
        negate = name == "boundary"

        def branch(batch, _filt=filt, _spec=spec, _neg=negate):
            sel = _filt(batch)
            # boundary-fanout rows also negate in the polygon table (M9)
            if _spec.name in ("polygon", "building") and sel.num_rows:
                import pyarrow as pa
                import pyarrow.compute as pc
                bnd = sel.column("is_boundary")
                pos = ProjectTable(_spec, False)(sel.filter(pc.invert(bnd)))
                neg = ProjectTable(_spec, True)(sel.filter(bnd))
                return pa.concat_tables([pos, neg])
            return ProjectTable(_spec, _neg)(sel)

        out[name] = routed.map_batches(branch, batch_format="pyarrow",
                                       batch_size=p.batch_size)
    return out


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
