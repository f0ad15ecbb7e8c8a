"""Incremental export maintenance — the reference's planet+change-file
semantic (read_blocks_merge over diffs, /root/reference
src/processpostgis.cpp:143) realized at the EXPORT level: given a
checkpointed export and a change set of documents (upserts), recompute
ONLY the partitions whose quadtree cells contain changed rows.

Correct because a row's tile — and therefore its partition — is a pure
function of doc_id (phash geotag), never of the row's text: an upsert
can change routing/columns but not move the row between partitions, so
invalidating the changed rows' partitions is exhaustive.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import ray
import ray.data

from osmquadtreepostgis_ray.config import EngineParams
from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.sources.tables import read_table
from osmquadtreepostgis_ray.state.checkpoint import DATA_DIR, MANIFEST_DIR, resumable_write

TILE_DEPTH = 8  # matches stages/cells.py EngineParams.tile_depth default


def partitions_of_docs(doc_ids: np.ndarray, part_depth: int = 4) -> np.ndarray:
    """Partition ids containing the given documents (pure function)."""
    ph = geotag.phash_of(np.asarray(doc_ids, dtype=np.int64))
    lon_m, lat_m = geotag.lonlat_milli_from_phash(ph)
    fx, fy = geotag.milli_to_fixed(lon_m, lat_m)
    ix, iy = quadtree.fixed_to_ixy(fx, fy, TILE_DEPTH)
    tile = quadtree.encode_ixy(ix, iy, TILE_DEPTH)
    return np.unique(quadtree.at_depth(tile, part_depth))


def invalidate_partitions(out_dir: str, parts: np.ndarray,
                          part_depth: int = 4) -> int:
    """Drop manifests + data dirs for the given part_depth partitions AND
    any quadtree DESCENDANTS of them (skew-subdivided hot partitions from
    a max_rows_per_part write live under deeper ids; leaving them behind
    would duplicate their rows after the shallow id is rewritten)."""
    from osmquadtreepostgis_ray.state.checkpoint import completed_partitions

    affected = {int(p) for p in parts}

    def is_affected(pid: int) -> bool:
        if pid in affected:
            return True
        depth = pid & 63
        if depth > part_depth:
            anc = int(quadtree.at_depth(np.array([pid], dtype=np.int64), part_depth)[0])
            return anc in affected
        return False

    victims = {pid for pid in completed_partitions(out_dir) if is_affected(pid)}
    victims |= affected  # data dirs may exist without manifests (killed run)
    n = 0
    for pid in sorted(victims):
        man = os.path.join(out_dir, MANIFEST_DIR, f"{pid}.json")
        if os.path.exists(man):
            os.remove(man)
            n += 1
        ddir = os.path.join(out_dir, DATA_DIR, f"part={pid}")
        if os.path.isdir(ddir):
            shutil.rmtree(ddir)
    return n


def update_export(out_dir: str, sf_dir: str, changes: pa.Table,
                  params: EngineParams | None = None, part_depth: int = 4) -> pa.Table:
    """Apply a change set (documents-shaped upserts: doc_id, text) to a
    checkpointed export.  Only affected partitions recompute; everything
    else is skipped via the manifest.  Returns the metrics table."""
    from osmquadtreepostgis_ray.pipelines.flagship import tables_union_of
    from osmquadtreepostgis_ray.state.checkpoint import read_settings

    p = params or EngineParams()
    # reuse the original write's partition settings: a different
    # part_depth / skew config would mis-align partition ids vs the
    # on-disk manifests
    settings = read_settings(out_dir) or {}
    part_depth = int(settings.get("part_depth", part_depth))
    max_rows_per_part = settings.get("max_rows_per_part")
    skew_depth_delta = int(settings.get("skew_depth_delta", 2))
    changed_ids = changes.column("doc_id").to_numpy()
    parts = partitions_of_docs(changed_ids, part_depth)
    invalidate_partitions(out_dir, parts, part_depth=part_depth)

    # merged corpus = base minus changed ids, plus changes (latest wins)
    ids_ref = ray.put(np.sort(changed_ids.astype(np.int64)))

    def drop_changed(batch: pa.Table) -> pa.Table:
        mask = ~np.isin(batch.column("doc_id").to_numpy(), ray.get(ids_ref))
        return batch.filter(pa.array(mask))

    base = read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(drop_changed, batch_format="pyarrow")
    merged = base.union(ray.data.from_arrow(changes.select(["doc_id", "text"])))

    from osmquadtreepostgis_ray.sources.images import _synth_meta_batch
    docs = merged.map_batches(_synth_meta_batch, batch_format="pyarrow")
    return resumable_write(tables_union_of(docs, p), out_dir,
                           key_col="tile", part_depth=part_depth,
                           max_rows_per_part=max_rows_per_part,
                           skew_depth_delta=skew_depth_delta)
