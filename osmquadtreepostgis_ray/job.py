"""Cluster job entry point — what `ray job submit` runs in production:

    ray job submit -- python -m osmquadtreepostgis_ray.job \
        --sf-dir /data/corpus --out /data/out --part-depth 4

Owns a Ray session only when none exists (the job server initialises one
for submitted jobs; standalone runs get a local session).  The export is
checkpointed per partition (state/checkpoint.py), so resubmitting after a
kill resumes, skipping completed partitions — run with --show-manifest to
inspect the lineage/metrics table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="osmquadtreepostgis_ray export job")
    ap.add_argument("--sf-dir", required=True, help="input corpus dir (parquet/lance)")
    ap.add_argument("--out", required=True, help="output dir (checkpointed parquet)")
    ap.add_argument("--part-depth", type=int, default=4)
    ap.add_argument("--max-rows-per-part", type=int, default=None,
                    help="skew guard: subdivide hotter partitions")
    ap.add_argument("--default-routing", action="store_true",
                    help="3-table routing instead of extended 6-table")
    ap.add_argument("--show-manifest", action="store_true")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from osmquadtreepostgis_ray.config import EngineParams
    from osmquadtreepostgis_ray.pipelines.flagship import all_tables_union
    from osmquadtreepostgis_ray.state.checkpoint import read_manifest, resumable_write

    if args.show_manifest:
        man = read_manifest(args.out)
        for rec in man.to_pylist():
            print(json.dumps(rec))
        return 0

    params = EngineParams(extended=not args.default_routing)
    metrics = resumable_write(
        all_tables_union(args.sf_dir, params), args.out,
        key_col="tile", part_depth=args.part_depth,
        max_rows_per_part=args.max_rows_per_part)
    done = sum(1 for s in metrics.column("status").to_pylist() if s == "done")
    skipped = metrics.num_rows - done
    rows = sum(metrics.column("rows").to_pylist())
    print(json.dumps({"partitions_written": done, "partitions_skipped": skipped,
                      "rows": rows, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
