"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship pipeline smoke on sf0.001.
queries()    — one entry per implemented operator/pipeline (SURVEY.md §2
               + training-data ops); each callable takes sf_dir.
oracle_sql() — DuckDB twins for the SQL-expressible subset.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: corpus -> cells -> route -> project;
    returns the projected point table (Dataset)."""
    from osmquadtreepostgis_ray import queries as Q
    return Q.q_flagship_point("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from osmquadtreepostgis_ray import queries as Q
    return {
        # geospatial core (cell encode, tiling, PIP, kNN)
        "cell_histogram": Q.q_cell_histogram,
        "tile_assign": Q.q_tile_assign,
        "tile_quadkey": Q.q_tile_quadkey,
        "tile_bundle": Q.q_tile_bundle,
        "agg_cells": Q.q_agg_cells,
        "tile_cover": Q.q_tile_cover,
        "pip_zones": Q.q_pip_zones,
        "pip_anti": Q.q_pip_anti,
        "viewport": Q.q_viewport,
        "zone_distance": Q.q_zone_distance,
        "zone_border_dist": Q.q_zone_border_dist,
        "pip_zones_partitioned": Q.q_pip_zones_partitioned,
        "zonal_stats": Q.q_zonal_stats,
        "pushdown_filter": Q.q_pushdown_filter,
        "tile_pyramid": Q.q_tile_pyramid,
        "radius_join": Q.q_radius_join,
        "rect_join": Q.q_rect_join,
        "tile_mosaic": Q.q_tile_mosaic,
        "tile_sobel": Q.q_tile_sobel,
        "mosaic_pyramid": Q.q_mosaic_pyramid,
        "hll_sketch": Q.q_hll_sketch,
        "rasterize": Q.q_rasterize,
        "raster_blur": Q.q_raster_blur,
        "dissolve": Q.q_dissolve,
        "trajectories": Q.q_trajectories,
        "knn_brute": Q.q_knn_brute,
        "knn_cellring": Q.q_knn_cellring,
        # flagship routing/projection/unions/lowzoom
        "flagship_point": Q.q_flagship_point,
        "flagship_counts": Q.q_flagship_counts,
        "union_lines": Q.q_union_lines,
        "roads": Q.q_roads,
        "union_polygon": Q.q_union_polygon,
        "polygon_point": Q.q_polygon_point,
        "lowzoom_counts": Q.q_lowzoom_counts,
        # geometry assembly + propagation (A1-A4) and checkpoint/lineage
        "assembly": Q.q_assembly,
        "relation_tags": Q.q_relation_tags,
        "admin_levels": Q.q_admin_levels,
        "parent_tags": Q.q_parent_tags,
        "checkpoint": Q.q_checkpoint,
        "json_props": Q.q_json_props,
        "json_extract": Q.q_json_extract,
        "simplify_ways": Q.q_simplify_ways,
        # relational ops (joins, window, topk, agg, diff-merge dedup)
        "segment_intersections": Q.q_segment_intersections,
        "triangles": Q.q_triangles,
        "pip_holes": Q.q_pip_holes,
        "dense_rank": Q.q_dense_rank,
        "lag_delta": Q.q_lag_delta,
        "outer_join": Q.q_outer_join,
        "snapshot_diff": Q.q_snapshot_diff,
        "ahash_neardup": Q.q_ahash_neardup,
        "hex_bin": Q.q_hex_bin,
        "cube_counts": Q.q_cube_counts,
        "mode_user_type": Q.q_mode_user_type,
        "sample_weighted": Q.q_sample_weighted,
        "corr_components": Q.q_corr_components,
        "nn_join": Q.q_nn_join,
        "running_total": Q.q_running_total,
        "dedup_latest": Q.q_dedup_latest,
        "window_hourly": Q.q_window_hourly,
        "window_sliding": Q.q_window_sliding,
        "quantiles": Q.q_quantiles,
        "quantiles_cont": Q.q_quantiles_cont,
        "histogram_quantiles": Q.q_histogram_quantiles,
        "rank_ties": Q.q_rank_ties,
        "outliers": Q.q_outliers,
        "moments": Q.q_moments,
        "join_orders_customer": Q.q_join_orders_customer,
        "skew_join": Q.q_skew_join,
        "join_lineitem_part": Q.q_join_lineitem_part,
        "topk_orders": Q.q_topk_orders,
        "distinct_users": Q.q_distinct_users,
        "sessionize": Q.q_sessionize,
        "transitions": Q.q_transitions,
        "sample_events": Q.q_sample_events,
        "sample_stratified": Q.q_sample_stratified,
        "topk_per_segment": Q.q_topk_per_segment,
        "lineitem_pricing": Q.q_lineitem_pricing,
        "asof_join": Q.q_asof_join,
        "range_join": Q.q_range_join,
        "semi_join": Q.q_semi_join,
        "anti_join": Q.q_anti_join,
        "bloom_semi": Q.q_bloom_semi,
        "heavy_hitters": Q.q_heavy_hitters,
        "ntile": Q.q_ntile,
        "pagerank": Q.q_pagerank,
        "pivot": Q.q_pivot,
        "unpivot": Q.q_unpivot,
        "intersect_keys": Q.q_intersect_keys,
        "except_keys": Q.q_except_keys,
        "rollup": Q.q_rollup,
        # training-data text ops
        "dedup_exact": Q.q_dedup_exact,
        "lang_id": Q.q_lang_id,
        "quality": Q.q_quality,
        "hstore_tags": Q.q_hstore_tags,
        "token_totals": Q.q_token_totals,
        "token_bpe": Q.q_token_bpe,
        "chunk_docs": Q.q_chunk_docs,
        "top_terms": Q.q_top_terms,
        "inverted_index": Q.q_inverted_index,
        "collocations": Q.q_collocations,
        "fuzzy_join": Q.q_fuzzy_join,
        "sequence_packing": Q.q_sequence_packing,
        "fingerprints": Q.q_fingerprints,
        "repetition": Q.q_repetition,
        "decontaminate": Q.q_decontaminate,
        "pii_redact": Q.q_pii_redact,
        "vocab_coverage": Q.q_vocab_coverage,
        "domain_cap": Q.q_domain_cap,
        "mixture_quotas": Q.q_mixture_quotas,
        "retention": Q.q_retention,
        "funnel": Q.q_funnel,
        "mixture_sample": Q.q_mixture_sample,
        "cluster_dedup_sample": Q.q_cluster_dedup_sample,
        "epoch_shuffle": Q.q_epoch_shuffle,
        "minhash_pairs": Q.q_minhash_pairs,
        "simhash": Q.q_simhash,
        "ngram_dups": Q.q_ngram_dups,
        "dup_spans": Q.q_dup_spans,
        # embeddings (similarity search / near-dup)
        "embed_docs": Q.q_embed_docs,
        "embed_knn": Q.q_embed_knn,
        "embed_knn_ivf": Q.q_embed_knn_ivf,
        "embed_knn_ivf_exhaustive": Q.q_embed_knn_ivf_exhaustive,
        "embed_knn_lsh": Q.q_embed_knn_lsh,
        "embed_knn_lsh_exhaustive": Q.q_embed_knn_lsh_exhaustive,
        "embed_neardup": Q.q_embed_neardup,
        "hard_negatives": Q.q_hard_negatives,
        "ann_recall": Q.q_ann_recall,
        # multimodal decode paths
        "image_decode": Q.q_image_decode,
        "image_blur": Q.q_image_blur,
        "image_augment": Q.q_image_augment,
        "crossmodal_knn": Q.q_crossmodal_knn,
        "crossmodal_align": Q.q_crossmodal_align,
        "image_norm_stats": Q.q_image_norm_stats,
        "image_transcode": Q.q_image_transcode,
        "frame_sample": Q.q_frame_sample,
        "image_ahash": Q.q_image_ahash,
        "image_resize": Q.q_image_resize,
        "image_patches": Q.q_image_patches,
        "ahash_dups": Q.q_ahash_dups,
        "geo_dup_groups": Q.q_geo_dup_groups,
        "caption_stats_by_zone": Q.q_caption_stats_by_zone,
        "audio_features": Q.q_audio_features,
        "audio_windows": Q.q_audio_windows,
        # dedup clustering
        "neardup_clusters": Q.q_neardup_clusters,
        "dbscan": Q.q_dbscan,
        "idw": Q.q_idw,
        "moran": Q.q_moran,
        "seq_pack": Q.q_seq_pack,
        "zonal_mode": Q.q_zonal_mode,
        "hotspot": Q.q_hotspot,
        "od_flows": Q.q_od_flows,
        "staypoints": Q.q_staypoints,
        "hilbert": Q.q_hilbert,
        "bpe_pairs": Q.q_bpe_pairs,
        "spacetime_cube": Q.q_spacetime_cube,
        "colocation": Q.q_colocation,
        "headings": Q.q_headings,
        "thin": Q.q_thin,
        "split_leakage_safe": Q.q_split_leakage_safe,
        "kmeans_embed": Q.q_kmeans_embed,
        "embed_calibration": Q.q_embed_calibration,
        "embed_pq": Q.q_embed_pq,
        "embed_knn_pq": Q.q_embed_knn_pq,
        "embed_knn_quant": Q.q_embed_knn_quant,
        "pq_recall": Q.q_pq_recall,
        "multimodal_fusion": Q.q_multimodal_fusion,
    }


def oracle_sql() -> dict[str, str]:
    from osmquadtreepostgis_ray.oracle import build_oracles
    return build_oracles()
