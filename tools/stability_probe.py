"""Probe: identical results at different parallelism levels (fresh
process per level). Prints a value hash per query."""
import hashlib
import os
import sys

import pandas as pd
import ray

ncpu = int(sys.argv[1])
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

for name in ("tile_assign", "flagship_counts", "pip_zones", "knn_cellring", "agg_cells",
             "image_ahash", "audio_features", "neardup_clusters", "ahash_dups",
             "hex_bin", "nn_join", "triangles", "running_total", "dense_rank",
             "segment_intersections", "pip_holes", "outer_join",
             "vocab_coverage", "domain_cap", "mixture_quotas", "retention",
             "funnel", "mixture_sample", "cluster_dedup_sample",
             "epoch_shuffle", "image_augment", "crossmodal_align",
             "pip_anti", "image_norm_stats", "zone_distance",
             "image_transcode", "snapshot_diff", "embed_calibration",
             "zone_border_dist", "tile_quadkey", "geo_dup_groups",
             "histogram_quantiles", "tile_bundle", "caption_stats_by_zone",
             "embed_pq", "embed_knn_pq", "embed_knn_quant", "pq_recall",
             "viewport", "dbscan", "idw", "moran", "seq_pack", "zonal_mode",
             "hotspot", "od_flows", "staypoints", "hilbert", "bpe_pairs",
             "spacetime_cube", "colocation", "headings", "thin",
             "densify", "line_raster", "map_match", "geohash",
             "pixel_hist", "glcm", "codec_sse", "dup_frames",
             "late_events", "moving_window", "lm_score", "kcore",
             "traj_hausdorff", "mmr_select", "otsu", "morphology",
             "blobs", "hex_ring", "ripley_k", "sssp_hops", "dist_raster",
             "fuzzy_decontam", "curriculum", "centroids", "skyline",
             "windowed_topk", "sinuosity", "zone_gini", "changepoint",
             "blockiness", "grad_orient", "kmv_sketch", "link_jaccard", "flow_accum",
             "slope_aspect", "lbp", "median3x3", "variogram",
             "time_split", "temperature_mix", "saliency_crop", "local_moran",
             "adaptive_tiles", "zone_overlay", "contour_cells",
             "chaikin", "visual_words", "image_dhash", "len_histogram",
             "fertility", "k_anon", "tile_edge_census", "audio_silence",
             "decay_counts", "od_gravity", "seam_cols",
             "interval_union", "user_extent", "degree_mix",
             "trend_fit", "history_ranges", "link_negatives",
             "inversions", "revisits", "modal_corr",
             "lang_confusion", "source_overlap", "near_dup_rate",
             "hist_equalize", "box5", "crossmodal_recall",
             "first_last_touch", "burstiness", "char_simpson",
             "fence_dwell", "vocab_tail", "cell_turnover",
             "weekend_lift", "pyramid_anomaly", "covisit_tiles"):
    res = E.queries()[name](sf)
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    df = df[sorted(df.columns)].sort_values(list(sorted(df.columns))).reset_index(drop=True)
    h = hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()[:16]
    print(f"{name} n={len(df)} hash={h}")
ray.shutdown()
