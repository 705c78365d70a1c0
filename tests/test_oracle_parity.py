"""Driver-mimicking correctness gate: run every ``queries()`` entry at
sf0.001 and compare against its ``oracle_sql()`` via DuckDB — row
count, schema (column names), and order-insensitive value equality —
the same comparison the driver performs at sf0.01."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def entries(ray_session):
    import __ray_entry__

    return __ray_entry__.queries(), __ray_entry__.oracle_sql()


def test_entry_smoke(ray_session):
    import __ray_entry__

    out = _to_pandas(__ray_entry__.entry())
    assert len(out) >= 0
    assert set(out.columns) == {"tile_z", "tile_x", "tile_y", "n_images"}


@pytest.mark.parametrize("name", [
    "promo_revenue", "market_share", "top_supplier", "brand_suppliers",
    "small_qty_revenue", "idle_customers", "late_priority",
    "spearman", "mann_whitney", "chi2_independence", "anova_f",
    "ewma_hourly", "hourly_seasonality", "seasonal_error", "rare_tokens",
    "douglas_peucker", "hll_users", "hll_users_by_type", "simhash",
    "minhash_dedup", "bpe_merges",
    "geotag", "cells", "tiles", "tile_stats", "events_by_type", "dedup_docs",
    "topk_events", "token_count", "quality", "knn", "pip_join_boxes",
    "ann_cosine", "cell_stats", "orders_per_nation", "semi_join_events",
    "anti_join_events",
    "window_counts", "asof_join", "distinct_types", "tile_polygons",
    "session_windows", "rolling_counts", "prefix_sums", "lag_deltas",
    "union_all", "hash_sample", "lineitem_stats",
    "minhash_exact", "top_tokens", "heavy_hitters", "tfidf",
    "order_lineitems", "profile_lineitem", "skew_join", "decontam",
    "group_stats", "rollup_orders", "group_mode", "rank_events",
    "setsim_pairs", "box_join", "group_concat", "pagerank",
    "funnel", "props_extract", "percentile_cont", "throttle_dedup",
    "radius_join", "star_join", "cube_orders", "travel_dist",
    "embedding_stats", "tile_pyramid", "kmeans", "upsert_merge",
    "nb_features", "mad", "sliding_distinct", "equidepth_hist",
    "scd_intervals", "ratio_to_report",
    "full_outer", "user_window", "dense_rank", "corr_flags",
    "pct_rank", "retention", "doc_stats", "type_entropy",
    "gap_fill", "triangles", "char_jaccard", "dup_spans", "unpivot",
    "transitions", "degree_hist", "group_percentiles",
    "minmax_norm", "winsorize", "cooccur", "shipping_priority", "outlier_flags", "hamming_topk",
    "local_volume", "big_orders", "returned_revenue",
    "pareto_front", "regex_extract", "interval_overlap", "asof_forward",
    "edit_join", "connected_components", "phrase_match", "min_cost_supp",
    "rows_frame_sum", "unigram_logprob", "ks_drift", "global_rank", "gini",
    "heading_octants", "stay_points", "shoelace_area", "bm25_topk",
    "spatial_clusters", "nearest_center", "rolling_zscore",
    "trend_slopes", "adaptive_tiles", "power_iteration", "group_sample",
    "mom_revenue", "label_scatter", "od_matrix", "cum_new_users",
    "kring_smooth", "border_crossings", "geohash4", "dbscan",
    "image_checksum", "thumb_checksum", "blur_checksum",
    "patch_checksum", "dhash_checksum", "colocation",
    "integral_checksum", "maxpool_checksum", "rle_runs", "lbp_hist",
    "median3_checksum", "euler4x", "chan_corr",
    "morph_checksum", "block_dct", "clustering_coeff", "closest_pair",
    "bilinear_checksum", "image_entropy", "audio_zcr", "triangle_raster",
    "haar_checksum", "dtw_pairs", "map_match", "winnowing", "hausdorff_pairs",
    "mann_kendall", "theilsen_slope", "hist_intersect",
    "modularity", "cms_counts", "audio_dft", "merkle_levels",
    "itemset_triples", "fano_factor", "markov_entropy",
    "rs_range", "perm_counts", "runs_test", "lis_length",
    "quadkeys", "rich_club", "kmv_distinct", "visit_entropy",
    "radius_gyration", "max_gap", "ks_exact", "byte_entropy",
    "clark_evans", "bhattacharyya", "attribution_pairs",
    "tile_entropy", "btc_checksum", "weighted_median", "ri_audit",
    "interval_union", "box_cover_cells", "simpson_tiles", "scan_stat",
    "noise_mad", "heaps_curve", "audio_envelope", "lag_cov",
    "colorfulness", "structure_tensor", "longest_streak",
    "nation_gini", "theil_nation", "tile_gini",
    "kapur_threshold", "lttb_downsample", "box_isect_area",
    "interval_stab", "ann_filtered", "rrf_fusion", "hilbert_range",
    "xcorr_lags", "radial_profile", "visvalingam", "caption_tile_tokens",
    "convex_hull", "cluster_diameter", "hough_lines", "harris_corners",
    "osmfilter_docs", "prep_pipeline", "exact_dedup_head",
    "hamming_pairs", "image_tiles", "knn_images_exact",
    "video_frames", "video_cuts", "audio_checksum",
    "repetition_ratio", "grad_energy", "weighted_centroid",
    "histeq_checksum", "speed_profile", "scatter_orientation",
    "border_buffer", "cell_transitions", "max_span", "self_crossings",
    "haversine_legs", "pair_dist_hist", "bbox_extent",
    "traj_intersections", "ab_ttest", "pmi_bigrams",
    "kcore", "morans_i", "zipf_slope", "js_divergence",
    "target_encode", "otsu_checksum", "hu_moment",
    "getis_ord", "glcm_texture", "sobel_octants",
    "idw_surface", "quadtree_leaves", "bigram_ppl",
    "ransac_line", "mutual_info",
    "autocorr", "cusum_changepoint", "benford", "density_gradient",
    "silhouette", "rfm_segments", "sssp", "assortativity", "emd1d",
    "hits",
])
def test_sql_parity(name, entries):
    qs, oracles = entries
    got = _canon(_to_pandas(qs[name](SF_DIR)))
    con = _con()
    want = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if got[c].dtype.kind == "f" or want[c].dtype.kind == "f":
            assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), \
                f"{name}.{c}: float values differ"
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), \
                f"{name}.{c}: values differ"


@pytest.mark.parametrize("name", [
    "flagship_tiles", "exact_dedup_images",
    "minhash_dedup", "simhash", "langid", "fingerprint", "knn_images",
    "image_features", "image_blur", "image_patches", "hll_users", "pq_ann",
    "hll_users_by_type",
    "bpe_merges", "image_pyramid", "compress_ratio",
    "audio_features", "douglas_peucker", "image_prep",
])
def test_rows_only_queries_run(name, entries):
    qs, _ = entries
    out = _to_pandas(qs[name](SF_DIR))
    assert len(out) > 0
