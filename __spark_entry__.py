"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship reference-shaped query on sf0.001.
queries()      — named-query registry (SURVEY.md §2 Part B surface).
oracle_sql()   — DuckDB oracle SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timestream_travel_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the backup-export
    chunk manifest over events (SURVEY.md §7 minimum slice)."""
    from timestream_travel_spark.registry import QUERIES

    return QUERIES["q_backup_manifest"](spark, "/root/testdata/sf0.001")


# Queries with no driver-green CORRECTNESS row as of round 1
# (CORRECTNESS_r01.json covered only the first 50 registry entries).
# Order these first so a capped driver harness verifies them next.
_UNVERIFIED_FIRST = [
    "q_dedup_keep_first", "q_upsert", "q_profile_columns", "q_histogram",
    "q_datetime_funcs", "q_string_funcs", "q_math_funcs", "q_hash_funcs",
    "q_array_funcs", "q_map_funcs", "q_json_funcs", "q_conditional_cast",
    "q_datetime_funcs2", "q_string_funcs2", "q_math_funcs2", "q_set_ops_all",
    "q_window_distribution", "q_sliding_window", "q_gap_fill_spine",
    "q_array_set_ops", "q_try_cast_safe", "q_explode_outer", "q_cosine_topk",
    "q_cosine_topk_per_label", "q_ann_lsh_topk", "q_ann_ivf_topk",
    "q_posexplode", "q_grouping_sets", "q_ann_ivf_kmeans_topk",
    "q_resample_hourly", "q_tumbling_window", "q_sessionize", "q_series_pivot",
    "q_chunk_bounds", "q_ewma", "q_ohlc_hourly", "q_sample_deterministic",
    "q_pandas_udf_norm", "q_applyinpandas_slope", "q_window_topk_per_group",
    "q_window_rank_kinds", "q_window_lag_delta", "q_window_running_sum",
    "q_window_moving_avg", "q_window_range_frame", "q_window_locf",
    "q_backup_manifest",
    # round-2 additions — also never driver-checked yet
    "q_lsh_verified_jaccard",
    "q_image_header_dims",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q5_local_supplier_volume",
    "q_tpch_q10_returned_items",
    "q_pivot_wide",
    "q_unpivot_melt",
    "q_percentile_exact",
    "q_dedup_clusters",
    "q_stopword_corpus",
    "q_bigram_counts",
    "q_type_token_ratio",
    "q_ann_ivf_kmeanspp_topk",
    "q_map_transform",
    "q_str_to_map",
    "q_lateral_view_stack",
    "q_rolling_hash_fp",
    "q_tpch_q6_forecast_revenue",
    "q_tpch_q14_promo_share",
    "q_tpch_q18_large_orders",
    "q_variant_json",
    "q_audio_header_meta",
    "q_label_centroids",
    "q_exists_subquery",
    "q_recursive_cte_spine",
    "q_text_chunks",
    "q_time_weighted_avg",
    "q_interpolate_linear",
    "q_listagg",
    "q_hll_sketch_union",
    "q_hash_sample",
    "q_edit_distance_neardups",
    "q_url_funcs",
    "q_tpch_q19_disjunctive",
    "q_chunk_corpus",
    "q_data_quality_report",
    "q_tpch_q7_nation_volume",
    "q_tpch_q8_market_share",
    "q_tpch_q22_dormant_customers",
    "q_tpch_q13_order_distribution",
    "q_tpch_q15_top_supplier",
    "q_tpch_q17_small_quantity",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _UNVERIFIED_FIRST:
        if name in registry.QUERIES:
            ordered[name] = registry.QUERIES[name]
    for name, fn in registry.QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
