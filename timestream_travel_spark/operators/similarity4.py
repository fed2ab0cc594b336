"""Series similarity, part 4: banded Dynamic Time Warping between
selected series pairs.

DTW (Sakoe & Chiba, IEEE TASSP'78 — public algorithm) is the
standard elastic distance for time series: it aligns two series
allowing local time stretches, where Euclidean distance demands
index-aligned samples. Together with SAX (timeseries8) it gives the
engine the two classic series-mining primitives: symbolic indexing
to FIND candidate pairs cheaply, elastic distance to VERIFY them.

100 TB shape: DTW is O(n·w) per pair with a Sakoe-Chiba band of
width w, so it must NEVER run all-pairs — exactly like the exact-
Jaccard verifier (dedup.py), it is the candidate-gated second stage:
a bounded pair list (here: the K longest series, K(K-1)/2 pairs;
in production: LSH/SAX-bucket candidates) joined to the per-series
rows, then one applyInPandas per pair. No oracle — DuckDB has no DTW
and the DP is not SQL-expressible at reasonable cost; correctness is
pinned by a pure-Python replay parity test plus metric-property
tests (identity, symmetry) in tests/test_round5_wave2.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

DTW_TOP_USERS = 6  # pairs drawn from the K longest purchase series
DTW_BAND = 24  # Sakoe-Chiba band half-width (hours)
# near-dup gate for the composed SAX→DTW pipeline: LENGTH-NORMALIZED
# DTW (dtw / max(n_a, n_b) — per-aligned-sample cost, comparable
# across series lengths and scale factors) must stay at or below
# this; the sf0.01 candidate population spans ~9–57 (sf0.001's one
# pair sits at ~33), so 35 keeps the genuinely-close majority and
# drops the far tail at every test SF
SAX_DTW_MAX_NORM = 35.0

_DTW_SCHEMA = "user_a bigint, user_b bigint, n_a int, n_b int, dtw double"


def dtw_distance(xs: np.ndarray, ys: np.ndarray, band: int) -> float:
    """Banded DTW with absolute-difference local cost. The band is
    widened to cover the length difference so a path always exists.
    Vectorized over the inner index: each DP row is computed with
    numpy mins over the shifted previous row."""
    n, m = len(xs), len(ys)
    w = max(band, abs(n - m) + 1)
    inf = np.inf
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo, hi = max(1, i - w), min(m, i + w)
        cost = np.abs(xs[i - 1] - ys[lo - 1 : hi])
        # cur[j] = cost + min(prev[j], prev[j-1], cur[j-1]); the
        # cur[j-1] term is a running min, so do the two prev-based
        # candidates vectorized and sweep the horizontal step once
        best = np.minimum(prev[lo:hi + 1], prev[lo - 1 : hi])
        run = inf
        seg = cur[lo : hi + 1]
        for k in range(hi - lo + 1):
            run = cost[k] + min(best[k], run)
            seg[k] = run
        prev = cur
    return float(prev[m])


def _dtw_group(pdf: pd.DataFrame) -> pd.DataFrame:
    ua = int(pdf["user_a"].iloc[0])
    ub = int(pdf["user_b"].iloc[0])
    sa = pdf[pdf["role"] == "a"].sort_values("h")["x"].to_numpy()
    sb = pdf[pdf["role"] == "b"].sort_values("h")["x"].to_numpy()
    d = dtw_distance(sa, sb, DTW_BAND)
    return pd.DataFrame(
        {
            "user_a": [ua],
            "user_b": [ub],
            "n_a": [len(sa)],
            "n_b": [len(sb)],
            "dtw": [d],
        }
    )


@query("q_dtw_pairs")
def q_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded DTW distance between every pair of the K longest
    hourly purchase-value series.

    Plan: one events scan → per-(user, hour) decimal-mean series →
    top-K longest series (broadcast, deterministic count/user_id
    order) → K(K-1)/2 pair list → pair-tagged union of both members'
    rows → applyInPandas DP per pair (O(n·w) each, O(w) rows of
    state). Candidate-gated by construction; swap the top-K selector
    for SAX-bucket or LSH candidates at scale.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
                / F.count("*")
            ).alias("x")
        )
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(DTW_TOP_USERS)
        .select("user_id")
    )
    series = ev.join(F.broadcast(top), "user_id")
    ta = top.select(F.col("user_id").alias("user_a"))
    tb = top.select(F.col("user_id").alias("user_b"))
    pairs = ta.crossJoin(tb).filter(F.col("user_a") < F.col("user_b"))
    rows_a = series.join(
        F.broadcast(pairs), series.user_id == pairs.user_a
    ).select("user_a", "user_b", F.lit("a").alias("role"), "h", "x")
    rows_b = series.join(
        F.broadcast(pairs), series.user_id == pairs.user_b
    ).select("user_a", "user_b", F.lit("b").alias("role"), "h", "x")
    return (
        rows_a.unionByName(rows_b)
        .groupBy("user_a", "user_b")
        .applyInPandas(_dtw_group, _DTW_SCHEMA)
        .orderBy("user_a", "user_b")
    )


def dtw_sax_candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    min_shared_days: int = 3,
    min_shared_frac: float = 0.5,
) -> DataFrame:
    """The scale path q_dtw_pairs' docstring promises, composed from
    the shipped pieces: SAX words (timeseries8.q_sax_symbols) bucket
    the series, users sharing an identical (day, sax) word on at
    least `min_shared_days` days AND at least `min_shared_frac` of
    the smaller user's observed days become candidate pairs, and
    banded DTW verifies ONLY those pairs.

    The FRACTIONAL evidence rule is the load-bearing scale control
    (round-6 fix): an absolute shared-day floor stops discriminating
    as the population grows — the SAX word space is small, so random
    collisions alone put ~42k of sf0.1's 1.1M user pairs over an
    absolute ≥3 cut (126 s of DTW), while ≥50% of the smaller
    series' days keeps 880 truly-shaped-alike pairs (~7 s). Evidence
    scales with opportunity, the same reason MinHash-LSH fixes the
    band PROBABILITY rather than a match count.

    100 TB shape: the candidate join is an equi-join on (day, sax) —
    the same bucket-join physics as MinHash-LSH bands — and the
    per-user day-count table (one row per user) broadcasts onto the
    pair aggregate; DTW cost is O(n·w) per surviving candidate.
    Registered as the rows-only query q_sax_dtw_neardups (round 6);
    parity + gating pinned by tests/test_round5_wave2.py and
    test_round6.py.
    """
    from timestream_travel_spark.operators.timeseries8 import q_sax_symbols

    # the SAX table feeds four plan branches (both join sides + the
    # two broadcast day-count lookups); lazy localCheckpoint
    # materializes the events scan + PAA + discretization ONCE
    sax = q_sax_symbols(spark, sf_dir).localCheckpoint(eager=False)
    days = sax.groupBy("user_id").agg(F.count("*").alias("nd"))
    a = sax.select(
        F.col("user_id").alias("user_a"), "day", F.col("sax").alias("w")
    )
    b = sax.select(
        F.col("user_id").alias("user_b"), "day", F.col("sax").alias("w")
    )
    cand = (
        a.join(b, ["day", "w"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("shared_days"))
        .join(
            F.broadcast(
                days.select(F.col("user_id").alias("user_a"), F.col("nd").alias("nd_a"))
            ),
            "user_a",
        )
        .join(
            F.broadcast(
                days.select(F.col("user_id").alias("user_b"), F.col("nd").alias("nd_b"))
            ),
            "user_b",
        )
        .filter(
            (F.col("shared_days") >= min_shared_days)
            & (
                F.col("shared_days")
                >= F.lit(min_shared_frac) * F.least("nd_a", "nd_b")
            )
        )
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
                / F.count("*")
            ).alias("x")
        )
    )
    rows_a = ev.join(
        cand.select("user_a", "user_b"), ev.user_id == F.col("user_a")
    ).select("user_a", "user_b", F.lit("a").alias("role"), "h", "x")
    rows_b = ev.join(
        cand.select("user_a", "user_b"), ev.user_id == F.col("user_b")
    ).select("user_a", "user_b", F.lit("b").alias("role"), "h", "x")
    return (
        rows_a.unionByName(rows_b)
        .groupBy("user_a", "user_b")
        .applyInPandas(_dtw_group, _DTW_SCHEMA)
        .orderBy("user_a", "user_b")
    )


@query("q_sax_dtw_neardups")
def q_sax_dtw_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX→DTW near-duplicate series pipeline, registered: SAX words
    bucket the daily series (candidate generation — the series analog
    of MinHash-LSH banding), banded DTW verifies only bucket-shared
    pairs, and the output keeps pairs under the near-dup distance
    gate. Rows-only by design: the DTW DP is not SQL-expressible; the
    SAX component is oracle-checked (q_sax_symbols) and the DTW
    verifier carries a python-parity + metric-property pytest
    (q_dtw_pairs). Gating behavior pinned by
    test_sax_dtw_neardups_gate_subset_of_candidates."""
    pairs = dtw_sax_candidate_pairs(spark, sf_dir)
    norm = F.col("dtw") / F.greatest("n_a", "n_b")
    return (
        pairs.withColumn("norm_dtw", norm)
        .filter(F.col("norm_dtw") <= SAX_DTW_MAX_NORM)
        .select("user_a", "user_b", "n_a", "n_b", "dtw", "norm_dtw")
        .orderBy("user_a", "user_b")
    )
