"""Round-5 fifth-wave operators: applyInArrow grouped stats,
power-iteration PCA, binary-segmentation change point.

The two oracled queries are strict-verified at sf0.001/0.01/0.1;
these tests add the numpy parity the rows-only PCA needs and the
planted-shift recovery property for binary segmentation.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from timestream_travel_spark.operators.similarity5 import (
    PCA_DIM,
    covariance_matrix,
    q_embedding_pca_top1,
)
from timestream_travel_spark.operators.timeseries10 import q_binseg_changepoint
from timestream_travel_spark.operators.udf_queries2 import q_applyinarrow_value_stats
from timestream_travel_spark.tables import load_table


def test_covariance_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mean, cov, n = covariance_matrix(emb)
    x = np.asarray(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-12)
    ref = (x.T @ x) / n - np.outer(x.mean(axis=0), x.mean(axis=0))
    np.testing.assert_allclose(cov, ref, rtol=1e-9, atol=1e-12)


def test_pca_top1_matches_numpy_eigh(spark, sf_dir):
    """The distributed-covariance + driver-eigh pipeline recovers
    numpy's leading eigenvector (up to sign, compared by |cosine|)
    and its eigenvalue."""
    rows = q_embedding_pca_top1(spark, sf_dir).collect()
    assert len(rows) == PCA_DIM
    v = np.zeros(PCA_DIM)
    for r in rows:
        v[r.dim_idx] = r.weight
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-9)

    emb = load_table(spark, sf_dir, "embeddings")
    x = np.asarray(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    cov = np.cov(x, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    lead = vecs[:, -1]
    assert abs(float(v @ lead)) > 1 - 1e-6
    assert math.isclose(rows[0].eigenvalue, float(w[-1]), rel_tol=1e-4)
    assert 0 < rows[0].explained_var_ratio <= 1


def test_applyinarrow_matches_builtin_aggregate(spark, sf_dir):
    """The Arrow UDF's integer-cents stats equal the equivalent
    JVM-side aggregate exactly."""
    got = {
        r.event_type: (r.n_events, r.sum_cents, r.max_cents)
        for r in q_applyinarrow_value_stats(spark, sf_dir).collect()
    }
    cents = F.round(F.col("value") * 100).cast("bigint")
    ref = {
        r.event_type: (r.n, r.s, r.m)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.max(cents).alias("m"),
        )
        .collect()
    }
    assert got == ref


def test_binseg_recovers_planted_level_shift(spark):
    """Statistical sanity (SURVEY §5 layer): a clean series with a
    level shift at k=18 must split exactly there, with segment means
    matching the plateaus."""
    from pyspark.sql.window import Window
    from timestream_travel_spark.operators.timeseries10 import (
        q_binseg_changepoint,  # noqa: F401 — shape only; build inline below
    )

    rows = [(0, i, 10.0 if i < 18 else 35.0) for i in range(30)]
    daily = spark.createDataFrame(rows, "g int, k int, v double")
    # inline the operator's math on the synthetic frame
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("g")
    vd = F.col("v").cast("decimal(18,4)")
    v2 = (vd * vd).cast("decimal(37,8)")
    cum = daily.select(
        "g",
        F.row_number().over(Window.partitionBy("g").orderBy("k")).alias("k"),
        F.sum(vd).over(w).alias("c1"),
        F.sum(v2).over(w).alias("c2"),
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum(vd).over(wt).alias("t1"),
        F.sum(v2).over(wt).alias("t2"),
    ).filter(F.col("k") < F.col("n"))
    c1d, c2d = F.col("c1").cast("double"), F.col("c2").cast("double")
    t1d, t2d = F.col("t1").cast("double"), F.col("t2").cast("double")
    k, n = F.col("k"), F.col("n")
    cost = (c2d - c1d * c1d / k) + (
        (t2d - c2d) - (t1d - c1d) * (t1d - c1d) / (n - k)
    )
    best = (
        cum.select("k", cost.alias("cost"), (c1d / k).alias("ml"),
                   ((t1d - c1d) / (n - k)).alias("mr"))
        .orderBy("cost", "k")
        .limit(1)
        .collect()[0]
    )
    assert best.k == 18
    assert math.isclose(best.ml, 10.0, rel_tol=1e-12)
    assert math.isclose(best.mr, 35.0, rel_tol=1e-12)
    assert math.isclose(best.cost, 0.0, abs_tol=1e-6)


def test_binseg_fixture_output_shape(spark, sf_dir):
    rows = q_binseg_changepoint(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.split_after_k < 30
        assert r.split_cost >= 0


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Spark 4's WindowGroupLimit must prune rank<=k windows BOTH
    map-side (before the exchange) and reduce-side — the window twin
    of partial aggregation. If a plan change ever regresses this,
    every top-k-per-group query starts sorting full partitions at
    100 TB."""
    from timestream_travel_spark.operators.windows import q_window_topk_per_group

    plan = (
        q_window_topk_per_group(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_croston_constant_demand_converges_to_rate(spark):
    """Statistical sanity: demand of exactly 2 units every 3rd day
    must give z→2, p→3, forecast→2/3 (the true demand rate) — and
    the recurrence seeds exactly (z=d1, p=q1)."""
    from timestream_travel_spark.operators.timeseries11 import (
        _croston_partition,
    )
    import pandas as pd

    days = list(range(3, 91, 3))
    pdf = pd.DataFrame(
        {
            "user_id": [1] * len(days),
            "day_idx": days,
            "demand": [2] * len(days),
            "q": [3] * len(days),
        }
    )
    out = pd.concat(list(_croston_partition(iter([pdf]))))
    assert float(out.iloc[0]["z"]) == 2.0 and float(out.iloc[0]["p"]) == 3.0
    last = out.iloc[-1]
    assert abs(float(last["forecast"]) - 2.0 / 3.0) < 1e-9
