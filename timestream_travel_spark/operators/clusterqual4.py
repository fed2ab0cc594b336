"""Cluster-quality / density family, part 4 (promoted into
load_all()'s round-11 tail): the mutual-reachability distance
(Campello, Moulavi & Sander, PAKDD 2013 —
d_mreach(a,b) = max(core_a, core_b, d(a,b)), the metric HDBSCAN's
MST is built over) materialized for every ε-pair, and an embedding
ANISOTROPY audit (Ethayarajh, EMNLP 2019 measures how far
contextual-embedding geometry is from isotropic; this is the
diagonal-covariance form: per-label max/mean/min per-dimension
variance) — the index-health statistic that flags labels whose
cells are elongated, where IVF nprobe must grow to hold recall.

Exactness: distances/core distances follow clusterqual3's contract
(identical IEEE fold; sqrt + round only at the output boundary —
the max() of three positive doubles is order-independent);
per-dimension variances come from exact DECIMAL Σv/Σv² per
(label, pos), bridged once, with the clusterqual discipline.

Scale shape: reuses clusterqual3's label-blocked machinery (pairs
and k-NN ranks never leave their cell); anisotropy is the
clusterqual (label, pos) reduce — k×dim rows out regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import to_double_array
from timestream_travel_spark.operators.clusterqual3 import (
    _D2_SQL,
    _PAIRS_SQL,
    CORE_K,
    core_dd_cached,
    eps_pairs_cached,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table, spread


@query(
    "q_mutual_reachability",
    oracle=f"""
    WITH {_PAIRS_SQL},
    d2 AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.label,
             {_D2_SQL} AS dd
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id
    ), core AS (
      SELECT va AS vec_id, dd
      FROM (SELECT va, dd, row_number() OVER (PARTITION BY va ORDER BY dd)
                     AS rn FROM d2)
      WHERE rn = {CORE_K}
    )
    SELECT p.va, p.vb, p.label,
           round(sqrt(d.dd), 6) AS dist,
           round(sqrt(ca.dd), 6) AS core_a,
           round(sqrt(cb.dd), 6) AS core_b,
           round(sqrt(greatest(d.dd, ca.dd, cb.dd)), 6) AS mreach
    FROM pairs p
    JOIN d2 d ON d.va = p.va AND d.vb = p.vb
    JOIN core ca ON ca.vec_id = p.va
    JOIN core cb ON cb.vec_id = p.vb
    """,
)
def q_mutual_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-reachability distance for every ε-pair:
    d_mreach = max(core_a, core_b, d) with core = the {CORE_K}-th-NN
    distance within the label block — the HDBSCAN edge weights. The
    max runs on SQUARED distances (monotone, so identical choice both
    engines); sqrt + round(6) only at the output. Both inputs come
    from the session-cached family tables (clusterqual3) — the
    ε-pair table carries its squared distance, so no pair join is
    re-paid here."""
    core = core_dd_cached(spark, sf_dir).select("vec_id", "cd")
    pairs = eps_pairs_cached(spark, sf_dir)
    return (
        pairs.join(
            core.select(F.col("vec_id").alias("va"), F.col("cd").alias("ca")),
            "va",
        )
        .join(
            core.select(F.col("vec_id").alias("vb"), F.col("cd").alias("cb")),
            "vb",
        )
        .select(
            "va",
            "vb",
            "label",
            F.round(F.sqrt("dd"), 6).alias("dist"),
            F.round(F.sqrt("ca"), 6).alias("core_a"),
            F.round(F.sqrt("cb"), 6).alias("core_b"),
            F.round(
                F.sqrt(F.greatest(F.col("dd"), F.col("ca"), F.col("cb"))), 6
            ).alias("mreach"),
        )
    )


@query(
    "q_embedding_anisotropy",
    oracle="""
    WITH x AS (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), per AS (
      SELECT label, pos,
             CAST(CAST(SUM(CAST(v AS DECIMAL(14,9))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(v * v AS DECIMAL(20,12))) AS VARCHAR) AS DOUBLE)
               AS q2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM x GROUP BY label, pos
    ), var AS (
      SELECT label, pos,
             q2 / n - (s / n) * (s / n) AS vr
      FROM per
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS dim,
           round(MAX(vr), 6) AS var_max,
           round(MIN(vr), 6) AS var_min,
           round(CAST(CAST(SUM(CAST(vr AS DECIMAL(20,12))) AS VARCHAR)
                      AS DOUBLE) / COUNT(*), 6) AS var_mean,
           round(MAX(vr) / (CAST(CAST(SUM(CAST(vr AS DECIMAL(20,12)))
                      AS VARCHAR) AS DOUBLE) / COUNT(*)), 6) AS anisotropy
    FROM var GROUP BY label
    """,
)
def q_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label diagonal anisotropy: each dimension's variance from
    exact DECIMAL Σv/Σv² (the clusterqual sufficient-statistic
    discipline), then max/mean/min across dimensions and the
    anisotropy ratio max/mean — 1.0 is perfectly isotropic (all
    directions equal); elongated cells score high and predict IVF
    recall loss. Per-dim variances quantize to DECIMAL(20,12) before
    the cross-dimension mean (order independence)."""
    e = load_table(spark, sf_dir, "embeddings")
    # r15: spread before the explode (size-gated; see clusterqual)
    x = spread(e).select(
        "label", F.posexplode(to_double_array("embedding")).alias("pos0", "v")
    ).select("label", (F.col("pos0") + 1).alias("pos"), "v")
    per = x.groupBy("label", "pos").agg(
        F.sum(F.col("v").cast("decimal(14,9)")).cast("double").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(20,12)"))
        .cast("double")
        .alias("q2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    var = per.select(
        "label",
        (
            F.col("q2") / F.col("n")
            - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
        ).alias("vr"),
    )
    agg = var.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("dim"),
        F.max("vr").alias("vmax"),
        F.min("vr").alias("vmin"),
        F.sum(F.col("vr").cast("decimal(20,12)")).cast("double").alias("vsum"),
    )
    mean = F.col("vsum") / F.col("dim")
    return agg.select(
        "label",
        "dim",
        F.round("vmax", 6).alias("var_max"),
        F.round("vmin", 6).alias("var_min"),
        F.round(mean, 6).alias("var_mean"),
        F.round(F.col("vmax") / mean, 6).alias("anisotropy"),
    )
