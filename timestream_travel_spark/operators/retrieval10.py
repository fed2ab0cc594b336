"""Round-14 retrieval: Kendall rank correlation between the BM25 and
Dirichlet query-likelihood rankers (Kendall, Biometrika 1938; the
ranker-agreement companion of retrieval9's top-weighted RBO — tau
weights every exchanged pair equally, so together they tell whether
disagreement lives in the head or the tail).

Exactness: both depth-{TAU_D} heads are total orders (row_number
with the doc_id tiebreak), so over the m common documents tau is the
exact integer census (C − D) / (m(m−1)/2) — concordant minus
discordant rank pairs, ONE guarded flat division. The pair join runs
on the ≤{TAU_D}-row intersection.

Scale shape: both rankers reduce to bounded candidate heads before
any global ordering (the retrieval2/retrieval3 plans — postings
pruned by the query terms, per-doc scores reduced map-side); the
tau census is a ≤{TAU_D}²-row broadcast self-join.

Reference parity: none (cmd/backup.go has no retrieval surface) —
north-star derived capability, sibling of retrieval9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timestream_travel_spark.operators.retrieval import _BM25_CTES, bm25_scores_cached
from timestream_travel_spark.operators.retrieval3 import ql_scores_cached
from timestream_travel_spark.operators.retrieval9 import _QLS_CTES
from timestream_travel_spark.registry import query

TAU_D = 20  # head depth compared


@query(
    "q_rankers_kendall_tau",
    oracle=f"""{_BM25_CTES},
    {_QLS_CTES},
    kw AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
      FROM scored ORDER BY score DESC, doc_id LIMIT {TAU_D}
    ), qr AS (
      SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS rb
      FROM qls ORDER BY ql_score DESC, doc_id LIMIT {TAU_D}
    ), common AS (
      SELECT kw.doc_id, kw.ra, qr.rb FROM kw JOIN qr ON kw.doc_id = qr.doc_id
    ), census AS (
      SELECT CAST(SUM(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS discordant
      FROM common a JOIN common b ON a.doc_id < b.doc_id
    ), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM common)
    SELECT CAST({TAU_D} AS INT) AS depth, m.n_common,
           COALESCE(census.concordant, 0) AS concordant,
           COALESCE(census.discordant, 0) AS discordant,
           CASE WHEN m.n_common > 1 THEN
             round(CAST(COALESCE(census.concordant, 0)
                        - COALESCE(census.discordant, 0) AS DOUBLE)
                   / (CAST(m.n_common AS DOUBLE) * (m.n_common - 1) / 2.0), 6)
           END AS kendall_tau
    FROM m, census
    """,
)
def q_rankers_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau between the BM25 and query-likelihood depth-{TAU_D}
    heads, over their common documents: the exact concordant/
    discordant pair census and ONE guarded flat division (module
    docstring)."""
    kw = (
        bm25_scores_cached(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TAU_D)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .alias("ra"),
        )
    )
    qr = (
        ql_scores_cached(spark, sf_dir)
        .orderBy(F.desc("ql_score"), "doc_id")
        .limit(TAU_D)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("ql_score"), "doc_id"))
            .alias("rb"),
        )
    )
    common = kw.join(qr, "doc_id").localCheckpoint(eager=True)
    a = common.select(
        F.col("doc_id").alias("da"), F.col("ra").alias("ra1"),
        F.col("rb").alias("rb1"),
    )
    b = common.select(
        F.col("doc_id").alias("db"), F.col("ra").alias("ra2"),
        F.col("rb").alias("rb2"),
    )
    prod = (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2"))
    census = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("concordant"),
            F.sum(F.when(prod < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("discordant"),
        )
    )
    m = common.agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    nc = F.col("n_common")
    return m.crossJoin(F.broadcast(census)).select(
        F.lit(TAU_D).cast("int").alias("depth"),
        "n_common",
        F.coalesce(F.col("concordant"), F.lit(0)).alias("concordant"),
        F.coalesce(F.col("discordant"), F.lit(0)).alias("discordant"),
        F.when(
            nc > 1,
            F.round(
                (
                    F.coalesce(F.col("concordant"), F.lit(0))
                    - F.coalesce(F.col("discordant"), F.lit(0))
                ).cast("double")
                / (nc.cast("double") * (nc - 1) / F.lit(2.0)),
                6,
            ),
        ).alias("kendall_tau"),
    )
