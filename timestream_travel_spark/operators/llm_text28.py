"""LLM-corpus ops, wave 28 (round 11): char-n-gram compressibility
proxy — the Gopher panel's missing compressibility rule (Rae et al.
2021 filter low-quality docs partly by how well they compress; the
zlib ratio itself is library-versioned, so this implements the
deterministic repeated-substring proxy an LZ coder exploits: the
fraction of char-{COMP_K}-gram occurrences that are repeats of an
earlier-seen gram). Highly compressible ⇔ high repeat fraction —
boilerplate, spam, and template text light up; the integer
cross-multiplied pass flag composes with q_repetition_panel /
q_gopher_quality_filter into the full Gopher verdict.

Exactness: counts are exact integers off the in-row gram array
(total − distinct = repeated occurrences); one flat division per
output row; the pass flag is integer cross-multiplied.

Scale shape: map-only per document — one normalization, one
let_-bound gram transform (the captured-expression rule), one
array_distinct; zero shuffles beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.dedup import normalized_text
from timestream_travel_spark.ops import let_
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

COMP_K = 16  # gram width: long enough that repeats mean real reuse
COMP_NUM, COMP_DEN = 1, 2  # pass iff repeat fraction <= 1/2

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _grams(text: Column | str) -> Column:
    """ALL char-{COMP_K}-grams of the normalized text (duplicates
    kept — the repeat census needs total vs distinct), let_-bound so
    the per-position lambda doesn't re-run the normalization regex."""

    def body(t: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(t) - (COMP_K - 1))
        return F.transform(idx, lambda i: t.substr(i, F.lit(COMP_K)))

    return let_(normalized_text(text), body)


@query(
    "q_compressibility_chargram",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source,
             list_transform(
               generate_series(1, length({_NORM_SQL}) - {COMP_K - 1}),
               i -> substr({_NORM_SQL}, i, {COMP_K})) AS grams
      FROM documents
      WHERE length({_NORM_SQL}) >= {COMP_K}
    ), per AS (
      SELECT doc_id, source,
             CAST(len(grams) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct
      FROM g
    )
    SELECT doc_id, source, n_grams, n_distinct,
           round(CAST(n_grams - n_distinct AS DOUBLE) / n_grams, 6)
             AS repeat_frac,
           CASE WHEN {COMP_DEN} * (n_grams - n_distinct)
                     <= {COMP_NUM} * n_grams
                THEN 1 ELSE 0 END AS comp_pass
    FROM per
    """,
)
def q_compressibility_chargram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document compressibility proxy: repeat_frac = repeated
    char-{COMP_K}-gram occurrences / total occurrences (an LZ match
    opportunity estimate), plus the pass flag
    repeat_frac ≤ {COMP_NUM}/{COMP_DEN} as integer cross-multiply.
    Docs whose normalized text is shorter than {COMP_K} chars are
    skipped on both engines (no gram denominator)."""
    from timestream_travel_spark.tables import spread

    # r15: spread the single-row-group scan before the per-doc
    # 16-gram transform (size-gated; per-doc output rows — the row
    # SET is unchanged by repartitioning)
    d = spread(load_table(spark, sf_dir, "documents"))
    # the short-doc guard precedes the gram transform: with
    # length < K, F.sequence(1, length-(K-1)) sees start > stop and
    # defaults to step -1 (descending — invalid positions), while the
    # oracle's generate_series yields an empty set
    d = d.filter(F.length(normalized_text("text")) >= COMP_K)
    d = d.select("doc_id", "source", _grams("text").alias("__g"))
    n = F.col("n_grams")
    nd = F.col("n_distinct")
    return (
        d.select(
            "doc_id",
            "source",
            F.size("__g").cast("bigint").alias("n_grams"),
            F.size(F.array_distinct("__g")).cast("bigint").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "source",
            "n_grams",
            "n_distinct",
            F.round((n - nd).cast("double") / n, 6).alias("repeat_frac"),
            F.when(COMP_DEN * (n - nd) <= COMP_NUM * n, 1)
            .otherwise(0)
            .alias("comp_pass"),
        )
    )
