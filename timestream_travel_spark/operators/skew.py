"""Skew-mitigation helpers (north star: '100 TB scale'; SURVEY §4
lists AQE skew-join as the built-in backstop — these are the explicit
levers for when AQE isn't enough or isn't available).

- salted_aggregate: two-phase aggregation through a salted key for
  decomposable aggregates; the hot key's partial state spreads over
  n_salts reducers before the final combine.
- salted_join: replicate the (small) build side n_salts times and
  salt the (large, skewed) probe side — the classic hot-key equi-join
  rewrite.

Both are semantics-preserving; tests assert equality against the
unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for decomposable aggregates
    (sum/count/min/max). aggs maps column -> one of those four.

    Phase 1 groups by (key, salt) — the hot key fans out over n_salts
    partitions; phase 2 re-combines per key. count re-combines as sum.
    """
    combiner = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in combiner:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[getattr(F, combiner[fn])(f"__p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted large side and a replicated small side.

    large gets a random salt in [0, n_salts); small is exploded
    n_salts times so every (key, salt) bucket finds its match. The
    shuffle key becomes (key, salt) — a single hot key spreads over
    n_salts reducers instead of melting one.

    Only inner/left/left_semi/left_anti (large side preserved) are
    semantics-preserving: with right/full, a small-side key with no
    large-side match would emit n_salts null-extended duplicates (one
    per replica). Those modes raise."""
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti",
    }
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join(how={how!r}): only large-side-preserving joins "
            "(inner/left/left_semi/left_anti) are semantics-preserving — "
            "the replicated small side would duplicate unmatched rows"
        )
    l_salted = large.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = l_salted.join(
        s_replicated,
        (l_salted[large_key] == s_replicated[small_key]) & (l_salted["__salt"] == s_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")
