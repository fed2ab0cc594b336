"""Time series, part 28 (promoted into load_all()'s round-11
tail): SPECTRAL FLATNESS (Wiener entropy; Gray &
Markel, IEEE TASSP 1974) of each event type's hour-of-day profile
over the same {N_HARM} daily harmonics q_spectral_entropy scores —
the geometric/arithmetic power-mean ratio: 1.0 for white (flat)
spectra, →0 for a single dominant cycle. Entropy and flatness rank
spectra differently (flatness punishes any near-zero bin hard), so
the pair together characterizes the periodicity structure.

Exactness: reuses q_goertzel_power's single-bin DFT machinery
verbatim (one map-side-combined (type, hod) DECIMAL reduce, 24-row
literal trig table, deterministic hod-ordered folds); the flatness
is a flat {N_HARM}-term composition exp((Σ ln p_k)/N)/(Σ p_k / N)
with both sums as left-associated literal chains — identical
expression text both engines. Zero-power bins (impossible on this
fixture, guarded anyway) produce NULL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.operators.timeseries12 import _fold_sum
from timestream_travel_spark.operators.timeseries17 import (
    _CS,
    _SPEC_FOLDS,
    _SPEC_POWERS,
    _SPEC_TERM_COLS,
    _SPEC_TRIG_COLS,
    _SPEC_TRIG_VALUES,
    N_HARM,
)
from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

_LN_SUM = " + ".join(f"ln(p{k})" for k in range(1, N_HARM + 1))
_P_SUM = " + ".join(f"p{k}" for k in range(1, N_HARM + 1))
_P_POS = " AND ".join(f"p{k} > 0" for k in range(1, N_HARM + 1))


@query(
    "q_spectral_flatness",
    oracle=f"""
    WITH trig(hod, {_SPEC_TRIG_COLS}) AS (VALUES {_SPEC_TRIG_VALUES}),
    hourly AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    terms AS (
      SELECT event_type, hod, {_SPEC_TERM_COLS}
      FROM hourly JOIN trig USING (hod)
    ),
    folded AS (
      SELECT event_type, {_SPEC_FOLDS}
      FROM terms GROUP BY event_type
    ),
    powers AS (
      SELECT event_type, {_SPEC_POWERS} FROM folded
    )
    SELECT event_type,
           round(CASE WHEN {_P_POS}
                 THEN exp(({_LN_SUM}) / {N_HARM}.0)
                      / (({_P_SUM}) / {N_HARM}.0) END, 6)
             AS spectral_flatness
    FROM powers
    """,
)
def q_spectral_flatness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiener spectral flatness over the first {N_HARM} daily
    harmonics of the hour-of-day profile:
    exp(mean ln p_k) / mean p_k ∈ (0, 1]. Plan and power terms are
    q_spectral_entropy's (shared single-bin DFT machinery); only the
    final flat composition differs."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("bigint").alias("hod"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    idx = (F.col("hod") + 1).cast("int")
    term_cols = []
    fields = []
    for k in range(1, N_HARM + 1):
        ck = F.array(*[F.lit(v) for v in _CS[k][0]])
        sk = F.array(*[F.lit(v) for v in _CS[k][1]])
        term_cols.append((F.col("v") * F.element_at(ck, idx)).alias(f"tc{k}"))
        term_cols.append((F.col("v") * F.element_at(sk, idx)).alias(f"ts{k}"))
        fields += [f"tc{k}", f"ts{k}"]
    terms = hourly.select("event_type", "hod", *term_cols)
    folded = terms.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hod", *fields))).alias("arr")
    )
    powers = folded.select(
        "event_type",
        *[
            (
                _fold_sum("arr", f"tc{k}") * _fold_sum("arr", f"tc{k}")
                + _fold_sum("arr", f"ts{k}") * _fold_sum("arr", f"ts{k}")
            ).alias(f"p{k}")
            for k in range(1, N_HARM + 1)
        ],
    )
    ln_sum = None
    p_sum = None
    p_pos = None
    for k in range(1, N_HARM + 1):
        pk = F.col(f"p{k}")
        ln_sum = F.log(pk) if ln_sum is None else ln_sum + F.log(pk)
        p_sum = pk if p_sum is None else p_sum + pk
        p_pos = (pk > 0) if p_pos is None else p_pos & (pk > 0)
    return powers.select(
        "event_type",
        F.round(
            F.when(
                p_pos,
                F.exp(ln_sum / F.lit(float(N_HARM)))
                / (p_sum / F.lit(float(N_HARM))),
            ),
            6,
        ).alias("spectral_flatness"),
    )
