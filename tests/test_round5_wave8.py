"""Round-5 eighth-wave operators: Kneser-Ney bigram LM and the
mergeable quantile-summary sketch.

KN is DuckDB-oracled (strict at 3 SFs); the parity test here pins the
ALGORITHM against a direct Python implementation (the oracle only
proves cross-engine equality). The quantile sketch is rows-only; its
test pins the rank-error bound against exact order statistics.
"""

from __future__ import annotations

from collections import Counter

from timestream_travel_spark.tables import load_table


def test_kneser_ney_matches_pure_python(spark, sf_dir):
    from timestream_travel_spark.operators.llm_text17 import (
        KN_DELTA,
        KN_SUPPORT,
        q_kneser_ney_bigram,
    )

    out = q_kneser_ney_bigram(spark, sf_dir).collect()
    assert out
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        toks = " ".join(r.text.strip().lower().split()).split(" ")
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] += 1
    ctx_n: Counter = Counter()
    ctx_d1: Counter = Counter()
    cont: Counter = Counter()
    for (a, b), c in cnt.items():
        ctx_n[a] += c
        ctx_d1[a] += 1
        cont[b] += 1
    bt = len(cnt)
    for r in out:
        assert ctx_n[r.w1] >= KN_SUPPORT
        expect = (cnt[(r.w1, r.w2)] - KN_DELTA) / ctx_n[r.w1] + (
            (KN_DELTA * ctx_d1[r.w1]) / ctx_n[r.w1]
        ) * (cont[r.w2] / bt)
        assert abs(r.p_kn - expect) < 1e-12, (r, expect)
        assert 0.0 < r.p_kn < 1.0
        # the discount strictly lowers the MLE term; the backoff mass
        # keeps the total close for high-count bigrams
        mle = cnt[(r.w1, r.w2)] / ctx_n[r.w1]
        assert r.p_kn < mle + (KN_DELTA * ctx_d1[r.w1]) / ctx_n[r.w1]


def test_quantile_sketch_rank_error_bound(spark, sf_dir):
    from timestream_travel_spark.operators.sketches import (
        SKETCH_SIZE,
        q_quantile_sketch,
    )

    out = {r.q: (r.est, r.n) for r in q_quantile_sketch(spark, sf_dir).collect()}
    vals = sorted(
        r.value for r in load_table(spark, sf_dir, "events").select("value").collect()
    )
    n = len(vals)
    # each contributing partition adds ≤ ceil(n_p/S) rank slack; with
    # P partitions that telescopes to n/S + P
    import math

    parts = spark.sparkContext.defaultParallelism
    bound = n / SKETCH_SIZE + parts
    for q, (est, n_reported) in out.items():
        assert n_reported == n
        rank = sum(1 for v in vals if v <= est)
        assert abs(rank - q * n) <= bound, (q, rank, q * n, bound)
    # monotone estimates
    assert out[0.5][0] <= out[0.9][0] <= out[0.99][0]


def test_quantile_sketch_merge_is_union(spark, sf_dir):
    """Merging = UNION ALL of summary tables: the sketch of the
    doubled corpus equals the union of two identical sketches in
    distribution — probed at the estimate level (same estimates,
    doubled weights)."""
    from pyspark.sql import functions as F

    from timestream_travel_spark.operators.sketches import quantile_summary

    ev = load_table(spark, sf_dir, "events")
    s1 = quantile_summary(ev, "value")
    merged = s1.unionByName(s1)
    tot1 = s1.agg(F.sum("w").alias("w")).collect()[0].w
    tot2 = merged.agg(F.sum("w").alias("w")).collect()[0].w
    assert tot2 == 2 * tot1


def test_compress_weighted_properties_hypothesis():
    """Randomized invariants of the shared weighted compressor:
    exact weight conservation, the SKETCH_SIZE+1 point bound, sorted
    unique-ish representatives, and the per-point weight bound that
    the rank-error argument rests on (each point's weight ≤
    step + max single input weight − 1)."""
    from hypothesis import given, settings, strategies as st

    from timestream_travel_spark.operators.sketches import (
        SKETCH_SIZE,
        compress_weighted,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.floats(-1e6, 1e6, allow_nan=False),
                st.integers(min_value=1, max_value=1000),
            ),
            min_size=1,
            max_size=500,
        )
    )
    def check(pairs):
        total = sum(w for _, w in pairs)
        max_w = max(w for _, w in pairs)
        out_v, out_w = compress_weighted(list(pairs))
        assert sum(out_w) == total  # exact conservation
        assert len(out_v) <= SKETCH_SIZE + 1
        assert out_v == sorted(out_v)  # representatives ascend
        step = max(1, (total + SKETCH_SIZE - 1) // SKETCH_SIZE)
        # a point absorbs follow-on pairs only while cumulative weight
        # stays within its step budget, so its weight is < step + max_w
        assert all(w < step + max_w for w in out_w)
        # every representative is an actual input value
        vals = {v for v, _ in pairs}
        assert all(v in vals for v in out_v)

    check()
