"""Property tests for the round-4 operators (analytics, llm_text10/11,
timeseries4) — invariants the DuckDB oracle can't express, plus
structural guarantees from the papers the ops implement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from timestream_travel_spark.tables import load_table


def test_funnel_stages_shrink_monotonically(spark, sf_dir):
    qs = entrymod.queries()
    row = qs["q_funnel_conversion"](spark, sf_dir).collect()[0]
    assert row["n_view_users"] >= row["n_click_users"] >= row["n_purchase_users"]
    assert 0.0 <= row["view_to_click"] <= 1.0
    assert 0.0 <= row["click_to_purchase"] <= 1.0


def test_retention_week0_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort week, so the
    week_offset=0 cells must sum to the distinct-user count."""
    qs = entrymod.queries()
    rows = qs["q_retention_cohorts"](spark, sf_dir).collect()
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users
    assert all(r["week_offset"] >= 0 for r in rows)


def test_word_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ log2(n_words); H = log2(n) iff all words distinct."""
    qs = entrymod.queries()
    for r in qs["q_word_entropy"](spark, sf_dir).collect():
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_words"]) + 1e-9


def test_semantic_dedup_reps_never_flagged(spark, sf_dir):
    """Cluster representatives score 1.0 against themselves and are
    never marked duplicates; every vector appears exactly once."""
    qs = entrymod.queries()
    rows = qs["q_semantic_dedup"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    reps = [r for r in rows if r["cos_to_rep"] == 1.0 and not r["is_dup"]]
    labels = {r["label"] for r in rows}
    assert len({r["label"] for r in reps}) == len(labels)


def test_winnowing_density_bound(spark, sf_dir):
    """Winnowing selects at most one fingerprint per window position;
    expected density is 2/(w+1) — assert the hard upper bound (#fps ≤
    #windows) and non-emptiness for every doc with enough tokens."""
    from timestream_travel_spark.operators.llm_text11 import WIN_K, WIN_W

    qs = entrymod.queries()
    fps = (
        qs["q_winnowing_fingerprints"](spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_fp"))
        .collect()
    )
    docs = {
        r["doc_id"]: r["n_tok"]
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias(
                "n_tok"
            ),
        )
        .collect()
    }
    eligible = {d for d, n in docs.items() if n - WIN_K + 1 >= WIN_W}
    assert {r["doc_id"] for r in fps} == eligible
    for r in fps:
        n_windows = docs[r["doc_id"]] - WIN_K + 1 - WIN_W + 1
        assert 1 <= r["n_fp"] <= n_windows


def test_corpus_shuffle_is_permutation(spark, sf_dir):
    qs = entrymod.queries()
    rows = qs["q_corpus_shuffle"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    # positions follow md5 order exactly
    by_hash = sorted(rows, key=lambda r: r["h"])
    assert [r["pos"] for r in by_hash] == list(range(1, n + 1))


def test_token_budget_mix_respects_budget(spark, sf_dir):
    from timestream_travel_spark.operators.llm_text11 import TOKEN_BUDGET

    qs = entrymod.queries()
    for r in qs["q_token_budget_mix"](spark, sf_dir).collect():
        assert r["n_tokens_kept"] <= TOKEN_BUDGET
        assert r["n_docs_kept"] >= 1


def test_bigram_lm_probabilities(spark, sf_dir):
    qs = entrymod.queries()
    rows = qs["q_bigram_lm"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        assert 1 <= r["rk"] <= 3
    # ranks are dense per context
    from collections import defaultdict

    by_ctx = defaultdict(list)
    for r in rows:
        by_ctx[r["w1"]].append(r["rk"])
    for rks in by_ctx.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_series_auc_matches_midpoint_times_duration(spark, sf_dir):
    """Single-interval sanity: AUC of each user's series equals the
    sum of midpoint×duration computed driver-side on the same rows."""
    qs = entrymod.queries()
    got = {r["user_id"]: r["auc"] for r in qs["q_series_auc"](spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for uid, pts in series.items():
        pts.sort()
        acc = 0.0
        for (t0, _, v0), (t1, _, v1) in zip(pts, pts[1:]):
            dt = (t1 - t0).total_seconds()
            if dt > 0:
                acc += (v0 + v1) / 2.0 * dt
        if uid in got:
            assert abs(got[uid] - acc) < 1e-2


def test_rolling_zscore_flags_injected_spike(spark, sf_dir):
    """An operator-level check on synthetic data: a flat series with
    one spike must z-score the spike highest."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 9,
            "event_id": list(range(9)),
            "ts": pd.date_range("2024-01-01", periods=9, freq="1h"),
            "event_type": ["purchase"] * 9,
            "value": [10.0, 10.1, 9.9, 10.0, 50.0, 10.2, 9.8, 10.0, 10.1],
        }
    )
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("zscore_fixture")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        qs = entrymod.queries()
        rows = qs["q_rolling_zscore"](spark, td).collect()
    top = max(rows, key=lambda r: abs(r["z"]))
    assert top["ts"].startswith("2024-01-01 04")
    assert top["z"] > 1.5


def test_binned_interval_join_matches_theta_join(spark, sf_dir):
    """The binned rewrite returns exactly the rows of the naive
    keyless theta join."""
    from pyspark.sql import functions as F

    from timestream_travel_spark.operators.joins2 import binned_interval_join
    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("h"))
        .limit(3)
        .select(
            F.col("h").alias("start_ts"),
            (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("end_ts"),
        )
    )
    binned = binned_interval_join(ev, win).select("event_id", "start_ts")
    naive = ev.alias("e").join(
        win.alias("w"),
        (F.col("e.ts") >= F.col("w.start_ts")) & (F.col("e.ts") < F.col("w.end_ts")),
    ).select("event_id", "start_ts")
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0


def test_scd2_intervals_partition_each_user_timeline(spark, sf_dir):
    """Per user: intervals are ordered, non-overlapping, close
    exactly where the next opens, and exactly one is 'current'."""
    from collections import defaultdict

    qs = entrymod.queries()
    rows = qs["q_scd2_intervals"](spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["valid_from"], r["valid_to"], r["event_type"]))
    for ivs in by_user.values():
        ivs.sort()
        assert sum(1 for _, vt, _ in ivs if vt == "current") == 1
        for (f0, t0, e0), (f1, t1, e1) in zip(ivs, ivs[1:]):
            assert t0 == f1  # adjacent: close where the next opens
            assert e0 != e1  # runs collapsed: adjacent intervals differ
        assert ivs[-1][1] == "current"


def test_duplicate_spans_fraction_bounds(spark, sf_dir):
    qs = entrymod.queries()
    for r in qs["q_duplicate_spans"](spark, sf_dir).collect():
        assert 0 <= r["n_dup_spans"] <= r["n_spans"]
        assert abs(r["dup_frac"] - round(r["n_dup_spans"] / r["n_spans"], 6)) < 1e-9
