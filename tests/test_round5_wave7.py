"""Round-5 seventh-wave operators: Goertzel spectral power, MACD,
Kaplan-Meier survival, Haar wavelet energy.

All four are DuckDB-oracled and strict-verified at sf0.001/0.01/0.1;
per SURVEY §5.6 the oracle only proves cross-engine EQUALITY, so each
operator also gets a statistical-sanity property here: spectral power
concentrates at a planted frequency, MACD is flat on constants and
signed on trends, KM reduces to the empirical survival function
without censoring, and Haar satisfies Parseval + localizes a step.
"""

from __future__ import annotations

import datetime
import math

from timestream_travel_spark.operators.timeseries12 import (
    HAAR_N,
    q_goertzel_power,
    q_haar_energy,
    q_kaplan_meier,
    q_macd,
)
from timestream_travel_spark.tables import load_table

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{path}/events.parquet"
    )


def test_goertzel_detects_planted_24h_seasonality(spark, tmp_path):
    """A pure 24h sine (20 full cycles, one sample per hour)
    concentrates all its power in the 24h bin: the 12h bin sees only
    orthogonal leakage (zero up to rounding) and vice versa for a
    12h sine."""
    sf = str(tmp_path / "goertzel_sf")
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(24 * 20):
        val = 5.0 * math.sin(2 * math.pi * (i % 24) / 24)
        rows.append((i, t0 + datetime.timedelta(hours=i), 1, "sine24", val, "{}"))
    for i in range(24 * 20):
        val = 5.0 * math.sin(2 * math.pi * (i % 12) / 12)
        rows.append(
            (100000 + i, t0 + datetime.timedelta(hours=i), 1, "sine12", val, "{}")
        )
    _write_events(spark, sf, rows)
    pw = {r.event_type: (r.power_24h, r.power_12h) for r in q_goertzel_power(spark, sf).collect()}
    # full cycles -> the matched bin holds (n_days*amp*12)^2/... >> 0,
    # the mismatched bin is orthogonal -> ~0
    assert pw["sine24"][0] > 1e4
    assert pw["sine24"][1] < 1e-12 * pw["sine24"][0] + 1e-6
    assert pw["sine12"][1] > 1e4
    assert pw["sine12"][0] < 1e-12 * pw["sine12"][1] + 1e-6


def test_macd_constant_flat_and_trend_signed(spark, tmp_path):
    """Constant daily sums keep MACD/signal/histogram at ~0; a
    monotone rising series drives MACD positive (fast EMA leads)."""
    sf = str(tmp_path / "macd_sf")
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for d in range(40):
        rows.append((d, t0 + datetime.timedelta(days=d), 1, "flat", 7.0, "{}"))
        rows.append(
            (1000 + d, t0 + datetime.timedelta(days=d), 1, "rise", 10.0 + 5.0 * d, "{}")
        )
    _write_events(spark, sf, rows)
    out = q_macd(spark, sf).collect()
    flat = [r for r in out if r.event_type == "flat"]
    rise = sorted((r for r in out if r.event_type == "rise"), key=lambda r: r.day)
    assert len(flat) == 40 and len(rise) == 40
    assert all(abs(r.macd) < 1e-9 and abs(r.histogram) < 1e-9 for r in flat)
    # steady uptrend: fast EMA above slow EMA from the second day on
    assert all(r.macd > 0 for r in rise[1:])
    # and the MACD line keeps growing toward its linear-trend limit
    assert rise[-1].macd > rise[5].macd


def test_kaplan_meier_no_censoring_is_empirical_survival(spark, tmp_path):
    """With every session ending well before the data edge, KM
    collapses to the empirical survival function: S(t) = #{dur > t}/N
    (telescoping product of (n-d)/n over distinct durations)."""
    sf = str(tmp_path / "km_sf")
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    durations = [0, 5, 5, 10, 30, 30, 30, 60, 120, 240]
    for u, dur in enumerate(durations):
        start = t0 + datetime.timedelta(hours=u * 24)
        # fill events every 25 min so the whole span stays ONE session
        # under the 30-min-gap sessionizer
        for m in list(range(0, dur, 25)) + [dur]:
            rows.append(
                (eid, start + datetime.timedelta(minutes=m), u, "click", 1.0, "{}")
            )
            eid += 1
    # a sentinel far-future event pushes the censoring edge away from
    # every real session (its own 1-event session has dur 0, censored)
    rows.append((eid, t0 + datetime.timedelta(days=300), 999, "click", 1.0, "{}"))
    _write_events(spark, sf, rows)
    out = sorted(q_kaplan_meier(spark, sf).collect(), key=lambda r: r.dur_min)
    # (dur, event) pairs: real sessions are events, the sentinel is censored
    pairs = [(d, 1) for d in durations] + [(0, 0)]
    n = len(pairs)
    assert out[0].n_at_risk == n
    assert sum(r.n_censored for r in out) == 1 and out[0].n_censored == 1
    surv = 1.0
    for r in out:
        n_t = sum(1 for d, _ in pairs if d >= r.dur_min)
        d_t = sum(1 for d, e in pairs if d == r.dur_min and e == 1)
        assert r.n_at_risk == n_t and r.d_events == d_t
        surv *= (n_t - d_t) / n_t
        assert abs(r.survival - surv) < 1e-12
        assert 0.0 <= r.survival <= 1.0
    # monotone nonincreasing
    assert all(a.survival >= b.survival for a, b in zip(out, out[1:]))


def test_lcs_contamination_max_df_cap_drops_boilerplate(spark, tmp_path):
    """A boilerplate 5-gram planted in > LCS_MAX_SHINGLE_DF docs
    produces NO pairs (the cap fires), while a rare shared 5-gram in
    the same corpus still pairs — the cap is code, not prose."""
    from timestream_travel_spark.operators.llm_text16 import (
        LCS_MAX_SHINGLE_DF,
        q_lcs_contamination,
    )

    sf = str(tmp_path / "lcs_cap_sf")
    boiler = "copyright examplecorp all rights reserved"
    rare = "zebra quokka axolotl wombat numbat"
    rows = []
    # BENCH_MOD = 29: doc_id % 29 == 0 is bench. Plant the boilerplate
    # in 70 docs (> cap) spanning both sides; the rare shingle in one
    # train doc (id 1) and one bench doc (id 29).
    for i in range(70):
        did = i + 1
        extra = rare if did in (1, 29) else f"filler{did} pad{did} x{did} y{did} z{did}"
        rows.append((did, f"{boiler} {extra}", "en", "web", 0))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = q_lcs_contamination(spark, sf).collect()
    got = {(r.train_id, r.bench_id) for r in out}
    assert got == {(1, 29)}, got
    assert 70 > LCS_MAX_SHINGLE_DF


def test_lcs_contamination_matches_pure_python(spark, sf_dir):
    """Every (train, bench) pair's DP result equals a direct Python
    LCS over the same token prefixes, ratio-1.0 pairs really are
    subsequence containments, and the emitted pair SET equals the
    pure-Python candidate generation under the SAME max-df shingle
    cap (the cap is code on both sides, not prose)."""
    from timestream_travel_spark.operators.llm_text6 import BENCH_MOD
    from timestream_travel_spark.operators.llm_text16 import (
        LCS_MAX_SHINGLE_DF,
        LCS_PREFIX_WORDS,
        lcs_len,
        q_lcs_contamination,
    )

    out = q_lcs_contamination(spark, sf_dir).collect()
    assert out, "expected at least one candidate pair at this SF"
    docs = load_table(spark, sf_dir, "documents").collect()
    # pure-Python candidate pairs: shared 5-gram whose total
    # occurrence count is within the max-df cap (same statistic as
    # the engine's hot-shingle count(*) gate)
    shingle_docs: dict[str, set[int]] = {}
    shingle_occ: dict[str, int] = {}
    for r in docs:
        ws = (r.text or "").split()  # doc_words: non-empty whitespace tokens
        for i in range(len(ws) - 4):
            s = " ".join(ws[i : i + 5])
            shingle_docs.setdefault(s, set()).add(r.doc_id)
            shingle_occ[s] = shingle_occ.get(s, 0) + 1
    expect_pairs = set()
    for s, ids in shingle_docs.items():
        if shingle_occ[s] > LCS_MAX_SHINGLE_DF:
            continue
        bench = [i for i in ids if i % BENCH_MOD == 0]
        train = [i for i in ids if i % BENCH_MOD != 0]
        for t in train:
            for b in bench:
                expect_pairs.add((t, b))
    assert {(r.train_id, r.bench_id) for r in out} == expect_pairs
    texts = {
        r.doc_id: r.text.split()[:LCS_PREFIX_WORDS]
        for r in docs
    }
    for r in out:
        a, b = texts[r.train_id], texts[r.bench_id]
        expect = lcs_len(a, b)
        assert (r.lcs_len, r.len_train, r.len_bench) == (expect, len(a), len(b))
        assert abs(r.lcs_ratio - expect / min(len(a), len(b))) < 1e-12
        if r.lcs_ratio == 1.0:
            assert expect == min(len(a), len(b))


def test_pq_ann_recall_vs_brute_force(spark, sf_dir):
    """ADC shortlist + exact re-rank recovers most of the true L2
    top-10 (measured 0.7 with a 64-wide shortlist on the isotropic
    fixture; pinned conservatively)."""
    import numpy as np

    from timestream_travel_spark.operators.similarity import _query_vec
    from timestream_travel_spark.operators.similarity6 import q_pq_ann_topk

    approx = [r.vec_id for r in q_pq_ann_topk(spark, sf_dir).collect()]
    assert len(approx) == 10
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = np.asarray(_query_vec(spark, sf_dir))
    d = {
        r.vec_id: float(np.sum((np.asarray(r.embedding, dtype=np.float64) - q) ** 2))
        for r in emb
        if r.vec_id != 0
    }
    exact = [k for k, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:10]]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"PQ ANN recall too low: {recall}"
    # the re-rank stage reports EXACT distances for whatever it kept
    got = {r.vec_id: r.l2sq for r in q_pq_ann_topk(spark, sf_dir).collect()}
    for vid, l2 in got.items():
        assert abs(l2 - d[vid]) < 1e-5


def test_haar_parseval_on_fixture(spark, sf_dir):
    """Parseval: the 5 detail energies + the approximation energy sum
    to the total energy of the 32-sample grid, per event_type."""
    out = q_haar_energy(spark, sf_dir).collect()
    by_type: dict[str, dict[int, float]] = {}
    for r in out:
        by_type.setdefault(r.event_type, {})[r.level] = r.energy
    # recompute total energy directly from the hourly grid
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    epoch0 = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    hourly = (
        ev.groupBy(
            "event_type",
            ((F.unix_timestamp(F.date_trunc("hour", "ts")) - epoch0) / 3600)
            .cast("bigint")
            .alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
        .filter((F.col("h") >= 0) & (F.col("h") < HAAR_N))
        .groupBy("event_type")
        .agg(F.sum(F.col("v") * F.col("v")).cast("double").alias("tot"))
    )
    totals = {r.event_type: r.tot for r in hourly.collect()}
    for t, levels in by_type.items():
        assert set(levels) == {0, 1, 2, 3, 4, 5}
        assert all(e >= 0 for e in levels.values())
        s = sum(levels.values())
        assert math.isclose(s, totals[t], rel_tol=1e-12), (t, s, totals[t])


def test_haar_step_localizes_to_coarsest_level(spark, tmp_path):
    """A signal constant at 4 on hours 0-15 and 8 on hours 16-31 has
    ALL its detail energy in the level-5 (16h-halves) coefficient;
    finer levels see within-block constants -> zero energy."""
    sf = str(tmp_path / "haar_sf")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=i), 1, "step", 4.0 if i < 16 else 8.0, "{}")
        for i in range(HAAR_N)
    ]
    _write_events(spark, sf, rows)
    levels = {r.level: r.energy for r in q_haar_energy(spark, sf).collect()}
    # detail: ((16*4 - 16*8))^2 / 32 = 4096/32... = (sumL-sumR)^2/2^5
    assert math.isclose(levels[5], (16 * 4.0 - 16 * 8.0) ** 2 / 32, rel_tol=1e-12)
    assert all(levels[lev] == 0.0 for lev in (1, 2, 3, 4))
    assert math.isclose(levels[0], (16 * 4.0 + 16 * 8.0) ** 2 / 32, rel_tol=1e-12)
