"""SURVEY §5.6 sanity tests for the round-8 fifth wave: ordered-
alternative tests (Page, Jonckheere–Terpstra), Cochran's Q, spectral
entropy, Higuchi fractal dimension, and Sharpe/Sortino — each
verified on planted data with hand-computable outcomes.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from timestream_travel_spark.operators.analytics9 import (
    COCHRAN_MIN_EVENTS,
    q_cochran_q,
    q_jonckheere_terpstra,
    q_page_trend,
)
from timestream_travel_spark.operators.timeseries17 import (
    q_higuchi_fd,
    q_sharpe_sortino,
    q_spectral_entropy,
)

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)
_T0 = datetime(2024, 5, 1, 0, 0, 0)
# analytics8.EVENT_TYPES order is the planted treatment ordering
_TYPES = ("click", "error", "purchase", "signup", "view")


def _write_events(spark, sf, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    return sf


def test_page_trend_perfect_ordering(spark, tmp_path):
    """Daily level = alphabetical treatment index every day for 20
    days -> L = n * sum(j^2) = 20 * 55 = 1100 and z = 2*sqrt(n)."""
    rows, eid = [], 0
    for d in range(20):
        for j, t in enumerate(_TYPES):
            eid += 1
            rows.append((eid, _T0 + timedelta(days=d), eid, t, float(j + 1), "{}"))
    sf = _write_events(spark, str(tmp_path / "sf_page"), rows)
    r = q_page_trend(spark, sf).collect()[0]
    assert r.n_blocks == 20 and r.k == 5
    assert r.page_l == 1100.0
    assert r.z_score == round(2 * math.sqrt(20), 6)


def test_jonckheere_fully_separated_groups(spark, tmp_path):
    """Every value in group i below every value in group j (i < j),
    10 values each -> JT = sum n_i*n_j = 1000, E = 500."""
    rows, eid = [], 0
    for j, t in enumerate(_TYPES):
        for m in range(10):
            eid += 1
            rows.append(
                (eid, _T0 + timedelta(hours=eid), eid, t,
                 float(j * 1000 + m + 1), "{}")
            )
    sf = _write_events(spark, str(tmp_path / "sf_jt"), rows)
    r = q_jonckheere_terpstra(spark, sf).collect()[0]
    assert r.n_total == 50
    assert r.jt_stat == 1000.0
    assert r.e_jt == 500.0
    var = (50.0 * 50 * 103 - 5 * 100 * 23) / 72
    assert r.z_score == round(500.0 / math.sqrt(var), 6)


def test_cochran_q_hand_computed(spark, tmp_path):
    """8 users x 3 types; responders get >= COCHRAN_MIN_EVENTS events.
    C = (8, 4, 0), R = four 1s + four 2s -> Q = 2*288/(3*16) = 12."""
    rows, eid = [], 0

    def burst(user, t, n):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, _T0 + timedelta(minutes=eid), user, t, 1.0, "{}")
            )

    for u in range(1, 5):       # users 1-4 respond to 'click' only
        burst(u, "click", COCHRAN_MIN_EVENTS)
    for u in range(5, 9):       # users 5-8 respond to 'click' and 'error'
        burst(u, "click", COCHRAN_MIN_EVENTS)
        burst(u, "error", COCHRAN_MIN_EVENTS)
    burst(1, "view", 2)         # 'view' present but below threshold
    sf = _write_events(spark, str(tmp_path / "sf_cq"), rows)
    r = q_cochran_q(spark, sf).collect()[0]
    assert r.n_users == 8 and r.k == 3
    assert r.n_responses == 12
    assert r.cochran_q == 12.0


def test_spectral_entropy_pure_tone_vs_flat_spectrum(spark, tmp_path):
    """A pure 24h (or 12h) cosine concentrates all power in one
    harmonic -> entropy ~ 0; equal-amplitude harmonics 1..5 spread it
    evenly -> normalized entropy ~ 1."""
    rows, eid = [], 0
    for d in range(3):
        for h in range(24):
            ts = _T0 + timedelta(days=d, hours=h)
            w = 2.0 * math.pi * h / 24.0
            series = {
                "click": 100.0 + 50.0 * math.cos(w),
                "error": 100.0 + 50.0 * math.cos(2 * w),
                "view": 100.0 + sum(30.0 * math.cos(k * w) for k in range(1, 6)),
            }
            for t, v in series.items():
                eid += 1
                rows.append((eid, ts, eid, t, v, "{}"))
    sf = _write_events(spark, str(tmp_path / "sf_spec"), rows)
    out = {r.event_type: r for r in q_spectral_entropy(spark, sf).collect()}
    assert out["click"].spectral_entropy_norm < 0.01
    assert out["error"].spectral_entropy_norm < 0.01
    assert out["view"].spectral_entropy_norm > 0.99


def test_higuchi_fd_line_one_sawtooth_rough(spark, tmp_path):
    """A straight line has FD exactly 1 (L(k) ~ 1/k); adding a
    stride-1 oscillation 10x the slope pushes FD toward 2."""
    rows, eid = [], 0
    for i in range(60):
        ts = _T0 + timedelta(hours=i)
        for t, v in (("click", float(i)), ("error", float(i + 10 * (i % 2)))):
            eid += 1
            rows.append((eid, ts, eid, t, v, "{}"))
    sf = _write_events(spark, str(tmp_path / "sf_hig"), rows)
    out = {r.event_type: r for r in q_higuchi_fd(spark, sf).collect()}
    assert out["click"].higuchi_fd == 1.0
    assert out["error"].higuchi_fd > 1.9


def test_sharpe_sortino_planted_returns(spark, tmp_path):
    """Alternating +10%/-10% -> mean 0, both ratios exactly 0;
    alternating +10%/+21% -> sharpe = .155/.055, no downside ->
    sortino NULL."""
    rows, eid = [], 0
    for d, v in enumerate([100.0, 110.0, 99.0, 108.9, 98.01]):
        eid += 1
        rows.append((eid, _T0 + timedelta(days=d), eid, "click", v, "{}"))
    for d, v in enumerate([100.0, 110.0, 133.1, 146.41, 177.1561]):
        eid += 1
        rows.append((eid, _T0 + timedelta(days=d), eid, "error", v, "{}"))
    sf = _write_events(spark, str(tmp_path / "sf_ss"), rows)
    out = {r.event_type: r for r in q_sharpe_sortino(spark, sf).collect()}
    assert out["click"].n_returns == 4
    assert out["click"].mean_return == 0.0
    assert out["click"].sharpe == 0.0
    assert out["click"].sortino == 0.0
    assert out["error"].mean_return == 0.155
    assert out["error"].sharpe == 2.818182
    assert out["error"].sortino is None
