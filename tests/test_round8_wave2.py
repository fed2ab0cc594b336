"""SURVEY §5.6 planted-signal sanity tests for the round-8 third
statistical wave (analytics8): the DuckDB oracle proves cross-engine
equality; these prove the statistics respond the way the textbooks
say they must.

- Kruskal–Wallis is exactly 0 when every group holds the same value
  multiset and fires under a planted location shift;
- Friedman is exactly 0 on within-block ties and exactly n(k−1) on a
  perfectly consistent block ordering;
- Wilcoxon signed-rank z is exactly 0 on sign-symmetric paired diffs
  and maximal when every diff is positive;
- Bartlett is exactly 0 under identical group variances and fires on
  a planted 100× variance;
- McNemar reproduces hand-computed (|b−c|−1)²/(b+c);
- Ljung–Box is large on a trending series, small on hash noise;
- Dickey–Fuller is strongly negative on a mean-reverting series and
  mild on a random-walk-like one.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from timestream_travel_spark.operators.analytics8 import (
    EVENT_TYPES,
    MCNEMAR_MIN_DAYS,
    SEGMENTS,
    q_bartlett,
    q_dickey_fuller,
    q_friedman,
    q_kruskal_wallis,
    q_ljung_box,
    q_mcnemar,
    q_wilcoxon_signed_rank,
)

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)
_T0 = datetime(2024, 1, 1, 12, 0, 0)
_LATE0 = datetime(2024, 1, 20, 12, 0, 0)


def _write_events(spark, sf, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )


def _write_customers(spark, sf, rows):
    spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{sf}/customer.parquet")


def test_kruskal_wallis_null_on_identical_fires_on_shift(spark, tmp_path):
    """Identical value multisets in all 5 groups → every value is a
    full cross-group tie → H = 0 exactly. Shifting one group's values
    far above the rest must fire."""

    def mk(name, shift_type):
        sf = str(tmp_path / name)
        rows, eid = [], 0
        for t in EVENT_TYPES:
            off = 1000.0 if t == shift_type else 0.0
            for i in range(1, 21):
                eid += 1
                rows.append((eid, _T0, eid, t, float(i) + off, "{}"))
        _write_events(spark, sf, rows)
        return sf

    (null_row,) = q_kruskal_wallis(spark, mk("kw_null", None)).collect()
    assert null_row.n_total == 100
    assert abs(null_row.h_stat) < 1e-9
    (shift_row,) = q_kruskal_wallis(spark, mk("kw_shift", "view")).collect()
    assert shift_row.h_stat > 20  # one group fully above the others


def test_friedman_zero_on_block_ties_and_nk1_on_consistent_order(
    spark, tmp_path
):
    """All treatments equal within every block → χ²_F = 0. A perfectly
    consistent ordering across all n blocks gives the textbook maximum
    χ²_F = n(k−1) exactly."""

    def mk(name, consistent):
        sf = str(tmp_path / name)
        rows, eid = [], 0
        for d in range(10):
            day = _T0 + timedelta(days=d)
            for j, t in enumerate(EVENT_TYPES):
                eid += 1
                v = float(10 * (j + 1)) if consistent else 42.0
                rows.append((eid, day, eid, t, v, "{}"))
        _write_events(spark, sf, rows)
        return sf

    (tied,) = q_friedman(spark, mk("fr_tied", False)).collect()
    assert tied.n_blocks == 10 and tied.k == 5
    assert abs(tied.chi2_f) < 1e-9
    (cons,) = q_friedman(spark, mk("fr_cons", True)).collect()
    assert abs(cons.chi2_f - 10 * (5 - 1)) < 1e-9  # n(k−1)


def test_wilcoxon_zero_on_symmetric_max_on_onesided(spark, tmp_path):
    """Pair each +d user with a −d user of the same magnitude → the
    positive side holds exactly half of every midrank → z = 0. All
    diffs positive → W⁺ = n(n+1)/2, the maximum."""

    def mk(name, symmetric):
        sf = str(tmp_path / name)
        rows, eid = [], 0
        uid = 0
        for i in range(1, 11):
            for sign in (1, -1) if symmetric else (1,):
                uid += 1
                eid += 1
                rows.append((eid, _T0, uid, "click", 100.0, "{}"))
                eid += 1
                rows.append(
                    (eid, _LATE0, uid, "click", 100.0 + sign * i, "{}")
                )
        _write_events(spark, sf, rows)
        return sf

    (sym,) = q_wilcoxon_signed_rank(spark, mk("wx_sym", True)).collect()
    assert sym.n_pairs == 20
    assert abs(sym.z_score) < 1e-9
    (pos,) = q_wilcoxon_signed_rank(spark, mk("wx_pos", False)).collect()
    assert pos.n_pairs == 10
    assert pos.w_plus == 10 * 11 / 2  # every rank on the positive side
    assert pos.z_score > 2.5


def test_bartlett_zero_on_equal_variance_fires_on_planted(spark, tmp_path):
    """Identical per-group samples → all s²_g equal → T = 0 exactly
    (Σ(n_g−1) = N−k makes the two log terms cancel). One segment
    scaled ×10 (variance ×100) must fire."""

    def mk(name, scaled_seg):
        sf = str(tmp_path / name)
        rows, ck = [], 0
        for s in SEGMENTS:
            scale = 10.0 if s == scaled_seg else 1.0
            for i in range(1, 21):
                ck += 1
                rows.append((ck, f"c{ck}", 0, 100.0 + scale * i, s))
        _write_customers(spark, sf, rows)
        return sf

    (eq,) = q_bartlett(spark, mk("bt_eq", None)).collect()
    assert eq.n_total == 100
    assert abs(eq.bartlett_stat) < 1e-9
    (fired,) = q_bartlett(spark, mk("bt_fire", "MACHINERY")).collect()
    assert fired.bartlett_stat > 20


def test_mcnemar_hand_computed(spark, tmp_path):
    """5 users engaged early-only, 1 late-only for 'click' →
    χ² = (|5−1|−1)²/6 = 1.5 exactly."""
    sf = str(tmp_path / "mc_sf")
    rows, eid = [], 0

    def burst(uid, start_day, n_days=MCNEMAR_MIN_DAYS):
        nonlocal eid
        for d in range(n_days):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 1, start_day + d, 12, 0, 0),
                    uid,
                    "click",
                    1.0,
                    "{}",
                )
            )

    for uid in range(1, 6):  # early-engaged only (b = 5)
        burst(uid, 1)
    burst(6, 16)  # late-engaged only (c = 1)
    burst(7, 1)
    burst(7, 16)  # engaged both halves — not in b or c
    _write_events(spark, sf, rows)
    out = {r.event_type: r for r in q_mcnemar(spark, sf).collect()}
    r = out["click"]
    assert (r.n_dropped, r.n_adopted) == (5, 1)
    assert abs(r.mcnemar_chi2 - (abs(5 - 1) - 1) ** 2 / 6) < 1e-9


def test_ljung_box_trend_vs_hash_noise(spark, tmp_path):
    """A monotone trend is maximally autocorrelated at every lag → Q
    huge; the first 60 decimal digits of π are as white as a fixed
    sequence gets (sample Q ≈ 12 vs ≈ 369 for the trend). The test
    pins the ordering with a 10× margin."""
    sf = str(tmp_path / "lb_sf")
    pi_digits = (
        "1415926535897932384626433832795028841971693993751058209749"
        "44"
    )
    rows, eid = [], 0
    for d in range(60):
        day = _T0 + timedelta(days=d)
        eid += 1
        rows.append((eid, day, 1, "trend", float(d * 10), "{}"))
        eid += 1
        rows.append((eid, day, 2, "noise", float(int(pi_digits[d])), "{}"))
    _write_events(spark, sf, rows)
    out = {r.event_type: r for r in q_ljung_box(spark, sf).collect()}
    assert out["trend"].n_obs == 60
    assert out["trend"].lb_stat > 10 * out["noise"].lb_stat
    assert out["noise"].lb_stat >= 0


def test_dickey_fuller_mean_reverting_vs_random_walk(spark, tmp_path):
    """An alternating series reverts fully every step (γ ≈ −2, t ≪ 0);
    a hash-increment random walk has γ ≈ 0 — the unit root the test
    cannot reject."""
    sf = str(tmp_path / "df_sf")
    pi_digits = "141592653589793238462643383279"
    rows, eid = [], 0
    level = 500.0
    for d in range(30):
        day = _T0 + timedelta(days=d)
        jit = 0.5 * int(pi_digits[d])  # keeps SSE > 0 (no exact fit)
        eid += 1
        rows.append(
            (
                eid,
                day,
                1,
                "revert",
                100.0 + (10.0 if d % 2 else -10.0) + jit,
                "{}",
            )
        )
        level += int(pi_digits[d]) - 4.5  # zero-mean white steps
        eid += 1
        rows.append((eid, day, 2, "walk", level, "{}"))
    _write_events(spark, sf, rows)
    out = {r.event_type: r for r in q_dickey_fuller(spark, sf).collect()}
    assert out["revert"].gamma < -1.5
    assert out["revert"].adf_t < -5
    assert out["walk"].adf_t > -3


# ---------------------------------------------------------------------
# Wave C (timeseries15): indicator / volatility planted-signal tests
# ---------------------------------------------------------------------

from timestream_travel_spark.operators.timeseries15 import (  # noqa: E402
    AROON_W,
    ATR_W,
    CMO_W,
    KC_K,
    q_aroon,
    q_atr_keltner,
    q_chande_momentum,
    q_hurst_rs,
    q_parkinson_gk_vol,
    q_ulcer_index,
)


def _write_hourly(spark, sf, series):
    """series: {type: [(day_offset, hour, value), ...]} — one event per
    hour so the hourly DECIMAL level equals the planted value."""
    rows, eid = [], 0
    for t, pts in series.items():
        for d, h, v in pts:
            eid += 1
            rows.append(
                (eid, datetime(2024, 1, 1 + d, h, 30, 0), 1, t, float(v), "{}")
            )
    _write_events(spark, sf, rows)


def test_aroon_pinned_on_monotone_series(spark, tmp_path):
    """Strictly increasing daily level: today IS the rolling high →
    aroon_up = 100 on every full window, and the rolling low is the
    window's oldest day → aroon_down = 100·(W−(W−1))/W."""
    sf = str(tmp_path / "aroon_sf")
    _write_hourly(
        spark, sf, {"up": [(d, 12, 100 + 10 * d) for d in range(20)]}
    )
    out = q_aroon(spark, sf).collect()
    assert len(out) == 20 - AROON_W + 1
    for r in out:
        assert r.days_since_high == 0
        assert r.aroon_up == 100.0
        assert r.days_since_low == AROON_W - 1
        assert abs(r.aroon_down - 100.0 * 1 / AROON_W) < 1e-6


def test_atr_keltner_constant_range(spark, tmp_path):
    """Every day: low 100 at 00h, high 110 at 12h, close 105 at 23h →
    TR = H−L = 10 (close gaps are inside the range), ATR = 10, center
    = (110+100+105)/3 = 105, bands 105 ± 2·10."""
    sf = str(tmp_path / "atr_sf")
    pts = []
    for d in range(ATR_W + 5):
        pts += [(d, 0, 100), (d, 12, 110), (d, 23, 105)]
    _write_hourly(spark, sf, {"flat": pts})
    out = q_atr_keltner(spark, sf).collect()
    assert len(out) == 5  # (ATR_W+5−1 TR days) − ATR_W + 1
    for r in out:
        assert r.true_range == 10.0
        assert r.atr == 10.0
        assert abs(r.keltner_upper - (105 + KC_K * 10)) < 1e-9
        assert abs(r.keltner_lower - (105 - KC_K * 10)) < 1e-9


def test_parkinson_gk_hand_computed(spark, tmp_path):
    """Constant H/L = e (ln = 1) with O = C (ln 0): σ_P = √(1/(4ln2)),
    σ_GK = √(0.5) exactly, for every complete week."""
    import math

    sf = str(tmp_path / "pk_sf")
    pts = []
    e = math.e
    for d in range(14):
        # open == close == geometric-ish mid, high/low ratio e
        pts += [(d, 0, 200.0), (d, 6, 100.0), (d, 12, 100.0 * e), (d, 23, 200.0)]
    _write_hourly(spark, sf, {"vol": pts})
    out = q_parkinson_gk_vol(spark, sf).collect()
    assert out
    for r in out:
        assert abs(r.parkinson_vol - math.sqrt(1 / (4 * math.log(2)))) < 1e-4
        assert abs(r.garman_klass_vol - math.sqrt(0.5)) < 1e-4


def test_ulcer_zero_on_monotone_and_hand_value_on_dip(spark, tmp_path):
    """Monotone rise → every drawdown 0 → UI = 0. A single 20% dip on
    day 2 of 4 flat days → UI = √(0.25·20²) = 10 exactly."""
    sf1 = str(tmp_path / "ui_up")
    _write_hourly(spark, sf1, {"up": [(d, 12, 100 + d) for d in range(10)]})
    (r,) = q_ulcer_index(spark, sf1).collect()
    assert r.ulcer_index == 0.0
    sf2 = str(tmp_path / "ui_dip")
    _write_hourly(
        spark, sf2, {"dip": [(0, 12, 100), (1, 12, 80), (2, 12, 100), (3, 12, 100)]}
    )
    (r2,) = q_ulcer_index(spark, sf2).collect()
    assert r2.n_days == 4
    assert abs(r2.ulcer_index - 10.0) < 1e-9


def test_cmo_saturates_and_balances(spark, tmp_path):
    """All moves up → CMO = +100 on every full window; perfectly
    alternating ±5 moves → ΣG = ΣL → CMO = 0 (windows with equal
    up/down counts)."""
    sf = str(tmp_path / "cmo_sf")
    _write_hourly(
        spark,
        sf,
        {
            "up": [(d, 12, 100 + 7 * d) for d in range(CMO_W + 3)],
            "alt": [
                (d, 12, 100 + (5 if d % 2 else 0)) for d in range(CMO_W + 3)
            ],
        },
    )
    out = {}
    for r in q_chande_momentum(spark, sf).collect():
        out.setdefault(r.event_type, []).append(r.cmo)
    assert all(v == 100.0 for v in out["up"])
    # CMO_W=14 moves: 7 up (+5), 7 down (−5) in every full window
    assert all(abs(v) < 1e-9 for v in out["alt"])


def test_hurst_orders_trend_vs_alternation(spark, tmp_path):
    """A trending hourly series is strongly persistent (H → 1); a
    fast alternation is anti-persistent (H well below 0.5). The test
    pins the ordering and the persistent H > 0.9."""
    sf = str(tmp_path / "hurst_sf")
    trend, alt = [], []
    for d in range(30):
        for h in range(24):
            i = d * 24 + h
            trend.append((d, h, 1000 + i))
            alt.append((d, h, 1000 + (50 if i % 2 else 0)))
    _write_hourly(spark, sf, {"trend": trend, "alt": alt})
    out = {r.event_type: r.hurst_h for r in q_hurst_rs(spark, sf).collect()}
    assert out["trend"] > 0.9
    assert out["alt"] < 0.3
    assert out["trend"] > out["alt"]
