"""SURVEY §5.6 statistical-sanity tests for the round-7 test wave.

The DuckDB oracle proves CROSS-ENGINE EQUALITY, not statistical
correctness (the q_holt_winters lesson): both engines could agree on
a wrong formula. These tests plant a known signal and check the
statistic responds the way the textbook says it must:

- KS / Mann-Whitney detect a planted location shift and stay exactly
  null on identical distributions;
- Spearman / Kendall are exactly ±1 on monotone / anti-monotone
  daily series and near 0 on an arbitrary fixed permutation;
- ANOVA F is exactly 0 under equal group means and reproduces a
  hand-computed F under planted unequal means;
- Cramér's V is exactly 0 on an independence-constructed contingency
  table and exactly 1 on a perfectly-associated (diagonal) one;
- Brown-Forsythe is exactly 0 when every group has the same absolute
  deviations from its median, and fires under planted unequal spread;
- Cohen's d reproduces a hand-computed pooled-SD effect size.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from timestream_travel_spark.operators.analytics5 import (
    q_kendall_tau,
    q_ks_two_sample,
    q_mann_whitney_u,
    q_spearman_corr,
)
from timestream_travel_spark.operators.analytics6 import (
    q_anova_f,
    q_cohens_d,
    q_cramers_v,
    q_levene_bf,
)

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)
_T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write_events(spark, sf, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )


def _write_customers(spark, sf, cust_rows, nation_rows):
    spark.createDataFrame(
        cust_rows,
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        nation_rows, "n_nationkey int, n_name string, n_regionkey int"
    ).write.mode("overwrite").parquet(f"{sf}/nation.parquet")


def _shift_fixture(spark, tmp_path):
    """3 event types: 'base' and 'same' share values 1..100 exactly;
    'shift' sits at 201..300 — disjoint support above both."""
    sf = str(tmp_path / "shift_sf")
    rows, eid = [], 0
    for t, off in (("base", 0), ("same", 0), ("shift", 200)):
        for i in range(1, 101):
            eid += 1
            rows.append((eid, _T0, eid, t, float(i + off), "{}"))
    _write_events(spark, sf, rows)
    return sf


def test_ks_null_on_identical_and_max_on_disjoint(spark, tmp_path):
    sf = _shift_fixture(spark, tmp_path)
    out = {(r.type_a, r.type_b): r.ks_stat for r in q_ks_two_sample(spark, sf).collect()}
    assert out[("base", "same")] == 0.0
    assert out[("base", "shift")] == 1.0  # disjoint supports: D = 1
    assert out[("same", "shift")] == 1.0


def test_mwu_null_on_identical_and_fires_on_shift(spark, tmp_path):
    sf = _shift_fixture(spark, tmp_path)
    out = {(r.type_a, r.type_b): r for r in q_mann_whitney_u(spark, sf).collect()}
    ident = out[("base", "same")]
    assert ident.u_a == 5000.0  # n_a·n_b/2 exactly under full ties
    assert ident.z_score == 0.0
    shifted = out[("base", "shift")]
    assert shifted.u_a == 0.0  # every base value below every shift value
    assert abs(shifted.z_score) > 10.0


def _rank_fixture(spark, tmp_path):
    """20 days; one event per (type, day). Daily sums: 'up' = d,
    'mono' = d² (strictly monotone in up), 'rev' = 21−d (exact
    reversal), 'indep' = a fixed permutation of 1..20."""
    perm = [7, 14, 2, 19, 5, 11, 20, 8, 1, 16, 4, 13, 9, 18, 3, 12, 6, 17, 10, 15]
    sf = str(tmp_path / "rank_sf")
    rows, eid = [], 0
    for d in range(1, 21):
        ts = _T0 + timedelta(days=d)
        for t, v in (
            ("up", float(d)),
            ("mono", float(d * d)),
            ("rev", float(21 - d)),
            ("indep", float(perm[d - 1])),
        ):
            eid += 1
            rows.append((eid, ts, eid, t, v, "{}"))
    _write_events(spark, sf, rows)
    return sf, perm


def test_spearman_monotone_reversal_independent(spark, tmp_path):
    sf, perm = _rank_fixture(spark, tmp_path)
    out = {
        (r.type_a, r.type_b): r.spearman_rho
        for r in q_spearman_corr(spark, sf).collect()
    }
    assert out[("mono", "up")] == 1.0  # monotone transform preserves ranks
    assert out[("rev", "up")] == -1.0  # exact reversal
    # fixed permutation: textbook 1 − 6Σd²/(n(n²−1)) computed here
    n = 20
    expect = 1 - 6 * sum((perm[i] - (i + 1)) ** 2 for i in range(n)) / (
        n * (n * n - 1)
    )
    assert abs(expect) < 0.35, "chosen permutation must be near-independent"
    assert abs(out[("indep", "up")] - round(expect, 6)) < 1e-9


def test_kendall_monotone_reversal_independent(spark, tmp_path):
    sf, perm = _rank_fixture(spark, tmp_path)
    out = {
        (r.type_a, r.type_b): r.kendall_tau_b
        for r in q_kendall_tau(spark, sf).collect()
    }
    assert out[("mono", "up")] == 1.0
    assert out[("rev", "up")] == -1.0
    # no ties in either series → tau-b = (C − D) / C(n,2)
    conc = sum(
        1
        for i in range(20)
        for j in range(i + 1, 20)
        if (perm[i] - perm[j]) * (i - j) > 0
    )
    npairs = 20 * 19 // 2
    expect = (conc - (npairs - conc)) / npairs
    assert abs(expect) < 0.35
    assert abs(out[("indep", "up")] - round(expect, 6)) < 1e-9


def test_anova_zero_under_equal_means_and_hand_computed_f(spark, tmp_path):
    nations = [(0, "XA", 0), (1, "YB", 0), (2, "ZC", 0)]
    # equal group means (all 20), nonzero within-group variance → F = 0
    sf0 = str(tmp_path / "anova_eq")
    _write_customers(
        spark,
        sf0,
        [
            (i * 10 + j, f"c{i}{j}", i, bal, "SEG")
            for i in range(3)
            for j, bal in enumerate((10.0, 20.0, 30.0))
        ],
        nations,
    )
    (row,) = q_anova_f(spark, sf0).collect()
    assert (row.k, row.n, row.f_stat) == (3, 9, 0.0)
    # planted unequal means 10/20/90, identical within-group spread:
    # ssb = 3·(900+400+2500) = 11400, ssw = 6 → F = 5700/1 = 5700
    sf1 = str(tmp_path / "anova_neq")
    _write_customers(
        spark,
        sf1,
        [
            (i * 10 + j, f"c{i}{j}", i, mean + d, "SEG")
            for i, mean in enumerate((10.0, 20.0, 90.0))
            for j, d in enumerate((-1.0, 0.0, 1.0))
        ],
        nations,
    )
    (row,) = q_anova_f(spark, sf1).collect()
    assert (row.k, row.n) == (3, 9)
    assert abs(row.f_stat - 5700.0) < 1e-6


def test_cramers_v_zero_on_independence_one_on_diagonal(spark, tmp_path):
    nations = [(0, "XA", 0), (1, "YB", 0)]
    # cell counts = product of marginals / N exactly → chi2 = V = 0
    sf0 = str(tmp_path / "cram_ind")
    rows, cid = [], 0
    for seg, nat, cnt in (("A", 0, 10), ("A", 1, 20), ("B", 0, 20), ("B", 1, 40)):
        for _ in range(cnt):
            cid += 1
            rows.append((cid, f"c{cid}", nat, 100.0, seg))
    _write_customers(spark, sf0, rows, nations)
    (row,) = q_cramers_v(spark, sf0).collect()
    assert (row.n, row.n_rows, row.n_cols) == (90, 2, 2)
    assert row.chi2 == 0.0
    assert row.cramers_v == 0.0
    # perfect association (diagonal only) → chi2 = N·min(r−1,c−1), V = 1
    sf1 = str(tmp_path / "cram_diag")
    rows, cid = [], 0
    for seg, nat in (("A", 0), ("B", 1)):
        for _ in range(30):
            cid += 1
            rows.append((cid, f"c{cid}", nat, 100.0, seg))
    _write_customers(spark, sf1, rows, nations)
    (row,) = q_cramers_v(spark, sf1).collect()
    assert row.chi2 == 60.0
    assert row.cramers_v == 1.0


def test_brown_forsythe_zero_on_equal_spread_fires_on_unequal(spark, tmp_path):
    # same |x − median| multiset {1, 0, 1} in every group → BF = 0
    sf0 = str(tmp_path / "bf_eq")
    rows, eid = [], 0
    for t, med in (("aa", 100.0), ("bb", 200.0), ("cc", 300.0)):
        for d in (-1.0, 0.0, 1.0):
            eid += 1
            rows.append((eid, _T0, eid, t, med + d, "{}"))
    _write_events(spark, sf0, rows)
    (row,) = q_levene_bf(spark, sf0).collect()
    assert (row.k, row.n, row.bf_stat) == (3, 9, 0.0)
    # one group 50× wider around the same median, 30 points/group so
    # the within-group df doesn't cap F near 1 → BF ≫ 0
    sf1 = str(tmp_path / "bf_neq")
    rows, eid = [], 0
    for t, scale in (("aa", 1.0), ("bb", 1.0), ("wide", 50.0)):
        for d in (-1.0, 0.0, 1.0):
            for _ in range(10):
                eid += 1
                rows.append((eid, _T0, eid, t, 100.0 + d * scale, "{}"))
    _write_events(spark, sf1, rows)
    (row,) = q_levene_bf(spark, sf1).collect()
    assert (row.k, row.n) == (3, 90)
    assert row.bf_stat > 30.0


def test_cohens_d_hand_computed(spark, tmp_path):
    # A = {0, 2}, B = {2, 4}: pooled s² = 2, d = −2/√2 ≈ −1.414214
    sf = str(tmp_path / "cohen_sf")
    _write_customers(
        spark,
        sf,
        [
            (1, "c1", 0, 0.0, "AAA"),
            (2, "c2", 0, 2.0, "AAA"),
            (3, "c3", 0, 2.0, "BBB"),
            (4, "c4", 0, 4.0, "BBB"),
        ],
        [(0, "XA", 0)],
    )
    (row,) = q_cohens_d(spark, sf).collect()
    assert (row.seg_a, row.seg_b, row.n_a, row.n_b) == ("AAA", "BBB", 2, 2)
    assert abs(row.cohens_d - round(-2.0 / 2.0**0.5, 6)) < 1e-12
