"""Round-5 fourth-wave operators: chi-square independence, Welch A/B
z-test, per-brand skyline, ABC classification, top session paths.

Cross-engine value correctness is covered by the DuckDB oracles
(strict at sf0.001/0.01/0.1); these tests pin algorithmic invariants
— notably a brute-force dominance check for the skyline window
formulation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from timestream_travel_spark.operators.analytics3 import (
    PATH_LEN,
    TOP_PATHS,
    q_ab_test_zscore,
    q_abc_classification,
    q_chi2_independence,
    q_session_paths,
    q_skyline_parts,
)
from timestream_travel_spark.tables import load_table


def test_skyline_matches_brute_force_dominance(spark, sf_dir):
    """No returned point is dominated, and no non-returned distinct
    point is undominated — the window trick equals the O(n²)
    definition."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_brand", "p_retailprice", "p_size"
    ).collect()
    pts: dict[str, set[tuple[float, int]]] = {}
    for r in parts:
        pts.setdefault(r.p_brand, set()).add((r.p_retailprice, r.p_size))
    expected = set()
    for brand, ps in pts.items():
        for p in ps:
            dominated = any(
                q != p and q[0] <= p[0] and q[1] <= p[1] for q in ps
            )
            if not dominated:
                expected.add((brand, p[0], p[1]))
    got = {
        (r.p_brand, r.p_retailprice, r.p_size)
        for r in q_skyline_parts(spark, sf_dir).collect()
    }
    assert got == expected


def test_abc_partitions_parts_and_shares(spark, sf_dir):
    rows = {r.abc_class: r for r in q_abc_classification(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    n_li_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_li_parts
    assert math.isclose(sum(r.revenue_share for r in rows.values()), 1.0, rel_tol=1e-9)
    # the A head covers at most 80% of revenue by construction
    assert rows["A"].revenue_share <= 0.8 + 1e-9


def test_chi2_cells_and_statistic(spark, sf_dir):
    rows = q_chi2_independence(spark, sf_dir).collect()
    assert len(rows) <= 5 * 4
    chi2 = {r.chi2 for r in rows}
    assert len(chi2) == 1 and chi2.pop() >= 0
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    assert math.isclose(sum(r.expected for r in rows), n_events, rel_tol=1e-9)


def test_ab_split_covers_all_users(spark, sf_dir):
    row = q_ab_test_zscore(spark, sf_dir).collect()[0]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert row.n_a + row.n_b == n_users
    assert row.n_a > 0 and row.n_b > 0
    assert math.isfinite(row.z_stat)


def test_session_paths_are_event_type_strings(spark, sf_dir):
    rows = q_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP_PATHS
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= PATH_LEN
        assert set(steps) <= types, r.path
        assert r.n_sessions > 0
