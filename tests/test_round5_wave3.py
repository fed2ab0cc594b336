"""Round-5 third-wave operators: session Markov transitions, RSI,
Benford audit, Gini concentration, degree assortativity, Theil–Sen
trend, source capping, and k-core decomposition.

Cross-engine value correctness is covered by the DuckDB oracles
(tools/oracle_check.py --strict passes at sf0.001/0.01/0.1); these
tests pin the algorithmic invariants the hash compare can't express
— and, for the iterative rows-only k-core, full parity against a
pure-Python peel.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from timestream_travel_spark.operators.analytics2 import (
    q_benford_digits,
    q_gini_concentration,
    q_rsi_indicator,
    q_session_transitions,
)
from timestream_travel_spark.operators.graph3 import (
    kcore_decomposition,
    q_degree_assortativity,
    q_kcore_trade,
)
from timestream_travel_spark.operators.llm_text15 import SOURCE_CAP, q_source_cap
from timestream_travel_spark.operators.timeseries9 import q_theilsen_trend


def _py_kcore(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference peel: repeatedly delete min-degree nodes; a node's
    core is the peel level at its deletion (Matula–Beck)."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    core: dict[int, int] = {}
    k = 1
    alive = set(adj)
    while alive:
        peel = {n for n in alive if len(adj[n] & alive) < k}
        if not peel:
            k += 1
            continue
        for n in peel:
            core[n] = k - 1
        alive -= peel
    return core


def test_kcore_matches_pure_python_random_graph(spark):
    rng = random.Random(5)
    n = 120
    edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(400)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    stats: dict = {}
    got = {r.node: r.core for r in kcore_decomposition(df, stats=stats).collect()}
    assert got == _py_kcore(edges)
    # degeneracy-bounded rounds: max core + cascade rounds, far
    # below the 200-round guard
    assert stats["rounds"] < 60, stats


def test_kcore_neighbor_cascade_path_graph(spark):
    """Path graph: peeling at k=2 deletes the endpoints, which
    strips the middle node's edges — it must still receive core 1
    (the alive-set left join), not vanish from the output."""
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.node: r.core for r in kcore_decomposition(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_kcore_trade_consistent_with_assortativity_graph(spark, sf_dir):
    rows = q_kcore_trade(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.core >= 0 for r in rows)


def test_session_transitions_rows_are_distributions(spark, sf_dir):
    rows = q_session_transitions(spark, sf_dir).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n > 0 and 0 < r.p <= 1
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, tot in by_prev.items():
        assert math.isclose(tot, 1.0, rel_tol=1e-12), (prev, tot)


def test_rsi_bounded_and_window_full(spark, sf_dir):
    rows = q_rsi_indicator(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.rsi <= 100.0 for r in rows)
    # 30 daily points → 29 deltas → 16 full 14-delta windows per type
    per_type: dict[str, int] = {}
    for r in rows:
        per_type[r.event_type] = per_type.get(r.event_type, 0) + 1
    assert set(per_type.values()) == {16}, per_type


def test_benford_frequencies_and_chi2(spark, sf_dir):
    rows = q_benford_digits(spark, sf_dir).collect()
    assert {r.digit for r in rows} == set(range(1, 10))
    assert math.isclose(sum(r.obs_freq for r in rows), 1.0, rel_tol=1e-12)
    assert math.isclose(sum(r.exp_freq for r in rows), 1.0, rel_tol=1e-9)
    chi2 = {r.chi2 for r in rows}
    assert len(chi2) == 1 and chi2.pop() >= 0


def test_gini_in_unit_interval(spark, sf_dir):
    row = q_gini_concentration(spark, sf_dir).collect()[0]
    assert row.n_customers > 0
    assert 0.0 <= row.gini < 1.0


def test_assortativity_in_pearson_range(spark, sf_dir):
    row = q_degree_assortativity(spark, sf_dir).collect()[0]
    assert row.n_endpoints > 0 and row.n_endpoints % 2 == 0
    assert -1.0 <= row.assortativity <= 1.0


def test_theilsen_ignores_outlier_where_lsq_cannot(spark):
    """Statistical sanity (SURVEY §5 layer): on y = 3x with one wild
    outlier, the pairwise-slope median recovers slope 3 exactly while
    least squares is dragged off by the contaminated point."""
    # outlier at the END point — max leverage on least squares (an
    # outlier at the mean of x has zero slope leverage)
    pts = [(float(x), 3.0 * x) for x in range(21)]
    pts[20] = (20.0, 1000.0)
    df = spark.createDataFrame(pts, "x double, y double")
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("s")
    )
    svals = sorted(r.s for r in slopes.collect())
    m = len(svals)
    median = (svals[(m - 1) // 2] + svals[m // 2]) / 2
    assert math.isclose(median, 3.0, rel_tol=1e-12)
    # LSQ on the same data does NOT recover 3
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    lsq = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(lsq - 3.0) > 0.5


def test_theilsen_fixture_slopes_finite(spark, sf_dir):
    rows = q_theilsen_trend(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_pairs > 0
        assert math.isfinite(r.theilsen_slope)


def test_source_cap_audit_consistent(spark, sf_dir):
    rows = q_source_cap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= SOURCE_CAP
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.kept_chars > 0
