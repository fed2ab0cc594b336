"""Round-16 optimization parity tests.

The rank_kit wave moves the two-/k-sample rank-test censuses
driver-side over the collected counts spine (the q_hodges_lehmann /
graph_kit precedent).  These tests pin the kit's collected arrays and
census helpers against the live Spark spine (analytics5._counts /
_pair_grid) on the fixture, so the optimization provably changed the
plan, not the numbers feeding each query's unchanged final float
expressions.
"""

from __future__ import annotations

from timestream_travel_spark.operators.rank_kit import (
    counts_by_type,
    doubled_midranks,
    med2_doubled,
    merged_pair,
    pooled_grid,
    type_pairs,
)


def test_counts_by_type_matches_spark_spine(spark, sf_dir):
    from timestream_travel_spark.operators.analytics5 import _counts

    kit = counts_by_type(spark, sf_dir)
    want: dict = {}
    for r in _counts(spark, sf_dir).collect():
        want.setdefault(r.t, []).append((r.v, r.c))
    assert set(kit) == set(want)
    for t, pairs in want.items():
        pairs.sort()
        v, c = kit[t]
        assert v.tolist() == [p[0] for p in pairs]
        assert c.tolist() == [p[1] for p in pairs]
        # the spine is distinct-by-value within each type
        assert len(set(v.tolist())) == len(v)


def test_merged_pair_matches_pair_grid(spark, sf_dir):
    from timestream_travel_spark.operators.analytics5 import _pair_grid

    kit = counts_by_type(spark, sf_dir)
    grid: dict = {}
    for r in _pair_grid(spark, sf_dir).collect():
        grid.setdefault((r.ta, r.tb), []).append((r.v, r.ca, r.cb))
    assert set(grid) == set(type_pairs(kit))
    for (ta, tb), rows in grid.items():
        rows.sort()
        v, ca, cb = merged_pair(kit, ta, tb)
        assert v.tolist() == [r[0] for r in rows]
        assert ca.tolist() == [r[1] for r in rows]
        assert cb.tolist() == [r[2] for r in rows]


def test_pooled_grid_and_census_helpers(spark, sf_dir):
    kit = counts_by_type(spark, sf_dir)
    vs, cs = pooled_grid(kit)
    # pooled counts are the per-type counts summed on the union grid
    flat: dict = {}
    for v, c in kit.values():
        for x, k in zip(v.tolist(), c.tolist()):
            flat[x] = flat.get(x, 0) + k
    assert vs.tolist() == sorted(flat)
    assert cs.tolist() == [flat[x] for x in vs.tolist()]

    # med2_doubled == the two middle order statistics of the expansion
    for t, (v, c) in kit.items():
        expanded = [x for x, k in zip(v.tolist(), c.tolist()) for _ in range(k)]
        n = len(expanded)
        want = expanded[(n + 1) // 2 - 1] + expanded[(n + 2) // 2 - 1]
        assert med2_doubled(v.tolist(), c.tolist(), n) == want, t

    # doubled midranks == 2*midrank of each tie block (always integral)
    r2 = doubled_midranks(cs)
    cum = 0
    for i, k in enumerate(cs.tolist()):
        lo, hi = cum + 1, cum + k
        assert r2[i] == lo + hi, i
        cum = hi
