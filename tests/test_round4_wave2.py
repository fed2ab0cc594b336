"""Property tests for the round-4 second-wave operators
(timeseries5, relational6, llm_text12) — invariants the DuckDB
oracle's value-hash can't express by itself."""

from __future__ import annotations

import os

import pytest

from timestream_travel_spark.operators.llm_text12 import q_split_kl_drift
from timestream_travel_spark.operators.relational6 import (
    q_merge_upsert,
    q_mode_per_group,
    q_window_count_distinct,
)
from timestream_travel_spark.operators.timeseries5 import (
    q_ewma_batch,
    q_lttb_downsample,
    q_mad_anomaly,
)
from timestream_travel_spark.tables import load_table


def test_ewma_matches_pure_python(spark, sf_dir):
    """Distributed grouped-map EWMA == the sequential reference
    recurrence, bit-for-bit, for every series."""
    rows = q_ewma_batch(spark, sf_dir).collect()
    got = {(r.user_id, r.event_id): r.ewma for r in rows}

    import duckdb

    src = duckdb.sql(
        f"SELECT user_id, event_id, value FROM '{sf_dir}/events.parquet' "
        "WHERE event_type = 'purchase' ORDER BY user_id, ts, event_id"
    ).fetchall()
    expect = {}
    prev_user, prev = None, 0.0
    for user_id, event_id, x in src:
        prev = x if user_id != prev_user else prev * 0.7 + 0.3 * x
        prev_user = user_id
        expect[(user_id, event_id)] = prev
    assert got == expect


def test_ewma_bounded_by_running_extremes(spark, sf_dir):
    """A convex-combination smoother can never leave the envelope of
    the values seen so far."""
    import duckdb

    src = duckdb.sql(
        f"SELECT user_id, event_id, value FROM '{sf_dir}/events.parquet' "
        "WHERE event_type = 'purchase' ORDER BY user_id, ts, event_id"
    ).fetchall()
    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    bounds = {}
    for user_id, event_id, x in src:
        lo[user_id] = min(lo.get(user_id, x), x)
        hi[user_id] = max(hi.get(user_id, x), x)
        bounds[(user_id, event_id)] = (lo[user_id], hi[user_id])
    for r in q_ewma_batch(spark, sf_dir).collect():
        b_lo, b_hi = bounds[(r.user_id, r.event_id)]
        assert b_lo - 1e-9 <= r.ewma <= b_hi + 1e-9


def test_merge_covers_keyspace_and_branches(spark, sf_dir):
    """MERGE output = target ∪ source keys exactly once; keep rows
    carry the target balance unchanged; inserts are source-only keys."""
    rows = q_merge_upsert(spark, sf_dir).collect()
    by_key = {r.c_custkey: r for r in rows}
    assert len(by_key) == len(rows), "merge key appears twice"

    cust = {
        r.c_custkey: r.c_acctbal
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    target = {k: v for k, v in cust.items() if k % 7 != 0}
    from timestream_travel_spark.operators.relational6 import MERGE_CUTOFF

    source = {
        r.o_custkey
        for r in load_table(spark, sf_dir, "orders")
        .filter(f"o_orderdate >= '{MERGE_CUTOFF}'")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert set(by_key) == set(target) | source
    for k, r in by_key.items():
        if r.action == "keep":
            assert k in target and k not in source
            assert r.new_acctbal == pytest.approx(target[k], abs=0.005)
        elif r.action == "insert":
            assert k not in target and k in source
        else:
            assert r.action == "update" and k in target and k in source


def test_window_count_distinct_monotone_and_final(spark, sf_dir):
    """Running distinct count is non-decreasing per user and ends at
    the user's true distinct-type count."""
    rows = q_window_count_distinct(spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.n_distinct_types))
    ev = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    for user, seq in per_user.items():
        seq.sort()
        counts = [n for _, _, n in seq]
        assert counts == sorted(counts), f"not monotone for user {user}"
        assert counts[-1] == truth[user]


def test_mode_is_argmax(spark, sf_dir):
    """Reported mode count equals the user's true max type count."""
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events")
    truth = {
        r.user_id: r.mx
        for r in ev.groupBy("user_id", "event_type")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("mx"))
        .collect()
    }
    for r in q_mode_per_group(spark, sf_dir).collect():
        assert r.n == truth[r.user_id]


def test_lttb_one_point_per_bucket_and_endpoints(spark, sf_dir):
    """Downsample keeps exactly one source point per (user, week) and
    preserves each series' first and last samples (the LTTB endpoint
    guarantee)."""
    import duckdb

    buckets = duckdb.sql(
        f"""
        SELECT user_id, count(DISTINCT date_trunc('week', ts)) AS n_wk,
               min(ts) AS first_ts, max(ts) AS last_ts
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
        GROUP BY user_id
        """
    ).fetchall()
    rows = q_lttb_downsample(spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.ts)
    for user_id, n_wk, first_ts, last_ts in buckets:
        got = sorted(per_user[user_id])
        assert len(got) == n_wk
        assert got[0] == first_ts.strftime("%Y-%m-%d %H:%M:%S")
        assert got[-1] == last_ts.strftime("%Y-%m-%d %H:%M:%S")


def test_mad_flags_are_extreme_within_series(spark, sf_dir):
    """Every flagged sample deviates from its series median by more
    than every unflagged sample of the same series deviates."""
    import duckdb

    flagged = {
        (r.user_id, r.event_id) for r in q_mad_anomaly(spark, sf_dir).collect()
    }
    src = duckdb.sql(
        f"""
        WITH m AS (
          SELECT user_id, quantile_cont(value, 0.5) AS med
          FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
          GROUP BY user_id
        )
        SELECT e.user_id, e.event_id, abs(e.value - m.med) AS dev
        FROM '{sf_dir}/events.parquet' e JOIN m USING (user_id)
        WHERE e.event_type = 'purchase'
        """
    ).fetchall()
    max_unflagged: dict[int, float] = {}
    min_flagged: dict[int, float] = {}
    for user_id, event_id, dev in src:
        if (user_id, event_id) in flagged:
            min_flagged[user_id] = min(min_flagged.get(user_id, dev), dev)
        else:
            max_unflagged[user_id] = max(max_unflagged.get(user_id, dev), dev)
    for user_id, lo in min_flagged.items():
        assert lo >= max_unflagged.get(user_id, 0.0)


def test_kl_drift_near_zero_on_hash_split(spark, sf_dir):
    """An md5 hash split is topic-blind, so both KL directions must be
    tiny and non-negative (smoothed KL of near-identical dists)."""
    row = q_split_kl_drift(spark, sf_dir).collect()[0]
    assert row.n_train_tok + row.n_val_tok > 0
    assert 0.0 <= row.kl_train_val_bits < 0.5
    assert 0.0 <= row.kl_val_train_bits < 0.5


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_nullsafe_join_is_hash_join(spark, sf_dir):
    """<=> must plan as a HASH join key (docstring claim): a
    nested-loop fallback would be unusable on a 100 TB fact side."""
    from timestream_travel_spark.operators.relational6 import q_nullsafe_join

    plan = _plan(q_nullsafe_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_ewma_single_exchange_and_pushdown(spark, sf_dir):
    """The recurrence costs exactly one shuffle (the user_id
    repartition) and the purchase filter reaches the scan."""
    from timestream_travel_spark.operators.timeseries5 import q_ewma_batch

    plan = _plan(q_ewma_batch(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "EqualTo(event_type,purchase)" in plan


@pytest.mark.parametrize(
    "dirname", ["sf0.001", "sf0.01", "sf0.1"], ids=["sf0.001", "sf0.01", "sf0.1"]
)
def test_hll_intersection_close_to_exact(spark, dirname):
    """Inclusion-exclusion HLL estimate lands within 15% of the exact
    INTERSECT count (HLL relative error ~1.6% at default lgK; three
    estimates compound) — checked across three fixture scales so the
    bound isn't a small-N accident (SURVEY B.4 row's claim)."""
    from timestream_travel_spark.operators.relational6 import (
        q_distinct_intersection,
        q_hll_intersection_est,
    )

    sf = f"/root/testdata/{dirname}"
    if not os.path.isdir(sf):
        pytest.skip(f"fixture {sf} not generated")
    exact = q_distinct_intersection(spark, sf).collect()[0].n_both
    est = q_hll_intersection_est(spark, sf).collect()[0].n_both_est
    assert exact > 0
    assert abs(est - exact) <= max(3, 0.15 * exact), (est, exact)


def test_lttb_true_matches_python_replay(spark, sf_dir):
    """True LTTB (previous-selected-point anchor, exact-integer
    n-scaled areas — the r15 oracled convention): exact match with a
    pure-Python integer replay per series; one point per bucket; both
    series endpoints preserved. Also pins the fixture's B ≤ 5 bucket
    bound the oracle's 3 unrolled middle steps rely on."""
    from decimal import Decimal

    import pandas as pd

    import __spark_entry__ as entrymod

    from timestream_travel_spark.operators.timeseries7 import LTTB_SERIES_CAP

    got = entrymod.queries()["q_lttb_true"](spark, sf_dir).collect()
    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .filter(f"user_id < {LTTB_SERIES_CAP}")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    pdf = pd.DataFrame([r.asDict() for r in rows])
    want = set()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = (g["ts"].astype("int64") // 1000).to_list()
        wk = [(u // 86_400_000_000 + 3) // 7 for u in us]
        yq = [int(Decimal(repr(float(v))) * 100) for v in g["value"]]
        buckets: list[list[int]] = []
        for i, w in enumerate(wk):
            if buckets and wk[buckets[-1][0]] == w:
                buckets[-1].append(i)
            else:
                buckets.append([i])
        assert len(buckets) <= 5  # the oracle's unroll bound
        chosen = [buckets[0][0]]
        for i in range(1, len(buckets) - 1):
            nxt = buckets[i + 1]
            n = len(nxt)
            sx = sum(us[j] for j in nxt)
            sy = sum(yq[j] for j in nxt)
            ax, ay = us[chosen[-1]], yq[chosen[-1]]
            best, best_area = None, -1
            for j in buckets[i]:
                area = abs(
                    (ax * n - sx) * (yq[j] - ay) - (ax - us[j]) * (sy - ay * n)
                )
                if area > best_area:
                    best, best_area = j, area
            chosen.append(best)
        if len(buckets) > 1:
            chosen.append(buckets[-1][-1])
        for j in chosen:
            want.add((uid, int(g.iloc[j]["event_id"])))
        # endpoints survive
        assert (uid, int(g.iloc[buckets[0][0]]["event_id"])) in want
        assert (uid, int(g.iloc[buckets[-1][-1]]["event_id"])) in want
    assert {(r["user_id"], r["event_id"]) for r in got} == want
