"""Property-style spot checks (SURVEY.md §5.5) + plan-shape
assertions that guard the scale story (pushdown, broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from timestream_travel_spark.tables import load_table


def test_topk_is_prefix_of_global_sort(spark, sf_dir):
    qs = entrymod.queries()
    topk = [r["o_orderkey"] for r in qs["q_orderby_limit"](spark, sf_dir).collect()]
    full = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey")
        .limit(len(topk))
        .collect()
    )
    assert topk == [r["o_orderkey"] for r in full]


def test_union_except_algebra(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    # x ∪ x == x (distinct); x − x == ∅
    assert c.union(c).distinct().count() == c.distinct().count()
    assert c.exceptAll(c).count() == 0


def test_asof_result_is_latest_prior(spark, sf_dir):
    qs = entrymod.queries()
    rows = qs["q_join_asof"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["click_ts"] is not None:
            assert r["click_ts"] <= r["purchase_ts"]


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = li.select("l_orderkey").  _jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_dim_join_is_broadcast(spark, sf_dir):
    qs = entrymod.queries()
    plan = qs["q_join_broadcast_dims"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_total_sort(spark, sf_dir):
    qs = entrymod.queries()
    plan = qs["q_orderby_limit"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Scale story: co-located (bucketed) fact tables join without an
    Exchange — the 100 TB answer to repeated orderkey joins."""
    import uuid

    db = f"bucketdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(f"{db}.orders_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(f"{db}.lineitem_b")
        ob, lb = spark.table(f"{db}.orders_b"), spark.table(f"{db}.lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Writes partitioned by event_type; an equality filter must prune
    to one partition directory (dynamic file skipping)."""
    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "part_events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dest)
    back = spark.read.parquet(dest).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """HLL++ estimate must stay within ~3x its configured rsd of the
    exact count (rows-only op needs a correctness bound somewhere)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    est = qs["q_approx_count_distinct"](spark, sf_dir).collect()[0]
    exact_orders = load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    exact_parts = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    assert abs(est["approx_orders"] - exact_orders) / exact_orders < 0.06
    assert abs(est["approx_parts"] - exact_parts) / exact_parts < 0.06


def test_percentile_approx_error_bound(spark, sf_dir):
    """approx_percentile sketch must land near the exact interpolated
    percentile (scale path next to the exact q_percentiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("ap"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("ex"),
    ).collect()[0]
    assert abs(row["ap"] - row["ex"]) / row["ex"] < 0.01


def test_hll_sketch_union_accuracy(spark, sf_dir):
    """Merged per-half HLL sketches must estimate the global distinct
    count within HLL error (~2% at default lgK), and match a sketch
    built over the whole table."""
    import __spark_entry__ as entrymod

    od = load_table(spark, sf_dir, "orders")
    exact = od.select("o_custkey").distinct().count()
    est = entrymod.queries()["q_hll_sketch_union"](spark, sf_dir).collect()[0]["approx_custkeys"]
    assert abs(est - exact) / exact < 0.05, f"{est} vs {exact}"
    whole = od.agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")), 0).cast("bigint").alias("e")
    ).collect()[0]["e"]
    assert est == whole  # union of halves == whole-table sketch


def test_parse_duration_properties():
    """Hypothesis: any composed <n><unit> sequence parses to the sum
    of its parts; junk never parses."""
    from datetime import timedelta

    from hypothesis import given, strategies as st

    from timestream_travel_spark.pipeline.backup import parse_duration

    UNITS = {"w": 7 * 86400, "d": 86400, "h": 3600, "m": 60, "s": 1}

    @given(
        st.lists(
            st.tuples(st.integers(0, 9999), st.sampled_from(list(UNITS))),
            min_size=1, max_size=6,
        )
    )
    def roundtrip(parts):
        spec = "".join(f"{n}{u}" for n, u in parts)
        want = timedelta(seconds=sum(n * UNITS[u] for n, u in parts))
        assert parse_duration(spec) == want

    roundtrip()

    @given(st.text(alphabet="0123456789wdhms .x-", max_size=12))
    def never_crashes(s):
        try:
            parse_duration(s)
        except ValueError:
            pass  # rejection is the contract; anything else would raise

    never_crashes()


def test_tpch_broadcast_hints_only_on_bounded_inputs(spark, sf_dir, monkeypatch):
    """Scale guard: an explicit F.broadcast hint overrides
    autoBroadcastJoinThreshold, so it is only safe on inputs whose size
    does NOT grow with scale factor — nation (25 rows), region (5), and
    1-row scalar aggregates. customer/supplier/part and data-derived
    key sets must join unhinted (AQE demotes to broadcast at runtime
    when the post-filter size allows). Spy on every hint the TPC-H
    suite places and fail if one targets a scaling table."""
    import os as _os

    import timestream_travel_spark.operators.tpch as tpch

    BOUNDED_FILES = {"nation.parquet", "region.parquet"}
    recorded: list = []
    real_broadcast = F.broadcast

    def spy(df):
        recorded.append(df)
        return real_broadcast(df)

    monkeypatch.setattr(tpch.F, "broadcast", spy)
    qs = entrymod.queries()
    tpch_names = [n for n in qs if n.startswith("q_tpch_")]
    assert tpch_names
    for name in tpch_names:
        recorded.clear()
        qs[name](spark, sf_dir)
        for hinted in recorded:
            files = {_os.path.basename(p.rstrip("/")) for p in hinted.inputFiles()}
            if files <= BOUNDED_FILES:
                continue
            # the only other legitimate hint target: a scalar (1-row,
            # no-grouping) aggregate — constant-size at any sf
            n_rows = hinted.count()
            assert n_rows == 1, (
                f"{name} forces broadcast on a scale-proportional input "
                f"(sources {sorted(files)}, {n_rows} rows)"
            )


def test_sample_deterministic_reproducible(spark, sf_dir):
    """Seeded sampling: same seed ⇒ identical row set across runs;
    fraction lands in a plausible band; a different seed diverges."""
    li = load_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_linenumber"]
    a = {tuple(r) for r in li.sample(fraction=0.01, seed=42).select(*key).collect()}
    b = {tuple(r) for r in li.sample(fraction=0.01, seed=42).select(*key).collect()}
    assert a == b
    n = li.count()
    assert 0 < len(a) < 0.05 * n
    c = {tuple(r) for r in li.sample(fraction=0.01, seed=7).select(*key).collect()}
    assert c != a
    # and the registry entry returns exactly the seed-42 sample
    reg = {
        tuple(r)
        for r in entrymod.queries()["q_sample_deterministic"](spark, sf_dir)
        .select(*key)
        .collect()
    }
    assert reg == a

def test_ntz_time_window_pushdown(spark, sf_dir):
    """The fixture's timestamp[us] column reads as TIMESTAMP_NTZ under
    Spark 4; time_window_filter must push the ts bounds into the scan
    via native NTZ literals — not depend on Catalyst unwrapping a cast
    around the column."""
    from timestream_travel_spark.tables import time_window_filter

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"
    plan = (
        time_window_filter(raw, "ts", "2024-01-08 00:00:00", "2024-01-14 23:59:59")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed


def test_events_ts_normalized_to_timestamp(spark, sf_dir):
    """Every registry query reaches events through load_table, which
    must hand back a plain TIMESTAMP ts — functions like unix_micros
    reject TIMESTAMP_NTZ (the round-3 regression class)."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_binned_interval_join_avoids_nested_loop(spark, sf_dir):
    """The keyless interval join must plan as an equi-join on the time
    bin (hash/broadcast), never BroadcastNestedLoopJoin/cartesian."""
    qs = entrymod.queries()
    plan = (
        qs["q_join_interval_binned"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_weighted_median_matches_python_reference(spark, sf_dir):
    """Weighted median = first value whose cumulative weight crosses
    half the total, on the same deterministic ordering — replayed in
    pure Python from the collected fixture."""
    qs = entrymod.queries()
    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_qty"])
        for r in qs["q_weighted_median"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
        .collect()
    )
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append(
            (r["l_extendedprice"], r["l_orderkey"], r["l_linenumber"], r["l_quantity"])
        )
    for flag, rs in groups.items():
        rs.sort()
        total = sum(q for _, _, _, q in rs)
        acc = 0.0
        for price, _, _, q in rs:
            acc += q
            if 2 * acc >= total:
                break
        assert got[flag][0] == price, flag
        assert abs(got[flag][1] - total) < 1e-6, flag


def test_cdc_passages_match_python_replay(spark, sf_dir):
    """CDC passage stats replayed in pure Python (md5 divider rule)
    for a doc sample: passage counts and dup fractions agree, and
    boundaries are content-anchored (word-local)."""
    import hashlib
    import re as _re

    from timestream_travel_spark.operators.llm_text14 import CDC_MOD

    qs = entrymod.queries()
    got = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"])
        for r in qs["q_cdc_passage_dedup"](spark, sf_dir).collect()
    }

    def passages_of(text: str) -> list[str]:
        words = [w for w in _re.split(r"\s+", text.strip()) if w]
        out, cur = [], []
        for w in words:
            cur.append(w)
            if int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % CDC_MOD == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    fp_docs: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for r in docs:
        ps = passages_of(r["text"])
        per_doc[r["doc_id"]] = ps
        for p in ps:
            fp_docs.setdefault(p, set()).add(r["doc_id"])
    for doc_id, ps in per_doc.items():
        n_dup = sum(1 for p in set(ps) if len(fp_docs[p]) >= 2)
        # query counts distinct (doc, passage_id) groups; identical
        # passages within a doc have distinct passage_ids
        n_dup_all = sum(1 for p in ps if len(fp_docs[p]) >= 2)
        assert got[doc_id][0] == len(ps), doc_id
        assert got[doc_id][1] == n_dup_all, (doc_id, n_dup, n_dup_all)


def test_autocorr_is_bounded(spark, sf_dir):
    """Pearson lag-1 autocorrelation must land in [-1, 1] (+ float
    eps) for every series."""
    qs = entrymod.queries()
    rows = qs["q_autocorr_lag1"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf1"] <= 1.0 + 1e-9, r


def test_weighted_sample_is_pps_biased_and_deterministic(spark, sf_dir):
    """A-ES sampling: deterministic across runs, exactly k rows with
    dense ranks, and the sampled mean weight exceeds the corpus mean
    (probability-proportional-to-size bias)."""
    qs = entrymod.queries()
    a = qs["q_weighted_sample"](spark, sf_dir).collect()
    b = qs["q_weighted_sample"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 50
    assert sorted(r["sample_rank"] for r in a) == list(range(1, 51))
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r["n_chars"] for r in a) / len(a)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_dir):
    """Spark's runtime row-level filtering (InjectRuntimeFilter): a
    selective dim side of a SHUFFLE join injects a bloom filter
    (`might_contain`) on the fact side, cutting shuffled fact rows to
    near the join's output size. Local fixtures sit under the default
    10 GB application-side threshold, so the test lowers it to prove
    the engine's plans take the filter when scan sizes warrant it —
    which at 100 TB they do with the DEFAULT thresholds."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:1500]
        # and the filtered join still computes the right thing
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dtw_metric_properties_hypothesis():
    """DTW with L1 local cost: symmetry, translation invariance, and
    positive homogeneity (dtw(a*s, a*t) = a * dtw(s, t) for a > 0) on
    random series, plus zero self-distance."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from timestream_travel_spark.operators.similarity4 import dtw_distance

    floats = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)

    @settings(max_examples=40, deadline=None)
    @given(
        xs=st.lists(floats, min_size=2, max_size=25),
        ys=st.lists(floats, min_size=2, max_size=25),
        shift=st.floats(min_value=-50, max_value=50, allow_nan=False),
        scale=st.floats(min_value=0.25, max_value=4, allow_nan=False),
    )
    def check(xs, ys, shift, scale):
        s = np.array(xs, dtype=float)
        t = np.array(ys, dtype=float)
        d = dtw_distance(s, t, band=8)
        assert d >= 0.0
        assert dtw_distance(s, s, band=8) == 0.0
        assert abs(dtw_distance(t, s, 8) - d) < 1e-9
        assert abs(dtw_distance(s + shift, t + shift, 8) - d) < 1e-6
        assert abs(dtw_distance(s * scale, t * scale, 8) - scale * d) < 1e-6

    check()


def test_cusum_detects_planted_level_shift():
    """One-sided CUSUM on synthetic data: values at the reference
    level keep the statistic at ~0 (no alarms); after a +20 level
    shift the excursion grows by 20/step and must alarm within
    ceil(H/20)+1 steps — and never before the shift."""
    import math

    import pandas as pd

    from timestream_travel_spark.operators.timeseries7 import CUSUM_H, CUSUM_REF
    from timestream_travel_spark.streaming.cusum import _update

    class _FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    shift_at, n = 50, 80
    vals = [CUSUM_REF] * shift_at + [CUSUM_REF + 20.0] * (n - shift_at)
    pdf = pd.DataFrame(
        {
            "user_id": [1] * n,
            "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
            "event_id": range(n),
            "value": vals,
        }
    )
    out = pd.concat(list(_update((1,), iter([pdf]), _FakeState())))
    alarms = out.index[out["alarm"]].tolist()
    first = out[out["alarm"]]["event_id"].min()
    assert not out.iloc[:shift_at]["alarm"].any(), "false alarm before shift"
    assert alarms, "shift never detected"
    assert first <= shift_at + math.ceil(CUSUM_H / 20.0) + 1


def test_skyline_window_trick_matches_brute_force_hypothesis():
    """The sort-based running-min skyline over DISTINCT 2D points
    equals the O(n²) dominance definition on random point sets —
    pure-Python mirror of q_skyline_parts' window formulation."""
    from hypothesis import given, settings, strategies as st

    coords = st.tuples(
        st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)
    )

    @settings(max_examples=100, deadline=None)
    @given(pts=st.sets(coords, min_size=1, max_size=40))
    def check(pts):
        # brute force: p on skyline iff no q != p with q <= p componentwise
        brute = {
            p
            for p in pts
            if not any(q != p and q[0] <= p[0] and q[1] <= p[1] for q in pts)
        }
        # window trick: sort by (x, y); keep iff y < running min of prior y
        window = set()
        mprev = None
        for x, y in sorted(pts):
            if mprev is None or y < mprev:
                window.add((x, y))
            mprev = y if mprev is None else min(mprev, y)
        assert window == brute

    check()


def test_theilsen_median_slope_invariances_hypothesis():
    """Theil–Sen estimator properties on random series: invariant
    under y-translation, equivariant under y-scaling, and exact on
    noiseless lines — the guarantees that make it the robust twin of
    the least-squares trend."""
    import math

    from hypothesis import given, settings, strategies as st

    def theilsen(ys):
        slopes = sorted(
            (ys[j] - ys[i]) / (j - i)
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        m = len(slopes)
        return (slopes[(m - 1) // 2] + slopes[m // 2]) / 2

    floats = st.floats(min_value=-1000, max_value=1000, allow_nan=False)

    @settings(max_examples=60, deadline=None)
    @given(
        ys=st.lists(floats, min_size=3, max_size=15),
        shift=st.floats(min_value=-100, max_value=100, allow_nan=False),
        scale=st.floats(min_value=0.5, max_value=8, allow_nan=False),
        slope=st.floats(min_value=-50, max_value=50, allow_nan=False),
    )
    def check(ys, shift, scale, slope):
        base = theilsen(ys)
        assert math.isclose(
            theilsen([y + shift for y in ys]), base, rel_tol=1e-9, abs_tol=1e-6
        )
        assert math.isclose(
            theilsen([y * scale for y in ys]), base * scale, rel_tol=1e-9, abs_tol=1e-6
        )
        line = [slope * i for i in range(10)]
        assert math.isclose(theilsen(line), slope, rel_tol=1e-12, abs_tol=1e-9)

    check()
