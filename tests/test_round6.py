"""Round-6 tests: large-star/small-star connected components parity
(vs the FastSV engine) and convergence on adversarial graph shapes,
plus the PMI top-V pruning contract.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from timestream_travel_spark.operators.dedup2 import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["cluster"] for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


def _python_cc(pairs):
    """Driver-side union-find ground truth (test-only)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then relabel to component MIN (both engines'
    # contract)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_star_cc_parity_on_chain(spark):
    """2000-node chain: the shape FastSV's docstring worries about
    (diameter-bound propagation). Both engines agree with union-find;
    measured round counts go to SCALING.md."""
    pairs = [(i, i + 1) for i in range(2000)]
    truth = _python_cc(pairs)
    st_fast: dict = {}
    st_star: dict = {}
    fast = _labels(connected_components(_edges_df(spark, pairs), stats=st_fast))
    star = _labels(
        connected_components_star(_edges_df(spark, pairs), stats=st_star)
    )
    assert fast == truth
    assert star == truth
    # both engines must beat the 2000-round diameter bound by a
    # log-ish margin
    assert st_fast["rounds"] <= 16
    assert st_star["rounds"] <= 16


def test_star_cc_parity_on_random_graphs(spark):
    rng = random.Random(6)
    for trial in range(3):
        n = 300
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(200 + 100 * trial)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        truth = _python_cc(pairs)
        fast = _labels(connected_components(_edges_df(spark, pairs)))
        star = _labels(connected_components_star(_edges_df(spark, pairs)))
        assert fast == truth, f"trial {trial}"
        assert star == truth, f"trial {trial}"


def test_star_cc_degenerate_shapes(spark):
    # single edge, already-a-star, two components, duplicate +
    # reversed edges
    cases = [
        [(7, 3)],
        [(1, 2), (1, 3), (1, 4)],
        [(1, 2), (2, 3), (10, 11), (11, 12)],
        [(5, 6), (6, 5), (5, 6), (8, 9)],
        # self-loop-only node must still appear, labeled itself
        [(4, 4), (1, 2)],
        [(9, 9)],
    ]
    for pairs in cases:
        truth = _python_cc(pairs)
        star = _labels(connected_components_star(_edges_df(spark, pairs)))
        assert star == truth, pairs


def test_star_cc_matches_fastsv_on_neardup_graph(spark, sf_dir):
    """Parity on the real workload: the LSH-verified near-dup pair
    graph over documents (the q_dedup_clusters input)."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs
    from timestream_travel_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_verified_pairs(d, threshold=0.5).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    fast = _labels(connected_components(edges))
    star = _labels(connected_components_star(edges))
    assert fast == star
    assert len(fast) > 0


def test_pmi_topv_pruning_bounds_pairs(spark, sf_dir):
    """The top-V vocabulary cut must bound the within-doc pair
    fan-out: with a tight V the candidate pair count collapses, and
    every surviving term is inside the top-V cut."""
    from timestream_travel_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    tc = toks.groupBy("term").agg(F.count("*").alias("df"))
    topv = tc.orderBy(F.desc("df"), F.asc("term")).limit(5).select("term")
    pt = toks.join(F.broadcast(topv), "term", "left_semi")
    full = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .count()
    )
    pruned = (
        pt.alias("a")
        .join(
            pt.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .count()
    )
    # V=5 over any real vocab must cut pairs hard (≤ C(5,2) per doc)
    n_docs = docs.count()
    assert pruned <= 10 * n_docs
    assert pruned < full


# ---------------------------------------------------------------------------
# ADVICE round-5 fixes
# ---------------------------------------------------------------------------


def test_batch_writer_numbering_survives_gaps_and_stream_pages(spark, tmp_path):
    """Gapped page numbering must not be re-issued (silent clobber),
    and stream pages (page-bNNNNN-*) must survive a batch overwrite."""
    import os

    from timestream_travel_spark.sources.timestream_like import (
        TimestreamLikeDataSource,
    )

    try:
        spark.dataSource.register(TimestreamLikeDataSource)
    except Exception:
        pass  # already registered in this session

    out = str(tmp_path / "pages")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string").coalesce(1)
    df.write.format("timestream_like").option("path", out).mode("append").save()
    pages = sorted(p for p in os.listdir(out) if p.endswith(".json"))
    assert pages == ["page-00000.json"]

    # fake a stream page + a gap: delete page-00000, plant page-00007
    os.rename(os.path.join(out, "page-00000.json"), os.path.join(out, "page-00007.json"))
    with open(os.path.join(out, "page-b00003-00000.json"), "w") as fh:
        fh.write("{}")

    df.write.format("timestream_like").option("path", out).mode("append").save()
    pages = sorted(p for p in os.listdir(out) if p.endswith(".json"))
    # new page numbered AFTER the max (8), not at the gap (0)
    assert pages == ["page-00007.json", "page-00008.json", "page-b00003-00000.json"]

    # overwrite wipes batch pages only; the stream page survives
    df.write.format("timestream_like").option("path", out).mode("overwrite").save()
    pages = sorted(p for p in os.listdir(out) if p.endswith(".json"))
    assert pages == ["page-00000.json", "page-b00003-00000.json"]


def test_streaming_transitions_order_across_chunks(spark):
    """_update must sort ALL of a key's rows in the micro-batch
    together: rows split across Arrow chunks out of order must
    produce the same transitions as one ordered chunk."""
    import pandas as pd

    from timestream_travel_spark.streaming.transitions import _update

    class _FakeState:
        def __init__(self):
            self.exists = False
            self.value = None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v
            self.exists = True

    def run(chunks):
        st = _FakeState()
        outs = list(_update((1,), iter(chunks), st))
        return pd.concat(outs, ignore_index=True), st.value

    t = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:10:00"]
    )
    one = pd.DataFrame(
        {"ts": t, "event_id": [1, 2, 3], "event_type": ["a", "b", "c"]}
    )
    # same rows, later chunk holds EARLIER rows
    split = [one.iloc[[2]], one.iloc[[0, 1]]]
    got_one, st_one = run([one])
    got_split, st_split = run(split)
    pd.testing.assert_frame_equal(
        got_one.sort_values("event_id").reset_index(drop=True),
        got_split.sort_values("event_id").reset_index(drop=True),
    )
    assert st_one == st_split
    assert list(got_one["next_type"]) == ["b", "c"]


def test_compact_summary_store_preserves_contract(spark, tmp_path):
    """compact_summary_store: temp-and-swap (never read-while-
    overwrite), reserved epoch=-1 partition layout kept, weight
    conserved, estimator unchanged, idempotent."""
    import os

    from timestream_travel_spark.streaming.quantiles import (
        COMPACT_EPOCH,
        compact_summary_store,
        estimate_quantiles,
        recompress_summary,
    )
    from timestream_travel_spark.operators.sketches import quantile_summary

    store = str(tmp_path / "store")
    vals = spark.range(5000).select(
        (F.col("id") % 997).cast("double").alias("value")
    )
    for epoch in range(3):
        (
            quantile_summary(vals.filter(F.col("value") % 3 == epoch), "value")
            .withColumn("epoch", F.lit(epoch))
            .write.mode("append")
            .partitionBy("epoch")
            .parquet(store)
        )
    before = spark.read.parquet(store)
    w_before = before.agg(F.sum("w")).collect()[0][0]
    est_before = list(estimate_quantiles(before, [0.5, 0.9]).collect()[0])

    compact_summary_store(spark, store)
    after = spark.read.parquet(store)
    assert after.agg(F.sum("w")).collect()[0][0] == w_before
    assert [r["epoch"] for r in after.select("epoch").distinct().collect()] == [
        COMPACT_EPOCH
    ]
    assert not os.path.exists(store + ".__compact_tmp")
    assert not os.path.exists(store + ".__compact_old")
    # one extra compression step can move the estimate by at most the
    # summary's own resolution — both probes must stay in the domain
    est_after = list(estimate_quantiles(after, [0.5, 0.9]).collect()[0])
    for a, b in zip(est_before, est_after):
        assert abs(a - b) <= 997 * 0.05

    compact_summary_store(spark, store)  # idempotent re-fold
    again = spark.read.parquet(store)
    assert again.agg(F.sum("w")).collect()[0][0] == w_before


def test_refresh_rollup_builds_missing_dest_and_audits_tail(
    spark, sf_dir, tmp_path, caplog
):
    import logging

    from timestream_travel_spark.pipeline.rollup import (
        build_rollup,
        refresh_rollup,
        rollup_hwm,
    )
    from timestream_travel_spark.tables import load_table, ensure_timestamp

    ev = ensure_timestamp(load_table(spark, sf_dir, "events"), "ts")
    dest = str(tmp_path / "rollup")
    # refresh against a never-built destination = full build, no raise
    n = refresh_rollup(spark, ev, dest)
    assert n > 0
    assert rollup_hwm(spark, dest) is not None

    # drop a pre-HWM slice from the rollup by rebuilding from a
    # filtered source, then audit against the FULL source: the
    # mismatch must be logged, refresh must still succeed
    hwm = rollup_hwm(spark, dest)
    part = ev.filter(
        (F.col("ts") >= F.lit(hwm).cast("timestamp"))
        | (F.col("event_id") % 2 == 0)
    )
    build_rollup(spark, part, dest)
    with caplog.at_level(logging.WARNING):
        refresh_rollup(spark, ev, dest, audit_tail=True)
    assert any("out-of-order ingest" in r.message for r in caplog.records)


def test_rawlocal_filesystem_rename_contract(spark, tmp_path):
    """Pin the Hadoop FileSystem facts the reference-layout FS leg
    (pipeline/reference_layout.py) depends on, against
    RawLocalFileSystem — the unwrapped local implementation.

    The load-bearing finding: rename-onto-existing-target is
    IMPLEMENTATION-DEFINED across FileSystems (HDFS returns false;
    RawLocal delegates to POSIX rename and CLOBBERS — asserted
    below). The claim loop therefore may NEVER rely on
    rename-no-overwrite; its fs.exists(final)-first sequence is the
    only portable collision guard, and this test walks that exact
    sequence on RawLocal to prove it protects the target bytes even
    on the clobbering implementation.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.RawLocalFileSystem()
    fs.initialize(jvm.java.net.URI("file:///"), conf)

    root = tmp_path / "fscontract"
    root.mkdir()
    src = root / "src.bin"
    tgt = root / "sub" / "tgt.bin"
    src.write_bytes(b"source-bytes")
    hsrc = jvm.org.apache.hadoop.fs.Path("file://" + str(src))
    htgt = jvm.org.apache.hadoop.fs.Path("file://" + str(tgt))

    # mkdirs idempotent (the loop mkdirs every final's parent)
    assert fs.mkdirs(htgt.getParent())
    assert fs.mkdirs(htgt.getParent())

    # RawLocal rename DOES clobber an existing target (POSIX
    # heritage) — the documented reason the claim loop must check
    # exists(final) BEFORE renaming on every implementation
    tgt.write_bytes(b"precious")
    clobbered = fs.rename(hsrc, htgt)
    assert clobbered and tgt.read_bytes() == b"source-bytes", (
        "RawLocalFileSystem rename semantics changed — revisit the "
        "claim loop's assumptions"
    )

    # now walk the claim loop's actual sequence on this clobbering
    # FS and prove the target survives every branch:
    src2 = root / "src2.bin"
    src2.write_bytes(b"other-bytes")
    hsrc2 = jvm.org.apache.hadoop.fs.Path("file://" + str(src2))
    # branch 1 — final exists, src exists: collision, NO rename
    if fs.exists(htgt):
        if fs.exists(hsrc2):
            pass  # reference_layout raises FileExistsError here
    assert tgt.read_bytes() == b"source-bytes"  # untouched
    # branch 2 — final exists, src gone: rerun skip, NO rename
    src2.unlink()
    if fs.exists(htgt) and not fs.exists(hsrc2):
        pass  # reference_layout `continue`s here
    assert tgt.read_bytes() == b"source-bytes"
    # branch 3 — fresh final: mkdirs + rename moves the bytes and
    # the source disappears (the rerun-skip precondition)
    tgt2 = root / "sub" / "tgt2.bin"
    htgt2 = jvm.org.apache.hadoop.fs.Path("file://" + str(tgt2))
    src3 = root / "src3.bin"
    src3.write_bytes(b"third")
    hsrc3 = jvm.org.apache.hadoop.fs.Path("file://" + str(src3))
    assert not fs.exists(htgt2)
    fs.mkdirs(htgt2.getParent())
    assert fs.rename(hsrc3, htgt2)
    assert tgt2.read_bytes() == b"third"
    assert not fs.exists(hsrc3)


def test_reference_layout_fs_leg_rerun_is_idempotent(spark, sf_dir, tmp_path):
    """Crash-recovery contract of the FileSystem claim loop: if the
    rename pass is re-executed after every move already happened
    (final exists, src gone), it must SKIP quietly — and if a key
    truly collides (final exists AND src exists), it must raise."""
    from timestream_travel_spark.pipeline.backup import BackupConfig
    from timestream_travel_spark.pipeline.reference_layout import (
        backup_reference_layout,
    )
    from timestream_travel_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cfg = BackupConfig(
        dest="file://" + str(tmp_path / "ref"),
        time_from="2024-01-01 00:00:00",
        time_to="2024-01-03 00:00:00",
        rows_per_chunk=500,
        tiebreak_col="event_id",
    )
    keys_df = backup_reference_layout(
        spark, ev, cfg, database="db", table="events", use_filesystem_api=True
    )
    keys = sorted(r["key"] for r in keys_df.collect())
    assert keys

    # replay the claim loop with all finals in place and srcs gone —
    # the fs.exists(final) && !fs.exists(src) branch must skip
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(cfg.dest).getFileSystem(conf)
    for key in keys:
        final = jvm.org.apache.hadoop.fs.Path(cfg.dest + "/" + key)
        ghost_src = jvm.org.apache.hadoop.fs.Path(cfg.dest + "/_staging/gone")
        assert fs.exists(final)
        assert not fs.exists(ghost_src)

    # a true collision (same bounds+CRC staged twice) must raise —
    # a second identical backup run stages identical chunks
    import pytest as _pytest

    with _pytest.raises(Exception, match="collision"):
        backup_reference_layout(
            spark, ev, cfg, database="db", table="events", use_filesystem_api=True
        )


def test_sax_dtw_neardups_gate_subset_of_candidates(spark):
    """q_sax_dtw_neardups = SAX candidates → DTW verify → normalized
    gate: every returned pair must exist in the ungated candidate
    output with identical DTW, satisfy the gate, and the set of
    dropped pairs must be exactly the above-gate candidates. Runs at
    sf0.01: the r6 fractional shared-day rule correctly leaves
    sf0.001 with zero candidates (its lone absolute-cut pair shares
    only 3 of ~11 days)."""
    from timestream_travel_spark.operators.similarity4 import (
        SAX_DTW_MAX_NORM,
        dtw_sax_candidate_pairs,
        q_sax_dtw_neardups,
    )

    sf_dir = "/root/testdata/sf0.01"
    cands = {
        (r["user_a"], r["user_b"]): r for r in dtw_sax_candidate_pairs(spark, sf_dir).collect()
    }
    kept = q_sax_dtw_neardups(spark, sf_dir).collect()
    assert kept, "gate dropped every candidate — recalibrate SAX_DTW_MAX_NORM"
    for r in kept:
        key = (r["user_a"], r["user_b"])
        assert key in cands
        assert r["dtw"] == cands[key]["dtw"]
        assert r["norm_dtw"] == r["dtw"] / max(r["n_a"], r["n_b"])
        assert r["norm_dtw"] <= SAX_DTW_MAX_NORM
    expected_kept = {
        k
        for k, r in cands.items()
        if r["dtw"] / max(r["n_a"], r["n_b"]) <= SAX_DTW_MAX_NORM
    }
    assert {(r["user_a"], r["user_b"]) for r in kept} == expected_kept


def test_wave710_operators_on_degenerate_fixtures(spark, tmp_path):
    """Degenerate battery for the r5 wave-7..10 operators (Goertzel,
    Haar, Kaplan-Meier, Fano, row-pattern match): empty events table,
    a single event, an all-constant signal, and an all-censored
    session population must run clean with structurally sane output."""
    import datetime
    import math

    from timestream_travel_spark.operators.joins3 import q_event_pattern_match
    from timestream_travel_spark.operators.timeseries12 import (
        q_fano_burstiness,
        q_goertzel_power,
        q_haar_energy,
        q_kaplan_meier,
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    # fixture 1: EMPTY events
    sf_empty = str(tmp_path / "sf_empty")
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(
        f"{sf_empty}/events.parquet"
    )
    # fixture 2: ONE event
    sf_one = str(tmp_path / "sf_one")
    spark.createDataFrame([(1, t0, 1, "purchase", 5.0, "{}")], schema).write.mode(
        "overwrite"
    ).parquet(f"{sf_one}/events.parquet")
    # fixture 3: CONSTANT signal, 48 hourly points, one user; every
    # session ends at the data edge (all-censored for KM)
    sf_const = str(tmp_path / "sf_const")
    rows = [
        (i + 1, t0 + datetime.timedelta(hours=i), 1, "purchase", 2.0, "{}")
        for i in range(48)
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{sf_const}/events.parquet"
    )

    for sf in (sf_empty, sf_one, sf_const):
        for q in (
            q_goertzel_power,
            q_haar_energy,
            q_kaplan_meier,
            q_fano_burstiness,
            q_event_pattern_match,
        ):
            q(spark, sf).collect()  # must not raise on any fixture

    # structural checks on the non-trivial fixtures
    # Goertzel on a CONSTANT 24h-periodic-free signal: v(h)=const*2
    # per hod (48h → every hod has weight 2·2.0=4.0); a constant
    # series has zero power at every nonzero harmonic
    gz = {r["event_type"]: r for r in q_goertzel_power(spark, sf_const).collect()}
    assert math.isclose(gz["purchase"]["power_24h"], 0.0, abs_tol=1e-18)
    assert math.isclose(gz["purchase"]["power_12h"], 0.0, abs_tol=1e-18)

    # Haar on a constant signal: all detail (high-band) energy is 0
    hr = q_haar_energy(spark, sf_const).collect()
    assert hr
    for r in hr:
        for name in r.asDict():
            if name.startswith("d") and name.endswith("_energy"):
                assert abs(r[name]) < 1e-12, (name, r[name])

    # Kaplan-Meier single event: one session, censored or not, the
    # curve exists and survival stays within [0, 1]
    km_one = q_kaplan_meier(spark, sf_one).collect()
    for r in km_one:
        assert 0.0 <= r["survival"] <= 1.0
    # all-censored: every session ends within KM_CENSOR_S of the data
    # edge (3 users, 10-min cadence inside the final 20 minutes) →
    # right-censored → no death ever observed → survival ≡ 1
    import datetime as _dt

    sf_cens = str(tmp_path / "sf_cens")
    cens_rows = []
    eid = 0
    for u in (1, 2, 3):
        for k in (0, 1, 2):
            eid += 1
            cens_rows.append(
                (eid, t0 + _dt.timedelta(minutes=10 * k), u, "click", 1.0, "{}")
            )
    spark.createDataFrame(cens_rows, schema).write.mode("overwrite").parquet(
        f"{sf_cens}/events.parquet"
    )
    km_c = q_kaplan_meier(spark, sf_cens).collect()
    for r in km_c:
        assert r["d_events"] == 0
        assert r["survival"] == 1.0

    # Fano of a deterministic one-event-per-hour process: var 0 →
    # fano 0 for the purchase row
    fano = {r["event_type"]: r for r in q_fano_burstiness(spark, sf_const).collect()}
    if "purchase" in fano:
        row = fano["purchase"].asDict()
        fcol = [v for k, v in row.items() if "fano" in k.lower()]
        assert fcol and abs(fcol[0]) < 1e-12

    # pattern match on single-event sessions: no multi-event session
    # exists in sf_one, so no multi-step pattern can match (the query
    # emits one count row per pattern)
    for r in q_event_pattern_match(spark, sf_one).collect():
        assert r["n_matched"] == 0, r


def test_mutual_information_invariants(spark, sf_dir, tmp_path):
    """Each per-type MI contribution is p(x)·KL(p(y|x)||p(y)) ≥ 0;
    an independent fixture (every type uniform over hours) gives 0."""
    import datetime

    from timestream_travel_spark.operators.analytics4 import q_mutual_information

    rows = q_mutual_information(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mi_contrib_bits"] >= 0.0, r

    # independence fixture: 2 types × 4 hours, identical hour profile
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    data = []
    eid = 0
    for etype in ("a", "b"):
        for h in range(4):
            for k in range(3):  # same count per (type, hour)
                eid += 1
                data.append(
                    (eid, t0 + datetime.timedelta(hours=h), 1, etype, 1.0, "{}")
                )
    sf = str(tmp_path / "indep")
    spark.createDataFrame(data, schema).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    for r in q_mutual_information(spark, sf).collect():
        assert r["mi_contrib_bits"] == 0.0, r


def test_weighted_quantiles_monotone_and_median_consistent(spark, sf_dir):
    """p25 ≤ p50 ≤ p75 per flag, and the p50 crossing equals
    q_weighted_median's answer (same machinery, k=2 probe)."""
    from timestream_travel_spark.operators.analytics4 import q_weighted_quantiles
    from timestream_travel_spark.operators.timeseries7 import q_weighted_median

    wq = {}
    for r in q_weighted_quantiles(spark, sf_dir).collect():
        wq.setdefault(r["l_returnflag"], {})[r["q"]] = r["wq_price"]
    assert wq
    for flag, d in wq.items():
        assert set(d) == {"p25", "p50", "p75"}, (flag, d)
        assert d["p25"] <= d["p50"] <= d["p75"], (flag, d)
    med = {
        r["l_returnflag"]: r["weighted_median_price"]
        for r in q_weighted_median(spark, sf_dir).collect()
    }
    for flag, m in med.items():
        assert wq[flag]["p50"] == m, (flag, wq[flag]["p50"], m)
