"""Round-9 property-style checks (SURVEY §5.5): STOMP vs brute force
on randomized series, loss-mask interval invariants on randomized
planted-duplicate corpora, and manifest-pruned-read exactness under
randomized predicates — seeded randomness, pure-Python oracles."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F


def test_stomp_matches_bruteforce_on_random_series():
    """Pure-Python property: the diagonal-recurrence profile equals
    the O(n²·w) brute force for random integer series — every window,
    every seed, including ties (lexicographic (d², j) policy)."""
    from timestream_travel_spark.operators.timeseries16 import MP_EXCL, MP_W
    from timestream_travel_spark.operators.timeseries19 import _stomp_profile

    rng = random.Random(9)
    for trial in range(5):
        n = rng.randrange(MP_W + MP_EXCL + 1, 90)
        # small value range on purpose: forces d² ties to exercise the
        # tie policy
        vals = [rng.randrange(-3, 4) * 10000 for _ in range(n)]
        pdf = pd.DataFrame(
            {"t": "x", "i": range(1, n + 1), "v": vals}
        )
        got = {
            int(r.win_start): (int(r.nn_start), float(r.nn_dist))
            for r in _stomp_profile(pdf).itertuples()
        }
        m = n - MP_W + 1
        for i in range(m):
            best = None
            for j in range(m):
                if abs(i - j) < MP_EXCL:
                    continue
                d2 = sum(
                    (vals[i + o] - vals[j + o]) ** 2 for o in range(MP_W)
                )
                if best is None or (d2, j) < best:
                    best = (d2, j)
            if best is None:
                assert (i + 1) not in got
                continue
            nn, dist = got[i + 1]
            assert nn == best[1] + 1, (trial, i, nn, best)
            assert abs(dist - (best[0] ** 0.5) / 10000.0) < 1e-9


def test_loss_mask_interval_invariants(spark, tmp_path):
    """Random corpora with planted cross-doc duplicates: for every
    document the mask intervals are sorted, disjoint, in-range, sum
    to n_masked, and exactly reproduce the pure-Python recompute of
    Lee-style keeper masking."""
    from collections import defaultdict

    from timestream_travel_spark.operators.llm_text11 import SPAN_N
    from timestream_travel_spark.operators.llm_text22 import q_loss_mask_manifest

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    shared = [rng.choice(vocab) for _ in range(SPAN_N + 2)]
    for doc_id in range(1, 13):
        words = [rng.choice(vocab) for _ in range(rng.randrange(SPAN_N, 40))]
        if rng.random() < 0.5:  # plant the shared passage somewhere
            pos = rng.randrange(0, len(words) + 1)
            words = words[:pos] + shared + words[pos:]
        docs.append((doc_id, " ".join(words), "en", "s0", 1))
    sf = str(tmp_path / "sf_prop")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    # pure-Python recompute
    toks = {d[0]: d[1].split() for d in docs}
    span_docs = defaultdict(set)
    for did, ws in toks.items():
        for i in range(len(ws) - SPAN_N + 1):
            span_docs[" ".join(ws[i : i + SPAN_N])].add(did)
    masked = defaultdict(set)
    for did, ws in toks.items():
        for i in range(len(ws) - SPAN_N + 1):
            s = " ".join(ws[i : i + SPAN_N])
            if len(span_docs[s]) >= 2 and did != min(span_docs[s]):
                masked[did].update(range(i + 1, i + SPAN_N + 1))
    out = {r.doc_id: r for r in q_loss_mask_manifest(spark, sf).collect()}
    for did, ws in toks.items():
        r = out[did]
        assert r.n_tok == len(ws)
        assert r.n_masked == len(masked[did])
        ivs = []
        if r.mask_ranges:
            for part in r.mask_ranges.split(","):
                a, b = map(int, part.split("-"))
                ivs.append((a, b))
        # sorted, disjoint, in-range, covering exactly the recompute
        cover = set()
        prev_end = 0
        for a, b in ivs:
            assert 1 <= a <= b <= len(ws)
            assert a > prev_end + 1 or prev_end == 0  # disjoint, merged runs
            prev_end = b
            cover.update(range(a, b + 1))
        assert cover == masked[did], did
        assert r.n_runs == len(ivs)


def test_pruned_read_exact_under_random_predicates(spark, sf_dir, tmp_path):
    """Randomized conjuncts over a ts/user/value store: the manifest-
    pruned read equals the naive filter row-for-row, every time."""
    import os

    from timestream_travel_spark.pipeline.skipping import pruned_read, write_manifest

    path = str(tmp_path / "prop_store")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    (
        ev.repartition(1)
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max(1, n // 10))
        .parquet(path)
    )
    write_manifest(spark, path, ["user_id", "value"])
    rng = random.Random(7)
    full = spark.read.parquet(path)
    vmax = full.agg(F.max("value")).collect()[0][0]
    for _ in range(5):
        lo = rng.uniform(0, vmax)
        hi = lo + rng.uniform(0, vmax - lo)
        uid = rng.randrange(1, 10)
        conj = [("value", "between", (lo, hi)), ("user_id", ">=", uid)]
        got = pruned_read(spark, path, conj)
        naive = full.filter(
            F.col("value").between(F.lit(lo), F.lit(hi))
            & (F.col("user_id") >= uid)
        )
        assert got.exceptAll(naive).count() == 0
        assert naive.exceptAll(got).count() == 0
