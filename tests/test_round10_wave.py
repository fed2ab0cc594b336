"""Round-10 growth wave: recompute/parity tests for the registered
queries (analytics13, graph7, llm_text26, timeseries23, llm_text27)
and the OPQ-IVFADC persisted-index twin (similarity9)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.registry import QUERIES, load_all
from timestream_travel_spark.tables import load_table

load_all()


def test_label_propagation_matches_pure_python(spark, sf_dir):
    """Synchronous deterministic LPA replayed in pure Python over the
    collected backbone edges must produce the identical partition."""
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph7 import LPA_ITERS

    edges = [(r["a"], r["b"]) for r in top_trade_edges(spark, sf_dir).collect()]
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(LPA_ITERS):
        nxt = {}
        for n, ns in nbrs.items():
            freq = Counter(lab[v] for v in ns)
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        lab = nxt
    got = {
        r["node"]: r["community"]
        for r in QUERIES["q_label_propagation"](spark, sf_dir).collect()
    }
    assert got == lab


def test_lpa_modularity_recompute(spark, sf_dir):
    """Q recomputed from the collected edges + the LPA partition."""
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(r["a"], r["b"]) for r in top_trade_edges(spark, sf_dir).collect()]
    lab = {
        r["node"]: r["community"]
        for r in QUERIES["q_label_propagation"](spark, sf_dir).collect()
    }
    m = len(edges)
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    intra = sum(1 for a, b in edges if lab[a] == lab[b])
    dsum: Counter = Counter()
    for n, d in deg.items():
        dsum[lab[n]] += d
    d2 = sum(v * v for v in dsum.values())
    q = (4 * m * intra - d2) / (4.0 * m * m)
    row = QUERIES["q_lpa_modularity"](spark, sf_dir).collect()[0]
    assert row["m_edges"] == m and row["intra_edges"] == intra
    assert row["n_communities"] == len(dsum)
    assert row["modularity"] == pytest.approx(round(q, 6), abs=1e-9)
    assert -0.5 <= row["modularity"] <= 1.0


def test_somers_tau_c_consistency_with_gamma(spark, sf_dir):
    """Shared pair census: |D_yx| ≤ |gamma| (the tie term only grows
    the denominator), tau-c and gamma agree in sign, and the census
    integers match a pure-python recompute from the events."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    from timestream_travel_spark.operators.analytics11 import GAMMA_VALUE_BANDS

    cells: Counter = Counter()
    for r in ev:
        x = r["ts"].hour // 6
        v = float(r["value"])
        y = sum(1 for b in GAMMA_VALUE_BANDS if v > b)
        cells[(x, y)] += 1
    conc = disc = ty = tx = 0
    items = list(cells.items())
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items:
            if xb > xa and yb > ya:
                conc += ca * cb
            elif xb > xa and yb < ya:
                disc += ca * cb
            if yb == ya and xb > xa:
                ty += ca * cb
            if xb == xa and yb > ya:
                tx += ca * cb
    row = QUERIES["q_somers_d"](spark, sf_dir).collect()[0]
    assert (row["c_pairs"], row["d_pairs"], row["ty_pairs"], row["tx_pairs"]) == (
        conc,
        disc,
        ty,
        tx,
    )
    gamma = (conc - disc) / (conc + disc)
    assert abs(row["somers_d_yx"]) <= abs(gamma) + 1e-12
    tc = QUERIES["q_stuart_tau_c"](spark, sf_dir).collect()[0]
    assert tc["c_pairs"] == conc and tc["d_pairs"] == disc
    assert (tc["tau_c"] >= 0) == (gamma >= 0)


def test_gwet_ac1_recompute(spark, sf_dir):
    row = QUERIES["q_gwet_ac1"](spark, sf_dir).collect()[0]
    n, a, b, c, d = row["n_units"], row["a"], row["b"], row["c"], row["d"]
    assert a + b + c + d == n
    pi = (2 * a + b + c) / (2.0 * n)
    pe = 2.0 * pi * (1.0 - pi)
    ac1 = ((a + d) / n - pe) / (1.0 - pe)
    assert row["ac1"] == pytest.approx(round(ac1, 6), abs=1e-9)


def test_theil_sen_matches_statistics_median(spark, sf_dir):
    """Explicit order-statistic median equals statistics.median over
    the same pure-python slope set, per event type."""
    import statistics

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(20,4)")).alias("v"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r["event_type"], r["day"])):
        series.setdefault(r["event_type"], []).append(float(r["v"]))
    rows = {r["event_type"]: r for r in QUERIES["q_theil_sen"](spark, sf_dir).collect()}
    for t, vs in series.items():
        slopes = [
            (vs[j] - vs[i]) / (j - i)
            for i in range(len(vs))
            for j in range(i + 1, len(vs))
        ]
        assert rows[t]["n_pairs"] == len(slopes)
        assert rows[t]["sen_slope"] == pytest.approx(
            round(statistics.median(slopes), 6), abs=1e-6
        )


def test_ultimate_oscillator_recompute(spark, sf_dir):
    """UO replayed in pure Python over the collected daily OHLC."""
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    bars = sorted(
        _daily_ohlc(spark, sf_dir).collect(), key=lambda r: (r["t"], r["day"])
    )
    per: dict[str, list] = {}
    for r in bars:
        per.setdefault(r["t"], []).append(
            (float(r["hi"]), float(r["lo"]), float(r["cl"]))
        )
    expect = {}
    for t, b in per.items():
        bp, tr = [], []
        for i in range(1, len(b)):
            hi, lo, cl = b[i]
            pc = b[i - 1][2]
            bp.append(cl - min(lo, pc))
            tr.append(max(hi, pc) - min(lo, pc))
        for i in range(27, len(bp)):
            s = lambda xs, w: sum(xs[i - w + 1 : i + 1])  # noqa: E731
            if min(s(tr, 7), s(tr, 14), s(tr, 28)) <= 0:
                continue
            uo = (
                100.0
                * (
                    4.0 * (s(bp, 7) / s(tr, 7))
                    + 2.0 * (s(bp, 14) / s(tr, 14))
                    + (s(bp, 28) / s(tr, 28))
                )
                / 7.0
            )
            expect[(t, i)] = uo
    got = QUERIES["q_ultimate_oscillator"](spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        assert 0.0 <= r["uo"] <= 100.0
    by_t = Counter(r["event_type"] for r in got)
    for t in per:
        assert by_t[t] == sum(1 for k in expect if k[0] == t)


def test_mass_query_topk_matches_brute_force(spark, sf_dir):
    """The FFT-nominate/exact-re-rank path must equal an exhaustive
    exact scan (the candidate margin is sound): brute-force int64
    distances over every admissible window, per series."""
    import numpy as np

    from timestream_travel_spark.operators.timeseries16 import MP_EXCL, MP_W, _hourly_idx
    from timestream_travel_spark.operators.timeseries23 import MASS_K

    ticks = _hourly_idx(spark, sf_dir).collect()
    per: dict[str, list] = {}
    for r in sorted(ticks, key=lambda r: (r["t"], r["i"])):
        # r["v"] is a Decimal: scale exactly (float(v)*10000 truncates)
        per.setdefault(r["t"], []).append(int(r["v"] * 10000))
    expect = {}
    for t, vs in per.items():
        a = np.asarray(vs, dtype=np.int64)
        n = len(a)
        m = n - MP_W + 1
        if m <= MP_EXCL:
            continue
        q = a[m - 1 :]
        cands = []
        for j in range(m - MP_EXCL):
            d2 = int(((a[j : j + MP_W] - q) ** 2).sum())
            cands.append((d2, j + 1))
        cands.sort()
        expect[t] = [
            (rk + 1, j, round(math.sqrt(d2) / 10000.0, 6))
            for rk, (d2, j) in enumerate(cands[:MASS_K])
        ]
    got: dict[str, list] = {}
    for r in QUERIES["q_mass_query_topk"](spark, sf_dir).collect():
        got.setdefault(r["event_type"], []).append(
            (r["rk"], r["win_start"], r["dist"])
        )
    for t in got:
        got[t].sort()
    for t, exp in expect.items():
        assert got[t] == [
            (rk, j, pytest.approx(d, abs=1e-9)) for rk, j, d in exp
        ] or got[t] == exp


def test_bpe_fertility_sweep_matches_python_replay(spark, sf_dir):
    """Full pure-Python replay of the sweep: the batched trainer
    (test_training_prep._bpe_reference_batched replays its selection
    rule exactly), then per-checkpoint tokenization of every word —
    (n_words, n_tokens, fertility) must match EXACTLY per (rank,
    lang). Plus the structural bounds: fertility non-increasing in
    merge budget, rank 0 = chars per word by construction. (No
    cross-parity with q_bpe_tokenize: that query trains batch=1 and
    the sweep trains batch={SWEEP_BATCH} — a documented, replayed,
    deterministic difference in merge order.)"""
    from tests.test_training_prep import _bpe_reference_batched
    from timestream_travel_spark.operators.llm_text27 import (
        SWEEP_BATCH,
        SWEEP_RANKS,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    lang_words: dict[str, list[str]] = {}
    for r in docs:
        lang_words.setdefault(r["lang"], []).extend(r["text"].split())
    all_words = [w for ws in lang_words.values() for w in ws]
    merges = _bpe_reference_batched(
        all_words, n_merges=max(SWEEP_RANKS), batch=SWEEP_BATCH
    )
    expect: dict[tuple, tuple] = {}
    for lang, ws in lang_words.items():
        state = {w: list(w) for w in set(ws)}
        applied = 0
        for rank in SWEEP_RANKS:
            while applied < rank and applied < len(merges):
                _, p1, p2, _, _ = merges[applied]
                for w, syms in state.items():
                    acc = [syms[0]]
                    for x in syms[1:]:
                        if acc[-1] == p1 and x == p2:
                            acc[-1] = p1 + p2
                        else:
                            acc.append(x)
                    state[w] = acc
                applied += 1
            n_words = len(ws)
            n_tokens = sum(len(state[w]) for w in ws)
            # the query labels checkpoints with the ACTUALLY-applied
            # merge count (and skips exhausted duplicates) — mirror it
            expect[(applied, lang)] = (
                n_words,
                n_tokens,
                round(n_tokens / n_words, 4),
            )
    rows = QUERIES["q_bpe_fertility_sweep"](spark, sf_dir).collect()
    got = {
        (r["n_merges"], r["lang"]): (r["n_words"], r["n_tokens"], r["fertility"])
        for r in rows
    }
    assert got == expect
    for lang in lang_words:
        ranks = sorted({k for (k, lg) in got if lg == lang})
        toks = [got[(k, lang)][1] for k in ranks]
        assert toks == sorted(toks, reverse=True)  # non-increasing
        # rank 0 = chars per word
        assert got[(0, lang)][1] == sum(len(w) for w in lang_words[lang])


def test_opq_ivfpq_from_index_matches_direct(spark, sf_dir, tmp_path):
    """build_opq_ivfpq_index → opq_ivfpq_topk_from_index returns
    EXACTLY q_opq_ivfpq_topk's rows, and the codes scan prunes to the
    probed cell partitions (PartitionFilters present in the plan)."""
    from timestream_travel_spark.operators.similarity9 import (
        build_opq_ivfpq_index,
        opq_ivfpq_topk_from_index,
    )

    idx = str(tmp_path / "opq_ivfpq_idx")
    build_opq_ivfpq_index(spark, sf_dir, idx)
    direct = [
        (r["vec_id"], r["l2sq"])
        for r in QUERIES["q_opq_ivfpq_topk"](spark, sf_dir).collect()
    ]
    from_idx_df = opq_ivfpq_topk_from_index(spark, sf_dir, idx)
    from_idx = [(r["vec_id"], r["l2sq"]) for r in from_idx_df.collect()]
    assert from_idx == direct
    plan = from_idx_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
