"""SURVEY §5.6 statistical-sanity tests for the round-8 third wave
(timeseries16: complexity / symbolic-dynamics measures).

The DuckDB oracle proves CROSS-ENGINE EQUALITY, not statistical
correctness (the q_holt_winters lesson): both engines could agree on
a wrong formula. These tests plant known dynamics and check each
statistic responds the way the textbook says it must:

- permutation entropy is exactly 0 on a strictly monotone (single
  ordinal pattern) series and exactly 1 bit on a clean 2-pattern
  alternation; the tie rule collapses a constant series to the
  single all-ties pattern (rank string 012);
- sample entropy is exactly 0 (A = B) on a constant and on a
  period-2 series — perfectly regular dynamics have zero entropy —
  and positive on an aperiodic planted series;
- the matrix profile of an exactly period-24 series is 0 everywhere,
  with the nearest neighbor at the lowest same-phase window start
  (the lexicographic (d², j) argmin tie rule);
- the Markov entropy rate is exactly 0 for a deterministic cycle and
  exactly 1 bit/step for the AABB... chain whose every row is a
  fair coin.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from timestream_travel_spark.operators.timeseries16 import (
    q_markov_entropy_rate,
    q_matrix_profile,
    q_permutation_entropy,
    q_sample_entropy,
)

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)
_T0 = datetime(2024, 3, 1, 0, 0, 0)


def _write_events(spark, sf, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )


def _hourly_fixture(spark, tmp_path, series_by_type):
    """One event per (type, hour): hourly level == the planted value."""
    sf = str(tmp_path / "sf_hourly")
    rows, eid = [], 0
    for t, series in series_by_type.items():
        for h, v in enumerate(series):
            eid += 1
            rows.append((eid, _T0 + timedelta(hours=h), eid, t, float(v), "{}"))
    _write_events(spark, sf, rows)
    return sf


def test_permutation_entropy_monotone_alternating_constant(spark, tmp_path):
    sf = _hourly_fixture(
        spark,
        tmp_path,
        {
            "mono": [float(h) for h in range(26)],
            "alt": [10.0 if h % 2 == 0 else 1.0 for h in range(26)],
            "const": [5.0] * 26,
        },
    )
    out = {r.event_type: r for r in q_permutation_entropy(spark, sf).collect()}
    assert out["mono"].n_patterns == 1
    assert out["mono"].perm_entropy_bits == 0.0
    # 26 hours -> 24 triples, split 12/12 between the two alternation
    # patterns -> exactly 1 bit
    assert out["alt"].n_patterns == 2
    assert out["alt"].perm_entropy_bits == 1.0
    # all-ties collapses to the single stable-order pattern (012)
    assert out["const"].n_patterns == 1
    assert out["const"].perm_entropy_bits == 0.0


def test_sample_entropy_regular_is_zero_aperiodic_positive(spark, tmp_path):
    # two-scale construction: the first 9 elements are all within 8
    # of each other, the last 6 are >= ~1e4 apart from everything;
    # sigma lands near 2.76e4 so r = 0.2*sigma ~ 5.5e3 separates the
    # scales with huge margin. Every pair among the 8 all-small
    # m-templates matches (C(8,2) = 28); extensions match for the 7
    # whose third element is small (C(7,2) = 21), and template 8's
    # extension (1e4) matches nothing -> SampEn = -ln(21/28) exactly.
    rough = [1.0, 2.0, 9.0, 1.0, 2.0, 1.0, 1.0, 2.0, 9.0,
             10000.0, 30000.0, 60000.0, 90000.0, 20000.0, 50000.0]
    sf = _hourly_fixture(
        spark,
        tmp_path,
        {
            "const": [5.0] * 20,
            "period2": [10.0 if h % 2 == 0 else 1.0 for h in range(20)],
            "rough": rough,
        },
    )
    out = {r.event_type: r for r in q_sample_entropy(spark, sf).collect()}
    # constant: r = 0 but every diff is 0 <= 0 -> A = B -> SampEn 0
    assert out["const"].a_matches == out["const"].b_matches
    assert out["const"].sampen == 0.0
    # period-2: matching m-templates are phase-aligned, and alignment
    # extends to m+1 -> A = B -> SampEn 0
    assert out["period2"].a_matches == out["period2"].b_matches
    assert out["period2"].sampen == 0.0
    # aperiodic: some m-matches fail to extend
    assert out["rough"].b_matches == 28
    assert out["rough"].a_matches == 21
    assert out["rough"].sampen == 0.287682  # round(-ln(21/28), 6)


def test_matrix_profile_periodic_series_all_zero(spark, tmp_path):
    # exactly period-24 series, 72 hours -> 49 window starts; every
    # window's same-phase twin is an exact match at distance 0
    base = [float((h * 7) % 24 + 1) for h in range(24)]
    sf = _hourly_fixture(
        spark, tmp_path, {"per": [base[h % 24] for h in range(72)]}
    )
    rows = q_matrix_profile(spark, sf).collect()
    assert len(rows) == 49
    for r in rows:
        assert r.nn_dist == 0.0
        j0 = ((r.win_start - 1) % 24) + 1
        expected = j0 if j0 != r.win_start else (
            r.win_start + 24 if r.win_start + 24 <= 49 else r.win_start - 24
        )
        assert r.nn_start == expected, (r.win_start, r.nn_start, expected)


_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _write_docs(spark, sf, docs):
    rows = [(i + 1, t, "en", "s0", len(t)) for i, t in enumerate(docs)]
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_gopher_filter_each_rule_fires_on_its_planted_doc(spark, tmp_path):
    from timestream_travel_spark.operators.llm_text20 import (
        q_gopher_quality_filter,
    )

    good = "the quick brown fox and a dog ran over hills " * 6  # 60 words, has the+a
    docs = [
        good,                                    # passes everything
        "tiny doc with the a stopwords here",    # fails word count only (7 words)
        good + "#### ### ## # ### ## # ## # #",  # symbol ratio pushed over 0.1
        good.replace("quick", "123456"),         # alpha words 54/60 = 0.9 still ok
        " ".join(["12345"] * 60),                # fails alpha AND stopwords
        " ".join(["extraordinarily"] * 60),      # mean word len 15 > 10, no stopword
    ]
    sf = _write_docs(spark, str(tmp_path / "sf_gopher"), docs)
    r = q_gopher_quality_filter(spark, sf).collect()[0]
    assert r.n_docs == 6
    assert r.pass_word_count == 5       # only the 7-word doc fails
    assert r.pass_mean_word_len == 5    # only the 15-char-word doc fails
    assert r.pass_symbol_ratio == 5     # only the #-doc fails (10 syms / 70 words)
    assert r.pass_alpha_ratio == 5      # only the all-digit doc fails
    assert r.pass_stopwords == 4        # digit doc + long-word doc lack 2 stopwords
    assert r.pass_all == 2              # the good doc and the digit-replaced one
    assert abs(r.pass_rate - 2 / 6) < 1e-6


def test_heaps_law_exact_on_constructed_growth(spark, tmp_path):
    from timestream_travel_spark.operators.llm_text20 import q_heaps_law

    # every word globally unique -> V(n) = T(n) -> beta = 1, ln K = 0
    docs = [" ".join(f"w{i}_{j}" for j in range(5 + i)) for i in range(30)]
    sf = _write_docs(spark, str(tmp_path / "sf_heaps1"), docs)
    r = q_heaps_law(spark, sf).collect()[0]
    assert r.n_docs == 30
    assert r.heaps_beta == 1.0
    assert r.heaps_ln_k == 0.0

    # single repeated word -> V(n) = 1 -> y = 0 everywhere -> beta = 0
    docs = [" ".join(["w"] * (5 + i)) for i in range(30)]
    sf = _write_docs(spark, str(tmp_path / "sf_heaps2"), docs)
    r = q_heaps_law(spark, sf).collect()[0]
    assert r.heaps_beta == 0.0
    assert r.heaps_ln_k == 0.0


def test_graph4_matches_pure_python_recompute(spark, sf_dir):
    """Clustering coefficient and Jaccard link prediction recomputed
    from the collected (<= 100-row) top-edge set in plain Python —
    an oracle-independent check of both formulas and tie policies."""
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph4 import (
        LP_TOP_K,
        q_clustering_coefficient,
        q_jaccard_link_prediction,
    )
    from timestream_travel_spark.tables import load_table

    edges = {(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()}
    names = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    got_cc = {r.nation: r for r in q_clustering_coefficient(spark, sf_dir).collect()}
    assert set(got_cc) == {names[u] for u in adj}
    for u, nb in adj.items():
        d = len(nb)
        tri = sum(
            1
            for x in nb
            for y in nb
            if x < y and (min(x, y), max(x, y)) in edges
        )
        row = got_cc[names[u]]
        assert row.degree == d
        assert row.triangles == tri
        expect = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(row.clustering_coeff - expect) < 1e-6

    scored = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            cn = len(adj[a] & adj[b])
            if cn == 0:
                continue
            j = cn / (len(adj[a]) + len(adj[b]) - cn)
            scored.append((-j, names[a], names[b], cn))
    scored.sort()
    expect_top = [(na, nb, cn) for _, na, nb, cn in scored[:LP_TOP_K]]
    got = [
        (r.nation_a, r.nation_b, r.common_neighbors)
        for r in q_jaccard_link_prediction(spark, sf_dir).collect()
    ]
    assert got == expect_top


def test_silhouette_planted_geometry(spark, tmp_path):
    """Tight isolated cluster -> mean silhouette exactly 1; two
    clusters sharing the same centroid and spread -> exactly 0."""
    from timestream_travel_spark.operators.clusterqual import (
        q_silhouette_centroid,
    )

    sf = str(tmp_path / "sf_sil")
    rows = []
    vid = 0
    for _ in range(8):  # label 0: all points AT the centroid (0,...)
        vid += 1
        rows.append((vid, [0.0, 0.0, 0.0, 0.0], 0))
    for _ in range(8):  # label 1: all points at (100,...)
        vid += 1
        rows.append((vid, [100.0, 0.0, 0.0, 0.0], 1))
    for lab in (2, 3):  # labels 2/3: same centroid (50), same spread
        for k in range(8):
            vid += 1
            rows.append((vid, [49.0 if k % 2 == 0 else 51.0, 0.0, 0.0, 0.0], lab))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    out = {r.label: r for r in q_silhouette_centroid(spark, sf).collect()}
    assert out[0].n_members == 8
    # a = 0 (points on own centroid), b = 50 (nearest overlap cell)
    assert out[0].mean_silhouette == 1.0
    assert out[1].mean_silhouette == 1.0
    # identical centroid + spread: a = b = 1 for every point
    assert out[2].mean_silhouette == 0.0
    assert out[3].mean_silhouette == 0.0


def test_pl2_matches_pure_python_recompute(spark, sf_dir):
    """PL2 scores recomputed in plain Python over the tokenized
    fixture corpus — an oracle-independent check of the DFR formula
    (Poisson model, Laplace after-effect, H2 normalization)."""
    import math
    import re

    from timestream_travel_spark.operators.retrieval import QUERY_TERMS, TOP_K
    from timestream_travel_spark.operators.retrieval4 import (
        LOG2_E,
        PL2_C,
        TWO_PI,
        q_pl2_topk,
    )
    from timestream_travel_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {
        r.doc_id: [w for w in re.split(r"[^a-z0-9]+", r.text.lower()) if w]
        for r in docs
    }
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    cf = {t: sum(ws.count(t) for ws in toks.values()) for t in QUERY_TERMS}
    scores = {}
    for doc_id, ws in toks.items():
        s = 0.0
        for t in QUERY_TERMS:
            tf = ws.count(t)
            if tf == 0:
                continue
            tfn = tf * math.log2(1.0 + PL2_C * avgdl / len(ws))
            lam = cf[t] / n_docs
            s += (1.0 / (tfn + 1.0)) * (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) * LOG2_E
                + 0.5 * math.log2(TWO_PI * tfn)
            )
        if s != 0.0:
            scores[doc_id] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    got = [(r.doc_id, r.score) for r in q_pl2_topk(spark, sf_dir).collect()]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, a), (_, b) in zip(got, expect):
        assert abs(a - b) < 1e-6


def test_markov_entropy_rate_cycle_zero_fair_coin_one_bit(spark, tmp_path):
    sf = str(tmp_path / "sf_cycle")
    rows = []
    # user 1: deterministic 3-cycle A->B->C->A... (60 events)
    for k in range(60):
        rows.append((k + 1, _T0 + timedelta(minutes=k), 1, "ABC"[k % 3], 1.0, "{}"))
    _write_events(spark, sf, rows)
    out = q_markov_entropy_rate(spark, sf).collect()[0]
    assert out.n_transitions == 59
    assert out.entropy_rate_bits == 0.0

    sf2 = str(tmp_path / "sf_coin")
    rows = []
    # user 1: AABB repeated -> from A: half A, half B; same from B ->
    # every row is a fair coin -> exactly 1 bit/step.  81 events so
    # the 80 transitions split 20/20/20/20 exactly.
    seq = ("AABB" * 21)[:81]
    for k, s in enumerate(seq):
        rows.append((k + 1, _T0 + timedelta(minutes=k), 1, s, 1.0, "{}"))
    _write_events(spark, sf2, rows)
    out = q_markov_entropy_rate(spark, sf2).collect()[0]
    assert out.n_transitions == 80
    assert out.n_states == 2
    assert out.entropy_rate_bits == 1.0
