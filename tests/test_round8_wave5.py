"""SURVEY §5.6 sanity tests for the round-8 sixth wave: containment
pairs, Adamic–Adar, DFA, inter-event burstiness, Burrows' Delta and
Jensen–Shannon divergence — planted fixtures with hand-computable
outcomes.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)
_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_T0 = datetime(2024, 6, 1, 0, 0, 0)


def _write_events(spark, sf, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    return sf


def _write_docs(spark, sf, rows):
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_containment_detects_subset_direction(spark, tmp_path):
    """Doc A is a strict prefix of doc B -> every A-shingle is a
    B-shingle -> contain(A in B) = 1.0 while Jaccard is diluted."""
    from timestream_travel_spark.operators.dedup6 import q_containment_pairs

    words = [f"w{i}" for i in range(40)]
    full = " ".join(words)
    prefix = " ".join(words[:10])
    other = " ".join(f"x{i}" for i in range(30))
    rows = [
        (1, full, "en", "s0", len(full)),
        (2, prefix, "en", "s0", len(prefix)),
        (3, other, "en", "s0", len(other)),
    ]
    sf = _write_docs(spark, str(tmp_path / "sf_cont"), rows)
    out = q_containment_pairs(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # doc 2 (the prefix) is fully contained in doc 1
    assert r.contain_b_in_a == 1.0
    assert r.contain_a_in_b < 0.5


def test_adamic_adar_matches_pure_python_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph4 import (
        LP_TOP_K,
        q_adamic_adar,
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
    scored = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            aa = sum(1.0 / math.log(len(adj[z])) for z in common)
            scored.append((-round(aa, 6), names[a], names[b], len(common)))
    scored.sort()
    expect = [(na, nb, cn) for _, na, nb, cn in scored[:LP_TOP_K]]
    got = [
        (r.nation_a, r.nation_b, r.common_neighbors)
        for r in q_adamic_adar(spark, sf_dir).collect()
    ]
    assert got == expect


def test_dfa_trend_above_alternation(spark, tmp_path):
    """A persistent (trending) series scores a much higher DFA alpha
    than a rapidly mean-reverting alternation."""
    from timestream_travel_spark.operators.timeseries18 import q_dfa_alpha

    rows, eid = [], 0
    for i in range(128):
        ts = _T0 + timedelta(hours=i)
        for t, v in (
            ("click", float(10 * i)),            # strong trend
            ("error", 100.0 + (7.0 if i % 2 == 0 else -7.0)),  # alternation
        ):
            eid += 1
            rows.append((eid, ts, eid, t, v, "{}"))
    sf = _write_events(spark, str(tmp_path / "sf_dfa"), rows)
    out = {r.event_type: r for r in q_dfa_alpha(spark, sf).collect()}
    assert out["click"].dfa_alpha > 1.2
    assert out["error"].dfa_alpha < out["click"].dfa_alpha
    assert out["error"].dfa_alpha < 0.5


def test_burstiness_periodic_minus_one_heavy_tail_positive(spark, tmp_path):
    from timestream_travel_spark.operators.timeseries18 import (
        q_interevent_burstiness,
    )

    rows, eid = [], 0
    # user 1: exactly periodic clicks every 60 s -> sigma = 0 -> B = -1
    for k in range(50):
        eid += 1
        rows.append((eid, _T0 + timedelta(seconds=60 * k), 1, "click", 1.0, "{}"))
    # user 2: 99 one-second gaps + one 10000-second gap -> sigma >> mu
    t = _T0
    for k in range(101):
        eid += 1
        rows.append((eid, t, 2, "error", 1.0, "{}"))
        t += timedelta(seconds=10000 if k == 50 else 1)
    sf = _write_events(spark, str(tmp_path / "sf_burst"), rows)
    out = {r.event_type: r for r in q_interevent_burstiness(spark, sf).collect()}
    assert out["click"].burstiness == -1.0
    assert out["click"].mean_gap_s == 60.0
    assert out["error"].burstiness > 0.5


def test_burrows_delta_and_js_on_planted_styles(spark, tmp_path):
    """Two sources sharing a word distribution sit at JS = 0 and the
    minimum Delta; a disjoint-vocabulary source maxes JS at 1 bit."""
    from timestream_travel_spark.operators.llm_text21 import (
        q_burrows_delta,
        q_js_divergence_sources,
    )

    same = "alpha beta gamma delta " * 15
    other = "omega psi chi phi " * 15
    rows = [
        (1, same, "en", "sA", len(same)),
        (2, same, "en", "sB", len(same)),
        (3, other, "en", "sC", len(other)),
    ]
    sf = _write_docs(spark, str(tmp_path / "sf_style"), rows)
    js = {
        (r.source_a, r.source_b): r.js_divergence
        for r in q_js_divergence_sources(spark, sf).collect()
    }
    assert js[("sA", "sB")] == 0.0
    assert js[("sA", "sC")] == 1.0  # disjoint supports: exactly 1 bit
    assert js[("sB", "sC")] == 1.0
    delta = {
        (r.source_a, r.source_b): r.delta
        for r in q_burrows_delta(spark, sf).collect()
    }
    assert delta[("sA", "sB")] == 0.0
    assert delta[("sA", "sC")] > delta[("sA", "sB")]
