"""Round-11 growth-wave tests: each new query pinned against a
pure-Python recompute on the same fixture (the SURVEY §5.6 pattern),
plus structural invariants (DBSCAN role semantics, Louvain gain
algebra, HW stability)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()


def _vectors(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    return {r.vec_id: (r.label, [float(x) for x in r.embedding]) for r in rows}


def _sqd(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += (x - y) * (x - y)
    return s


def _eps_graph(vecs, eps2):
    nbrs = defaultdict(set)
    ids = sorted(vecs)
    for i, va in enumerate(ids):
        la, ea = vecs[va]
        for vb in ids[i + 1 :]:
            lb, eb = vecs[vb]
            if la == lb and _sqd(ea, eb) <= eps2:
                nbrs[va].add(vb)
                nbrs[vb].add(va)
    return nbrs


def test_dbscan_core_census_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.clusterqual3 import (
        DBSCAN_EPS2,
        DBSCAN_MINPTS,
    )

    vecs = _vectors(spark, sf_dir)
    nbrs = _eps_graph(vecs, DBSCAN_EPS2)
    got = {
        r.vec_id: (r.label, r.n_neighbors, r.is_core)
        for r in QUERIES["q_dbscan_core_census"](spark, sf_dir).collect()
    }
    assert len(got) == len(vecs)
    n_core = 0
    for vid, (lab, _) in vecs.items():
        n = len(nbrs[vid])
        core = int(n + 1 >= DBSCAN_MINPTS)
        assert got[vid] == (lab, n, core)
        n_core += core
    assert 0 < n_core < len(vecs)  # ε/minPts give a non-trivial census


def test_dbscan_clusters_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.clusterqual3 import (
        DBSCAN_EPS2,
        DBSCAN_MINPTS,
    )

    vecs = _vectors(spark, sf_dir)
    nbrs = _eps_graph(vecs, DBSCAN_EPS2)
    core = {v for v in vecs if len(nbrs[v]) + 1 >= DBSCAN_MINPTS}
    parent = {v: v for v in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u in core:
        for v in nbrs[u]:
            if v in core:
                ra, rb = find(u), find(v)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical root per component
    root = {}
    for u in core:
        r = find(u)
        root.setdefault(r, set()).add(u)
    canon = {}
    for r, members in root.items():
        mid = min(members)
        for u in members:
            canon[u] = mid
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in QUERIES["q_dbscan_clusters"](spark, sf_dir).collect()
    }
    assert len(got) == len(vecs)
    for vid in vecs:
        if vid in core:
            assert got[vid] == ("core", canon[vid])
        else:
            core_nb = {canon[v] for v in nbrs[vid] if v in core}
            if core_nb:
                assert got[vid] == ("border", min(core_nb))
            else:
                assert got[vid] == ("noise", -1)


def test_hdbscan_core_distance_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.clusterqual3 import CORE_K

    vecs = _vectors(spark, sf_dir)
    by_label = defaultdict(list)
    for vid, (lab, e) in vecs.items():
        by_label[lab].append((vid, e))
    got = {
        r.vec_id: r.core_dist
        for r in QUERIES["q_hdbscan_core_distance"](spark, sf_dir).collect()
    }
    for lab, members in by_label.items():
        for vid, e in members:
            ds = sorted(_sqd(e, eo) for vo, eo in members if vo != vid)
            if len(ds) >= CORE_K:
                want = round(math.sqrt(ds[CORE_K - 1]), 6)
                assert got[vid] == pytest.approx(want, abs=1e-9)
            else:
                assert vid not in got


def test_louvain_gain_algebra_and_modularity(spark, sf_dir):
    """modularity_before equals q_lpa_modularity's; n_moved > 0 ⇒
    the sweep changed the partition; the reported after-score is the
    exact modularity of the refined partition (recomputed from the
    backbone in pure Python)."""
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph7 import _lpa_labels

    row = QUERIES["q_louvain_one_level"](spark, sf_dir).collect()[0]
    lpa = QUERIES["q_lpa_modularity"](spark, sf_dir).collect()[0]
    assert row.m_edges == lpa.m_edges
    assert row.n_comm_before == lpa.n_communities
    assert row.modularity_before == lpa.modularity

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    lab = {r.node: r.lab for r in _lpa_labels(spark, sf_dir).collect()}
    m = len(edges)
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dsum = defaultdict(int)
    for n, c in lab.items():
        dsum[c] += deg[n]
    ki = defaultdict(int)  # (node, lab) -> edge count into lab
    for a, b in edges:
        ki[(a, lab[b])] += 1
        ki[(b, lab[a])] += 1
    new_lab = {}
    n_moved = 0
    for n, c in lab.items():
        cands = sorted(
            {lb for (nn, lb) in ki if nn == n and lb != c},
        )
        best = None
        for lb in cands:
            gain = 4 * m * (ki[(n, lb)] - ki[(n, c)]) - 2 * deg[n] * (
                dsum[lb] - dsum[c] + deg[n]
            )
            if best is None or gain > best[0]:
                best = (gain, lb)
        if best and best[0] > 0:
            new_lab[n] = best[1]
            n_moved += 1
        else:
            new_lab[n] = c
    assert row.n_moved == n_moved

    def modularity(labels):
        intra = sum(1 for a, b in edges if labels[a] == labels[b])
        ds = defaultdict(int)
        for n, c in labels.items():
            ds[c] += deg[n]
        d2 = sum(v * v for v in ds.values())
        return round((4 * m * intra - d2) / (4.0 * m * m), 6), len(ds)

    q_after, nc_after = modularity(new_lab)
    assert row.modularity_after == pytest.approx(q_after, abs=1e-9)
    assert row.n_comm_after == nc_after


def test_compressibility_recompute(spark, sf_dir):
    import re

    from timestream_travel_spark.operators.llm_text28 import (
        COMP_DEN,
        COMP_K,
        COMP_NUM,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {
        r.doc_id: (r.n_grams, r.n_distinct, r.repeat_frac, r.comp_pass)
        for r in QUERIES["q_compressibility_chargram"](spark, sf_dir).collect()
    }
    n_seen = 0
    for r in docs:
        t = re.sub(r"\s+", " ", r.text.strip().lower())
        if len(t) < COMP_K:
            assert r.doc_id not in got
            continue
        grams = [t[i : i + COMP_K] for i in range(len(t) - COMP_K + 1)]
        n, nd = len(grams), len(set(grams))
        want = (
            n,
            nd,
            pytest.approx(round((n - nd) / n, 6), abs=1e-9),
            int(COMP_DEN * (n - nd) <= COMP_NUM * n),
        )
        assert got[r.doc_id] == want
        n_seen += 1
    assert n_seen == len(got)


def test_retrieval_eval_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.llm_text6 import BENCH_MOD
    from timestream_travel_spark.operators.retrieval import TOP_K

    topk = [
        r.doc_id
        for r in QUERIES["q_bm25_topk"](spark, sf_dir).collect()
    ]
    # relevance labels: the contamination hit set
    rel = {
        r.doc_id
        for r in QUERIES["q_contamination_ngrams"](spark, sf_dir).collect()
    }
    assert all(d % BENCH_MOD != 0 for d in rel)
    row = QUERIES["q_retrieval_eval_bm25"](spark, sf_dir).collect()[0]
    hits = [i + 1 for i, d in enumerate(topk) if d in rel]
    assert row.k == TOP_K and row.n_relevant == len(rel)
    assert row.n_hits == len(hits)
    assert row.recall_at_k == pytest.approx(round(len(hits) / len(rel), 6))
    assert row.precision_at_k == pytest.approx(round(len(hits) / TOP_K, 6))
    want_mrr = round(1.0 / hits[0], 6) if hits else 0.0
    assert row.mrr == pytest.approx(want_mrr)


def test_holt_winters_multiplicative_replay(spark, sf_dir):
    """Bit-exact pure-Python replay of the multiplicative recurrence
    (the walk is the same IEEE sequence), plus stability: the
    seasonal ratios stay positive and bounded on count data."""
    from timestream_travel_spark.operators.timeseries25 import (
        HWM_A,
        HWM_B,
        HWM_G,
        HWM_PERIOD,
    )

    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("ts")
        .count()
        .selectExpr("date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour")
        .groupBy("hour")
        .count()
        .orderBy("hour")
        .collect()
    )
    series = [(r.hour, float(r["count"])) for r in hourly]
    lv = tr = 0.0
    seas = [1.0] * HWM_PERIOD
    want = {}
    first = True
    for hour, x in series:
        s_old = seas.pop(0)
        if first:
            lv, tr = x, 0.0
            s_new = HWM_G * (x / lv) + (1 - HWM_G) * s_old
            first = False
        else:
            prev = lv
            lv = HWM_A * (x / s_old) + (1 - HWM_A) * (lv + tr)
            tr = HWM_B * (lv - prev) + (1 - HWM_B) * tr
            s_new = HWM_G * (x / lv) + (1 - HWM_G) * s_old
        seas.append(s_new)
        want[hour] = (x, lv, tr, s_new)
    got = QUERIES["q_holt_winters_multiplicative"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        x, lv, tr, s = want[r.hour]
        assert (r.x, r.level, r.trend, r.seasonal) == (x, lv, tr, s)
        assert 0.0 < r.seasonal < 10.0 and r.level > 0.0
