"""SURVEY §5.6 sanity tests for the third round-11 wave (retrieval7,
timeseries27, analytics16, clusterqual4, graph10, timeseries28) —
written to the round-12 staging discipline (strict 3-SF gates +
these recompute tests first), then promoted into load_all() in the
same round once the driver's drain math cleared. Each statistic is
pinned against a pure-Python recompute on the same fixture."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES, load_staged
from timestream_travel_spark.tables import load_table

registry.load_all()
load_staged()  # no-op while STAGED_MODULES is empty; kept for form


def _daily_levels(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    daily = defaultdict(Decimal)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += Decimal(str(round(r.value, 4)))
    out = defaultdict(list)
    for (t, day) in sorted(daily):
        out[t].append((str(day), daily[(t, day)]))
    return out


def test_dema_tema_replay(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries27 import DT_A

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        e1 = e2 = e3 = float(series[0][1])
        want[(t, series[0][0])] = (2 * e1 - e2, 3 * e1 - 3 * e2 + e3)
        for day, v in series[1:]:
            x = float(v)
            e1 = (1 - DT_A) * e1 + DT_A * x
            e2 = (1 - DT_A) * e2 + DT_A * e1
            e3 = (1 - DT_A) * e3 + DT_A * e2
            want[(t, day)] = (2.0 * e1 - e2, 3.0 * e1 - 3.0 * e2 + e3)
    got = QUERIES["q_dema_tema"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r.dema, r.tema) == want[(r.event_type, r.day)]


def test_calmar_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries27 import CAL_ANN

    levels = _daily_levels(spark, sf_dir)
    got = {
        r.event_type: (r.n_returns, r.max_drawdown, r.calmar)
        for r in QUERIES["q_calmar_ratio"](spark, sf_dir).collect()
    }
    for t, series in levels.items():
        vals = [v for _, v in series]
        rets = [
            Decimal(
                float(vals[i]) / float(vals[i - 1]) - 1.0
            ).quantize(Decimal("1e-10"))
            for i in range(1, len(vals))
        ]
        peak = vals[0]
        max_dd = 0.0
        for v in vals:
            peak = max(peak, v)
            max_dd = max(max_dd, float(peak - v) / float(peak))
        if max_dd == 0:
            assert t not in got
            continue
        sr = float(sum(rets))
        want = round((sr / len(rets) * CAL_ANN) / max_dd, 6)
        assert got[t][0] == len(rets)
        assert got[t][1] == pytest.approx(round(max_dd, 6), abs=1e-9)
        assert got[t][2] == pytest.approx(want, abs=1e-6)


def test_forecast_backtest_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries27 import BT_SEASON

    levels = _daily_levels(spark, sf_dir)
    got = {
        r.event_type: r
        for r in QUERIES["q_forecast_backtest"](spark, sf_dir).collect()
    }
    for t, series in levels.items():
        vals = [v for _, v in series]
        ae_n, ae_s, se_n, se_s = [], [], [], []
        for i in range(BT_SEASON, len(vals)):
            an = abs(vals[i] - vals[i - 1])
            asv = abs(vals[i] - vals[i - BT_SEASON])
            ae_n.append(an)
            ae_s.append(asv)
            se_n.append(Decimal(float(an) * float(an)).quantize(Decimal("1e-8")))
            se_s.append(Decimal(float(asv) * float(asv)).quantize(Decimal("1e-8")))
        n = len(ae_n)
        r = got[t]
        assert r.n_origins == n
        assert r.mae_naive == pytest.approx(round(float(sum(ae_n)) / n, 6))
        assert r.mae_snaive == pytest.approx(round(float(sum(ae_s)) / n, 6))
        assert r.rmse_naive == pytest.approx(
            round(math.sqrt(float(sum(se_n)) / n), 6), abs=1e-6
        )
        assert r.rmse_snaive == pytest.approx(
            round(math.sqrt(float(sum(se_s)) / n), 6), abs=1e-6
        )
        # paired comparison: same origins for both forecasters
        assert r.n_origins == len(vals) - BT_SEASON


def test_ndcg_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.retrieval import TOP_K

    topk = [r.doc_id for r in QUERIES["q_bm25_topk"](spark, sf_dir).collect()]
    grades = {
        r.doc_id: r.n_contaminated
        for r in QUERIES["q_contamination_ngrams"](spark, sf_dir).collect()
    }
    q = Decimal("1e-12")
    dcg = sum(
        (
            Decimal(grades[d] / (math.log(i + 2) / math.log(2.0))).quantize(q)
            for i, d in enumerate(topk)
            if d in grades
        ),
        Decimal(0),
    )
    ideal = sorted(grades.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    idcg = sum(
        (
            Decimal(g / (math.log(i + 2) / math.log(2.0))).quantize(q)
            for i, (_, g) in enumerate(ideal)
        ),
        Decimal(0),
    )
    row = QUERIES["q_ndcg_bm25"](spark, sf_dir).collect()[0]
    assert row.k == TOP_K
    assert row.dcg_at_k == pytest.approx(round(float(dcg), 6), abs=1e-6)
    assert row.idcg_at_k == pytest.approx(round(float(idcg), 6), abs=1e-6)
    assert row.ndcg_at_k == pytest.approx(
        round(float(dcg) / float(idcg), 6), abs=1e-6
    )
    assert 0.0 <= row.ndcg_at_k <= 1.0


def test_mutual_reachability_recompute(spark, sf_dir):
    """mreach = max(core_a, core_b, dist) row-by-row, core distances
    consistent with q_hdbscan_core_distance, pair set = the ε-pairs."""
    mr = QUERIES["q_mutual_reachability"](spark, sf_dir).collect()
    core = {
        r.vec_id: r.core_dist
        for r in QUERIES["q_hdbscan_core_distance"](spark, sf_dir).collect()
    }
    census = {
        r.vec_id: r.n_neighbors
        for r in QUERIES["q_dbscan_core_census"](spark, sf_dir).collect()
    }
    n_pairs = sum(census.values()) // 2
    assert len(mr) == n_pairs
    for r in mr:
        assert r.core_a == pytest.approx(core[r.va], abs=1e-9)
        assert r.core_b == pytest.approx(core[r.vb], abs=1e-9)
        assert r.mreach == pytest.approx(
            max(r.core_a, r.core_b, r.dist), abs=2e-6
        )
        assert r.mreach >= r.dist


def test_embedding_anisotropy_recompute(spark, sf_dir):
    import statistics

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", "embedding")
        .collect()
    )
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append([float(x) for x in r.embedding])
    got = {
        r.label: r for r in QUERIES["q_embedding_anisotropy"](spark, sf_dir).collect()
    }
    for lab, vecs in by_label.items():
        dim = len(vecs[0])
        variances = [
            statistics.pvariance([v[i] for v in vecs]) for i in range(dim)
        ]
        r = got[lab]
        assert r.dim == dim
        assert r.var_max == pytest.approx(max(variances), abs=1e-4)
        assert r.var_min == pytest.approx(min(variances), abs=1e-4)
        mean = sum(variances) / dim
        assert r.var_mean == pytest.approx(mean, abs=1e-4)
        assert r.anisotropy == pytest.approx(max(variances) / mean, abs=1e-3)
        assert r.anisotropy >= 1.0


def test_community_mixing_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph7 import _lpa_labels

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    lab = {r.node: r.lab for r in _lpa_labels(spark, sf_dir).collect()}
    cells = defaultdict(int)
    for a, b in edges:
        la, lb = sorted((lab[a], lab[b]))
        cells[(la, lb)] += 1
    got = {
        (r.comm_a, r.comm_b): (r.n_edges, r.intra, r.edge_frac)
        for r in QUERIES["q_community_mixing"](spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    m = len(edges)
    for (la, lb), n in cells.items():
        assert got[(la, lb)] == (
            n,
            int(la == lb),
            pytest.approx(round(n / m, 6)),
        )
    # diagonal sums to q_lpa_modularity's intra count
    intra = sum(n for (la, lb), n in cells.items() if la == lb)
    lpa = QUERIES["q_lpa_modularity"](spark, sf_dir).collect()[0]
    assert intra == lpa.intra_edges


def test_spectral_flatness_bounds_and_entropy_consistency(spark, sf_dir):
    flat = {
        r.event_type: r.spectral_flatness
        for r in QUERIES["q_spectral_flatness"](spark, sf_dir).collect()
    }
    ent = {
        r.event_type: r.spectral_entropy_norm
        for r in QUERIES["q_spectral_entropy"](spark, sf_dir).collect()
    }
    assert set(flat) == set(ent)
    for t, f in flat.items():
        assert 0.0 < f <= 1.0
        # both measures agree on perfect flatness (==1 iff equal bins)
        if f == pytest.approx(1.0, abs=1e-9):
            assert ent[t] == pytest.approx(1.0, abs=1e-9)


def test_tukey_fences_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(Decimal(str(round(r.value, 4))))
    got = {
        r.event_type: r for r in QUERIES["q_tukey_fences"](spark, sf_dir).collect()
    }
    for t, vs in vals.items():
        vs.sort()
        n = len(vs)

        def q4(num):
            k, rem = divmod(num * (n - 1), 4)
            hi = vs[k + 1] if k + 1 < n else vs[k]
            return 4 * vs[k] + (hi - vs[k]) * rem

        q1_4, q3_4 = q4(1), q4(3)
        lo8, hi8 = 5 * q1_4 - 3 * q3_4, 5 * q3_4 - 3 * q1_4
        r = got[t]
        assert r.n == n
        assert r.q1 == float(q1_4) / 4.0 and r.q3 == float(q3_4) / 4.0
        assert r.lo_fence == float(lo8) / 8.0
        assert r.hi_fence == float(hi8) / 8.0
        assert r.n_below == sum(1 for v in vs if 8 * v < lo8)
        assert r.n_above == sum(1 for v in vs if 8 * v > hi8)
