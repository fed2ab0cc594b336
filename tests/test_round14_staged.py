"""SURVEY §5.6 recompute tests for the round-14 STAGED wave
(timeseries33, analytics23, graph16, retrieval9) — each staged
query's full output recomputed in pure Python (exact integers /
Fractions / replayed float compositions) and compared exactly;
exercised here and by `tools/oracle_check.py --staged`; registered
next round."""

from __future__ import annotations

import math
from collections import deque
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES

registry.load_all()
registry.load_staged()

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    """HALF_UP quantize to 6dp via the shortest decimal repr — the
    engines' documented rounding contract (Spark BigDecimal.valueOf +
    setScale(HALF_UP), DuckDB round()). Python round() is half-even
    and would flip an exact .5 boundary (ADVICE r13)."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )


# ------------------------------------------------------ timeseries33
def _tr_rows(spark):
    from timestream_travel_spark.operators.timeseries30 import _tr

    rows = _tr(spark, SF).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.t, []).append(r)
    for seq in by_t.values():
        seq.sort(key=lambda r: r.rn)
    return by_t


def test_vortex_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries33 import VX_W

    by_t = _tr_rows(spark)
    want = {}
    for t, seq in by_t.items():
        vmp = [None] + [
            abs(seq[i].hi - seq[i - 1].lo) for i in range(1, len(seq))
        ]
        vmm = [None] + [
            abs(seq[i].lo - seq[i - 1].hi) for i in range(1, len(seq))
        ]
        for i, r in enumerate(seq):
            lo = max(0, i - (VX_W - 1))
            vp = [v for v in vmp[lo : i + 1] if v is not None]
            vm = [v for v in vmm[lo : i + 1] if v is not None]
            tr = [x.tr for x in seq[lo : i + 1] if x.tr is not None]
            if len(vp) != VX_W or sum(tr) <= 0:
                continue
            day = r.day.strftime("%Y-%m-%d")
            want[(t, day)] = (
                _r6(float(sum(vp)) / float(sum(tr))),
                _r6(float(sum(vm)) / float(sum(tr))),
            )
    got = {
        (r.event_type, r.day): (r.vi_plus, r.vi_minus)
        for r in QUERIES["q_vortex_indicator"](spark, SF).collect()
    }
    assert got == want


def test_awesome_oscillator_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries33 import (
        AO_DEN,
        AO_FAST,
        AO_SLOW,
    )
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    rows = _daily_ohlc(spark, SF).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.t, []).append(r)
    want = {}
    for t, seq in by_t.items():
        seq.sort(key=lambda r: r.day)
        mid2 = [r.hi + r.lo for r in seq]
        for i, r in enumerate(seq):
            if i < AO_SLOW - 1:
                continue
            sf_ = sum(mid2[i - AO_FAST + 1 : i + 1])
            ss = sum(mid2[i - AO_SLOW + 1 : i + 1])
            want[(t, r.day.strftime("%Y-%m-%d"))] = _r6(
                float(AO_SLOW * sf_ - AO_FAST * ss) / AO_DEN
            )
    got = {
        (r.event_type, r.day): r.awesome_osc
        for r in QUERIES["q_awesome_oscillator"](spark, SF).collect()
    }
    assert got == want


def test_choppiness_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries33 import CH_W

    by_t = _tr_rows(spark)
    want = {}
    for t, seq in by_t.items():
        for i, r in enumerate(seq):
            lo = max(0, i - (CH_W - 1))
            tr = [x.tr for x in seq[lo : i + 1] if x.tr is not None]
            hh = max(x.hi for x in seq[lo : i + 1])
            ll = min(x.lo for x in seq[lo : i + 1])
            if len(tr) != CH_W or hh <= ll or sum(tr) <= 0:
                continue
            want[(t, r.day.strftime("%Y-%m-%d"))] = _r6(
                100.0
                * math.log(float(sum(tr)) / float(hh - ll))
                / math.log(float(CH_W))
            )
    got = {
        (r.event_type, r.day): r.choppiness
        for r in QUERIES["q_choppiness_index"](spark, SF).collect()
    }
    assert got == want


def test_parabolic_sar_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc
    from timestream_travel_spark.operators.timeseries34 import SAR_AF0, SAR_AFMAX

    rows = _daily_ohlc(spark, SF).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.t, []).append(r)
    want = {}
    for t, seq in by_t.items():
        seq.sort(key=lambda r: r.day)
        sar = ep = af = phi = plo = 0.0
        trend = 1
        for i, r in enumerate(seq):
            hi, lo = float(r.hi), float(r.lo)
            if i == 0:
                trend, sar, ep, af = 1, lo, hi, SAR_AF0
            else:
                sar0 = sar + af * (ep - sar)
                if trend == 1:
                    sar1 = min(sar0, plo)
                    if lo < sar1:
                        trend, sar, ep, af = -1, ep, lo, SAR_AF0
                    else:
                        sar = sar1
                        if hi > ep:
                            ep, af = hi, min(af + SAR_AF0, SAR_AFMAX)
                else:
                    sar1 = max(sar0, phi)
                    if hi > sar1:
                        trend, sar, ep, af = 1, ep, hi, SAR_AF0
                    else:
                        sar = sar1
                        if lo < ep:
                            ep, af = lo, min(af + SAR_AF0, SAR_AFMAX)
            phi, plo = hi, lo
            want[(t, r.day.strftime("%Y-%m-%d"))] = (sar, trend)
    got = {
        (r.event_type, r.day): (r.psar, r.trend)
        for r in QUERIES["q_parabolic_sar"](spark, SF).collect()
    }
    assert got == want
    # the walk actually exercises both trends and the af ladder
    assert any(tr == -1 for _, tr in got.values())
    assert any(tr == 1 for _, tr in got.values())


# ------------------------------------------------------- analytics23
def _events(spark):
    from timestream_travel_spark.tables import load_table

    return load_table(spark, SF, "events").select("event_type", "value").collect()


def test_runs_two_sample_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r.value)
    types = sorted(by_t)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_runs_two_sample"](spark, SF).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            blocks = sorted(
                {(v, ta) for v in by_t[ta]} | {(v, tb) for v in by_t[tb]}
            )
            runs = 1 + sum(
                1
                for j in range(1, len(blocks))
                if blocks[j][1] != blocks[j - 1][1]
            )
            r = got[(ta, tb)]
            na, nb = len(by_t[ta]), len(by_t[tb])
            assert (r.n_a, r.n_b, r.n_runs) == (na, nb, runs)
            z = (runs - (2.0 * na * nb / (na + nb) + 1)) / math.sqrt(
                2.0
                * na
                * nb
                * (2.0 * na * nb - na - nb)
                / ((na + nb) * (na + nb) * (na + nb - 1.0))
            )
            assert r.z_runs == _r6(z)


def test_tukey_duckworth_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r.value)
    types = sorted(by_t)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_tukey_duckworth"](spark, SF).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a, b = by_t[ta], by_t[tb]
            t_ab = sum(1 for v in a if v < min(b)) + sum(
                1 for v in b if v > max(a)
            )
            t_ba = sum(1 for v in b if v < min(a)) + sum(
                1 for v in a if v > max(b)
            )
            r = got[(ta, tb)]
            assert (r.t_ab, r.t_ba) == (t_ab, t_ba)


def test_freeman_tukey_matches_recompute(spark):
    from timestream_travel_spark.operators.analytics8 import EVENT_TYPES

    rows = _events(spark)
    counts = {t: 0 for t in EVENT_TYPES}
    for r in rows:
        counts[r.event_type] += 1
    k = len(EVENT_TYPES)
    n = 0
    for t in EVENT_TYPES:  # left-associated, same order
        n = n + counts[t]
    e_term = math.sqrt(4.0 * n / k + 1.0)
    t2 = 0.0
    first = True
    for t in EVENT_TYPES:
        c = counts[t]
        d = math.sqrt(float(c)) + math.sqrt(c + 1.0) - e_term
        t2 = d * d if first else t2 + d * d
        first = False
    row = QUERIES["q_freeman_tukey_gof"](spark, SF).collect()[0]
    assert (row.k, row.n_total) == (k, n)
    assert row.ft_t2 == _r6(t2)


def test_trimean_qcd_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[int]] = {}
    for r in rows:
        # Spark/DuckDB round(v*100, 0) is HALF_UP on the double
        cents = math.floor(r.value * 100 + 0.5)
        by_t.setdefault(r.event_type, []).append(cents)
    got = {r.event_type: r for r in QUERIES["q_trimean_qcd"](spark, SF).collect()}
    for t, vals in by_t.items():
        vals.sort()
        n = len(vals)

        def q(kth):  # smallest value whose cumulative count >= kth
            return vals[kth - 1]

        q1, q2, q3 = q((n + 3) // 4), q((n + 1) // 2), q((3 * n + 3) // 4)
        r = got[t]
        assert (r.n, r.q1_cents, r.q2_cents, r.q3_cents) == (n, q1, q2, q3)
        assert r.trimean == _r6((q1 + 2 * q2 + q3) / 400.0)
        expect_qcd = None if q3 + q1 == 0 else _r6(float(q3 - q1) / (q3 + q1))
        assert r.qcd == expect_qcd


# ----------------------------------------------------------- graph16
def _backbone(spark):
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(r.a, r.b) for r in top_trade_edges(spark, SF).collect()]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def _bfs_sigma(adj, s):
    dist = {s: 0}
    sig = {s: 1}
    q = deque([s])
    while q:
        u = q.popleft()
        for w in sorted(adj[u]):
            if w not in dist:
                dist[w] = dist[u] + 1
                sig[w] = sig[u]
                q.append(w)
            elif dist[w] == dist[u] + 1:
                sig[w] += sig[u]
    return dist, sig


def test_edge_betweenness_matches_recompute(spark):
    from timestream_travel_spark.operators.graph16 import EB_SCALE

    edges, adj = _backbone(spark)
    nodes = sorted(adj)
    dist, sig = {}, {}
    for s in nodes:
        dist[s], sig[s] = _bfs_sigma(adj, s)
    want_scaled: dict[tuple, int] = {}
    want_pairs: dict[tuple, int] = {}
    for a, b in edges:
        for i, s in enumerate(nodes):
            for t in nodes[i + 1 :]:
                if t not in dist[s]:
                    continue
                num = 0
                # direction a→b
                if (
                    a in dist[s]
                    and b in dist[t]
                    and dist[s][a] + 1 + dist[t][b] == dist[s][t]
                ):
                    num += sig[s][a] * sig[t][b]
                # direction b→a
                if (
                    b in dist[s]
                    and a in dist[t]
                    and dist[s][b] + 1 + dist[t][a] == dist[s][t]
                ):
                    num += sig[s][b] * sig[t][a]
                if num:
                    want_scaled[(a, b)] = (
                        want_scaled.get((a, b), 0)
                        + (num * EB_SCALE) // sig[s][t]
                    )
                    want_pairs[(a, b)] = want_pairs.get((a, b), 0) + 1
    got = {
        (r.node_a, r.node_b): r
        for r in QUERIES["q_edge_betweenness"](spark, SF).collect()
    }
    assert set(got) == set(want_scaled)
    for e, r in got.items():
        assert r.eb_scaled == want_scaled[e]
        assert r.n_pairs == want_pairs[e]
        assert r.edge_betweenness == r.eb_scaled / EB_SCALE


def test_global_efficiency_matches_recompute(spark):
    from timestream_travel_spark.operators.graph12 import DIST_ROUNDS

    _, adj = _backbone(spark)
    nodes = sorted(adj)
    counts = {d: 0 for d in range(1, DIST_ROUNDS + 1)}
    reachable = 0
    for s in nodes:
        dist, _ = _bfs_sigma(adj, s)
        for v, d in dist.items():
            if 1 <= d <= DIST_ROUNDS:
                counts[d] += 1
                reachable += 1
    chain = 0.0
    first = True
    for d in range(1, DIST_ROUNDS + 1):
        term = float(counts[d]) / d
        chain = term if first else chain + term
        first = False
    n = len(nodes)
    row = QUERIES["q_global_efficiency"](spark, SF).collect()[0]
    assert (row.n_nodes, row.n_reachable_pairs) == (n, reachable)
    assert row.global_efficiency == _r6(chain / (n * (n - 1.0)))


# -------------------------------------------------------- retrieval9
def test_rbo_matches_exact_fraction(spark):
    from timestream_travel_spark.operators.retrieval import bm25_scores
    from timestream_travel_spark.operators.retrieval3 import ql_scores
    from timestream_travel_spark.operators.retrieval9 import RBO_D, RBO_Q, RBO_W

    kw = [
        d
        for _, d in sorted(
            (
                (-r.score, r.doc_id)
                for r in bm25_scores(spark, SF).collect()
            )
        )
    ][:RBO_D]
    ql = [
        d
        for _, d in sorted(
            ((-r.ql_score, r.doc_id) for r in ql_scores(spark, SF).collect())
        )
    ][:RBO_D]
    # exact-Fraction truncated RBO from the overlap curve
    p = Fraction(9, 10)
    rbo = Fraction(0)
    num = 0
    n_common = 0
    for d in range(1, RBO_D + 1):
        o_d = len(set(kw[:d]) & set(ql[:d]))
        rbo += (1 - p) * p ** (d - 1) * Fraction(o_d, d)
    for doc in set(kw) & set(ql):
        m = max(kw.index(doc) + 1, ql.index(doc) + 1)
        num += RBO_W[m]
        n_common += 1
    assert Fraction(num, RBO_Q) == rbo  # the weight table IS the sum
    row = QUERIES["q_rbo_rankers"](spark, SF).collect()[0]
    assert (row.n_common, row.rbo_num) == (n_common, num)
    assert row.rbo == _r6(num / RBO_Q)


def test_bpref_matches_exact_fraction(spark):
    from timestream_travel_spark.operators.retrieval import TOP_K
    from timestream_travel_spark.operators.retrieval8 import _hits

    hit, nrel = _hits(spark, SF)
    hits = [(r.rnk, r.j) for r in hit.collect()]
    n_rel = nrel.collect()[0].n_rel
    rp = min(n_rel, TOP_K)
    num = sum(rp - min(rnk - j, rp) for rnk, j in hits)
    row = QUERIES["q_retrieval_bpref"](spark, SF).collect()[0]
    assert (row.n_relevant, row.n_hits, row.bpref_num) == (
        n_rel,
        len(hits),
        num,
    )
    assert row.bpref == _r6(float(num) / (rp * rp))
