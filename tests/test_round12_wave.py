"""SURVEY §5.6 sanity tests for the round-12 growth wave
(retrieval8, ...): each oracled query pinned against an independent
pure-Python recompute on the same fixture."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()


def _bm25_hits(spark, sf_dir):
    """(top-k doc ids, relevant set, 1-based hit ranks) — the shared
    spine of the ranked-eval metrics, recomputed from the two
    already-oracled upstream queries."""
    topk = [r.doc_id for r in QUERIES["q_bm25_topk"](spark, sf_dir).collect()]
    rel = {
        r.doc_id
        for r in QUERIES["q_contamination_ngrams"](spark, sf_dir).collect()
    }
    hits = [i + 1 for i, d in enumerate(topk) if d in rel]
    return topk, rel, hits


def test_retrieval_map_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.retrieval import TOP_K

    _, rel, hits = _bm25_hits(spark, sf_dir)
    q = Decimal("1e-12")
    sum_prec = sum(
        (Decimal(j / rnk).quantize(q) for j, rnk in enumerate(hits, 1)),
        Decimal(0),
    )
    row = QUERIES["q_retrieval_map"](spark, sf_dir).collect()[0]
    assert row.k == TOP_K and row.n_relevant == len(rel)
    assert row.n_hits == len(hits)
    want = round(float(sum_prec) / min(len(rel), TOP_K), 6)
    assert row.ap_at_k == pytest.approx(want, abs=1e-6)
    assert 0.0 <= row.ap_at_k <= 1.0


def test_retrieval_err_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.retrieval import TOP_K

    _, _, hits = _bm25_hits(spark, sf_dir)
    q = Decimal("1e-12")
    err = sum(
        (Decimal(0.5**j / rnk).quantize(q) for j, rnk in enumerate(hits, 1)),
        Decimal(0),
    )
    row = QUERIES["q_retrieval_err"](spark, sf_dir).collect()[0]
    assert row.k == TOP_K
    assert row.err_at_k == pytest.approx(round(float(err), 6), abs=1e-6)
    # the cascade sum is dominated by the first relevant hit
    if hits:
        assert row.err_at_k <= 0.5 / hits[0] + 1e-9


def test_retrieval_rbp_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.retrieval8 import RBP_DEN, RBP_NUM

    _, _, hits = _bm25_hits(spark, sf_dir)
    p = RBP_NUM / RBP_DEN
    q = Decimal("1e-12")
    sum_p = sum(
        (
            Decimal(RBP_NUM ** (rnk - 1) / RBP_DEN ** (rnk - 1)).quantize(q)
            for rnk in hits
        ),
        Decimal(0),
    )
    row = QUERIES["q_retrieval_rbp"](spark, sf_dir).collect()[0]
    assert row.persistence == pytest.approx(p)
    assert row.rbp == pytest.approx(round((1 - p) * float(sum_p), 6), abs=1e-6)
    assert 0.0 <= row.rbp <= 1.0


def test_retrieval_success_f1_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.retrieval import TOP_K

    _, rel, hits = _bm25_hits(spark, sf_dir)
    row = QUERIES["q_retrieval_success_f1"](spark, sf_dir).collect()[0]
    assert row.success_at_k == (1 if hits else 0)
    want_f1 = round(2.0 * len(hits) / (TOP_K + len(rel)), 6) if hits else 0.0
    assert row.f1_at_k == pytest.approx(want_f1, abs=1e-6)
    # F1 is the harmonic mean: bounded by min(precision, recall)·2
    prec, rec = len(hits) / TOP_K, len(hits) / len(rel) if rel else 0.0
    assert row.f1_at_k <= 2 * min(prec, rec) + 1e-9


# ------------------------------------------------ inequality panel
def _values_by_type(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r.value)
    return by_t


def test_theil_atkinson_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    got = {
        r.event_type: r
        for r in QUERIES["q_theil_atkinson"](spark, sf_dir).collect()
    }
    q = Decimal("1e-12")
    for t, vals in by_t.items():
        xs = [v for v in vals if v > 0]
        n = len(xs)
        mu = float(
            sum(Decimal(str(round(v, 4))) for v in xs)
        ) / n
        theil = float(
            sum(
                (Decimal((x / mu) * math.log(x / mu)).quantize(q) for x in xs),
                Decimal(0),
            )
        ) / n
        lx = float(
            sum((Decimal(math.log(x)).quantize(q) for x in xs), Decimal(0))
        )
        atk = 1.0 - math.exp(lx / n) / mu
        assert got[t].n == n
        assert got[t].theil_t == pytest.approx(round(theil, 6), abs=1e-6)
        assert got[t].atkinson_1 == pytest.approx(round(atk, 6), abs=1e-6)
        assert got[t].theil_t >= -1e-9 and 0.0 <= got[t].atkinson_1 < 1.0


def test_hoover_palma_quantile_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    hoov = {
        r.event_type: r
        for r in QUERIES["q_hoover_index"](spark, sf_dir).collect()
    }
    palm = {
        r.event_type: r
        for r in QUERIES["q_palma_ratio"](spark, sf_dir).collect()
    }
    quan = {
        r.event_type: r
        for r in QUERIES["q_quantile_ratio"](spark, sf_dir).collect()
    }
    for t, vals in by_t.items():
        xs = sorted(Decimal(str(round(v, 4))) for v in vals)
        n = len(xs)
        s = sum(xs)
        want_h = float(sum(abs(n * x - s) for x in xs)) / float(2 * n * s)
        assert hoov[t].hoover == pytest.approx(round(want_h, 6), abs=1e-6)
        bottom = sum(xs[: (4 * n) // 10])
        top = sum(xs[n - n // 10 :])
        assert palm[t].bottom40_sum == pytest.approx(float(bottom))
        assert palm[t].top10_sum == pytest.approx(float(top))
        assert palm[t].palma == pytest.approx(
            round(float(top) / float(bottom), 6), abs=1e-6
        )

        def qtl(p_num, p_den):
            return xs[-((-p_num * n) // p_den) - 1]  # ceil(p·n), 1-based

        assert quan[t].p90 == pytest.approx(float(qtl(9, 10)))
        assert quan[t].p10 == pytest.approx(float(qtl(1, 10)))
        assert quan[t].ratio_90_10 == pytest.approx(
            round(float(qtl(9, 10)) / float(qtl(1, 10)), 6), abs=1e-6
        )


def test_brunner_munzel_recompute(spark, sf_dir):
    """Pure-Python midrank recompute of W and p̂ for every pair —
    the scipy.stats.brunnermunzel convention."""
    by_t = _values_by_type(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_brunner_munzel"](spark, sf_dir).collect()
    }

    def midranks(values, universe_sorted):
        # rank each value against `universe_sorted` with midrank ties
        import bisect

        out = []
        for v in values:
            lo = bisect.bisect_left(universe_sorted, v)
            hi = bisect.bisect_right(universe_sorted, v)
            out.append((lo + hi + 1) / 2.0)
        return out

    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_t[ta], by_t[tb]
            na, nb = len(xa), len(xb)
            comb = sorted(xa + xb)
            rca = midranks(xa, comb)
            rcb = midranks(xb, comb)
            ra = midranks(xa, sorted(xa))
            rb = midranks(xb, sorted(xb))
            m_rca, m_rcb = sum(rca) / na, sum(rcb) / nb
            da = [c - w for c, w in zip(rca, ra)]
            db = [c - w for c, w in zip(rcb, rb)]
            s2a = (sum(d * d for d in da) - sum(da) ** 2 / na) / (na - 1)
            s2b = (sum(d * d for d in db) - sum(db) ** 2 / nb) / (nb - 1)
            w = (
                na
                * nb
                * (m_rcb - m_rca)
                / ((na + nb) * math.sqrt(na * s2a + nb * s2b))
            )
            p_hat = (m_rcb - (nb + 1) / 2.0) / na
            r = got[(ta, tb)]
            assert (r.n_a, r.n_b) == (na, nb)
            assert r.p_hat == pytest.approx(round(p_hat, 6), abs=1e-6)
            assert r.w_bm == pytest.approx(round(w, 6), abs=1e-5)
            assert 0.0 <= r.p_hat <= 1.0


# ------------------------------------------------- indicator walks
def _daily_ohlc_py(spark, sf_dir):
    """(t -> [(day, op, hi, lo, cl)]) day-sorted exact-Decimal daily
    OHLC of the hourly level series — mirrors timeseries15's
    _daily_ohlc."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    hourly: dict[tuple, Decimal] = {}
    for r in rows:
        key = (r.event_type, r.ts.strftime("%Y-%m-%d"), r.ts.hour)
        hourly[key] = hourly.get(key, Decimal(0)) + Decimal(
            str(round(r.value, 4))
        )
    days: dict[tuple, dict[int, Decimal]] = {}
    for (t, day, hr), v in hourly.items():
        days.setdefault((t, day), {})[hr] = v
    out: dict[str, list] = {}
    for (t, day), hrs in sorted(days.items()):
        vals = [hrs[h] for h in sorted(hrs)]
        out.setdefault(t, []).append(
            (day, vals[0], max(vals), min(vals), vals[-1])
        )
    return out


def test_elder_ray_walk_replay(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries29 import EMA_A

    ohlc = _daily_ohlc_py(spark, sf_dir)
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_elder_ray"](spark, sf_dir).collect()
    }
    for t, series in ohlc.items():
        e1 = None
        for day, op, hi, lo, cl in series:
            c = float(cl)
            e1 = c if e1 is None else (1 - EMA_A) * e1 + EMA_A * c
            r = got[(t, day)]
            assert r.bull_power == float(hi) - e1
            assert r.bear_power == float(lo) - e1


def test_mass_index_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries29 import EMA_A, MASS_W

    ohlc = _daily_ohlc_py(spark, sf_dir)
    got = {
        (r.event_type, r.day): r.mass_index
        for r in QUERIES["q_mass_index"](spark, sf_dir).collect()
    }
    q = Decimal("1e-12")
    seen = 0
    for t, series in ohlc.items():
        e1 = e2 = None
        ratios = []
        for day, _, hi, lo, _ in series:
            rg = float(hi - lo)
            if e1 is None:
                e1 = e2 = rg
            else:
                e1 = (1 - EMA_A) * e1 + EMA_A * rg
                e2 = (1 - EMA_A) * e2 + EMA_A * e1
            ratios.append(Decimal(e1 / e2 if e2 != 0.0 else 1.0).quantize(q))
            if len(ratios) >= MASS_W:
                want = float(sum(ratios[-MASS_W:]))
                assert got[(t, day)] == pytest.approx(want, abs=1e-9)
                seen += 1
    assert seen == len(got)


def test_ease_of_movement_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries29 import EMV_W

    ohlc = _daily_ohlc_py(spark, sf_dir)
    vol_rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "ts")
        .count()
        .collect()
    )
    vol: dict[tuple, int] = {}
    for r in vol_rows:
        key = (r.event_type, r.ts.strftime("%Y-%m-%d"))
        vol[key] = vol.get(key, 0) + r["count"]
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_ease_of_movement"](spark, sf_dir).collect()
    }
    for t, series in ohlc.items():
        emvs = []
        prev = None
        for day, _, hi, lo, _ in series:
            if prev is not None:
                n = (hi + lo - prev) * (hi - lo)
                emv = float(n) / (2 * vol[(t, day)])
                emvs.append(emv)
                if len(emvs) >= EMV_W:
                    r = got[(t, day)]
                    assert r.emv == emv
                    # same-order left-associated chain sum
                    s = emvs[-1]
                    for x in emvs[-2 : -EMV_W - 1 : -1]:
                        s = s + x
                    assert r.emv_sma == pytest.approx(
                        round(s / EMV_W, 6), abs=1e-6
                    )
            prev = hi + lo


def test_stochastic_rsi_bounds_and_consistency(spark, sf_dir):
    """StochRSI ∈ [0,1]; the underlying rsi column must agree with
    q_rsi_indicator row-for-row on the overlap."""
    base = {
        (r.event_type, r.day): r.rsi
        for r in QUERIES["q_rsi_indicator"](spark, sf_dir).collect()
    }
    rows = QUERIES["q_stochastic_rsi"](spark, sf_dir).collect()
    assert rows, "stoch rsi emitted nothing"
    for r in rows:
        assert 0.0 <= r.stoch_rsi <= 1.0
        assert base[(r.event_type, r.day)] == pytest.approx(
            r.rsi, abs=1e-6
        )


def test_kst_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries29 import (
        KST_LAGS,
        KST_SMA,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    daily: dict[tuple, Decimal] = {}
    for r in rows:
        key = (r.event_type, r.ts.strftime("%Y-%m-%d"))
        daily[key] = daily.get(key, Decimal(0)) + Decimal(
            str(round(r.value, 4))
        )
    series: dict[str, list] = {}
    for (t, day), v in sorted(daily.items()):
        series.setdefault(t, []).append(float(v))
    got = {
        (r.event_type, r.day): r.kst
        for r in QUERIES["q_kst"](spark, sf_dir).collect()
    }
    q = Decimal("1e-12")
    gate = max(l + s - 1 for l, s in zip(KST_LAGS, KST_SMA))
    checked = 0
    for t, vals in series.items():
        days = sorted({d for (tt, d) in daily if tt == t})
        for i in range(gate, len(vals)):
            kst = 0.0
            for w, (lag, sma) in enumerate(zip(KST_LAGS, KST_SMA), 1):
                terms = [
                    Decimal(vals[j] / vals[j - lag] - 1.0).quantize(q)
                    for j in range(i - sma + 1, i + 1)
                ]
                kst += w * (float(sum(terms)) / sma)
            assert got[(t, days[i])] == pytest.approx(
                round(kst, 6), abs=1e-6
            )
            checked += 1
    assert checked == len(got)


# ------------------------------------------------ backbone centralities
def _backbone_adj(spark, sf_dir):
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def _bfs(adj, src):
    dist = {src: 0}
    frontier = [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_distance_fixpoint_and_closeness_recompute(spark, sf_dir):
    """The fixed {DIST_ROUNDS}-round unroll must BE the true BFS on
    the fixture (no distance exceeds the round count), and
    closeness/harmonic/eccentricity match a pure-Python BFS."""
    from timestream_travel_spark.operators.graph12 import DIST_ROUNDS

    _, adj = _backbone_adj(spark, sf_dir)
    clos = {
        r.node: r
        for r in QUERIES["q_closeness_harmonic"](spark, sf_dir).collect()
    }
    ecc = {
        r.node: r
        for r in QUERIES["q_graph_eccentricity"](spark, sf_dir).collect()
    }
    all_ecc = []
    for src in adj:
        dist = _bfs(adj, src)
        assert max(dist.values()) <= DIST_ROUNDS, "unroll below true diameter"
        ds = [d for d in dist.values() if d > 0]
        r = clos[src]
        assert r.n_reach == len(dist)
        assert r.sum_dist == sum(ds)
        assert r.closeness == pytest.approx(
            round((len(dist) - 1) / sum(ds), 6), abs=1e-6
        )
        # same-order chain: counts per distance value, ascending d
        harm = 0.0
        for k in range(1, DIST_ROUNDS + 1):
            harm += sum(1 for d in ds if d == k) / k
        assert r.harmonic == pytest.approx(round(harm, 6), abs=1e-6)
        assert ecc[src].eccentricity == max(ds)
        all_ecc.append(max(ds))
    any_row = next(iter(ecc.values()))
    assert any_row.radius == min(all_ecc)
    assert any_row.diameter == max(all_ecc)


def test_katz_scaled_integer_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph12 import (
        KATZ_DEN,
        KATZ_ROUNDS,
    )

    _, adj = _backbone_adj(spark, sf_dir)
    y = {u: 1 for u in adj}
    for it in range(1, KATZ_ROUNDS + 1):
        y = {
            u: KATZ_DEN**it + sum(y[w] for w in adj[u]) for u in adj
        }
    got = {
        r.node: r for r in QUERIES["q_katz_centrality"](spark, sf_dir).collect()
    }
    assert set(got) == set(adj)
    for u, r in got.items():
        assert r.katz_scaled == y[u]
        assert r.katz == y[u] / KATZ_DEN**KATZ_ROUNDS  # dyadic-exact


def test_ktruss_peel_fixpoint_and_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph12 import (
        KTRUSS_K,
        TRUSS_ROUNDS,
    )

    edges, _ = _backbone_adj(spark, sf_dir)

    def support(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    cur = list(edges)
    rounds_to_fix = 0
    while True:
        sup = support(cur)
        keep = [e for e in cur if sup[e] >= KTRUSS_K - 2]
        if len(keep) == len(cur):
            break
        cur = keep
        rounds_to_fix += 1
    assert rounds_to_fix <= TRUSS_ROUNDS, "peel unroll below fixpoint"
    got = {
        (r.a, r.b): r.support
        for r in QUERIES["q_ktruss_edges"](spark, sf_dir).collect()
    }
    assert got == support(cur)
    assert all(s >= KTRUSS_K - 2 for s in got.values())


# --------------------------------------------- rank tests, part B
def _pooled_midranks(by_t):
    """Combined midranks over all samples: value -> midrank."""
    from collections import Counter

    allv = sorted(v for vals in by_t.values() for v in vals)
    cnt = Counter(allv)
    mid, cum = {}, 0
    for v in sorted(cnt):
        c = cnt[v]
        mid[v] = cum + (c + 1) / 2.0
        cum += c
    return mid, len(allv), cnt


def test_dunn_posthoc_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    mid, nn, cnt = _pooled_midranks(by_t)
    ties = sum(c**3 - c for c in cnt.values())
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_dunn_posthoc"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na, nb = len(by_t[ta]), len(by_t[tb])
            ra = sum(mid[v] for v in by_t[ta]) / na
            rb = sum(mid[v] for v in by_t[tb]) / nb
            var = (nn * (nn + 1) / 12.0 - ties / (12.0 * (nn - 1))) * (
                1.0 / na + 1.0 / nb
            )
            z = (ra - rb) / math.sqrt(var)
            r = got[(ta, tb)]
            assert (r.n_a, r.n_b) == (na, nb)
            assert r.z_dunn == pytest.approx(round(z, 6), abs=1e-5)


def test_mood_scale_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r.z_mood
        for r in QUERIES["q_mood_scale_test"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            pair = {ta: by_t[ta], tb: by_t[tb]}
            mid, nn, _ = _pooled_midranks(pair)
            na, nb = len(by_t[ta]), len(by_t[tb])
            # doubled centered scores s2 = 2R - (N+1); A = s2²
            a_all = [
                (2 * mid[v] - (nn + 1)) ** 2
                for t in (ta, tb)
                for v in by_t[t]
            ]
            t1 = sum((2 * mid[v] - (nn + 1)) ** 2 for v in by_t[ta])
            sa, sa2 = sum(a_all), sum(x * x for x in a_all)
            z = (t1 - na * sa / nn) / math.sqrt(
                na * nb / (nn * (nn - 1.0)) * (sa2 - sa * sa / nn)
            )
            assert got[(ta, tb)] == pytest.approx(round(z, 6), abs=1e-5)


def test_mad_robust_z_recompute(spark, sf_dir):
    got = {
        r.event_type: r
        for r in QUERIES["q_mad_robust_z"](spark, sf_dir).collect()
    }
    for t, vals in _values_by_type(spark, sf_dir).items():
        xs = sorted(Decimal(str(round(v, 4))) for v in vals)
        n = len(xs)
        med2 = xs[(n - 1) // 2] + xs[n // 2]
        devs = sorted(abs(2 * x - med2) for x in xs)
        mad4 = devs[(n - 1) // 2] + devs[n // 2]
        n_out = sum(
            1 for x in xs if 2 * 6745 * abs(2 * x - med2) > 35000 * mad4
        )
        r = got[t]
        assert r.median == pytest.approx(float(med2) / 2.0)
        assert r.mad == pytest.approx(float(mad4) / 4.0)
        assert r.n_outliers == n_out


def test_monroe_log_odds_recompute(spark, sf_dir):
    from collections import Counter

    from timestream_travel_spark.operators.llm_text29 import (
        MONROE_MIN_G,
        MONROE_TOP_K,
        PRIOR_DEN,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    wc: dict[str, Counter] = {}
    for r in docs:
        wc.setdefault(r.lang, Counter()).update(
            w.lower() for w in r.text.split() if w
        )
    glob = Counter()
    for c in wc.values():
        glob.update(c)
    nn = sum(glob.values())
    got: dict[str, list] = {}
    for r in QUERIES["q_monroe_log_odds"](spark, sf_dir).collect():
        got.setdefault(r.lang, []).append(r)
    for lang, c in wc.items():
        nl = sum(c.values())
        scored = []
        for w, y in c.items():
            g = glob[w]
            if g < MONROE_MIN_G:
                continue
            aw, a0 = g / PRIOR_DEN, nn / PRIOR_DEN
            yr = g - y
            delta = math.log((y + aw) / (nl + a0 - y - aw)) - math.log(
                (yr + aw) / ((nn - nl) + a0 - yr - aw)
            )
            var = 1.0 / (y + aw) + 1.0 / (yr + aw)
            scored.append((delta / math.sqrt(var), w, y, g))
        scored.sort(key=lambda s: (-s[0], s[1]))
        rows = sorted(got[lang], key=lambda r: r.rnk)
        assert len(rows) == min(MONROE_TOP_K, len(scored))
        for r, (z, w, y, g) in zip(rows, scored):
            assert (r.word, r.n_in_lang, r.n_corpus) == (w, y, g)
            assert r.z_monroe == pytest.approx(round(z, 6), abs=1e-6)
        # the z ordering is strictly enforced
        zs = [r.z_monroe for r in rows]
        assert zs == sorted(zs, reverse=True)
