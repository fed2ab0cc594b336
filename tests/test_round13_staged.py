"""SURVEY §5.6 sanity tests for the formerly-staged round-13 wave
(analytics21, graph13 — promoted into load_all()'s round-13 tail).
load_staged() below now loads whatever STAGED_MODULES currently
holds (the round-14+ staged set) — harmless here, and it keeps this
module runnable standalone alongside the staged tests."""

from __future__ import annotations

import math

import pytest

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()
registry.load_staged()


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


def _midranks(values, universe_sorted):
    import bisect

    out = []
    for v in values:
        lo = bisect.bisect_left(universe_sorted, v)
        hi = bisect.bisect_right(universe_sorted, v)
        out.append((lo + hi + 1) / 2.0)
    return out


def test_conover_squared_ranks_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r.z_conover
        for r in QUERIES["q_conover_squared_ranks"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_t[ta], by_t[tb]
            na, nb = len(xa), len(xb)
            sa, sb = sum(xa), sum(xb)
            # scaled-out deviations on a common denominator n_a·n_b
            da = [abs(na * x - sa) * nb for x in xa]
            db = [abs(nb * y - sb) * na for y in xb]
            comb = sorted(da + db)
            ra = _midranks(da, comb)
            rall = ra + _midranks(db, comb)
            nn = na + nb
            t1 = sum(r * r for r in ra)
            s1 = sum(r * r for r in rall)
            s2 = sum(r**4 for r in rall)
            z = (t1 - na * s1 / nn) / math.sqrt(
                na * nb / (nn * (nn - 1.0)) * (s2 - s1 * s1 / nn)
            )
            assert got[(ta, tb)] == pytest.approx(round(z, 6), abs=1e-5)


def test_cucconi_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_cucconi_test"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_t[ta], by_t[tb]
            na, nb = len(xa), len(xb)
            nn = na + nb
            comb = sorted(xa + xb)
            rb = _midranks(xb, comb)
            sr2 = sum(r * r for r in rb)
            sc2 = sum((nn + 1 - r) ** 2 for r in rb)
            den = math.sqrt(
                na * nb * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0
            )
            u = (6 * sr2 - nb * (nn + 1) * (2 * nn + 1)) / den
            v = (6 * sc2 - nb * (nn + 1) * (2 * nn + 1)) / den
            rho = 2.0 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
            c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
            r = got[(ta, tb)]
            assert r.u_stat == pytest.approx(round(u, 6), abs=1e-5)
            assert r.v_stat == pytest.approx(round(v, 6), abs=1e-5)
            assert r.c_cucconi == pytest.approx(round(c, 6), abs=1e-5)
            assert r.c_cucconi >= -1e-9  # C is a nonnegative quadratic form


def test_welch_anova_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    k = len(by_t)
    ws, ms, ns = {}, {}, {}
    for t, xs in by_t.items():
        n = len(xs)
        mean = sum(xs) / n
        s2 = sum((x - mean) ** 2 for x in xs) / (n - 1)
        ns[t], ms[t], ws[t] = n, mean, n / s2
    wsum = sum(ws.values())
    grand = sum(ws[t] * ms[t] for t in by_t) / wsum
    num = sum(ws[t] * (ms[t] - grand) ** 2 for t in by_t) / (k - 1)
    lam = sum((1 - ws[t] / wsum) ** 2 / (ns[t] - 1) for t in by_t)
    f = num / (1 + 2 * (k - 2) * lam / (k * k - 1))
    df2 = (k * k - 1) / (3 * lam)
    row = QUERIES["q_welch_anova"](spark, sf_dir).collect()[0]
    assert row.k == k
    assert row.grand_mean == pytest.approx(round(grand, 6), abs=1e-4)
    assert row.f_welch == pytest.approx(round(f, 6), rel=1e-6)
    assert row.df2 == pytest.approx(round(df2, 6), rel=1e-6)
    assert row.f_welch >= 0.0


def test_stress_centrality_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs_sigma(src):
        dist = {src: 0}
        sigma = {src: 1}
        frontier = [src]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        sigma[v] = 0
                        nxt.append(v)
                    if dist[v] == dist[u] + 1:
                        sigma[v] += sigma[u]
            frontier = nxt
        return dist, sigma

    info = {s: bfs_sigma(s) for s in adj}
    want: dict[int, int] = {}
    nodes = sorted(adj)
    for i, s in enumerate(nodes):
        ds, sgs = info[s]
        for t in nodes[i + 1 :]:
            if t not in ds:
                continue
            dt, sgt = info[t]
            for v in adj:
                if v in (s, t) or v not in ds or v not in dt:
                    continue
                if ds[v] + dt[v] == ds[t]:
                    want[v] = want.get(v, 0) + sgs[v] * sgt[v]
    got = {
        r.node: r.stress
        for r in QUERIES["q_stress_centrality"](spark, sf_dir).collect()
    }
    assert got == want  # integer-exact, row-for-row


def test_ansari_bradley_lepage_recompute(spark, sf_dir):
    by_t = _values_by_type(spark, sf_dir)
    ab = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_ansari_bradley"](spark, sf_dir).collect()
    }
    lp = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_lepage_test"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_t[ta], by_t[tb]
            na, nb = len(xa), len(xb)
            nn = na + nb
            comb = sorted(xa + xb)
            ra = _midranks(xa, comb)
            rall = ra + _midranks(xb, comb)
            sa = [min(r, nn + 1 - r) for r in ra]
            aall = [min(r, nn + 1 - r) for r in rall]
            t_ab = sum(sa)
            s1, s2 = sum(aall), sum(x * x for x in aall)
            z_ab = (t_ab - na * s1 / nn) / math.sqrt(
                na * nb / (nn * (nn - 1.0)) * (s2 - s1 * s1 / nn)
            )
            t_w = sum(ra)
            sw2 = sum(r * r for r in rall)
            z_w = (t_w - na * (nn + 1) / 2.0) / math.sqrt(
                na
                * nb
                / (nn * (nn - 1.0))
                * (sw2 - nn * ((nn + 1) / 2.0) ** 2)
            )
            r = ab[(ta, tb)]
            assert r.ab_stat == pytest.approx(t_ab)
            assert r.z_ab == pytest.approx(round(z_ab, 6), abs=1e-5)
            q = lp[(ta, tb)]
            assert q.z_wilcoxon == pytest.approx(round(z_w, 6), abs=1e-5)
            assert q.z_ab == pytest.approx(round(z_ab, 6), abs=1e-5)
            assert q.l_lepage == pytest.approx(
                round(z_w * z_w + z_ab * z_ab, 6), abs=1e-4
            )
            assert q.l_lepage >= -1e-9


def test_hodges_lehmann_recompute(spark, sf_dir):
    """Exact brute-force median of all pairwise cent differences —
    the selection search must land on it precisely."""
    by_t = _values_by_type(spark, sf_dir)
    got = {
        (r.type_a, r.type_b): r.hl_shift
        for r in QUERIES["q_hodges_lehmann_shift"](spark, sf_dir).collect()
    }
    types = sorted(by_t)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            a = [round(v * 100) for v in by_t[ta]]
            b = [round(v * 100) for v in by_t[tb]]
            diffs = sorted(y - x for x in a for y in b)
            p = len(diffs)
            want = (diffs[(p + 1) // 2 - 1] + diffs[(p + 2) // 2 - 1]) / 200.0
            assert got[(ta, tb)] == want, (ta, tb)


def test_copurchase_recompute(spark, sf_dir):
    from collections import Counter

    from timestream_travel_spark.operators.graph14 import COPURCHASE_TOP_K

    inc = {
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    }
    by_order: dict[int, list[int]] = {}
    for o, p in inc:
        by_order.setdefault(o, []).append(p)
    pair_n = Counter()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair_n[(a, b)] += 1
    sup = Counter(p for _, p in inc)
    n_orders = len(by_order)
    ranked = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[
        :COPURCHASE_TOP_K
    ]
    rows = QUERIES["q_copurchase_pairs"](spark, sf_dir).collect()
    assert len(rows) == min(COPURCHASE_TOP_K, len(pair_n))
    got = {(r.pa, r.pb): r for r in rows}
    for (a, b), n_co in ranked:
        r = got[(a, b)]
        assert r.n_co == n_co and (r.n_a, r.n_b) == (sup[a], sup[b])
        assert r.n_orders == n_orders
        assert r.lift == pytest.approx(
            round(n_co * n_orders / (sup[a] * sup[b]), 6), abs=1e-6
        )


def _ohlc_tr_py(spark, sf_dir):
    """(t -> [(day, op, hi, lo, cl, tr)]) with exact-Decimal OHLC and
    true range — mirrors timeseries30's substrate."""
    from decimal import Decimal

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
    prev_cl: dict[str, Decimal] = {}
    for (t, day), hrs in sorted(days.items()):
        vals = [hrs[h] for h in sorted(hrs)]
        op, hi, lo, cl = vals[0], max(vals), min(vals), vals[-1]
        if t in prev_cl:
            tr = max(hi - lo, abs(hi - prev_cl[t]), abs(lo - prev_cl[t]))
        else:
            tr = hi - lo
        prev_cl[t] = cl
        out.setdefault(t, []).append((day, op, hi, lo, cl, tr))
    return out


def test_chandelier_qstick_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries30 import (
        CE_K,
        CE_W,
        QS_W,
    )

    ohlc = _ohlc_tr_py(spark, sf_dir)
    ce = {
        (r.event_type, r.day): r
        for r in QUERIES["q_chandelier_exit"](spark, sf_dir).collect()
    }
    qb = {
        (r.event_type, r.day): r
        for r in QUERIES["q_qstick_bop"](spark, sf_dir).collect()
    }
    for t, series in ohlc.items():
        for i in range(len(series)):
            day = series[i][0]
            if i + 1 >= CE_W:
                win = series[i - CE_W + 1 : i + 1]
                hh = max(float(r[2]) for r in win)
                ll = min(float(r[3]) for r in win)
                atr = float(sum(r[5] for r in win)) / CE_W
                r = ce[(t, day)]
                assert r.chandelier_long == pytest.approx(
                    round(hh - CE_K * atr, 6), abs=1e-6
                )
                assert r.chandelier_short == pytest.approx(
                    round(ll + CE_K * atr, 6), abs=1e-6
                )
                assert r.long_held == (
                    1 if float(series[i][4]) > hh - CE_K * atr else 0
                )
            if i + 1 >= QS_W:
                win = series[i - QS_W + 1 : i + 1]
                body = float(sum(r[4] - r[1] for r in win)) / QS_W
                bops = [
                    0.0
                    if r[2] == r[3]
                    else float(r[4] - r[1]) / float(r[2] - r[3])
                    for r in win
                ]
                s = bops[-1]
                for x in bops[-2::-1]:
                    s = s + x
                r = qb[(t, day)]
                assert r.qstick == pytest.approx(round(body, 6), abs=1e-6)
                assert r.bop_sma == pytest.approx(
                    round(s / QS_W, 6), abs=1e-6
                )


def test_supertrend_walk_replay(spark, sf_dir):
    """Bit-exact pure-Python replay of the band/trend hysteresis,
    plus the invariant: the indicator sits on the lower band in an
    up-trend and the upper band in a down-trend."""
    from timestream_travel_spark.operators.timeseries30 import ST_M, ST_W

    ohlc = _ohlc_tr_py(spark, sf_dir)
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_supertrend"](spark, sf_dir).collect()
    }
    n_checked = 0
    for t, series in ohlc.items():
        f_ub = f_lb = prev_cl = None
        trend = 1
        for i in range(ST_W - 1, len(series)):
            day = series[i][0]
            win = series[i - ST_W + 1 : i + 1]
            mid = float(series[i][2] + series[i][3]) / 2.0
            atr = float(sum(r[5] for r in win)) / ST_W
            cl = float(series[i][4])
            bub, blb = mid + ST_M * atr, mid - ST_M * atr
            if f_ub is None:
                f_ub, f_lb = bub, blb
                trend = 1 if cl > bub else -1
            else:
                if bub < f_ub or prev_cl > f_ub:
                    f_ub = bub
                if blb > f_lb or prev_cl < f_lb:
                    f_lb = blb
                if trend == 1:
                    trend = -1 if cl <= f_lb else 1
                else:
                    trend = 1 if cl >= f_ub else -1
            prev_cl = cl
            r = got[(t, day)]
            assert r.trend == trend
            assert r.supertrend == (f_lb if trend == 1 else f_ub)
            n_checked += 1
    assert n_checked == len(got)


def test_page_hinkley_walk_replay(spark, sf_dir):
    """Bit-exact pure-Python replay of the running-mean CUSUM walk;
    PH is nonnegative by construction."""
    from decimal import Decimal

    from timestream_travel_spark.operators.timeseries31 import (
        PH_DELTA,
        PH_LAMBDA,
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
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_page_hinkley"](spark, sf_dir).collect()
    }
    series: dict[str, list] = {}
    for (t, day), v in sorted(daily.items()):
        series.setdefault(t, []).append((day, float(v)))
    for t, days in series.items():
        s = m = mn = 0.0
        for k, (day, x) in enumerate(days, 1):
            if k == 1:
                s = x
                m = x - s / 1 - PH_DELTA
                mn = min(0.0, m)
            else:
                s = s + x
                m = m + (x - s / k - PH_DELTA)
                mn = min(mn, m)
            r = got[(t, day)]
            assert r.m == m and r.ph == m - mn
            assert r.ph >= 0.0
            assert r.alarm == (1 if m - mn > PH_LAMBDA else 0)


def test_heikin_ashi_walk_replay(spark, sf_dir):
    """Bit-exact dyadic walk replay + the candle-envelope invariant
    (ha_low ≤ ha_open, ha_close ≤ ha_high)."""
    ohlc = _ohlc_tr_py(spark, sf_dir)
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_heikin_ashi"](spark, sf_dir).collect()
    }
    for t, series in ohlc.items():
        ha_o = ha_c = None
        for day, op, hi, lo, cl, _ in series:
            op, hi, lo, cl = float(op), float(hi), float(lo), float(cl)
            nc = (op + hi + lo + cl) / 4.0
            no = (op + cl) / 2.0 if ha_o is None else (ha_o + ha_c) / 2.0
            ha_o, ha_c = no, nc
            r = got[(t, day)]
            assert (r.ha_open, r.ha_close) == (no, nc)
            assert r.ha_high == max(hi, no, nc)
            assert r.ha_low == min(lo, no, nc)
            assert r.ha_low <= min(no, nc) <= max(no, nc) <= r.ha_high


def test_pivot_points_recompute(spark, sf_dir):
    ohlc = _ohlc_tr_py(spark, sf_dir)
    got = {
        (r.event_type, r.day): r
        for r in QUERIES["q_pivot_points"](spark, sf_dir).collect()
    }
    for t, series in ohlc.items():
        for (pd_, _, ph, pl, pc, _), (day, *_rest) in zip(
            series, series[1:]
        ):
            ph, pl, pc = float(ph), float(pl), float(pc)
            p = (ph + pl + pc) / 3.0
            r = got[(t, day)]
            assert r.pivot == p
            assert r.r1 == 2.0 * p - pl and r.s1 == 2.0 * p - ph
            assert r.r2 == p + (ph - pl) and r.s2 == p - (ph - pl)
            assert r.s2 <= r.s1 <= r.r1 <= r.r2