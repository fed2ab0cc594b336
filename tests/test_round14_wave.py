"""SURVEY §5.6 recompute tests for the round-14 wave (analytics24,
timeseries35, graph17, llm_text31, retrieval10) — each query's full
output recomputed in pure Python (exact integers / replayed float
compositions) and compared exactly."""

from __future__ import annotations

import math
import re
from collections import Counter, deque
from decimal import ROUND_HALF_UP, Decimal

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()
registry.load_staged()

SF = "/root/testdata/sf0.001"


def _rk(x: float, k: int) -> float:
    """HALF_UP quantize to k dp via the shortest decimal repr — the
    engines' rounding contract (Python round() is half-even)."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal(f"1e-{k}"), rounding=ROUND_HALF_UP)
    )


def _events(spark):
    return (
        load_table(spark, SF, "events")
        .select("event_type", "value", "ts")
        .collect()
    )


def _cents(v: float) -> int:
    # Spark/DuckDB round(v*100, 0) is HALF_UP on the (positive) double
    return math.floor(v * 100 + 0.5)


# ------------------------------------------------------- analytics24
def test_fligner_policello_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r.value)
    types = sorted(by_t)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_fligner_policello"](spark, SF).collect()
    }
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xs, ys = by_t[ta], by_t[tb]
            m, n = len(xs), len(ys)
            ys_sorted = sorted(ys)
            xs_sorted = sorted(xs)

            def p2_of(v, other):
                import bisect

                lt = bisect.bisect_left(other, v)
                eq = bisect.bisect_right(other, v) - lt
                return 2 * lt + eq

            p2s = [p2_of(x, ys_sorted) for x in xs]
            q2s = [p2_of(y, xs_sorted) for y in ys]
            sp, sp2 = sum(p2s), sum(v * v for v in p2s)
            sq, sq2 = sum(q2s), sum(v * v for v in q2s)
            r = got[(ta, tb)]
            assert (r.n_a, r.n_b, r.sum_p2, r.sum_q2) == (m, n, sp, sq)
            z = ((float(sp) - sq) / 2.0) / math.sqrt(
                (float(m) * float(sp2) - float(sp) * sp) / (4.0 * m)
                + (float(n) * float(sq2) - float(sq) * sq) / (4.0 * n)
                + float(sp) * sq / (4.0 * float(m) * n)
            )
            assert r.z_fp == _rk(z, 6)


def test_mann_kendall_matches_recompute(spark):
    rows = _events(spark)
    daily: dict[tuple, list[int]] = {}
    for r in rows:
        key = (r.event_type, r.ts.date())
        daily.setdefault(key, [0, 0])
        daily[key][0] += _cents(r.value)
        daily[key][1] += 1
    by_t: dict[str, list[tuple]] = {}
    for (t, day), (s, c) in daily.items():
        by_t.setdefault(t, []).append((day, s, c))
    got = {
        r.event_type: r
        for r in QUERIES["q_mann_kendall_trend"](spark, SF).collect()
    }
    for t, seq in by_t.items():
        seq.sort()
        nd = len(seq)
        s_mk = 0
        for i in range(nd):
            for j in range(i + 1, nd):
                lhs = seq[j][1] * seq[i][2]
                rhs = seq[i][1] * seq[j][2]
                s_mk += 1 if lhs > rhs else (-1 if lhs < rhs else 0)
        tie_corr = 0
        for i in range(nd):
            ti = sum(
                1
                for j in range(nd)
                if seq[i][1] * seq[j][2] == seq[j][1] * seq[i][2]
            )
            tie_corr += (ti - 1) * (2 * ti + 5)
        var_num = nd * (nd - 1) * (2 * nd + 5) - tie_corr
        r = got[t]
        assert (r.n_days, r.s_mk, r.var18_num) == (nd, s_mk, var_num)
        sd = math.sqrt(float(var_num) / 18.0)
        if s_mk > 0:
            z = (float(s_mk) - 1.0) / sd
        elif s_mk < 0:
            z = (float(s_mk) + 1.0) / sd
        else:
            z = 0.0
        assert r.z_mk == _rk(z, 6)


def _order_cells(spark):
    rows = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cells = Counter((r.o_orderpriority, r.o_orderstatus) for r in rows)
    return cells


def test_gk_lambda_matches_recompute(spark):
    cells = _order_cells(spark)
    n = sum(cells.values())
    rows_ = sorted({r for r, _ in cells})
    cols = sorted({c for _, c in cells})
    sum_rowmax = sum(max(cells.get((r, c), 0) for c in cols) for r in rows_)
    sum_colmax = sum(max(cells.get((r, c), 0) for r in rows_) for c in cols)
    max_coltot = max(sum(cells.get((r, c), 0) for r in rows_) for c in cols)
    max_rowtot = max(sum(cells.get((r, c), 0) for c in cols) for r in rows_)
    row = QUERIES["q_gk_lambda"](spark, SF).collect()[0]
    assert (row.n, row.sum_rowmax, row.sum_colmax) == (n, sum_rowmax, sum_colmax)
    assert (row.max_coltot, row.max_rowtot) == (max_coltot, max_rowtot)
    assert row.lambda_c_given_r == _rk(
        float(sum_rowmax - max_coltot) / (n - max_coltot), 6
    )
    assert row.lambda_r_given_c == _rk(
        float(sum_colmax - max_rowtot) / (n - max_rowtot), 6
    )
    assert row.lambda_sym == _rk(
        float(sum_rowmax + sum_colmax - max_coltot - max_rowtot)
        / (2 * n - max_coltot - max_rowtot),
        6,
    )


def test_theil_uncertainty_matches_recompute(spark):
    cells = _order_cells(spark)
    n = sum(cells.values())
    q15 = Decimal("1e-15")

    def entropy(counts):
        s = Decimal(0)
        for c in counts:
            term = (float(c) / n) * math.log(float(c) / n)
            s += Decimal(repr(term)).quantize(q15, rounding=ROUND_HALF_UP)
        return -float(s)

    rows_ = Counter()
    cols = Counter()
    for (r, c), k in cells.items():
        rows_[r] += k
        cols[c] += k
    hr = entropy(rows_.values())
    hc = entropy(cols.values())
    hrc = entropy(cells.values())
    row = QUERIES["q_theil_uncertainty"](spark, SF).collect()[0]
    assert row.n == n
    assert row.h_row == _rk(hr, 6)
    assert row.h_col == _rk(hc, 6)
    assert row.h_joint == _rk(hrc, 6)
    assert row.u_r_given_c == _rk((hr + hc - hrc) / hr, 6)
    assert row.u_c_given_r == _rk((hr + hc - hrc) / hc, 6)
    assert row.u_sym == _rk(2.0 * (hr + hc - hrc) / (hr + hc), 6)


def test_wilson_interval_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[int]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(_cents(r.value))
    got = {
        r.event_type: r for r in QUERIES["q_wilson_interval"](spark, SF).collect()
    }
    for t, vals in by_t.items():
        n, s = len(vals), sum(vals)
        k = sum(1 for v in vals if v * n > s)
        r = got[t]
        assert (r.n, r.k) == (n, k)
        ph = float(k) / n
        assert r.p_hat == _rk(ph, 6)
        half = 1.96 * math.sqrt(ph * (1.0 - ph) / n + 3.8416 / (4.0 * n * n))
        center = ph + 3.8416 / (2.0 * n)
        denom = 1.0 + 3.8416 / n
        assert r.wilson_lo == _rk((center - half) / denom, 6)
        assert r.wilson_hi == _rk((center + half) / denom, 6)


# ------------------------------------------------------ timeseries35
def _ohlc(spark):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    rows = _daily_ohlc(spark, SF).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.t, []).append(r)
    for seq in by_t.values():
        seq.sort(key=lambda r: r.day)
    return by_t


def test_adx_dmi_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries35 import ADX_W

    by_t = _ohlc(spark)
    want = {}
    for t, seq in by_t.items():
        trs = pdms = mdms = dxsum = 0.0
        adx = None
        ph = pl = pc = 0.0
        for rn, r in enumerate(seq, 1):
            h, l, c = float(r.hi), float(r.lo), float(r.cl)
            if rn > 1:
                tr = max(h - l, abs(h - pc), abs(l - pc))
                pdm = h - ph if (h - ph) > (pl - l) and (h - ph) > 0.0 else 0.0
                mdm = pl - l if (pl - l) > (h - ph) and (pl - l) > 0.0 else 0.0
                if rn <= ADX_W + 1:
                    trs, pdms, mdms = trs + tr, pdms + pdm, mdms + mdm
                else:
                    trs = trs - trs / 14.0 + tr
                    pdms = pdms - pdms / 14.0 + pdm
                    mdms = mdms - mdms / 14.0 + mdm
            if rn >= ADX_W + 1:
                dip = 100.0 * pdms / trs if trs > 0.0 else None
                dim = 100.0 * mdms / trs if trs > 0.0 else None
                if trs > 0.0 and (dip + dim) > 0.0:
                    dx = 100.0 * abs(dip - dim) / (dip + dim)
                else:
                    dx = 0.0
                if ADX_W + 1 <= rn <= 2 * ADX_W:
                    dxsum = dxsum + dx
                if rn == 2 * ADX_W:
                    adx = dxsum / 14.0
                elif rn > 2 * ADX_W:
                    adx = (adx * 13.0 + dx) / 14.0
                day = r.day.strftime("%Y-%m-%d")
                want[(t, day)] = (dip, dim, dx, adx)
            ph, pl, pc = h, l, c
    got = {
        (r.event_type, r.day): (r.di_plus, r.di_minus, r.dx, r.adx)
        for r in QUERIES["q_adx_dmi"](spark, SF).collect()
    }
    assert got == want
    # the walk reaches the ADX phase on this fixture
    assert any(v[3] is not None for v in got.values())


def test_rvi_matches_recompute(spark):
    from timestream_travel_spark.operators.timeseries35 import RVI_SUM_W

    by_t = _ohlc(spark)
    want = {}
    for t, seq in by_t.items():
        co = [int((r.cl - r.op) * 10000) for r in seq]
        hl = [int((r.hi - r.lo) * 10000) for r in seq]
        num4 = [None] * len(seq)
        den4 = [None] * len(seq)
        for i in range(3, len(seq)):
            num4[i] = co[i - 3] + 2 * co[i - 2] + 2 * co[i - 1] + co[i]
            den4[i] = hl[i - 3] + 2 * hl[i - 2] + 2 * hl[i - 1] + hl[i]
        for i in range(RVI_SUM_W + 2, len(seq)):
            rnum = sum(num4[i - RVI_SUM_W + 1 : i + 1])
            rden = sum(den4[i - RVI_SUM_W + 1 : i + 1])
            day = seq[i].day.strftime("%Y-%m-%d")
            rvi = _rk(float(rnum) / rden, 6) if rden != 0 else None
            want[(t, day)] = (rnum, rden, rvi)
    got = {
        (r.event_type, r.day): (r.rvi_num, r.rvi_den, r.rvi)
        for r in QUERIES["q_rvi"](spark, SF).collect()
    }
    assert got == want


def test_vpt_matches_recompute(spark):
    from timestream_travel_spark.operators.timeseries35 import VPT_SCALE

    by_t = _ohlc(spark)
    vol = {}
    for r in _events(spark):
        key = (r.event_type, r.ts.date())
        vol[key] = vol.get(key, 0) + 1
    want = {}
    for t, seq in by_t.items():
        cum = 0
        pc4 = None
        for r in seq:
            c4 = int(r.cl * 10000)
            v = vol[(t, r.day.date())]
            if pc4 is None:
                term = 0
            elif c4 >= pc4:
                term = (v * (c4 - pc4) * VPT_SCALE) // pc4
            else:
                term = -((v * (pc4 - c4) * VPT_SCALE) // pc4)
            cum += term
            day = r.day.strftime("%Y-%m-%d")
            want[(t, day)] = (cum, float(cum) / VPT_SCALE)
            pc4 = c4
    got = {
        (r.event_type, r.day): (r.vpt_scaled, r.vpt)
        for r in QUERIES["q_vpt"](spark, SF).collect()
    }
    assert got == want


def test_hull_ma_matches_recompute(spark):
    from timestream_travel_spark.operators.timeseries35 import HMA_DEN, HMA_N

    by_t = _ohlc(spark)
    want = {}
    for t, seq in by_t.items():
        c4 = [int(r.cl * 10000) for r in seq]
        raw = [None] * len(seq)
        for i in range(8, len(seq)):
            w4 = c4[i - 3] + 2 * c4[i - 2] + 3 * c4[i - 1] + 4 * c4[i]
            w9 = sum((j + 1) * c4[i - 8 + j] for j in range(9))
            raw[i] = 90 * w4 - 10 * w9
        for i in range(HMA_N + 1, len(seq)):
            hnum = raw[i - 2] + 2 * raw[i - 1] + 3 * raw[i]
            day = seq[i].day.strftime("%Y-%m-%d")
            want[(t, day)] = (hnum, _rk(float(hnum) / HMA_DEN, 6))
    got = {
        (r.event_type, r.day): (r.hma_num, r.hull_ma)
        for r in QUERIES["q_hull_ma"](spark, SF).collect()
    }
    assert got == want


# ----------------------------------------------------------- graph17
def test_wiener_index_matches_recompute(spark):
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = [(r.a, r.b) for r in top_trade_edges(spark, SF).collect()]
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    total = reach = 0
    for s in nodes:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:  # DIST_ROUNDS cap, matching the query
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if d >= 1:
                total += d
                reach += 1
    row = QUERIES["q_wiener_index"](spark, SF).collect()[0]
    assert (row.n_nodes, row.n_reachable_pairs) == (len(nodes), reach)
    assert row.wiener == total // 2
    assert row.avg_path_len == _rk(float(total) / reach, 6)


def test_graph_transitivity_matches_recompute(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    supp = {r.s_suppkey: r.s_nationkey
            for r in load_table(spark, SF, "supplier").collect()}
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, SF, "customer").collect()}
    ok = {r.o_orderkey: r.o_custkey for r in orders.collect()}
    E = set()
    for r in li.collect():
        s, c = supp[r.l_suppkey], cust[ok[r.l_orderkey]]
        if s != c:
            E.add((min(s, c), max(s, c)))
    adj: dict[int, set] = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in E
        for z in adj[a] & adj[b]
        if z > b
    )
    triads2 = sum(len(v) * (len(v) - 1) for v in adj.values())
    row = QUERIES["q_graph_transitivity"](spark, SF).collect()[0]
    assert (row.n_triangles, row.n_triads) == (tri, triads2 // 2)
    assert row.transitivity == _rk(float(6 * tri) / triads2, 6)


# -------------------------------------------------------- llm_text31
def _word_freqs(spark):
    docs = load_table(spark, SF, "documents").select("text").collect()
    cnt: Counter = Counter()
    for r in docs:
        for w in re.split(r"\s+", r.text.strip()):
            if w:
                cnt[w.lower()] += 1
    return cnt


def test_token_gini_matches_recompute(spark):
    cnt = _word_freqs(spark)
    freqs = sorted(cnt.values())
    v, n = len(freqs), sum(freqs)
    s1_2 = sum(2 * i * f for i, f in enumerate(freqs, 1))
    row = QUERIES["q_token_gini"](spark, SF).collect()[0]
    assert (row.vocab, row.total_tokens) == (v, n)
    assert row.gini == _rk(float(s1_2 - (v + 1) * n) / (float(v) * n), 6)


def test_simpson_diversity_matches_recompute(spark):
    cnt = _word_freqs(spark)
    v = len(cnt)
    n = sum(cnt.values())
    coll2 = sum(f * (f - 1) for f in cnt.values())
    f2 = sum(f * f for f in cnt.values())
    row = QUERIES["q_simpson_diversity"](spark, SF).collect()[0]
    assert (row.vocab, row.total_tokens) == (v, n)
    assert row.simpson_d == _rk(float(coll2) / (float(n) * (n - 1)), 6)
    assert row.inv_simpson == _rk(float(n) * n / f2, 6)


def test_smog_source_matches_recompute(spark):
    docs = load_table(spark, SF, "documents").select("source", "text").collect()
    per: dict[str, list[int]] = {}
    for r in docs:
        ws = [w for w in re.split(r"\s+", r.text.strip()) if w]
        if not ws:
            continue
        sents = max(len(re.findall(r"[.!?]+", r.text)), 1)
        cx = sum(
            1 for w in ws if len(re.findall(r"[aeiouy]+", w.lower())) >= 3
        )
        acc = per.setdefault(r.source, [0, 0, 0])
        acc[0] += 1
        acc[1] += sents
        acc[2] += cx
    got = {r.source: r for r in QUERIES["q_smog_source"](spark, SF).collect()}
    assert set(got) == set(per)
    for src, (nd, sents, cx) in per.items():
        r = got[src]
        assert (r.n_docs, r.n_sentences, r.n_complex) == (nd, sents, cx)
        assert r.smog == _rk(1.043 * math.sqrt(30.0 * cx / sents) + 3.1291, 4)


# ------------------------------------------------------- retrieval10
def test_rankers_kendall_tau_matches_recompute(spark):
    from timestream_travel_spark.operators.retrieval import bm25_scores
    from timestream_travel_spark.operators.retrieval3 import ql_scores
    from timestream_travel_spark.operators.retrieval10 import TAU_D

    kw = [
        r.doc_id
        for r in bm25_scores(spark, SF)
        .orderBy("score", ascending=False)
        .collect()
    ]
    # deterministic tiebreak on doc_id, matching the query
    kw_scores = {
        r.doc_id: r.score for r in bm25_scores(spark, SF).collect()
    }
    kw = sorted(kw_scores, key=lambda d: (-kw_scores[d], d))[:TAU_D]
    ql_s = {r.doc_id: r.ql_score for r in ql_scores(spark, SF).collect()}
    ql = sorted(ql_s, key=lambda d: (-ql_s[d], d))[:TAU_D]
    ra = {d: i + 1 for i, d in enumerate(kw)}
    rb = {d: i + 1 for i, d in enumerate(ql)}
    common = sorted(set(kw) & set(ql))
    conc = disc = 0
    for i, d1 in enumerate(common):
        for d2 in common[i + 1 :]:
            prod = (ra[d1] - ra[d2]) * (rb[d1] - rb[d2])
            conc += prod > 0
            disc += prod < 0
    row = QUERIES["q_rankers_kendall_tau"](spark, SF).collect()[0]
    assert (row.depth, row.n_common) == (TAU_D, len(common))
    assert (row.concordant, row.discordant) == (conc, disc)
    m = len(common)
    if m > 1:
        assert row.kendall_tau == _rk(
            float(conc - disc) / (float(m) * (m - 1) / 2.0), 6
        )
    else:
        assert row.kendall_tau is None


# --------------------------------- q_kcore_trade conversion (graph3)
def test_kcore_trade_matches_exact_peel_and_unroll_bounds(spark):
    """The r14 rows-only→oracled conversion's convention pin: exact
    Python core numbers match the query, every cascade level
    fixpoints within KC_ROUNDS, and the max core stays below
    KC_KMAX (so the fixed unroll IS the true decomposition here)."""
    from timestream_travel_spark.operators.graph3 import (
        KC_KMAX,
        KC_ROUNDS,
        top_trade_edges,
    )

    edges = [(r.a, r.b) for r in top_trade_edges(spark, SF).collect()]
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    surv = set(adj)
    core: dict[int, int] = {}
    k = 1
    max_rounds_per_k = 0
    while surv:
        rounds = 0
        while True:
            drop = {n for n in surv if len(adj[n] & surv) < k}
            if not drop:
                break
            surv -= drop
            rounds += 1
            for n in drop:
                core[n] = k - 1
        max_rounds_per_k = max(max_rounds_per_k, rounds)
        if not surv:
            break
        k += 1
    assert max(core.values()) < KC_KMAX
    assert max_rounds_per_k <= KC_ROUNDS
    nation = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF, "nation").collect()
    }
    want = {nation[n]: c for n, c in core.items()}
    got = {
        r.nation: r.core for r in QUERIES["q_kcore_trade"](spark, SF).collect()
    }
    assert got == want
