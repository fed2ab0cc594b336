"""SURVEY §5.6 recompute tests for the round-16 STAGED wave
(analytics26, timeseries37, graph20, llm_text34) — each staged
query's full output recomputed in pure Python (exact integers /
Fractions / replayed float compositions) and compared exactly;
exercised here and by `tools/oracle_check.py --staged`; registered
next round."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()
registry.load_staged()

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    )


def _daily_cents(spark):
    rows = load_table(spark, SF, "events").collect()
    daily: dict[tuple, int] = defaultdict(int)
    for r in rows:
        cents = int(Decimal(repr(r["value"])).quantize(Decimal("0.01")) * 100)
        daily[(r["event_type"], r["ts"].strftime("%Y-%m-%d"))] += cents
    return daily


def test_pettitt_recompute(spark):
    daily = _daily_cents(spark)
    series: dict[str, list] = defaultdict(list)
    for (t, day), y in daily.items():
        series[t].append((day, y))
    want = {}
    for t, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        best = None
        for tcut in range(1, n):
            u = sum(
                (1 if ys[i] > ys[j] else (-1 if ys[i] < ys[j] else 0))
                for i in range(tcut)
                for j in range(tcut, n)
            )
            if best is None or abs(u) > abs(best[1]):
                best = (tcut, u)
        tcut, u = best
        k = abs(u)
        p = _r6(
            2.0 * math.exp(-6.0 * (float(k) * float(k)) / (float(n) * n * n + float(n) * n))
        )
        want[t] = (n, pts[tcut - 1][0], u, k, p)
    got = {
        r["event_type"]: (
            r["n"],
            r["change_day"],
            r["u_at_change"],
            r["k_stat"],
            r["p_approx"],
        )
        for r in QUERIES["q_pettitt_change"](spark, SF).collect()
    }
    assert got == want


def test_kuiper_recompute(spark):
    rows = load_table(spark, SF, "events").collect()
    a = sorted(
        int(Decimal(repr(r["value"])).quantize(Decimal("0.01")) * 100)
        for r in rows
        if r["event_type"] == "purchase"
    )
    b = sorted(
        int(Decimal(repr(r["value"])).quantize(Decimal("0.01")) * 100)
        for r in rows
        if r["event_type"] == "click"
    )
    na, nb = len(a), len(b)
    import bisect

    dps = dms = 0
    for v in sorted(set(a) | set(b)):
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        dps = max(dps, ca * nb - cb * na)
        dms = max(dms, cb * na - ca * nb)
    row = QUERIES["q_kuiper_two_sample"](spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert (row["dplus_scaled"], row["dminus_scaled"]) == (dps, dms)
    assert row["v_stat"] == (dps + dms) / (na * nb)
    assert 0 < row["v_stat"] < 1


def test_l_moments_recompute(spark):
    rows = [
        r
        for r in load_table(spark, SF, "events").collect()
        if r["event_type"] == "purchase"
    ]
    ys = sorted(
        int(Decimal(repr(r["value"])).quantize(Decimal("0.01")) * 100)
        for r in rows
    )
    n = len(ys)
    b0 = sum(ys)
    b1 = sum(y * i for i, y in enumerate(ys))
    b2 = sum(y * i * (i - 1) for i, y in enumerate(ys))
    b3 = sum(y * i * (i - 1) * (i - 2) for i, y in enumerate(ys))
    n1 = b0
    n2 = 2 * b1 - (n - 1) * b0
    n3 = 6 * b2 - 6 * (n - 2) * b1 + (n - 1) * (n - 2) * b0
    n4 = (
        20 * b3
        - 30 * (n - 3) * b2
        + 12 * (n - 2) * (n - 3) * b1
        - (n - 1) * (n - 2) * (n - 3) * b0
    )
    row = QUERIES["q_l_moments"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["l1"] == n1 / n
    assert row["l2"] == n2 / (float(n) * (n - 1))
    assert row["l3"] == n3 / (float(n) * (n - 1) * (n - 2))
    assert row["l4"] == n4 / (float(n) * (n - 1) * (n - 2) * (n - 3))
    assert row["t3"] == n3 / ((n - 2) * n2)
    assert row["t4"] == n4 / ((n - 2) * (n - 3) * n2)
    # Fraction sanity: tau ratios are scale-free and |tau| < 1
    t3_exact = Fraction(n3, (n - 2) * n2)
    assert abs(row["t3"] - float(t3_exact)) < 1e-12
    assert abs(row["t3"]) < 1 and abs(row["t4"]) < 1
    # L-scale is positive and below half the mean gap bound
    assert 0 < row["l2"] < row["l1"]


def _daily_close_units(spark):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    out: dict[str, list] = defaultdict(list)
    for r in _daily_ohlc(spark, SF).collect():
        u = int(Decimal(str(r["cl"])) * 10000)
        out[r["t"]].append((r["day"].strftime("%Y-%m-%d"), u))
    for pts in out.values():
        pts.sort()
    return out


def test_zigzag_recompute(spark):
    want = set()
    for t, pts in _daily_close_units(spark).items():
        direction, (d0, ext) = 1, pts[0]
        ext_day = d0
        for day, u in pts[1:]:
            if direction == 1:
                if u > ext:
                    ext, ext_day = u, day
                elif 20 * u <= 19 * ext:
                    want.add((t, ext_day, ext / 10000.0, "high", 0))
                    direction, ext, ext_day = -1, u, day
            else:
                if u < ext:
                    ext, ext_day = u, day
                elif 20 * u >= 21 * ext:
                    want.add((t, ext_day, ext / 10000.0, "low", 0))
                    direction, ext, ext_day = 1, u, day
        want.add(
            (t, ext_day, ext / 10000.0, "high" if direction == 1 else "low", 1)
        )
    got = {
        (r["event_type"], r["pivot_day"], r["pivot"], r["kind"], r["is_final"])
        for r in QUERIES["q_zigzag_pivots"](spark, SF).collect()
    }
    assert got == want
    # both pivot kinds occur and confirmed pivots alternate per type
    kinds = {k for _, _, _, k, f in want if f == 0}
    assert kinds == {"high", "low"}


def test_renko_recompute(spark):
    want = {}
    for t, pts in _daily_close_units(spark).items():
        d0, u0 = pts[0]
        brick = max(1, u0 // 20)
        top, bot = u0, u0 - brick
        up = down = 0
        want[(t, d0)] = (up, down, top / 10000.0, bot / 10000.0)
        for day, u in pts[1:]:
            if u >= top + brick:
                m = (u - top) // brick
                top += m * brick
                bot = top - brick
                up += m
            elif u <= bot - brick:
                m = (bot - u) // brick
                bot -= m * brick
                top = bot + brick
                down += m
            want[(t, day)] = (up, down, top / 10000.0, bot / 10000.0)
    got = {
        (r["event_type"], r["day"]): (
            r["up_cum"],
            r["down_cum"],
            r["top"],
            r["bot"],
        )
        for r in QUERIES["q_renko_bricks"](spark, SF).collect()
    }
    assert got == want
    # bricks actually accumulate in both directions somewhere
    finals = defaultdict(lambda: (0, 0))
    for (t, d), (u, dn, _, _) in sorted(want.items()):
        finals[t] = (u, dn)
    assert any(u > 0 for u, _ in finals.values())
    assert any(dn > 0 for _, dn in finals.values())


def test_fractals_recompute(spark):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    series: dict[str, list] = defaultdict(list)
    for r in _daily_ohlc(spark, SF).collect():
        series[r["t"]].append(
            (r["day"].strftime("%Y-%m-%d"), Decimal(str(r["hi"])), Decimal(str(r["lo"])))
        )
    want = set()
    for t, pts in series.items():
        pts.sort()
        for i in range(2, len(pts) - 2):
            day, hi, lo = pts[i]
            his = [pts[j][1] for j in (i - 2, i - 1, i + 1, i + 2)]
            los = [pts[j][2] for j in (i - 2, i - 1, i + 1, i + 2)]
            if all(hi > h for h in his):
                want.add((t, day, "high", float(hi)))
            if all(lo < l for l in los):
                want.add((t, day, "low", float(lo)))
    got = {
        (r["event_type"], r["day"], r["kind"], r["level"])
        for r in QUERIES["q_williams_fractals"](spark, SF).collect()
    }
    assert got == want
    assert {k for _, _, k, _ in want} == {"high", "low"}


def test_simrank_recompute(spark):
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph20 import (
        SIM_ITERS,
        SIM_SCALE,
        SIM_TOPK,
    )

    edges = [(r["a"], r["b"]) for r in top_trade_edges(spark, SF).collect()]
    nbrs: dict[int, list[int]] = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    nodes = sorted(nbrs)
    assert max(len(v) for v in nbrs.values()) <= 24  # int64 dividend pin
    # independent float SimRank for the truncation-gap bound
    sf = {(u, v): (1.0 if u == v else 0.0) for u in nodes for v in nodes}
    si = {(u, v): (SIM_SCALE if u == v else 0) for u in nodes for v in nodes}
    for _ in range(SIM_ITERS):
        nf, ni = {}, {}
        for u in nodes:
            for v in nodes:
                if u == v:
                    nf[(u, v)], ni[(u, v)] = 1.0, SIM_SCALE
                    continue
                accf = sum(sf[(a, b)] for a in nbrs[u] for b in nbrs[v])
                acci = sum(si[(a, b)] for a in nbrs[u] for b in nbrs[v])
                nf[(u, v)] = 0.8 * accf / (len(nbrs[u]) * len(nbrs[v]))
                ni[(u, v)] = (8 * acci) // (10 * len(nbrs[u]) * len(nbrs[v]))
        sf, si = nf, ni
    ranked = sorted(
        ((u, v, s) for (u, v), s in si.items() if u < v),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:SIM_TOPK]
    got = [
        (r["node_a"], r["node_b"], r["simrank_fp"], r["simrank"])
        for r in QUERIES["q_simrank_backbone"](spark, SF)
        .orderBy(F_desc_then_pair())
        .collect()
    ]
    want = [(u, v, s, s / SIM_SCALE) for u, v, s in ranked]
    assert got == want
    # truncated fixed point sits within the accumulated-truncation
    # bound of the float recursion
    for u, v, s, _ in want:
        assert abs(s / SIM_SCALE - sf[(u, v)]) < 1e-9
    assert want[0][2] > 0  # non-degenerate: some similar pair exists


def F_desc_then_pair():
    from pyspark.sql import functions as F

    return [F.col("simrank_fp").desc(), "node_a", "node_b"]


def test_mtld_recompute(spark):
    docs = load_table(spark, SF, "documents").collect()

    def factors(ws):
        full, seen, cnt = 0, set(), 0
        for w in ws:
            cnt += 1
            seen.add(w)
            if 100 * len(seen) < 72 * cnt:
                full, seen, cnt = full + 1, set(), 0
        partial = (1.0 - len(seen) / cnt) / 0.28 if cnt > 0 else 0.0
        return full + partial

    want = {}
    for r in docs:
        ws = r["text"].split(" ")
        ff, fb = factors(ws), factors(ws[::-1])
        mtld = (
            (len(ws) / ff + len(ws) / fb) / 2.0 if ff > 0 and fb > 0 else None
        )
        want[r["doc_id"]] = (len(ws), ff, fb, mtld)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["factors_fwd"],
            r["factors_bwd"],
            r["mtld"],
        )
        for r in QUERIES["q_mtld"](spark, SF).collect()
    }
    assert got == want
    # the small vocab forces multiple full factors on long docs
    assert max(v[1] for v in want.values()) >= 2


def test_rake_recompute(spark):
    from timestream_travel_spark.operators.llm_text4 import STOPWORDS
    from timestream_travel_spark.operators.llm_text34 import (
        RAKE_MAX_LEN,
        RAKE_TOPK,
    )

    docs = load_table(spark, SF, "documents").collect()
    sw = set(STOPWORDS)
    phrases_by_source: dict[str, list] = defaultdict(list)
    for r in docs:
        run = []
        for w in r["text"].split(" ") + ["the"]:  # sentinel flush
            if w in sw:
                if run and len(run) <= RAKE_MAX_LEN:
                    phrases_by_source[r["source"]].append(tuple(run))
                run = []
            else:
                run.append(w)
    want = {}
    for src, phrases in phrases_by_source.items():
        freq: dict[str, int] = defaultdict(int)
        deg: dict[str, int] = defaultdict(int)
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
        wscore = {
            w: Decimal(repr(deg[w] / freq[w])).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
            for w in freq
        }
        scored = {}
        for p in phrases:
            txt = " ".join(p)
            if txt not in scored:
                scored[txt] = (len(p), sum(wscore[w] for w in p))
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))
        for rank, (txt, (nw, sc)) in enumerate(ranked[:RAKE_TOPK], 1):
            want[(src, txt)] = (nw, float(sc), rank)
    got = {
        (r["source"], r["phrase"]): (r["n_words"], r["score"], r["rank"])
        for r in QUERIES["q_rake_keywords"](spark, SF).collect()
    }
    assert got == want


def test_gries_dp_recompute(spark):
    from timestream_travel_spark.operators.llm_text34 import DP_TOP_WORDS

    docs = load_table(spark, SF, "documents").collect()
    fwi: dict[tuple, int] = defaultdict(int)
    ni: dict[str, int] = defaultdict(int)
    for r in docs:
        for w in r["text"].split(" "):
            fwi[(w, r["source"])] += 1
            ni[r["source"]] += 1
    n = sum(ni.values())
    fw: dict[str, int] = defaultdict(int)
    for (w, _), c in fwi.items():
        fw[w] += c
    top = sorted(fw.items(), key=lambda kv: (-kv[1], kv[0]))[:DP_TOP_WORDS]
    want = {}
    for w, f in top:
        dev = sum(
            abs(fwi.get((w, src), 0) * n - f * nsrc) for src, nsrc in ni.items()
        )
        want[w] = (f, dev / (2.0 * f * n))
    got = {
        r["word"]: (r["freq"], r["dp"])
        for r in QUERIES["q_gries_dp"](spark, SF).collect()
    }
    assert got == want
    # dispersion is a genuine signal: DP spreads over a range
    vals = [v[1] for v in want.values()]
    assert max(vals) - min(vals) > 0.001
    assert all(0 <= v <= 1 for v in vals)


def test_msttr_recompute(spark):
    from timestream_travel_spark.operators.llm_text34 import MSTTR_SEG

    docs = sorted(
        load_table(spark, SF, "documents").collect(), key=lambda r: r["doc_id"]
    )
    streams: dict[str, list] = defaultdict(list)
    for r in docs:
        streams[r["source"]].extend(r["text"].split(" "))
    want = {}
    for src, toks in streams.items():
        nseg = len(toks) // MSTTR_SEG
        if nseg == 0:
            continue
        dsum = sum(
            len(set(toks[k * MSTTR_SEG : (k + 1) * MSTTR_SEG]))
            for k in range(nseg)
        )
        want[src] = (nseg, dsum, dsum / (MSTTR_SEG * nseg))
    got = {
        r["source"]: (r["n_segments"], r["distinct_sum"], r["msttr"])
        for r in QUERIES["q_msttr"](spark, SF).collect()
    }
    assert got == want
