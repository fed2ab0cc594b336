"""SURVEY §5.6 recompute tests for the round-15 wave staged during
round 14 (timeseries36, analytics25, graph18, llm_text32,
retrieval11) — promoted into load_all()'s round-15 tail, so
load_staged() below is now a no-op kept for call-shape parity with
the other staged-test files. Each query's full output is recomputed
in pure Python (exact integers / Fractions / replayed float
compositions) and compared exactly."""

from __future__ import annotations

import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()
registry.load_staged()

SF = "/root/testdata/sf0.001"


def _rk(x: float, k: int = 6) -> float:
    """HALF_UP quantize via the shortest decimal repr — the engines'
    rounding contract (Python round() is half-even)."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal(f"1e-{k}"), rounding=ROUND_HALF_UP)
    )


def _ohlc(spark):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc

    rows = _daily_ohlc(spark, SF).collect()
    by_t: dict[str, list] = {}
    for r in rows:
        by_t.setdefault(r.t, []).append(r)
    for seq in by_t.values():
        seq.sort(key=lambda r: r.day)
    return by_t


def _vols(spark):
    rows = (
        load_table(spark, SF, "events").select("event_type", "ts").collect()
    )
    vol: dict[tuple, int] = {}
    for r in rows:
        key = (r.event_type, r.ts.date())
        vol[key] = vol.get(key, 0) + 1
    return vol


# ------------------------------------------------------ timeseries36
def test_nvi_pvi_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries36 import NVI_BASE

    by_t, vol = _ohlc(spark), _vols(spark)
    want = {}
    for t, seq in by_t.items():
        nvi = pvi = NVI_BASE
        pc = pvol = None
        for r in seq:
            c = float(r.cl)
            v = vol[(t, r.day.date())]
            if pc is not None:
                if v < pvol:
                    nvi = nvi + nvi * ((c - pc) / pc)
                elif v > pvol:
                    pvi = pvi + pvi * ((c - pc) / pc)
            want[(t, r.day.strftime("%Y-%m-%d"))] = (nvi, pvi)
            pc, pvol = c, v
    got = {
        (r.event_type, r.day): (r.nvi, r.pvi)
        for r in QUERIES["q_nvi_pvi"](spark, SF).collect()
    }
    assert got == want
    # both gates actually fire on this fixture
    assert any(v[0] != NVI_BASE for v in got.values())
    assert any(v[1] != NVI_BASE for v in got.values())


def test_fisher_transform_matches_replay(spark):
    from timestream_travel_spark.operators.timeseries36 import FI_W

    by_t = _ohlc(spark)
    want = {}
    for t, seq in by_t.items():
        v = fis = 0.0
        for i, r in enumerate(seq):
            rn = i + 1
            if rn < FI_W:
                continue
            if rn > FI_W:
                lo = seq[i - FI_W + 1 : i + 1]
                mn = float(min(x.cl for x in lo))
                mx = float(max(x.cl for x in lo))
                c = float(r.cl)
                raw = (c - mn) / (mx - mn) if mx > mn else 0.5
                v = 0.33 * (2.0 * (raw - 0.5)) + 0.67 * v
                v = min(max(v, -0.999), 0.999)
                fis = 0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * fis
            want[(t, r.day.strftime("%Y-%m-%d"))] = (v, fis)
    got = {
        (r.event_type, r.day): (r.v, r.fisher)
        for r in QUERIES["q_fisher_transform"](spark, SF).collect()
    }
    assert got == want


def test_intraday_intensity_matches_recompute(spark):
    from timestream_travel_spark.operators.timeseries36 import II_SCALE, II_W

    by_t, vol = _ohlc(spark), _vols(spark)
    want = {}
    for t, seq in by_t.items():
        terms = []
        for r in seq:
            h4, l4, c4 = (
                int(r.hi * 10000),
                int(r.lo * 10000),
                int(r.cl * 10000),
            )
            v = vol[(t, r.day.date())]
            num = 2 * c4 - h4 - l4
            if h4 == l4:
                term = 0
            elif num >= 0:
                term = (v * num * II_SCALE) // (h4 - l4)
            else:
                term = -((v * (-num) * II_SCALE) // (h4 - l4))
            terms.append(term)
        for i, r in enumerate(seq):
            cum = sum(terms[: i + 1])
            w21 = sum(terms[max(0, i - II_W + 1) : i + 1])
            want[(t, r.day.strftime("%Y-%m-%d"))] = (
                cum,
                float(cum) / II_SCALE,
                w21,
                float(w21) / II_SCALE,
            )
    got = {
        (r.event_type, r.day): (r.ii_cum_scaled, r.ii_cum, r.ii21_scaled, r.ii21)
        for r in QUERIES["q_intraday_intensity"](spark, SF).collect()
    }
    assert got == want


# ------------------------------------------------------- analytics25
def _events(spark):
    return (
        load_table(spark, SF, "events").select("event_type", "value").collect()
    )


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


def _st_score(p: int, n: int) -> int:
    bmax = n // 2
    if p <= bmax:
        return 2 * p - (1 if p % 2 == 1 else 0)
    if n % 2 == 1 and p == (n + 1) // 2:
        return n
    k = n + 1 - p
    return 2 * k - (1 if k % 2 == 0 else 0)


def test_siegel_tukey_matches_fixed_point_recompute(spark):
    from timestream_travel_spark.operators.analytics25 import ST_SCALE

    rows = _events(spark)
    by_t: dict[str, list[float]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r.value)
    types = sorted(by_t)
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["q_siegel_tukey"](spark, SF).collect()
    }
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xs, ys = by_t[ta], by_t[tb]
            m, n_b = len(xs), len(ys)
            nn = m + n_b
            merged = sorted(
                Counter([(v, "a") for v in xs] + [(v, "b") for v in ys]).items()
            )
            # blocks over distinct merged values
            blocks = {}
            for (v, side), c in merged:
                blk = blocks.setdefault(v, [0, 0])
                blk[0 if side == "a" else 1] += c
            t_fp = s2_fp = 0
            t_exact = s2_exact = Fraction(0)
            pos = 0
            for v in sorted(blocks):
                ca, cb = blocks[v]
                c = ca + cb
                pl, pr = pos + 1, pos + c
                s = sum(_st_score(p, nn) for p in range(pl, pr + 1))
                t_fp += (ca * s * ST_SCALE) // c
                s2_fp += (s * s * ST_SCALE) // c
                t_exact += Fraction(ca * s, c)
                s2_exact += Fraction(s * s, c)
                pos = pr
            assert pos == nn
            r = got[(ta, tb)]
            assert (r.n_a, r.n_b) == (m, n_b)
            t_d = float(t_fp) / float(ST_SCALE)
            s2_d = float(s2_fp) / float(ST_SCALE)
            assert r.st_t == _rk(t_d)
            # truncation gap vs the exact-Fraction midranks is < one
            # unit per block
            assert abs(t_exact - Fraction(t_fp, ST_SCALE)) <= Fraction(
                len(blocks), ST_SCALE
            )
            mean = float(m) * (nn + 1) / 2.0
            var = (
                float(m)
                * n_b
                / (float(nn) * (nn - 1.0))
                * (s2_d - float(nn) * (nn + 1.0) * (nn + 1.0) / 4.0)
            )
            assert r.z_st == _rk((t_d - mean) / math.sqrt(var))


def test_gini_mean_difference_matches_brute_force(spark):
    rows = _events(spark)
    by_t: dict[str, list[int]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(_cents(r.value))
    got = {
        r.event_type: r
        for r in QUERIES["q_gini_mean_difference"](spark, SF).collect()
    }
    for t, vals in by_t.items():
        vals.sort()
        n = len(vals)
        s0 = sum(vals)
        s1_2 = sum(2 * i * v for i, v in enumerate(vals, 1))
        num = 2 * (s1_2 - (n + 1) * s0)
        # identity check against the literal pairwise definition
        brute = sum(
            abs(a - b) for i, a in enumerate(vals) for b in vals[i + 1 :]
        )
        # Σ_{i<j}(x₍j₎−x₍i₎) = Σ(2i−n−1)x₍i₎ = S1₂ − (n+1)s0, so
        # num = 2·brute and GMD = num/(n(n−1)) = E|X−X'| over ordered
        # pairs
        assert num == 2 * brute
        r = got[t]
        assert r.n == n
        assert r.gmd == _rk(float(num) / (float(n) * (n - 1) * 100.0))
        assert r.rel_gini == _rk(float(num) / (2.0 * (n - 1) * float(s0)))


def test_bowley_moors_matches_recompute(spark):
    rows = _events(spark)
    by_t: dict[str, list[int]] = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(_cents(r.value))
    got = {
        r.event_type: r for r in QUERIES["q_bowley_moors"](spark, SF).collect()
    }
    for t, vals in by_t.items():
        vals.sort()
        n = len(vals)
        e = {k: vals[(k * n + 7) // 8 - 1] for k in range(1, 8)}
        r = got[t]
        assert (r.n, r.q1_cents, r.q2_cents, r.q3_cents) == (n, e[2], e[4], e[6])
        assert r.bowley_skew == _rk(float(e[6] + e[2] - 2 * e[4]) / (e[6] - e[2]))
        assert r.moors_kurt == _rk(
            float((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
        )


def test_cramers_v_corrected_matches_recompute(spark):
    rows = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cells = Counter((r.o_orderpriority, r.o_orderstatus) for r in rows)
    n = sum(cells.values())
    nr = Counter()
    nc = Counter()
    for (a, b), k in cells.items():
        nr[a] += k
        nc[b] += k
    q8 = Decimal("1e-8")
    s = Decimal(0)
    for (a, b), o in cells.items():
        term = (float(o) * o * n) / (float(nr[a]) * nc[b])
        s += Decimal(repr(term)).quantize(q8, rounding=ROUND_HALF_UP)
    chi2 = float(s) - n
    kr, kc = len(nr), len(nc)
    phi2c = max(chi2 / n - float((kr - 1) * (kc - 1)) / (n - 1), 0.0)
    r_t = kr - float((kr - 1) * (kr - 1)) / (n - 1)
    c_t = kc - float((kc - 1) * (kc - 1)) / (n - 1)
    row = QUERIES["q_cramers_v_corrected"](spark, SF).collect()[0]
    assert (row.n, row.n_rows, row.n_cols) == (n, kr, kc)
    assert row.chi2 == _rk(chi2)
    assert row.phi2_corrected == _rk(phi2c)
    assert row.cramers_v_corrected == _rk(
        math.sqrt(phi2c / (min(r_t, c_t) - 1.0))
    )


# ----------------------------------------------------------- graph18
def _backbone_sets(spark):
    from timestream_travel_spark.operators.graph3 import top_trade_edges

    edges = sorted(
        (min(r.a, r.b), max(r.a, r.b))
        for r in top_trade_edges(spark, SF).collect()
    )
    nodes = sorted({x for e in edges for x in e})
    return edges, nodes


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return len({find(n) for n in nodes})


def test_bridge_edges_matches_union_find(spark):
    edges, nodes = _backbone_sets(spark)
    base = _uf_components(nodes, edges)
    got = {
        (r.a, r.b): r for r in QUERIES["q_bridge_edges"](spark, SF).collect()
    }
    assert set(got) == set(edges)
    for e in edges:
        rest = [x for x in edges if x != e]
        ncr = _uf_components(nodes, rest)
        r = got[e]
        assert (r.n_components, r.n_components_removed) == (base, ncr)
        assert r.is_bridge == (1 if ncr > base else 0)
    # the fixture backbone actually exercises both outcomes or is
    # fully 2-edge-connected — either way the census must be coherent
    assert sum(r.is_bridge for r in got.values()) == sum(
        1 for e in edges if _uf_components(nodes, [x for x in edges if x != e]) > base
    )


def test_articulation_points_matches_union_find(spark):
    edges, nodes = _backbone_sets(spark)
    base = _uf_components(nodes, edges)
    got = {
        r.node: r
        for r in QUERIES["q_articulation_points"](spark, SF).collect()
    }
    assert set(got) == set(nodes)
    for x in nodes:
        rest_nodes = [n for n in nodes if n != x]
        rest_edges = [(a, b) for a, b in edges if a != x and b != x]
        ncr = _uf_components(rest_nodes, rest_edges)
        r = got[x]
        assert (r.n_components, r.n_components_removed) == (base, ncr)
        assert r.is_articulation == (1 if ncr > base else 0)


# -------------------------------------------------------- llm_text32
def _source_freqs(spark):
    docs = load_table(spark, SF, "documents").select("source", "text").collect()
    sc: dict[str, Counter] = {}
    for r in docs:
        cnt = sc.setdefault(r.source, Counter())
        for w in re.split(r"\s+", r.text.strip()):
            if w:
                cnt[w.lower()] += 1
    return sc


def test_pct_diff_keyness_matches_recompute(spark):
    from timestream_travel_spark.operators.llm_text32 import PD_TOP_K

    sc = _source_freqs(spark)
    tot = {s: sum(c.values()) for s, c in sc.items()}
    fs = sorted(tot, key=lambda s: (-tot[s], s))[0]
    ns = tot[fs]
    nr = sum(v for s, v in tot.items() if s != fs)
    restc: Counter = Counter()
    for s, c in sc.items():
        if s != fs:
            restc.update(c)
    scored = []
    for w, f_s in sc[fs].items():
        f_r = restc.get(w, 0)
        if f_r < 1:
            continue
        pd_ = _rk(100.0 * (f_s * nr - f_r * ns) / (float(f_r) * ns))
        scored.append((-pd_, w, f_s, f_r))
    scored.sort()
    want = [
        (fs, w, f_s, f_r, -negpd)
        for negpd, w, f_s, f_r in scored[:PD_TOP_K]
    ]
    got = [
        (r.focus_source, r.word, r.f_s, r.f_r, r.pct_diff)
        for r in QUERIES["q_pct_diff_keyness"](spark, SF).collect()
    ]
    assert got == want


def test_maas_cttr_brunet_matches_recompute(spark):
    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    per: dict[str, Counter] = {}
    for r in docs:
        cnt = per.setdefault(r.lang, Counter())
        for w in re.split(r"\s+", r.text.strip()):
            if w:
                cnt[w.lower()] += 1
    got = {
        r.lang: r for r in QUERIES["q_maas_cttr_brunet"](spark, SF).collect()
    }
    assert set(got) == set(per)
    for lang, cnt in per.items():
        v, n = float(len(cnt)), float(sum(cnt.values()))
        r = got[lang]
        assert (r.vocab, r.total_tokens) == (len(cnt), sum(cnt.values()))
        assert r.maas_a2 == _rk(
            (math.log(n) - math.log(v)) / (math.log(n) * math.log(n))
        )
        assert r.cttr == _rk(v / math.sqrt(2.0 * n))
        assert r.brunet_w == _rk(
            math.exp(math.log(n) * math.exp(-0.165 * math.log(v)))
        )


# ------------------------------------------------------- retrieval11
def test_pr_curve_matches_recompute(spark):
    from timestream_travel_spark.operators.retrieval import (
        QUERY_TERMS,
        TOP_K,
        bm25_scores,
    )
    from timestream_travel_spark.operators.retrieval11 import REL_TF

    scores = {r.doc_id: r.score for r in bm25_scores(spark, SF).collect()}
    topk = sorted(scores, key=lambda d: (-scores[d], d))[:TOP_K]
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    rel = set()
    for r in docs:
        cnt = Counter(
            w for w in re.split(r"[^a-z0-9]+", r.text.lower()) if w
        )
        if all(cnt.get(t, 0) >= REL_TF for t in QUERY_TERMS):
            rel.add(r.doc_id)
    hits = [
        (j + 1, rnk + 1)
        for j, (rnk, d) in enumerate(
            (rnk, d) for rnk, d in enumerate(topk) if d in rel
        )
    ]
    rp = min(len(rel), TOP_K)
    got = {
        r.level_tenths: r
        for r in QUERIES["q_pr_curve_bm25"](spark, SF).collect()
    }
    assert set(got) == set(range(11))
    for k in range(11):
        qual = [(j, rnk) for j, rnk in hits if j * 10 >= k * rp]
        r = got[k]
        assert r.recall_level == k / 10.0
        if not qual:
            assert (r.best_j, r.best_rnk, r.p_interp) == (0, 0, 0.0)
            continue
        best = sorted(qual, key=lambda x: (-_rk(x[0] / x[1]), x[1], x[0]))[0]
        assert (r.best_j, r.best_rnk) == best
        assert r.p_interp == _rk(best[0] / best[1])
    # the tf-threshold labels interleave with the ranking: the curve
    # is non-trivial (neither all-zero nor flat 1.0)
    ps = [got[k].p_interp for k in range(11)]
    assert any(p > 0.0 for p in ps) and len(set(ps)) > 1
