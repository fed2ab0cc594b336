"""SURVEY §5.6 sanity tests for the round-9 waves 2–5: statistics
(Mood, kappa, odds ratio, G-test, Durbin–Watson, Cox–Stuart, Theil
U1, gamma), indicators (Williams %R, CCI, Vortex, Force Index, DPO,
Coppock), readability/lexical panels, and the trade-backbone degree
metrics — each pinned against an independent pure-Python recompute
of the published formula on the same fixture data."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from timestream_travel_spark.tables import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_type", "value"
    ).collect()


def test_mood_median_test_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import q_mood_median_test

    rows = _events(spark, sf_dir)
    vals = sorted(r.value for r in rows)
    # lower weighted median: first value where 2*rank >= n
    n = len(vals)
    med = vals[(n - 1) // 2] if n % 2 else vals[n // 2 - 1]
    per = defaultdict(lambda: [0, 0])  # type -> [ng, above]
    for r in rows:
        per[r.event_type][0] += 1
        per[r.event_type][1] += int(r.value > med)
    N = sum(v[0] for v in per.values())
    A = sum(v[1] for v in per.values())
    chi2 = sum(
        (v[1] * N - v[0] * A) ** 2 / v[0] for v in per.values()
    ) / (A * (N - A))
    got = q_mood_median_test(spark, sf_dir).collect()[0]
    assert got.n_total == N and got.n_above == A
    assert got.grand_median == round(med, 4)
    assert abs(got.chi2 - chi2) < 1e-4, (got.chi2, chi2)


def test_cohens_kappa_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import q_cohens_kappa

    rows = _events(spark, sf_dir)
    units = defaultdict(lambda: [0, 0])
    for r in rows:
        key = (r.user_id, r.ts.date())
        units[key]  # every (user, day) with ANY event is a unit
        if r.event_type == "click":
            units[key][0] = 1
        if r.event_type == "view":
            units[key][1] = 1
    n = len(units)
    a = sum(1 for x in units.values() if x == [1, 1])
    b = sum(1 for x in units.values() if x == [1, 0])
    c = sum(1 for x in units.values() if x == [0, 1])
    d = n - a - b - c
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    got = q_cohens_kappa(spark, sf_dir).collect()[0]
    assert (got.n_units, got.a, got.b, got.c, got.d) == (n, a, b, c, d)
    assert abs(got.kappa - (po - pe) / (1 - pe)) < 1e-5


def test_odds_ratio_ci_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import Z95, q_odds_ratio_ci

    rows = _events(spark, sf_dir)
    vals = sorted(r.value for r in rows)
    n = len(vals)
    med = vals[(n - 1) // 2] if n % 2 else vals[n // 2 - 1]
    a = b = c = d = 0
    for r in rows:
        exp = r.ts.hour >= 12
        out = r.value > med
        if exp and out:
            a += 1
        elif exp:
            b += 1
        elif out:
            c += 1
        else:
            d += 1
    got = q_odds_ratio_ci(spark, sf_dir).collect()[0]
    assert (got.a, got.b, got.c, got.d) == (a, b, c, d)
    orx = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert abs(got.odds_ratio - orx) < 1e-5
    assert abs(got.ci_lo - orx * math.exp(-Z95 * se)) < 1e-4
    assert abs(got.ci_hi - orx * math.exp(Z95 * se)) < 1e-4
    assert got.ci_lo < got.odds_ratio < got.ci_hi


def test_g_test_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import q_g_test

    docs = load_table(spark, sf_dir, "documents").select("lang", "source").collect()
    cells = Counter((r.lang, r.source) for r in docs)
    rm = Counter()
    cm = Counter()
    for (lg, src), o in cells.items():
        rm[lg] += o
        cm[src] += o
    n = sum(cells.values())
    g = 2 * sum(
        o * math.log(o * n / (rm[lg] * cm[src])) for (lg, src), o in cells.items()
    )
    got = q_g_test(spark, sf_dir).collect()[0]
    assert got.n_docs == n
    assert got.df == (len(rm) - 1) * (len(cm) - 1)
    assert abs(got.g_stat - g) < 1e-4
    assert got.g_stat >= 0


def _daily_levels(spark, sf_dir):
    rows = _events(spark, sf_dir)
    daily = defaultdict(float)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += round(r.value, 4)
    out = defaultdict(list)
    for (t, day) in sorted(daily):
        out[t].append(round(daily[(t, day)], 4))
    return out


def test_durbin_watson_and_theils_u1_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import (
        q_durbin_watson,
        q_theils_u1,
    )

    series = _daily_levels(spark, sf_dir)
    dw_got = {r.event_type: r for r in q_durbin_watson(spark, sf_dir).collect()}
    u1_got = {r.event_type: r for r in q_theils_u1(spark, sf_dir).collect()}
    for t, xs in series.items():
        m = sum(xs) / len(xs)
        e = [x - m for x in xs]
        dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, len(e))) / sum(
            x * x for x in e
        )
        assert abs(dw_got[t].dw - dw) < 1e-5, (t, dw_got[t].dw, dw)
        assert dw_got[t].n_days == len(xs)
        pairs = list(zip(xs[1:], xs[:-1]))
        npair = len(pairs)
        sd = sum((a - p) ** 2 for a, p in pairs)
        sa = sum(a * a for a, _ in pairs)
        sp = sum(p * p for _, p in pairs)
        u1 = math.sqrt(sd / npair) / (math.sqrt(sa / npair) + math.sqrt(sp / npair))
        assert abs(u1_got[t].u1 - u1) < 1e-5
        assert 0.0 <= u1_got[t].u1 <= 1.0


def test_cox_stuart_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import q_cox_stuart

    series = _daily_levels(spark, sf_dir)
    got = {r.event_type: r for r in q_cox_stuart(spark, sf_dir).collect()}
    for t, xs in series.items():
        h = len(xs) // 2
        pos = sum(1 for i in range(h) if xs[i + h] > xs[i])
        neg = sum(1 for i in range(h) if xs[i + h] < xs[i])
        assert (got[t].n_pos, got[t].n_neg) == (pos, neg)
        m = pos + neg
        assert abs(got[t].z - (2 * pos - m) / math.sqrt(m)) < 1e-6


def test_goodman_kruskal_gamma_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import (
        GAMMA_VALUE_BANDS,
        q_goodman_kruskal_gamma,
    )

    rows = _events(spark, sf_dir)
    cells = Counter()
    for r in rows:
        x = r.ts.hour // 6
        v = r.value
        y = 0 if v <= GAMMA_VALUE_BANDS[0] else (
            1 if v <= GAMMA_VALUE_BANDS[1] else (2 if v <= GAMMA_VALUE_BANDS[2] else 3)
        )
        cells[(x, y)] += 1
    conc = disc = 0
    for (xa, ya), ca in cells.items():
        for (xb, yb), cb in cells.items():
            if xb > xa and yb > ya:
                conc += ca * cb
            elif xb > xa and yb < ya:
                disc += ca * cb
    got = q_goodman_kruskal_gamma(spark, sf_dir).collect()[0]
    assert (got.c_pairs, got.d_pairs) == (conc, disc)
    assert abs(got.gamma - (conc - disc) / (conc + disc)) < 1e-6


def test_indicator_recomputes(spark, sf_dir):
    """Williams %R, CCI, Force Index and DPO recomputed from the same
    OHLC table the queries consume."""
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc
    from timestream_travel_spark.operators.timeseries20 import (
        CCI_C,
        CCI_W,
        DPO_W,
        WPR_W,
        q_cci,
        q_dpo,
        q_force_index,
        q_williams_r,
    )

    ohlc = defaultdict(list)
    for r in sorted(
        _daily_ohlc(spark, sf_dir).collect(), key=lambda r: (r.t, r.day)
    ):
        ohlc[r.t].append((str(r.day)[:10], float(r.hi), float(r.lo), float(r.cl)))
    wr = {(r.event_type, r.day): r.williams_r for r in q_williams_r(spark, sf_dir).collect()}
    cci = {(r.event_type, r.day): r.cci for r in q_cci(spark, sf_dir).collect()}
    dpo = {(r.event_type, r.day): r.dpo for r in q_dpo(spark, sf_dir).collect()}
    assert wr and cci and dpo
    for t, days in ohlc.items():
        for i in range(len(days)):
            day, hi, lo, cl = days[i]
            if i >= WPR_W - 1:
                win = days[i - WPR_W + 1 : i + 1]
                hh = max(x[1] for x in win)
                ll = min(x[2] for x in win)
                if hh != ll:
                    want = 100.0 * (cl - hh) / (hh - ll)
                    assert abs(wr[(t, day)] - want) < 1e-4
            if i >= CCI_W - 1:
                win = days[i - CCI_W + 1 : i + 1]
                tps = [x[1] + x[2] + x[3] for x in win]
                sma3 = sum(tps) / CCI_W
                md3 = sum(abs(x - sma3) for x in tps) / CCI_W
                if md3:
                    want = (tps[-1] - sma3) / (CCI_C * md3)
                    assert abs(cci[(t, day)] - want) < 1e-3
            if i >= DPO_W - 1 and i >= DPO_W // 2 + 1:
                win = days[i - DPO_W + 1 : i + 1]
                sma = sum(x[3] for x in win) / DPO_W
                want = days[i - (DPO_W // 2 + 1)][3] - sma
                assert abs(dpo[(t, day)] - want) < 1e-4
    fi = q_force_index(spark, sf_dir).collect()
    assert all(r.volume > 0 for r in fi) and len(fi) > 0


def test_vortex_and_coppock_shapes(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries20 import (
        q_coppock_curve,
        q_vortex,
    )

    vi = q_vortex(spark, sf_dir).collect()
    assert len(vi) > 0
    for r in vi:
        assert r.vi_plus >= 0 and r.vi_minus >= 0
        # |H−pL| and |L−pH| each ≤ 2·TR elementwise isn't a law, but
        # the sums are bounded by Σ(|move| components) ≈ ranges: keep
        # a generous sanity ceiling
        assert r.vi_plus < 10 and r.vi_minus < 10
    cc = q_coppock_curve(spark, sf_dir).collect()
    assert len(cc) > 0 and all(abs(r.coppock) < 1e4 for r in cc)


def test_readability_planted(spark, tmp_path):
    from timestream_travel_spark.operators.llm_text23 import (
        q_readability_ari_cl,
        q_readability_flesch_fog,
    )

    text = "The cat sat on the mat. It was extraordinarily comfortable!"
    rows = [(1, text, "en", "s0", len(text))]
    sf = str(tmp_path / "sf_read")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    r = q_readability_ari_cl(spark, sf).collect()[0]
    words = text.split()
    chars = sum(len(w) for w in words)
    sents = 2
    assert (r.n_words, r.n_chars, r.n_sentences) == (len(words), chars, sents)
    ari = 4.71 * chars / len(words) + 0.5 * len(words) / sents - 21.43
    assert abs(r.ari - ari) < 1e-3
    f = q_readability_flesch_fog(spark, sf).collect()[0]
    # 'extraordinarily' (e-xtrao-rdi-na-ri-ly → ≥3 vowel groups) and
    # 'comfortable!' are the complex words
    assert f.n_complex == 2
    assert f.flesch_ease < 110 and f.gunning_fog > 0


def test_lexical_panels_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.llm_text23 import (
        q_lexical_richness,
        q_yules_k,
    )

    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    words = defaultdict(Counter)
    for r in docs:
        for w in r.text.strip().split():
            words[r.lang][w.lower()] += 1
    yk = {r.lang: r for r in q_yules_k(spark, sf_dir).collect()}
    lr = {r.lang: r for r in q_lexical_richness(spark, sf_dir).collect()}
    for lang, wc in words.items():
        n = sum(wc.values())
        v = len(wc)
        s2 = sum(m * m for m in wc.values())
        assert yk[lang].n_tokens == n
        assert abs(yk[lang].yules_k - 1e4 * (s2 - n) / (n * n)) < 1e-3
        assert lr[lang].n_types == v
        assert abs(lr[lang].guiraud_r - v / math.sqrt(n)) < 1e-4
        assert abs(lr[lang].herdan_c - math.log(v) / math.log(n)) < 1e-4
        rep = sum(m * (m - 1) for m in wc.values())
        assert abs(lr[lang].simpson_d - rep / (n * (n - 1))) < 1e-6
        assert 0 < lr[lang].lexical_density <= 1


def test_char_trigram_entropy_bounds(spark, sf_dir):
    from timestream_travel_spark.operators.llm_text23 import q_char_trigram_entropy

    rows = q_char_trigram_entropy(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # entropy of a natural-language trigram table: positive and
        # below log2(distinct trigrams) ≤ log2(n)
        assert 0 < r.trigram_entropy_bits <= math.log2(r.n_trigrams)


def test_backbone_degree_metrics_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.graph3 import top_trade_edges
    from timestream_travel_spark.operators.graph5 import (
        RC_KS,
        q_avg_neighbor_degree,
        q_degree_gini,
        q_rich_club,
    )

    edges = [(r.a, r.b) for r in top_trade_edges(spark, sf_dir).collect()]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    # rich club
    rc = {r.k: r for r in q_rich_club(spark, sf_dir).collect()}
    for k in RC_KS:
        rich = {n for n, d in deg.items() if d > k}
        if len(rich) < 2:
            assert k not in rc
            continue
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        assert rc[k].n_nodes == len(rich) and rc[k].n_edges == ek
        assert abs(rc[k].phi - 2 * ek / (len(rich) * (len(rich) - 1))) < 1e-6
    # knn curve
    knn = {r.k: r for r in q_avg_neighbor_degree(spark, sf_dir).collect()}
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    per_k = defaultdict(lambda: [0, 0])
    for node, d in deg.items():
        per_k[d][0] += 1
        per_k[d][1] += sum(deg[nb] for nb in adj[node])
    for k, (nk, snb) in per_k.items():
        assert knn[k].n_nodes == nk and knn[k].sum_nb == snb
        assert abs(knn[k].knn - snb / (k * nk)) < 1e-6
    # gini
    ds = sorted(deg.values())
    n, sd = len(ds), sum(ds)
    gini = (2 * sum((i + 1) * d for i, d in enumerate(ds)) - (n + 1) * sd) / (n * sd)
    got = q_degree_gini(spark, sf_dir).collect()[0]
    assert got.n_nodes == n and got.sum_deg == sd
    assert abs(got.gini - gini) < 1e-6


def test_hits_parity_and_shape(spark, sf_dir):
    """Exact integer replay of the truncated fixed-point HITS walk
    (HITS_SCALE iterates, max-normalized by integer DIV — the r14
    rows-only→oracled conversion, graph15 convention)."""
    from timestream_travel_spark.operators.graph5 import (
        HITS_ITERS,
        HITS_SCALE,
        q_hits_hubs_authorities,
    )

    rows = q_hits_hubs_authorities(spark, sf_dir).collect()
    assert len(rows) > 1
    # max-normalization: top hub / top authority at exactly SCALE
    assert max(r.hub_scaled for r in rows) == HITS_SCALE
    assert max(r.auth_scaled for r in rows) == HITS_SCALE
    assert all(0 <= r.hub_scaled <= HITS_SCALE for r in rows)
    assert all(r.hub == r.hub_scaled / float(HITS_SCALE) for r in rows)
    assert all(
        r.authority == r.auth_scaled / float(HITS_SCALE) for r in rows
    )
    # parity: rebuild the same directed edge set and replay the
    # integer walk exactly (arbitrary-precision Python == BIGINT DIV)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = {r.s_suppkey: r.s_nationkey
            for r in load_table(spark, sf_dir, "supplier").collect()}
    cust = {r.c_custkey: r.c_nationkey
            for r in load_table(spark, sf_dir, "customer").collect()}
    ok = {r.o_orderkey: r.o_custkey for r in orders.collect()}
    E = set()
    for r in li.collect():
        s, c = supp[r.l_suppkey], cust[ok[r.l_orderkey]]
        if s != c:
            E.add((s, c))
    nodes = sorted({x for e in E for x in e})
    into = {n: [s for s, c in E if c == n] for n in nodes}
    out = {n: [c for s, c in E if s == n] for n in nodes}
    h = {n: HITS_SCALE for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(HITS_ITERS):
        araw = {n: sum(h[u] for u in into[n]) for n in nodes}
        mxa = max(max(araw.values()), 1)
        a = {n: (araw[n] * HITS_SCALE) // mxa for n in nodes}
        hraw = {n: sum(a[v] for v in out[n]) for n in nodes}
        mxh = max(max(hraw.values()), 1)
        h = {n: (hraw[n] * HITS_SCALE) // mxh for n in nodes}
    got = {r.n_nationkey: (r.hub_scaled, r.auth_scaled) for r in rows}
    assert got == {n: (h[n], a[n]) for n in nodes}


