"""SURVEY §5.6 sanity tests for the STAGED round-10 modules
(analytics12, timeseries21/22, graph6, llm_text24, similarity9) —
they register
next round; until then
pytest + `oracle_check --staged` are their gates. Each statistic is
pinned against a pure-Python recompute on the same fixture."""

from __future__ import annotations

import math
from collections import defaultdict

from timestream_travel_spark.registry import load_staged
from timestream_travel_spark.tables import load_table

load_staged()


def _daily_levels(spark, sf_dir):
    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    daily = defaultdict(float)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += round(r.value, 4)
    out = defaultdict(list)
    for (t, day) in sorted(daily):
        out[t].append(round(daily[(t, day)], 4))
    return out


def test_yule_q_matches_kappa_cells(spark, sf_dir):
    from timestream_travel_spark.operators.analytics11 import q_cohens_kappa
    from timestream_travel_spark.operators.analytics12 import q_yule_q

    kap = q_cohens_kappa(spark, sf_dir).collect()[0]
    yq = q_yule_q(spark, sf_dir).collect()[0]
    assert (yq.a, yq.b, yq.c, yq.d) == (kap.a, kap.b, kap.c, kap.d)
    want = (yq.a * yq.d - yq.b * yq.c) / (yq.a * yq.d + yq.b * yq.c)
    assert abs(yq.yule_q - want) < 1e-6 and -1 <= yq.yule_q <= 1


def test_kendalls_w_from_friedman(spark, sf_dir):
    from timestream_travel_spark.operators.analytics8 import q_friedman
    from timestream_travel_spark.operators.analytics12 import q_kendalls_w

    fr = q_friedman(spark, sf_dir).collect()[0]
    kw = q_kendalls_w(spark, sf_dir).collect()[0]
    assert (kw.n_blocks, kw.k) == (fr.n_blocks, fr.k)
    want = fr.chi2_f / (fr.n_blocks * (fr.k - 1))
    assert abs(kw.kendalls_w - want) < 1e-5
    assert 0 <= kw.kendalls_w <= 1


def test_sign_test_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics12 import (
        SIGN_A,
        SIGN_B,
        q_sign_test,
    )

    series = _daily_levels(spark, sf_dir)
    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    daily = defaultdict(float)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += round(r.value, 4)
    days = sorted({d for (t, d) in daily if t in (SIGN_A, SIGN_B)})
    pos = neg = 0
    for d in days:
        if (SIGN_A, d) in daily and (SIGN_B, d) in daily:
            va, vb = round(daily[(SIGN_A, d)], 4), round(daily[(SIGN_B, d)], 4)
            pos += va > vb
            neg += va < vb
    got = q_sign_test(spark, sf_dir).collect()[0]
    assert (got.n_pos, got.n_neg) == (pos, neg)
    m = pos + neg
    assert abs(got.z - (2 * pos - m) / math.sqrt(m)) < 1e-6
    assert series  # fixture sanity


def test_variance_ratio_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics12 import VR_Q, q_variance_ratio

    series = _daily_levels(spark, sf_dir)
    got = {r.event_type: r for r in q_variance_ratio(spark, sf_dir).collect()}
    for t, xs in series.items():
        d1 = [xs[i + 1] - xs[i] for i in range(len(xs) - 1)]
        dq = [xs[i + VR_Q] - xs[i] for i in range(len(xs) - VR_Q)]
        var = lambda d: sum(x * x for x in d) / len(d) - (sum(d) / len(d)) ** 2  # noqa: E731
        want = var(dq) / (VR_Q * var(d1))
        assert abs(got[t].vr - want) < 1e-4, (t, got[t].vr, want)
        assert got[t].n_1 == len(d1) and got[t].n_q == len(dq)


def test_distribution_distances_recompute(spark, sf_dir):
    from collections import Counter

    from timestream_travel_spark.operators.analytics12 import (
        q_distribution_distances,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    wc = defaultdict(Counter)
    for r in docs:
        wc[r.source].update(r.text.strip().split())
    got = {
        (r.source_a, r.source_b): r
        for r in q_distribution_distances(spark, sf_dir).collect()
    }
    srcs = sorted(wc)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            na, nb = sum(wc[sa].values()), sum(wc[sb].values())
            vocab = set(wc[sa]) | set(wc[sb])
            bc = sum(
                math.sqrt(wc[sa][w] * wc[sb][w] / (na * nb)) for w in vocab
            )
            tv = sum(abs(wc[sa][w] / na - wc[sb][w] / nb) for w in vocab) / 2
            r = got[(sa, sb)]
            assert abs(r.bhattacharyya - bc) < 1e-4
            assert abs(r.hellinger - math.sqrt(max(1 - bc, 0))) < 1e-4
            assert abs(r.total_variation - tv) < 1e-4
            assert 0 <= r.hellinger <= 1 and 0 <= r.total_variation <= 1


def test_yule_walker_recompute(spark, sf_dir):
    import numpy as np

    from timestream_travel_spark.operators.timeseries21 import q_yule_walker_ar2

    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    hourly = defaultdict(float)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += round(
            r.value, 4
        )
    series = defaultdict(list)
    for (t, h) in sorted(hourly):
        series[t].append(round(hourly[(t, h)], 4))
    got = {r.event_type: r for r in q_yule_walker_ar2(spark, sf_dir).collect()}
    for t, xs in series.items():
        x = np.asarray(xs) - np.mean(xs)
        c0 = float(x @ x)
        c1 = float(x[1:] @ x[:-1])
        c2 = float(x[2:] @ x[:-2])
        r1, r2 = c1 / c0, c2 / c0
        g = got[t]
        assert abs(g.r1 - r1) < 1e-4 and abs(g.r2 - r2) < 1e-4
        assert abs(g.phi2_pacf2 - (r2 - r1 * r1) / (1 - r1 * r1)) < 1e-4
        assert abs(g.phi1 - r1 * (1 - r2) / (1 - r1 * r1)) < 1e-4


def test_allan_variance_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries21 import (
        ALLAN_BLOCKS,
        q_allan_variance,
    )

    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    hourly = defaultdict(float)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += round(
            r.value, 4
        )
    series = defaultdict(list)
    for (t, h) in sorted(hourly):
        series[t].append(round(hourly[(t, h)], 4))
    got = {(r.event_type, r.tau_hours): r
           for r in q_allan_variance(spark, sf_dir).collect()}
    for t, xs in series.items():
        for b in ALLAN_BLOCKS:
            means = [
                sum(xs[i : i + b]) / b for i in range(0, len(xs) - b + 1, b)
            ]
            if len(means) < 2:
                continue
            av = sum(
                (means[i + 1] - means[i]) ** 2 for i in range(len(means) - 1)
            ) / (2 * (len(means) - 1))
            r = got[(t, b)]
            assert r.n_pairs == len(means) - 1
            assert abs(r.avar - av) < max(1e-3, abs(av) * 1e-5), (t, b, r.avar, av)


def test_katz_petrosian_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries21 import q_katz_petrosian_fd

    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    hourly = defaultdict(float)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += round(
            r.value, 4
        )
    series = defaultdict(list)
    for (t, h) in sorted(hourly):
        series[t].append(round(hourly[(t, h)], 4))
    got = {r.event_type: r for r in q_katz_petrosian_fd(spark, sf_dir).collect()}
    for t, xs in series.items():
        n = len(xs)
        L = sum(abs(xs[i] - xs[i - 1]) for i in range(1, n))
        d = max(abs(x - xs[0]) for x in xs)
        diffs = [xs[i] - xs[i - 1] for i in range(1, n)]
        nd = sum(
            1 for i in range(1, len(diffs)) if diffs[i] * diffs[i - 1] < 0
        )
        katz = math.log10(n - 1) / (math.log10(n - 1) + math.log10(d / L))
        pet = math.log10(n) / (math.log10(n) + math.log10(n / (n + 0.4 * nd)))
        g = got[t]
        assert g.n_sign_changes == nd
        assert abs(g.katz_fd - katz) < 1e-4
        assert abs(g.petrosian_fd - pet) < 1e-5


def test_money_flow_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc
    from timestream_travel_spark.operators.timeseries21 import (
        CMF_W,
        q_accumulation_distribution,
        q_chaikin_money_flow,
    )

    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type"
    ).collect()
    vol = defaultdict(int)
    for r in rows:
        vol[(r.event_type, r.ts.date())] += 1
    ohlc = defaultdict(list)
    for r in sorted(_daily_ohlc(spark, sf_dir).collect(), key=lambda r: (r.t, r.day)):
        ohlc[r.t].append((r.day.date(), float(r.hi), float(r.lo), float(r.cl)))
    ad = {(r.event_type, r.day): r.ad_line
          for r in q_accumulation_distribution(spark, sf_dir).collect()}
    cmf = {(r.event_type, r.day): r.cmf
           for r in q_chaikin_money_flow(spark, sf_dir).collect()}
    assert ad and cmf
    for t, days in ohlc.items():
        mfvs = []
        vols = []
        run = 0.0
        for day, hi, lo, cl in days:
            v = vol[(t, day)]
            mfv = 0.0 if hi == lo else v * (2 * cl - hi - lo) / (hi - lo)
            mfvs.append(mfv)
            vols.append(v)
            run += mfv
            key = (t, str(day))
            assert abs(ad[key] - run) < 2e-4 * max(1, len(mfvs))
            if len(mfvs) >= CMF_W:
                want = sum(mfvs[-CMF_W:]) / sum(vols[-CMF_W:])
                assert abs(cmf[key] - want) < 1e-4


def test_link_predictors_recompute(spark, sf_dir):
    import math
    from collections import defaultdict

    from timestream_travel_spark.operators.graph4 import trade_edges
    from timestream_travel_spark.operators.graph6 import q_link_predictors

    edges = {(r.a, r.b) for r in trade_edges(spark, sf_dir).collect()}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    names = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    scored = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            ra = sum(1 / len(adj[z]) for z in common)
            scored[(names[a], names[b])] = (
                len(common), ra, len(adj[a]) * len(adj[b])
            )
    got = q_link_predictors(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        cn, ra, pa = scored[(r.nation_a, r.nation_b)]
        assert r.common_neighbors == cn
        assert abs(r.resource_allocation - ra) < 1e-5
        assert r.preferential_attachment == pa
    # ordering: descending RA with name tiebreak
    ras = [(-r.resource_allocation, r.nation_a, r.nation_b) for r in got]
    assert ras == sorted(ras)
    assert math.isfinite(got[0].resource_allocation)


def test_repetition_panel_planted(spark, tmp_path):
    from timestream_travel_spark.operators.llm_text24 import q_repetition_panel

    rows = [
        # spam: one word dominates and every bigram repeats
        (1, "spam spam spam spam spam spam spam spam", "s0", "en", 40),
        # clean: all-distinct tokens
        (2, "alpha beta gamma delta epsilon zeta eta theta", "s0", "en", 46),
        # borderline: one repeated trigram in otherwise-unique text
        (3, "one two three one two three four five six seven", "s0", "en", 48),
    ]
    sf = str(tmp_path / "sf_rep")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, source string, lang string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in q_repetition_panel(spark, sf).collect()}
    assert out[1].top_word_frac == 1.0 and out[1].rep_pass == 0
    assert out[1].dup_bigram_frac == round(6 / 7, 6)  # 7 bigrams, 1 distinct
    assert out[2].top_word_frac == 0.125
    assert out[2].dup_bigram_frac == 0.0 and out[2].dup_trigram_frac == 0.0
    assert out[2].rep_pass == 1
    # doc 3: 10 words; 'one two three' appears twice -> 8 trigrams, 7
    # distinct -> dup_trigram_frac = 1/8
    assert out[3].dup_trigram_frac == 0.125
    assert out[3].top_word_frac == 0.2


def test_hjorth_and_signal_shape_recompute(spark, sf_dir):
    import numpy as np

    from timestream_travel_spark.operators.timeseries22 import (
        q_hjorth_parameters,
        q_zero_crossing_crest,
    )

    rows = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect()
    hourly = defaultdict(float)
    for r in rows:
        hourly[(r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))] += round(
            r.value, 4
        )
    series = defaultdict(list)
    for (t, h) in sorted(hourly):
        series[t].append(round(hourly[(t, h)], 4))
    hj = {r.event_type: r for r in q_hjorth_parameters(spark, sf_dir).collect()}
    zc = {r.event_type: r for r in q_zero_crossing_crest(spark, sf_dir).collect()}
    for t, xs in series.items():
        x = np.asarray(xs, dtype=np.float64)
        e = x - x.mean()
        d1 = np.diff(e)
        d2 = np.diff(e, 2)
        v0 = float((e * e).mean())
        v1 = float((d1 * d1).mean())
        v2 = float((d2 * d2).mean())
        g = hj[t]
        assert abs(g.activity - v0) < max(1e-3, v0 * 1e-4)
        assert abs(g.mobility - math.sqrt(v1 / v0)) < 1e-4
        assert abs(g.complexity - math.sqrt(v2 / v1) / math.sqrt(v1 / v0)) < 1e-4
        crossings = int(np.sum(e[1:] * e[:-1] < 0))
        z = zc[t]
        assert z.crossings == crossings
        assert abs(z.zcr - crossings / (len(e) - 1)) < 1e-6
        assert abs(z.crest_factor - np.abs(e).max() / math.sqrt(v0)) < 1e-4


def test_mfi_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries15 import _daily_ohlc
    from timestream_travel_spark.operators.timeseries22 import MFI_W, q_mfi

    rows = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    vol = defaultdict(int)
    for r in rows:
        vol[(r.event_type, r.ts.date())] += 1
    ohlc = defaultdict(list)
    for r in sorted(_daily_ohlc(spark, sf_dir).collect(), key=lambda r: (r.t, r.day)):
        ohlc[r.t].append((r.day.date(), float(r.hi), float(r.lo), float(r.cl)))
    got = {(r.event_type, r.day): r.mfi for r in q_mfi(spark, sf_dir).collect()}
    assert got
    for t, days in ohlc.items():
        pos, neg = [], []
        prev = None
        for day, hi, lo, cl in days:
            tp3 = hi + lo + cl
            v = vol[(t, day)]
            p = n = 0.0
            if prev is not None:
                if tp3 > prev:
                    p = tp3 * v
                elif tp3 < prev:
                    n = tp3 * v
            pos.append(p)
            neg.append(n)
            prev = tp3
            i = len(pos)
            if i > MFI_W:  # window of MFI_W rows with a previous TP each
                sp = sum(pos[i - MFI_W : i])
                sn = sum(neg[i - MFI_W : i])
                if sp + sn > 0:
                    want = 100.0 * sp / (sp + sn)
                    assert abs(got[(t, str(day))] - want) < 1e-3, (t, day)
                    assert 0.0 <= got[(t, str(day))] <= 100.0


def test_opq_ivfpq_recall_and_mse_gain(spark, sf_dir):
    import numpy as np

    from timestream_travel_spark.operators.similarity import _query_vec
    from timestream_travel_spark.operators.similarity9 import (
        q_opq_ivfpq_mse_gain,
        q_opq_ivfpq_topk,
    )

    row = q_opq_ivfpq_mse_gain(spark, sf_dir).collect()[0]
    # rotation trains from the plain residual solution on the same
    # objective -> nonnegative by construction, material in practice
    assert row.opq_ivfpq_mse <= row.ivfpq_mse + 1e-9, row
    assert row.gain_pct > 1.0, row
    approx = [r.vec_id for r in q_opq_ivfpq_topk(spark, sf_dir).collect()]
    assert len(approx) == 10
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = np.asarray(_query_vec(spark, sf_dir))
    d = {
        r.vec_id: float(np.sum((np.asarray(r.embedding, dtype=np.float64) - q) ** 2))
        for r in emb
        if r.vec_id != 0
    }
    exact = [k for k, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:10]]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"OPQ-IVFADC recall too low: {recall}"
    got = {r.vec_id: r.l2sq for r in q_opq_ivfpq_topk(spark, sf_dir).collect()}
    for vid, l2 in got.items():  # exact re-rank reports true distances
        assert abs(l2 - d[vid]) < 1e-4


def test_dunning_keyness_recompute(spark, sf_dir):
    from collections import Counter

    from timestream_travel_spark.operators.llm_text25 import (
        KEY_A,
        KEY_B,
        q_dunning_keyness,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    ca, cb = Counter(), Counter()
    for r in docs:
        if r.source == KEY_A:
            ca.update(r.text.strip().split())
        elif r.source == KEY_B:
            cb.update(r.text.strip().split())
    na, nb = sum(ca.values()), sum(cb.values())

    def g2(a, b):
        t = 0.0
        if a:
            t += a * math.log(a)
        if b:
            t += b * math.log(b)
        t -= (a + b) * math.log(a + b)
        t += (a + b) * math.log(na + nb)
        t -= a * math.log(na)
        t -= b * math.log(nb)
        return 2 * t

    got = q_dunning_keyness(spark, sf_dir).collect()
    assert len(got) > 0
    for r in got:
        a, b = ca[r.word], cb[r.word]
        assert (r.count_a, r.count_b) == (a, b)
        assert abs(r.g2 - g2(a, b)) < 1e-3
        assert r.keyword_of == (KEY_A if a * nb > b * na else KEY_B)
        assert r.g2 >= 0 - 1e-9
    # descending with word tiebreak
    order = [(-r.g2, r.word) for r in got]
    assert order == sorted(order)


def test_burstiness_and_dispersion_recompute(spark, sf_dir):
    from collections import Counter

    from timestream_travel_spark.operators.llm_text25 import (
        BURST_MIN_DOCS,
        DISP_MIN_N,
        DISP_SLICES,
        q_juilland_dispersion,
        q_word_burstiness,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    nd = len(docs)
    percnt = {}
    for r in docs:
        percnt[r.doc_id] = Counter(r.text.strip().split())
    # burstiness
    agg = {}
    for did, c in percnt.items():
        for w, k in c.items():
            s, q, df = agg.get(w, (0, 0, 0))
            agg[w] = (s + k, q + k * k, df + 1)
    got = q_word_burstiness(spark, sf_dir).collect()
    assert got
    for r in got:
        s, q, df = agg[r.word]
        assert (r.n_occurrences, r.n_docs_with) == (s, df)
        assert df >= BURST_MIN_DOCS
        mean = s / nd
        vmr = (q / nd - mean * mean) / mean
        assert abs(r.vmr - vmr) < 1e-4
        assert r.vmr > 0
    # dispersion
    sl = {}
    for did, c in percnt.items():
        for w, k in c.items():
            key = (w, did % DISP_SLICES)
            sl[key] = sl.get(key, 0) + k
    per_w = {}
    for (w, s_), k in sl.items():
        n, q = per_w.get(w, (0, 0))
        per_w[w] = (n + k, q + k * k)
    dd = q_juilland_dispersion(spark, sf_dir).collect()
    assert dd
    for r in dd:
        n, q = per_w[r.word]
        assert n >= DISP_MIN_N and r.n_occurrences == n
        cv2 = max(DISP_SLICES * q / (n * n) - 1.0, 0.0)
        want = 1.0 - math.sqrt(cv2) / math.sqrt(DISP_SLICES - 1)
        assert abs(r.juilland_d - want) < 1e-4
        assert 0.0 <= r.juilland_d <= 1.0
