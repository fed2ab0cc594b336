"""SURVEY §5.6 recompute tests for the round-15 growth wave
(reference_domain.py): each query's full output recomputed in pure
Python (exact Decimal sums / replayed float compositions / exact
Fraction solves) and compared exactly."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal
from fractions import Fraction

from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table

registry.load_all()

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events").collect()


def test_interpolate_spline_recompute(spark):
    from timestream_travel_spark.operators.reference_domain import (
        SPLINE_KNOT_DOMS,
        _spline_moments,
    )

    rows = _events(spark)
    # exact daily sums (the dsum contract: DECIMAL accumulate, one
    # correctly-rounded cast to double)
    daily: dict[tuple, Decimal] = defaultdict(lambda: Decimal(0))
    for r in rows:
        day = r["ts"].strftime("%Y-%m-%d")
        daily[(r["event_type"], day)] += Decimal(repr(r["value"])).quantize(
            Decimal("1.0000")
        )
    series: dict[str, list] = defaultdict(list)
    for (t, day), s in daily.items():
        x = (
            __import__("datetime").date.fromisoformat(day)
            - __import__("datetime").date(1970, 1, 1)
        ).days
        series[t].append((x, day, float(s)))
    want = {}
    for t, pts in series.items():
        pts.sort()
        kn = [(x, y) for x, day, y in pts if int(day[8:10]) in SPLINE_KNOT_DOMS]
        if len(kn) < 2:
            continue
        xs = [p[0] for p in kn]
        ys = [p[1] for p in kn]
        m = _spline_moments(xs, ys)

        # independent exactness check: the float moments must sit
        # within 1e-9 relative of the EXACT Fraction tridiagonal
        # solution (not just replay the same rounding)
        n = len(xs)
        if n >= 3:
            h = [Fraction(xs[i + 1] - xs[i]) for i in range(n - 1)]
            a = [[Fraction(0)] * (n - 2) for _ in range(n - 2)]
            b = [Fraction(0)] * (n - 2)
            for j in range(n - 2):
                i = j + 1
                a[j][j] = 2 * (h[i - 1] + h[i])
                if j > 0:
                    a[j][j - 1] = h[i - 1]
                if j < n - 3:
                    a[j][j + 1] = h[i]
                b[j] = 6 * (
                    (Fraction(repr(ys[i + 1])) - Fraction(repr(ys[i]))) / h[i]
                    - (Fraction(repr(ys[i])) - Fraction(repr(ys[i - 1])))
                    / h[i - 1]
                )
            # Gaussian elimination on the exact tridiagonal system
            for j in range(1, n - 2):
                f = a[j][j - 1] / a[j - 1][j - 1]
                a[j][j] -= f * a[j - 1][j]
                b[j] -= f * b[j - 1]
            exact = [Fraction(0)] * (n - 2)
            for j in reversed(range(n - 2)):
                acc = b[j]
                if j < n - 3:
                    acc -= a[j][j + 1] * exact[j + 1]
                exact[j] = acc / a[j][j]
            for j in range(n - 2):
                e = float(exact[j])
                assert abs(m[j + 1] - e) <= 1e-9 * max(1.0, abs(e))

        for gx, gday, gy in pts:
            # locate interval (last knot closes its interval)
            for i in range(len(xs) - 1):
                lo, hi = xs[i], xs[i + 1]
                last = i + 2 == len(xs)
                if gx >= lo and (gx < hi or (last and gx <= hi)):
                    hh = float(hi - lo)
                    dx0 = float(gx - lo)
                    dx1 = float(hi - gx)
                    sp = (
                        m[i] * (dx1 * dx1 * dx1) / (6.0 * hh)
                        + m[i + 1] * (dx0 * dx0 * dx0) / (6.0 * hh)
                        + (ys[i] / hh - m[i] * hh / 6.0) * dx1
                        + (ys[i + 1] / hh - m[i + 1] * hh / 6.0) * dx0
                    )
                    want[(t, gday)] = (gy, sp)
                    break

    got = {
        (r["event_type"], r["day"]): (r["actual"], r["spline"])
        for r in QUERIES["q_interpolate_spline"](spark, SF).collect()
    }
    assert got == want  # bit-identical doubles
    # the spline interpolates: at knot days it reproduces the level
    # up to the documented cancellation (both engines share it)
    for (t, day), (actual, sp) in got.items():
        if int(day[8:10]) in SPLINE_KNOT_DOMS:
            assert abs(sp - actual) <= 1e-6 * max(1.0, abs(actual))


def test_interpolate_fill_recompute(spark):
    from timestream_travel_spark.operators.reference_domain import (
        FILL_CONST,
        FILL_FROM,
        FILL_TO,
    )
    import datetime as dt

    rows = [r for r in _events(spark) if r["event_type"] == "purchase"]
    last: dict[tuple, tuple] = {}
    users = set()
    for r in rows:
        users.add(r["user_id"])
        k = (r["user_id"], r["ts"].strftime("%Y-%m-%d"))
        cand = (r["ts"], r["event_id"], r["value"])
        if k not in last or cand[:2] > last[k][:2]:
            last[k] = cand
    d0 = dt.date.fromisoformat(FILL_FROM)
    d1 = dt.date.fromisoformat(FILL_TO)
    want = {}
    for u in users:
        d = d0
        while d <= d1:
            k = (u, d.isoformat())
            if k in last:
                want[k] = (last[k][2], 0)
            else:
                want[k] = (FILL_CONST, 1)
            d += dt.timedelta(days=1)
    got = {
        (r["user_id"], r["day"]): (r["filled"], r["is_fill"])
        for r in QUERIES["q_interpolate_fill"](spark, SF).collect()
    }
    assert got == want


def test_unload_export_recompute(spark):
    from timestream_travel_spark.operators.reference_domain import (
        UNLOAD_ROWS_PER_CHUNK,
    )

    def faithful(v):
        return "NULL" if v is None else str(v)

    rows = [r for r in _events(spark) if r["event_type"] is not None]
    by_part = defaultdict(list)
    for r in rows:
        by_part[r["event_type"]].append(r)
    want = {}
    for part, rs in by_part.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]), reverse=True)
        for ci in range(0, len(rs), UNLOAD_ROWS_PER_CHUNK):
            chunk = rs[ci : ci + UNLOAD_ROWS_PER_CHUNK]
            tss = [r["ts"] for r in chunk]
            mn, mx = min(tss), max(tss)
            nbytes = 0
            for r in chunk:
                line = (
                    '{"event_id":"%s","ts":"%s","user_id":"%s",'
                    '"event_type":"%s","value":"%s","props":%s}'
                    % (
                        faithful(r["event_id"]),
                        r["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                        faithful(r["user_id"]),
                        faithful(r["event_type"]),
                        faithful(r["value"]),
                        r["props"] if r["props"] is not None else "null",
                    )
                )
                nbytes += len(line) + 1
            key = "%s/%s/%s_%s.log.gz" % (
                part,
                mn.strftime("%Y%m%d"),
                mn.strftime("%Y%m%dT%H%M%S"),
                mx.strftime("%Y%m%dT%H%M%S"),
            )
            want[(part, ci // UNLOAD_ROWS_PER_CHUNK)] = (
                key,
                len(chunk),
                nbytes,
            )
    got = {
        (r["partition"], r["chunk"]): (
            r["object_key"],
            r["row_count"],
            r["payload_bytes"],
        )
        for r in QUERIES["q_unload_export"](spark, SF).collect()
    }
    assert got == want


def _docs(spark):
    return load_table(spark, SF, "documents").collect()


def test_boilerplate_lines_recompute(spark):
    from timestream_travel_spark.operators.llm_text33 import (
        BOILER_MAX_PCT,
        BOILER_MIN,
    )

    docs = _docs(spark)
    lines_per_doc: dict[int, list[str]] = {}
    occ: dict[tuple, int] = defaultdict(int)
    src_of = {}
    for r in docs:
        ws = r["text"].split(" ")
        ll = 4 + r["doc_id"] % 5
        ls = [
            " ".join(ws[i * ll : i * ll + ll])
            for i in range((len(ws) + ll - 1) // ll)
        ]
        lines_per_doc[r["doc_id"]] = ls
        src_of[r["doc_id"]] = r["source"]
        for ln in ls:
            occ[(r["source"], ln)] += 1
    want = {}
    for did, ls in lines_per_doc.items():
        nb = sum(1 for ln in ls if occ[(src_of[did], ln)] >= BOILER_MIN)
        want[did] = (
            len(ls),
            nb,
            1 if nb * 100 <= len(ls) * BOILER_MAX_PCT else 0,
        )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_boiler"], r["page_kept"])
        for r in QUERIES["q_boilerplate_lines"](spark, SF).collect()
    }
    assert got == want
    # the signal is non-degenerate: some boilerplate exists and not
    # every page is kept-with-zero
    assert any(v[1] > 0 for v in want.values())


def test_hash_split_recompute(spark):
    import hashlib

    from timestream_travel_spark.operators.llm_text33 import (
        SPLIT_TRAIN_END,
        SPLIT_VAL_END,
    )

    want: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in _docs(spark):
        b = int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16) % 100
        split = (
            "train"
            if b < SPLIT_TRAIN_END
            else ("val" if b < SPLIT_VAL_END else "test")
        )
        cell = want[(split, r["lang"])]
        cell[0] += 1
        cell[1] += len(r["text"].split(" "))
    got = {
        (r["split"], r["lang"]): [r["n_docs"], r["n_tokens"]]
        for r in QUERIES["q_hash_split"](spark, SF).collect()
    }
    assert got == dict(want)
    # all three splits materialize (hash spread sanity)
    assert {s for s, _ in got} == {"train", "val", "test"}


def test_dedup_vocab_set_recompute(spark):
    import hashlib

    by_fp: dict[str, list] = defaultdict(list)
    for r in _docs(spark):
        toks = r["text"].split(" ")
        fp = hashlib.md5(
            " ".join(sorted(set(toks))).encode()
        ).hexdigest()
        by_fp[fp].append(
            (
                r["doc_id"],
                len(toks),
                len(set(toks)),
                hashlib.md5(r["text"].encode()).hexdigest(),
            )
        )
    want = {}
    for fp, members in by_fp.items():
        if len(members) < 2:
            continue
        want[fp] = (
            len(members),
            min(m[0] for m in members),
            max(m[2] for m in members),
            sum(m[1] for m in members),
            len(members) - len({m[3] for m in members}),
        )
    got = {
        r["fp"]: (
            r["n_docs"],
            r["rep_doc"],
            r["vocab_size"],
            r["n_tokens"],
            r["n_exact_dups"],
        )
        for r in QUERIES["q_dedup_vocab_set"](spark, SF).collect()
    }
    assert got == want
    assert want  # non-degenerate: clusters exist at sf0.001


def test_graph_assortativity_recompute(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    supp = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, SF, "supplier").collect()
    }
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF, "customer").collect()
    }
    omap = {r["o_orderkey"]: r["o_custkey"] for r in orders.collect()}
    edges = set()
    for r in li.collect():
        sn = supp.get(r["l_suppkey"])
        cn = cust.get(omap.get(r["l_orderkey"]))
        if sn is None or cn is None or sn == cn:
            continue
        edges.add((min(sn, cn), max(sn, cn)))
    deg: dict[int, int] = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    m = len(edges)
    sjk = sum(deg[a] * deg[b] for a, b in edges)
    s1 = sum(deg[a] + deg[b] for a, b in edges)
    s2 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
    den = 2 * m * s2 - s1 * s1
    row = QUERIES["q_graph_assortativity"](spark, SF).collect()[0]
    assert (row["n_edges"], row["sum_jk"], row["sum_deg"], row["sum_sq"]) == (
        m,
        sjk,
        s1,
        s2,
    )
    if den == 0:
        assert row["assortativity"] is None
    else:
        from decimal import ROUND_HALF_UP, Decimal

        want_r = float(
            Decimal(repr((4 * m * sjk - s1 * s1) / den)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        )
        assert row["assortativity"] == want_r


def test_join_asof_tolerance_recompute(spark):
    import datetime as dt

    from timestream_travel_spark.operators.joins4 import ASOF_TOL_HOURS

    ev = _events(spark)
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    clicks = sorted(
        (r for r in ev if r["event_type"] == "click"),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    want = {}
    for p in purchases:
        best = None
        for c in clicks:
            if c["user_id"] == p["user_id"] and c["ts"] <= p["ts"]:
                best = c  # clicks sorted asc -> last qualifying wins
        if best is not None and best["ts"] >= p["ts"] - dt.timedelta(
            hours=ASOF_TOL_HOURS
        ):
            want[p["event_id"]] = (
                best["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                best["value"],
                1,
            )
        else:
            want[p["event_id"]] = (None, None, 0)
    got = {
        r["event_id"]: (r["click_ts"], r["click_value"], r["matched"])
        for r in QUERIES["q_join_asof_tolerance"](spark, SF).collect()
    }
    assert got == want
    # tolerance actually bites: both matched and unmatched rows exist
    assert {v[2] for v in want.values()} == {0, 1}
