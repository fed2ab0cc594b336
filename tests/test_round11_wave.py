"""Round-11 promotion tests: (1) the two formerly-dark modules
(analytics14, timeseries24 — the r10 verdict's 'What's wrong #1')
now registered in load_all()'s round-11 tail, each query pinned
against a pure-Python recompute on the same fixture; (2) the
registry-contract hole closed — every operator module that defines
an @query MUST be reachable via load_all() or STAGED_MODULES; (3)
the rows-only rotation invariant (r10 verdict 'What's wrong #2') —
an expired rows-only query must lead the queries() ordering so the
driver's capped drain re-checks it next round."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import pytest

from timestream_travel_spark.registry import QUERIES
from timestream_travel_spark.tables import load_table


# ------------------------------------------------------- contract
def test_no_query_module_outside_registry():
    """Every module under operators/ that defines an @query must be
    imported by load_all() or named in STAGED_MODULES — closes the
    hole where written-but-unwired query code passes the doc-sync
    guard vacuously (r10 verdict 'What's wrong #1')."""
    import ast
    import os

    import timestream_travel_spark.registry as regmod

    reg_path = regmod.__file__
    tree = ast.parse(open(reg_path).read())
    wired: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.endswith("operators")
        ):
            wired.update(a.name for a in node.names)
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "STAGED_MODULES":
                    wired.update(ast.literal_eval(node.value))
        if (
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Name)
            and node.target.id == "STAGED_MODULES"
            and node.value is not None
        ):
            wired.update(ast.literal_eval(node.value))
    ops_dir = os.path.join(os.path.dirname(reg_path), "operators")
    dark = []
    for fname in sorted(os.listdir(ops_dir)):
        if not fname.endswith(".py") or fname == "__init__.py":
            continue
        mod = fname[:-3]
        if "@query(" in open(os.path.join(ops_dir, fname)).read():
            if mod not in wired:
                dark.append(mod)
    assert dark == [], f"@query modules reachable by nothing: {dark}"


def test_rows_only_rotation_invariant():
    """A rows-only query whose latest executed-ok driver row has
    expired (older than ROWS_ONLY_COVER_ROUNDS) must appear in the
    leading segment of queries() — before every driver-green query
    and inside the driver's ~50-slot drain — so it is re-checked
    next round. q_ivfpq_topk slipped the r10 window (last row r08);
    this pins the mechanism that rotates it back in."""
    import glob
    import json
    import os

    import __spark_entry__ as entrymod

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not paths:
        pytest.skip("no driver ledger files present")
    recent = set(paths[-entrymod.ROWS_ONLY_COVER_ROUNDS:])
    last_ok: dict[str, str] = {}
    for path in paths:
        rows = json.load(open(path))
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("spark_rows") is not None:
                last_ok[name] = path
    from timestream_travel_spark.registry import ORACLES

    ordered = list(entrymod.queries())
    green = entrymod._driver_green_keys()
    rows_only = [n for n in QUERIES if n not in ORACLES]
    expired = [
        n for n in rows_only if n in last_ok and last_ok[n] not in recent
    ]
    first_green = next(
        (i for i, n in enumerate(ordered) if n in green), len(ordered)
    )
    for name in expired:
        pos = ordered.index(name)
        assert pos < first_green, (
            f"expired rows-only {name} at {pos} trails a green query"
        )
        assert pos < 50, f"expired rows-only {name} outside the drain cap"
    # never-checked queries lead too (same mechanism, stronger need)
    for name in QUERIES:
        if name not in last_ok:
            assert ordered.index(name) < first_green


def test_exactly_once_replay_scrubs_leaked_tmp(spark, tmp_path):
    """A crash after the marker write but before the final staging
    cleanup must not leak `_epoch-<id>.tmp` forever: the replay path
    scrubs it on the marker-exists early return (r10 ADVICE #2)."""
    import os

    from timestream_travel_spark.streaming.index_maintain import (
        _commit_batch_exactly_once,
    )

    table = str(tmp_path / "tbl")
    df = spark.range(5).selectExpr("id")
    assert _commit_batch_exactly_once(df, table, 7) is True
    # simulate the crash window: marker exists, staging dir left over
    tmp = os.path.join(table, "_epoch-7.tmp")
    os.makedirs(tmp, exist_ok=True)
    assert _commit_batch_exactly_once(df, table, 7) is False
    assert not os.path.isdir(tmp)
    assert len(spark.read.parquet(table).collect()) == 5


# ------------------------------------------------- shared fixtures
def _daily_levels(spark, sf_dir):
    """(event_type -> [(day, v), ...] day-sorted), v = exact Decimal
    daily sum of value quantized to 4dp — mirrors _daily/_DAILY_SQL."""
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
        out[t].append((day, daily[(t, day)]))
    return out


# ---------------------------------------------------- analytics14
def test_kendall_tau_b_census_and_formula(spark, sf_dir):
    """tau-b shares q_somers_d's exact pair census; the statistic is
    the tie-symmetric composition of the same four integers."""
    sd = QUERIES["q_somers_d"](spark, sf_dir).collect()[0]
    tb = QUERIES["q_kendall_tau_b"](spark, sf_dir).collect()[0]
    assert (tb.c_pairs, tb.d_pairs, tb.ty_pairs, tb.tx_pairs) == (
        sd.c_pairs,
        sd.d_pairs,
        sd.ty_pairs,
        sd.tx_pairs,
    )
    c, d, tx, ty = tb.c_pairs, tb.d_pairs, tb.tx_pairs, tb.ty_pairs
    want = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    assert tb.tau_b == pytest.approx(round(want, 6), abs=1e-9)
    assert -1.0 <= tb.tau_b <= 1.0


def test_quade_recompute(spark, sf_dir):
    """Pure-Python Quade F over complete days × event types with
    fractional midranks (the query's doubled-rank discipline is an
    integer-exact encoding of the same statistic)."""
    levels = _daily_levels(spark, sf_dir)
    k = len(levels)
    by_day = defaultdict(dict)
    for t, series in levels.items():
        for day, v in series:
            by_day[day][t] = v
    full = {d: m for d, m in by_day.items() if len(m) == k}

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2.0 + 1.0
            for p in range(i, j + 1):
                r[order[p]] = mr
            i = j + 1
        return r

    days = sorted(full)
    types = sorted(levels)
    ranges = [max(full[d].values()) - min(full[d].values()) for d in days]
    q = midranks(ranges)
    s = defaultdict(float)
    a2 = 0.0
    for di, d in enumerate(days):
        r = midranks([full[d][t] for t in types])
        for ti, t in enumerate(types):
            sij = q[di] * (r[ti] - (k + 1) / 2.0)
            s[t] += sij
            a2 += sij * sij
    b = len(days)
    bsum = sum(v * v for v in s.values()) / b
    want = (b - 1) * bsum / (a2 - bsum)
    row = QUERIES["q_quade_test"](spark, sf_dir).collect()[0]
    assert (row.n_blocks, row.k) == (b, k)
    assert row.quade_f == pytest.approx(want, rel=1e-5)


def test_point_biserial_recompute(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    )
    g = {}
    x = defaultdict(Decimal)
    for r in rows:
        key = (r.user_id, r.ts.date())
        x[key] += Decimal(str(round(r.value, 4)))
        g[key] = g.get(key, 0) or int(r.event_type == "click")
    n = len(x)
    n1 = sum(g.values())
    xs = [float(v) for v in x.values()]
    m1 = sum(float(x[k]) for k in x if g[k]) / n1
    m0 = sum(float(x[k]) for k in x if not g[k]) / (n - n1)
    mean = sum(xs) / n
    sd = math.sqrt(sum(v * v for v in xs) / n - mean * mean)
    want = (m1 - m0) / sd * math.sqrt(n1 * (n - n1) / (n * n))
    row = QUERIES["q_point_biserial"](spark, sf_dir).collect()[0]
    assert (row.n_units, row.n_pos) == (n, n1)
    assert row.r_pb == pytest.approx(want, abs=1e-5)
    assert -1.0 <= row.r_pb <= 1.0


def test_partial_corr_recompute(spark, sf_dir):
    from timestream_travel_spark.operators.analytics14 import PC_X, PC_Y, PC_Z

    levels = _daily_levels(spark, sf_dir)
    by_day = defaultdict(dict)
    for t in (PC_X, PC_Y, PC_Z):
        for day, v in levels[t]:
            by_day[day][t] = float(v)
    grid = [m for _, m in sorted(by_day.items()) if len(m) == 3]

    def pearson(a, b):
        n = len(grid)
        sa = sum(m[a] for m in grid)
        sb = sum(m[b] for m in grid)
        sab = sum(m[a] * m[b] for m in grid)
        saa = sum(m[a] * m[a] for m in grid)
        sbb = sum(m[b] * m[b] for m in grid)
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    rxy, rxz, ryz = (
        pearson(PC_X, PC_Y),
        pearson(PC_X, PC_Z),
        pearson(PC_Y, PC_Z),
    )
    want = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    row = QUERIES["q_partial_corr"](spark, sf_dir).collect()[0]
    assert row.n_days == len(grid)
    assert row.r_xy == pytest.approx(rxy, abs=1e-5)
    assert row.r_xy_z == pytest.approx(want, abs=1e-5)
    assert -1.0 <= row.r_xy_z <= 1.0


# --------------------------------------------------- timeseries24
def test_trix_pure_python_walk(spark, sf_dir):
    """The triple-EMA walk replayed in pure Python is the same IEEE
    sequence the mapInPandas carry-state runs (q_macd contract)."""
    from timestream_travel_spark.operators.timeseries24 import TRIX_A

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        e1 = e2 = e3 = float(series[0][1])
        want[(t, str(series[0][0]))] = (e3, None)
        for day, v in series[1:]:
            prev3 = e3
            x = float(v)
            e1 = (1 - TRIX_A) * e1 + TRIX_A * x
            e2 = (1 - TRIX_A) * e2 + TRIX_A * e1
            e3 = (1 - TRIX_A) * e3 + TRIX_A * e2
            trix = 100.0 * (e3 - prev3) / prev3 if prev3 != 0.0 else None
            want[(t, str(day))] = (e3, trix)
    got = QUERIES["q_trix"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        we3, wtrix = want[(r.event_type, r.day)]
        assert r.e3 == we3  # bit-exact: identical IEEE op sequence
        assert r.trix == wtrix


def test_ppo_pure_python_walk(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries24 import (
        PPO_FAST_A,
        PPO_SLOW_A,
    )

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        ef = es = float(series[0][1])
        want[(t, str(series[0][0]))] = (
            100.0 * (ef - es) / es if es != 0.0 else None
        )
        for day, v in series[1:]:
            x = float(v)
            ef = (1 - PPO_FAST_A) * ef + PPO_FAST_A * x
            es = (1 - PPO_SLOW_A) * es + PPO_SLOW_A * x
            want[(t, str(day))] = 100.0 * (ef - es) / es if es != 0.0 else None
    got = QUERIES["q_ppo"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.ppo == want[(r.event_type, r.day)]


def test_psy_line_integer_census(spark, sf_dir):
    from timestream_travel_spark.operators.timeseries24 import PSY_W

    levels = _daily_levels(spark, sf_dir)
    want = {}
    for t, series in levels.items():
        ups = [
            1 if series[i][1] > series[i - 1][1] else 0
            for i in range(1, len(series))
        ]
        days = [series[i][0] for i in range(1, len(series))]
        for i in range(PSY_W - 1, len(ups)):
            n_up = sum(ups[i - PSY_W + 1 : i + 1])
            want[(t, str(days[i]))] = n_up
    got = QUERIES["q_psy_line"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        n_up = want[(r.event_type, r.day)]
        assert r.n_up == n_up
        assert r.psy == pytest.approx(round(100.0 * n_up / PSY_W, 6))
