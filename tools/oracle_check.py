"""Local mirror of the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given
SF, compare row-count + column names + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
       [--strict] [--no-cache] [--write-cache]

--strict compares floats repr-exact (the driver's hash semantics)
and bypasses the lenient-normalized cache.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from timestream_travel_spark import get_spark
from timestream_travel_spark.tables import TABLES


def normalize(rows: list[tuple], cols: list[str], strict: bool = False) -> list[tuple]:
    """Sort columns by name, round floats, stringify, sort rows.

    strict=True mirrors the driver's hash semantics: floats compare
    repr-exact (bit-for-bit doubles), no 12-sig-digit fold and no
    -0.0/0.0 fold — the fold is how q_series_derivative's ulp-level
    round-half divergence passed this gate in r4 while the driver's
    exact hash caught it."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if strict:
                return repr(v)
            if v == 0.0:
                return "0"  # fold -0.0 and 0.0 together
            return f"{v:.12g}"
        return str(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out)


CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_cache")


def _fixture_fingerprint(sf_dir: str) -> str:
    """md5 over the parquet fixture bytes — a cached oracle result is
    only valid for the exact fixture data it was computed from."""
    import hashlib

    h = hashlib.md5()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
    return h.hexdigest()


def _cache_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(CACHE_DIR, tag, f"{name}.json.gz")


def _oracle_sql_md5(sql: str) -> str:
    import hashlib

    return hashlib.md5(sql.encode()).hexdigest()


def _cache_read(sf_dir: str, name: str, fingerprint: str, sql: str):
    """→ (cols, normalized_rows) or None. Stale fixture fingerprints
    miss; so do entries cached under a DIFFERENT oracle SQL (editing
    a query's oracle must invalidate its cache — the round-4 lesson:
    a failed compare once poisoned the cache for the fixed SQL).
    Entries WITHOUT a sql_md5 field are treated as stale too — the
    round-5 lesson: legacy leniency let pre-md5 caches survive oracle
    edits forever, producing false FAILs against current SQL (all
    remaining legacy entries were md5-stamped or purged in r5)."""
    import gzip
    import json

    p = _cache_path(sf_dir, name)
    if not os.path.exists(p):
        return None
    with gzip.open(p, "rt") as fh:
        blob = json.load(fh)
    if blob.get("fingerprint") != fingerprint:
        return None
    if blob.get("sql_md5") != _oracle_sql_md5(sql):
        return None
    return blob["cols"], [tuple(r) for r in blob["rows"]]


def _cache_write(
    sf_dir: str, name: str, fingerprint: str, sql: str, cols, norm_rows
) -> None:
    import gzip
    import json

    p = _cache_path(sf_dir, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with gzip.open(p, "wt") as fh:
        json.dump(
            {
                "fingerprint": fingerprint,
                "sql_md5": _oracle_sql_md5(sql),
                "cols": cols,
                "rows": norm_rows,
            },
            fh,
        )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    write_cache = "--write-cache" in flags
    strict = "--strict" in flags
    # cached rows are stored pre-normalized with the lenient fold, so
    # a strict run must recompute every oracle from DuckDB
    no_cache = "--no-cache" in flags or strict
    if strict:
        write_cache = False
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if "--staged" in flags:
        # also gate next-round queries that load_all() doesn't import
        # yet (registry.STAGED_MODULES) — they register on top of the
        # live surface for this process only
        from timestream_travel_spark import registry

        registry.load_staged()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fingerprint = _fixture_fingerprint(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(s_rows)} rows (no oracle) [{time.perf_counter()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        cached = (
            None if no_cache else _cache_read(sf_dir, name, fingerprint, oracles[name])
        )
        if cached is not None:
            d_cols, nd = cached
            d_rows = nd  # already normalized
            tag = " (cached oracle)"
        else:
            try:
                res = con.execute(oracles[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
            except Exception as e:
                print(f"FAIL {name}: duckdb error: {e}")
                n_fail += 1
                continue
            nd = normalize(d_rows, d_cols, strict=strict)
            tag = " (strict)" if strict else ""
            if write_cache:
                _cache_write(sf_dir, name, fingerprint, oracles[name], d_cols, nd)
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        else:
            ns = normalize(s_rows, s_cols, strict=strict)
            if ns != nd:
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                print(f"FAIL {name}: values differ, first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(s_rows)} rows [{time.perf_counter()-t0:.1f}s]{tag}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
