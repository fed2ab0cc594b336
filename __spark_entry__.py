"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship reference-shaped query on sf0.001.
queries()      — named-query registry (SURVEY.md §2 Part B surface).
oracle_sql()   — DuckDB oracle SQL for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timestream_travel_spark import registry

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the backup-export
    chunk manifest over events (SURVEY.md §7 minimum slice)."""
    from timestream_travel_spark.registry import QUERIES

    return QUERIES["q_backup_manifest"](spark, "/root/testdata/sf0.001")


# Rows-only coverage (no oracle — the driver only records that the
# Spark side executed) expires after this many rounds, so a
# later-broken rows-only query rotates back into the capped driver's
# verification slots instead of being counted covered forever.
ROWS_ONLY_COVER_ROUNDS = 2


def _driver_green_keys() -> set[str]:
    """Query names considered driver-covered: a fully green
    rows+schema+hash row in ANY prior CORRECTNESS_r*.json (hash green
    is strong evidence and regressions are caught by the local pytest
    gate), plus rows-only (no_oracle) rows — but those only from the
    last ROWS_ONLY_COVER_ROUNDS files, so their weaker executed-ok
    check is re-run periodically.

    A no_oracle row counts ONLY while the query is still oracle-less
    in the live registry: after a rows-only→oracled conversion the
    stale executed-ok row is not hash evidence, so the conversion
    queues for its first hash row immediately (the r14 verdict's
    conversion-without-coverage gap — q_hits_hubs_authorities'
    recent r13 rows-only row was masking it from the r15 queue)."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    recent = set(paths[-ROWS_ONLY_COVER_ROUNDS:])
    green: set[str] = set()
    for path in paths:
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            ok = (
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            ) or (
                err == "no_oracle"
                and name not in registry.ORACLES
                and row.get("spark_rows") is not None
                and path in recent
            )
            if ok:
                green.add(name)
    return green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ordered so queries WITHOUT a driver-green CORRECTNESS
    row lead — a capped driver harness then always verifies genuinely
    unverified queries first (generated, not hand-maintained).

    Within the unchecked set, ROWS-ONLY queries lead oracled ones.
    Rows-only coverage expires after ROWS_ONLY_COVER_ROUNDS, so the
    unchecked rows-only set is exactly the rotation debt (expired +
    never-checked); putting it first guarantees the expiry invariant
    stays true of the ledger even when a large new oracled wave plus
    the debt exceeds the driver's slot cap — the debt is small and
    bounded (≤ the rows-only additions of recent rounds) while a new
    oracled query merely waits one extra round for its hash row.
    (Round 9 ordered oracled-first and 9 rows-only rows fell out of
    their re-check window — the r9 verdict's 'What's wrong #1'.)"""
    green = _driver_green_keys()
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in registry.QUERIES.items():
        if name not in green and name not in registry.ORACLES:
            ordered[name] = fn
    for name, fn in registry.QUERIES.items():
        if name not in green:
            ordered.setdefault(name, fn)
    for name, fn in registry.QUERIES.items():
        ordered.setdefault(name, fn)
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
