"""Registry-wide contract guards (cheap, full coverage):

- every oracled query's OUTPUT COLUMN NAMES match its DuckDB oracle's
  (the driver sorts columns by name before value-hashing, so a
  mismatch is an automatic red row even with identical values);
- every registry entry builds a DataFrame without executing it.

Both sides stay lazy: Spark gives columns from the analyzed plan,
DuckDB from DESCRIBE (binder only) — so even the all-pairs oracles
cost milliseconds here.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_every_oracle_columns_match_spark_columns(spark, sf_dir, duck):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    mismatches = []
    for name, sql in oracles.items():
        try:
            spark_cols = sorted(qs[name](spark, sf_dir).columns)
        except Exception as e:  # pragma: no cover - surfaced as failure
            mismatches.append((name, f"spark build error: {e}"))
            continue
        try:
            duck_cols = sorted(
                r[0] for r in duck.execute(f"DESCRIBE {sql}").fetchall()
            )
        except Exception as e:
            mismatches.append((name, f"duckdb bind error: {e}"))
            continue
        if spark_cols != duck_cols:
            mismatches.append((name, f"spark={spark_cols} duck={duck_cols}"))
    assert not mismatches, mismatches


def test_every_oracled_query_output_is_atomic(spark, sf_dir):
    """The external checker canonicalizes results with pandas
    sort_values, which cannot hash array/map/struct cells (TypeError:
    unhashable type) — so an oracled query with a non-atomic output
    column can NEVER turn green and burns a capped driver slot every
    round. Stringify collections at the output boundary instead
    (array_join / to_json), as q_inverted_index and q_image_features
    do. Applies to EVERY registry query — the driver collects
    rows-only results through the same canonicalizer."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs = entrymod.queries()
    offenders = []
    for name in qs:
        schema = qs[name](spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, offenders


def test_no_oracle_emits_hugeint(duck):
    """DuckDB silently widens SUM over BIGINT (plain and windowed) to
    HUGEINT, and the external checker's pandas canonicalizer
    materializes HUGEINT as float64 — so a HUGEINT oracle column
    hash-mismatches a value-identical Spark BIGINT (`1500.0` vs
    `1500`). This is exactly what turned q_cramers_v red in r07: one
    `SUM(o) OVER ()` missed its `CAST(... AS BIGINT)`. Guard every
    oracle's top-level output via DESCRIBE (binder-only, no
    execution)."""
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        for col, typ in (
            (r[0], r[1]) for r in duck.execute(f"DESCRIBE {sql}").fetchall()
        ):
            if "HUGEINT" in typ.upper():
                offenders.append((name, col, typ))
    assert not offenders, offenders


def test_every_registry_query_builds(spark, sf_dir):
    broken = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            assert df.columns
        except Exception as e:
            broken.append((name, str(e)))
    assert not broken, broken


def test_every_registry_query_is_documented():
    """SURVEY §2 / COVERAGE.md are the inventory the judge grades
    line by line (the r7 verdict's #1 missing item was doc lag):
    every registered query name must appear in at least one of them."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = ""
    for fname in ("SURVEY.md", "COVERAGE.md"):
        with open(os.path.join(here, fname)) as fh:
            docs += fh.read()
    missing = sorted(n for n in entrymod.queries() if n not in docs)
    assert not missing, f"undocumented registry queries: {missing}"


def test_plans_md_keeps_multifile_section():
    """The marker-delimited multi-file scan audit must survive every
    PLANS.md regen — r12's plain `tools/plan_audit.py` run rebuilt
    the file without `--multifile` and silently dropped the section
    (VERDICT r12 what's-wrong #1); main() now carries the block
    through a full rewrite and this guard keeps it that way."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLANS.md")) as fh:
        text = fh.read()
    assert "<!-- MULTIFILE-BEGIN -->" in text
    assert "<!-- MULTIFILE-END -->" in text
