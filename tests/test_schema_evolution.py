"""Schema-evolution + quarantine-ingest behaviors
(pipeline/schema_evolution.py): multi-generation parquet reads under
an explicit target schema vs mergeSchema, and PERMISSIVE NDJSON
quarantine splits."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.schema_evolution import (
    evolved_read,
    merged_read,
    quarantine_read_json,
)


def _write_generations(spark, root):
    """gen1: (id, v) — gen2 adds `tag`, retypes nothing."""
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id bigint, v double"
    ).write.mode("overwrite").parquet(f"{root}/g=1")
    spark.createDataFrame(
        [(3, 30.0, "a"), (4, 40.0, "b")], "id bigint, v double, tag string"
    ).write.mode("overwrite").parquet(f"{root}/g=2")


def test_evolved_read_fills_missing_columns(spark, tmp_path):
    root = str(tmp_path / "store")
    _write_generations(spark, root)
    df = evolved_read(spark, f"{root}/g=*", "id bigint, v double, tag string")
    rows = {r.id: (r.v, r.tag) for r in df.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "a"), 4: (40.0, "b")}
    # dropped-column downgrade: a narrower target never reads `tag`
    narrow = evolved_read(spark, f"{root}/g=*", "id bigint, v double")
    assert narrow.columns == ["id", "v"] and narrow.count() == 4
    # and the scan prunes to the requested columns (ReadSchema)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "tag" not in plan


def test_merged_read_unions_footers(spark, tmp_path):
    root = str(tmp_path / "store")
    _write_generations(spark, root)
    df = merged_read(spark, f"{root}/g=*")
    assert set(df.columns) == {"id", "v", "tag"}
    assert df.filter(F.col("tag").isNull()).count() == 2


def test_quarantine_read_json_splits(spark, tmp_path):
    p = tmp_path / "drop.json"
    lines = [
        json.dumps({"id": 1, "text": "ok"}),
        "{not valid json",
        json.dumps({"id": 2, "text": "fine"}),
        '{"id": "NaNsense"}',  # wrong type -> corrupt under the schema
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = quarantine_read_json(spark, str(p), "id bigint, text string")
    good_rows = {r.id: r.text for r in good.collect()}
    assert good_rows == {1: "ok", 2: "fine"}
    bad_rows = [r.raw_record for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not valid json" in b for b in bad_rows)
    assert good.columns == ["id", "text"]  # corrupt col dropped


def test_quarantine_read_json_leaves_caller_schema_untouched(spark, tmp_path):
    """StructType.add mutates self — the corrupt-capture column must
    be grafted onto a COPY, or a reused caller schema (evolved_read,
    a write contract) silently grows a spurious nullable column."""
    from pyspark.sql.types import StructType

    p = tmp_path / "drop.json"
    p.write_text(json.dumps({"id": 1, "text": "ok"}) + "\n")
    schema = StructType.fromDDL("id bigint, text string")
    before = [f.name for f in schema.fields]
    good, bad = quarantine_read_json(spark, str(p), schema)
    good.collect(), bad.collect()
    assert [f.name for f in schema.fields] == before
