"""Faithful-sink rendering: the reference's output quirks, reproduced
only at the sink boundary (SURVEY.md §1.2 notes).

- NULL scalars render as the literal string "NULL"
  (helpers/helpers.go:5-10: a nil ScalarValue becomes "NULL").
- Every scalar renders as its string form (helpers/helpers.go:9: the
  Timestream wire format delivers all scalars as strings and the
  reference passes them through to JSON).

Internal engine semantics keep real SQL NULLs and native types; these
projections apply only when writing reference-compatible NDJSON.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType, TimestampType

# The reference's timestamp wire format: '2006-01-02 15:04:05' Go layout
# (cmd/backup.go:25) == yyyy-MM-dd HH:mm:ss.
REF_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def faithful_scalar(col: Column, is_timestamp: bool = False) -> Column:
    """Render one scalar the way the reference's decoder does:
    stringly, with NULL → \"NULL\" (helpers/helpers.go:5-10)."""
    rendered = F.date_format(col, REF_TS_FMT) if is_timestamp else col.cast("string")
    return F.coalesce(rendered, F.lit("NULL"))


def faithful_projection(df: DataFrame) -> DataFrame:
    """Project every top-level column to its faithful string form.
    Nested types (array/map/struct) keep structure — the reference
    nests recursively too (helpers/helpers.go:18-59) — and only their
    leaf scalars were stringly; for simplicity v1 JSON-encodes nested
    columns wholesale."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            cols.append(F.coalesce(F.to_json(c), F.lit("NULL")).alias(f.name))
        else:
            cols.append(faithful_scalar(c, isinstance(f.dataType, TimestampType)).alias(f.name))
    return df.select(*cols)
