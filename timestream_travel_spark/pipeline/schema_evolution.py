"""Schema evolution + ingest quarantine — the operational reads a
long-lived 100 TB store needs once writers upgrade:

- `evolved_read`: one DataFrame over parquet files written at
  DIFFERENT schema generations. Two strategies, both exercised by
  the tests: (a) `mergeSchema=true` unions the footer schemas (pays
  a footer pass per file — fine for a one-off exploration, wrong as
  a standing contract at 800k files); (b) the production path reads
  with an EXPLICIT target schema — Spark fills columns absent from
  an old file with NULLs, no footer union job, and the scan prunes
  to the requested columns. New columns must be added NULLABLE; a
  column REMOVED from the target schema is simply never read
  (column pruning handles the downgrade for free).
- `quarantine_read_json`: PERMISSIVE ingest of NDJSON drops with a
  `_corrupt_record` capture column, split into (good, quarantined)
  DataFrames — malformed rows land in the quarantine sink with
  their raw text instead of failing the job or silently vanishing
  (DROPMALFORMED's failure mode). The schema is explicit (the
  repo-wide no-inference-jobs rule).

Reference parity: none (backup.go assumes a fixed wire schema) —
north-star operational capability; the reference's own layout
(SURVEY §1.3) would hit exactly this on its first schema change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def evolved_read(
    spark: SparkSession,
    path: str,
    target_schema: StructType | str,
) -> DataFrame:
    """Read a multi-generation parquet store under an explicit
    TARGET schema: old-generation files yield NULL for columns they
    predate; columns dropped from the target are pruned, not read.
    No footer-union job (the mergeSchema alternative) — planning
    cost is O(listing), not O(files) footer reads."""
    return spark.read.schema(target_schema).parquet(path)


def merged_read(spark: SparkSession, path: str) -> DataFrame:
    """The exploration-time alternative: union all footer schemas.
    Correct but pays a distributed footer pass; use evolved_read with
    a declared target schema as the standing contract."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def quarantine_read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE NDJSON read with explicit schema: returns
    (good, quarantined). Malformed lines parse to all-NULL fields
    plus their raw text in `corrupt_col`; good rows have it NULL.
    The quarantine side keeps ONLY the raw text (the parsed columns
    are meaningless there), ready for a replay sink. Spark requires
    caching/materializing before filtering on the corrupt column —
    handled here with a localCheckpoint on the raw parse (bounded by
    the micro-batch/drop size at ingest)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        # Copy before extending: StructType.add mutates self (appends
        # to self.fields and returns self), so extending the caller's
        # schema object in place would permanently graft the capture
        # column onto a schema the caller may reuse for evolved_read
        # or a write contract.
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType())]
        )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .localCheckpoint(eager=True)
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    return good, quarantined
