"""timestream_travel_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of mgjules/timestream-travel.

The reference (read-only at /root/reference) is a Go CLI that exports
Amazon Timestream time-series tables to S3 as gzip NDJSON
(cmd/backup.go). Its query semantics (time-range predicates,
partition discovery via GROUP BY, per-partition ordered export with
chunking — SURVEY.md §2 Part A) are re-expressed here as Catalyst
logical plans over Spark DataFrames, and generalized to a full
relational / time-series / LLM-data-pipeline operator surface
(SURVEY.md §2 Part B).

Design rules (SURVEY.md §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join planning.
- Pandas UDFs only where built-ins cannot express the semantics.
- No driver-side row loops over data; collect() only for small
  parameter sets (e.g. partition values, a query vector).
"""

__version__ = "0.1.0"

from timestream_travel_spark.session import get_spark
from timestream_travel_spark.tables import TABLES, load_tables

__all__ = ["get_spark", "load_tables", "TABLES", "__version__"]
