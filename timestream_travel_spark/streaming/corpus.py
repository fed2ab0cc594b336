"""Streaming corpus preparation (round 3): the batch quality/PII
operators composed into a continuous document-ingest pipeline —
scrub PII, score quality, gate on score + language whitelist, stamp
the dedup fingerprint, and land analysis-ready parquet.

Every transformation is the SAME stateless expression tree the batch
queries use (operators/llm_text.quality_score, llm_text6's PII
regexes), so streaming output ≡ batch output row-for-row — asserted
by the parity test. Stateless per-row work means no watermark, no
state store: the pipeline scales with scan bandwidth alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text import quality_score
from timestream_travel_spark.operators.llm_text6 import _EMAIL_RE, _PHONE_RE

QUALITY_FLOOR = 0.5
LANG_WHITELIST = ("en", "es", "de", "fr", "zh")


def prepare_corpus(docs: DataFrame) -> DataFrame:
    """Batch/streaming-agnostic corpus preparation: works unchanged
    on a static DataFrame or a streaming one (all row-local)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    out = docs.select(
        "doc_id",
        "lang",
        scrubbed.alias("text"),
        F.round(quality_score(scrubbed), 4).alias("quality"),
        F.md5(F.regexp_replace(F.lower(F.trim(scrubbed)), r"\s+", " ")).alias("fp"),
    )
    return out.filter(
        (F.col("quality") >= QUALITY_FLOOR) & F.col("lang").isin(*LANG_WHITELIST)
    )


def corpus_prep_stream(stream: DataFrame, dest: str, checkpoint: str):
    """writeStream wiring: append-mode parquet sink (stateless row
    pipeline — no watermark needed)."""
    return (
        prepare_corpus(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest)
        .option("checkpointLocation", checkpoint)
    )
