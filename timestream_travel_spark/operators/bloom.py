"""Distributed Bloom filter for incremental-ingest dedup (round 3).

PySpark exposes no public Bloom-filter API, so this builds one from
expression primitives — every step a JVM expression, no UDFs:

  build:  fingerprint → K = {K_HASHES} positions via xxhash64(fp, seed_i)
          mod M = {M_BITS} → (word = pos div 64, bit = pos mod 64)
          → groupBy(word).agg(bit_or(1 << bit))  ⇒ a bitmap table of
          ≤ M/64 rows (constant-bounded ⇒ broadcast is legitimate).
  probe:  incoming batch computes the same K positions, broadcast-joins
          the bitmap, and is a probable duplicate iff all K bits hit.

The point at 100 TB: probing a new ingest batch against the corpus
costs |batch|·K bitmap lookups against a constant-size broadcast —
the corpus itself is NEVER re-scanned or joined. No false negatives
by construction; false-positive rate ≈ (1 − e^(−K·n/M))^K
(pytest-verified on planted novel docs). Rows-only oracle: the bitmap
depends on xxhash64, which DuckDB does not implement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table

M_BITS = 1 << 17  # 131072 bits = 2048 longs
K_HASHES = 5


def _fingerprint(text: Column) -> Column:
    """Normalized-text fingerprint (same normalization family as the
    dedup operators: lowercase, collapsed whitespace)."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def _positions(fp: Column) -> Column:
    """Array of K bit positions for a fingerprint."""
    return F.array(
        *[
            F.pmod(F.xxhash64(fp, F.lit(i)), F.lit(M_BITS)).alias(f"p{i}")
            for i in range(K_HASHES)
        ]
    )


def bloom_build(corpus: DataFrame, fp_col: str = "fp") -> DataFrame:
    """(word, bits) bitmap table — ≤ M/64 rows regardless of corpus
    size; the only shuffle is the 2048-key bit_or aggregation."""
    pos = corpus.select(F.explode(_positions(F.col(fp_col))).alias("pos"))
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(batch: DataFrame, bitmap: DataFrame, id_col: str, fp_col: str = "fp") -> DataFrame:
    """(id, probably_dup) for every batch row: all K bits set ⇒
    probable member. The bitmap is constant-bounded ⇒ explicit
    broadcast is safe by definition."""
    pos = batch.select(
        F.col(id_col), F.explode(_positions(F.col(fp_col))).alias("pos")
    ).select(
        id_col,
        (F.col("pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
    )
    hits = (
        pos.join(F.broadcast(bitmap), "word", "left")
        .select(
            id_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            ).cast("int").alias("hit"),
        )
        .groupBy(id_col)
        .agg((F.sum("hit") == K_HASHES).alias("probably_dup"))
    )
    return hits


@query("q_bloom_dedup_probe")
def q_bloom_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup gate: build the Bloom bitmap over the
    corpus fingerprints once, then probe a synthetic ingest batch —
    every 7th document verbatim (planted duplicates: must all hit)
    plus one guaranteed-novel doc per corpus doc_id ('novel ingest
    doc <id>': should miss at the designed FP rate). Output is the
    per-probe verdict; pytest asserts zero false negatives and the
    FP bound. Rows-only oracle (xxhash64 is Spark-specific)."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.select(_fingerprint(F.col("text")).alias("fp"))
    bitmap = bloom_build(corpus)
    dups = d.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("probe_id"), _fingerprint(F.col("text")).alias("fp")
    )
    novel = d.select(
        (F.col("doc_id") + 1_000_000).alias("probe_id"),
        _fingerprint(F.concat(F.lit("novel ingest doc "), F.col("doc_id"))).alias("fp"),
    )
    return bloom_probe(dups.unionByName(novel), bitmap, "probe_id").orderBy("probe_id")
