"""Materialize packed training sequences (round 3): turn the corpus
into the ACTUAL fixed-length token-sequence shards a trainer reads —
the write-path counterpart of q_pack_sequences' manifest.

Plan shape: tokens get global positions from the two-phase
distributed prefix sum (operators/llm_text7.doc_offsets — no global
window), chunk assembly is one hash-shuffle on chunk_id with an
in-row sort of each chunk's (position, token) pairs, and the sink is
standard partitioned parquet with maxRecordsPerFile sharding. The
driver never sees a token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timestream_travel_spark.operators.llm_text6 import doc_words
from timestream_travel_spark.operators.llm_text7 import CHUNK_TOKENS, doc_offsets


def packed_sequences(docs: DataFrame, budget: int = CHUNK_TOKENS) -> DataFrame:
    """(chunk_id, tokens array<string>, n_tokens) — documents
    concatenated in doc_id order, cut into `budget`-token sequences.
    Every chunk except the last carries exactly `budget` tokens."""
    toks = docs.select("doc_id", F.size(doc_words("text")).alias("n_tok"))
    offs = doc_offsets(toks)
    per_tok = (
        docs.join(offs, "doc_id")
        .select(
            "off",
            F.posexplode(doc_words("text")).alias("pos_in_doc", "token"),
        )
        .select(
            (F.col("off") + F.col("pos_in_doc")).alias("gpos"),
            "token",
        )
    )
    return (
        per_tok.withColumn("chunk_id", F.floor(F.col("gpos") / budget))
        .groupBy("chunk_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("gpos", "token"))),
                lambda s: s["token"],
            ).alias("tokens")
        )
        .select("chunk_id", "tokens", F.size("tokens").alias("n_tokens"))
    )


def write_training_shards(
    docs: DataFrame,
    dest: str,
    budget: int = CHUNK_TOKENS,
    chunks_per_file: int = 1024,
) -> int:
    """Write the packed sequences as size-controlled parquet shards;
    returns the number of chunks written."""
    seqs = packed_sequences(docs, budget)
    (
        seqs.repartitionByRange("chunk_id")
        .sortWithinPartitions("chunk_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", chunks_per_file)
        .parquet(dest)
    )
    return seqs.sparkSession.read.parquet(dest).count()
