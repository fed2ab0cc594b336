"""Round-8 wave tests: cluster-quality audit (Davies–Bouldin / Dunn),
cluster medoid selection, n-gram novelty drift, and IVF-PQ ANN.
Planted-signal / recall checks beyond the DuckDB oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.functions.vectors import to_double_array
from timestream_travel_spark.operators.clusterqual import (
    q_davies_bouldin,
    q_dunn_index,
)
from timestream_travel_spark.operators.dedup5 import q_cluster_medoid
from timestream_travel_spark.operators.llm_text18 import N_EPOCHS, q_ngram_novelty
from timestream_travel_spark.operators.similarity import QUERY_VEC_ID, TOP_K
from timestream_travel_spark.operators.similarity6 import _l2sq_lit
from timestream_travel_spark.operators.similarity7 import q_ivfpq_topk
from timestream_travel_spark.tables import load_table


def _write_embeddings(spark, sf, rows):
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")


def test_davies_bouldin_and_dunn_on_planted_separation(spark, tmp_path):
    """Two tight clusters 10 apart in dim 0 (scatter ≈ 0.5, separation
    ≈ 10): DB ratio ≈ (0.5+0.5)/10 = 0.1 per cluster, Dunn ≈ 10/1.
    Same data with the gap collapsed to 1: DB ≈ 1, Dunn ≈ 1 — the
    indices must order the two geometries correctly."""
    dim = 8

    def mk(sf_name, gap):
        sf = str(tmp_path / sf_name)
        rows = []
        vid = 0
        for lab, center in ((0, 0.0), (1, gap)):
            for off in (-0.5, 0.5):
                for _ in range(4):
                    vec = [center + off] + [0.0] * (dim - 1)
                    rows.append((vid, [float(x) for x in vec], lab))
                    vid += 1
        _write_embeddings(spark, sf, rows)
        return sf

    far = mk("cq_far", 10.0)
    near = mk("cq_near", 1.0)
    db_far = {r.label: r for r in q_davies_bouldin(spark, far).collect()}
    assert set(db_far) == {0, 1}
    for r in db_far.values():
        assert abs(r.scatter - 0.5) < 1e-9
        assert abs(r.db_ratio - 0.1) < 1e-9
        assert r.n_members == 8
    db_near = {r.label: r for r in q_davies_bouldin(spark, near).collect()}
    assert all(r.db_ratio > 0.9 for r in db_near.values())
    (dunn_far,) = q_dunn_index(spark, far).collect()
    (dunn_near,) = q_dunn_index(spark, near).collect()
    assert dunn_far.k == 2
    assert abs(dunn_far.min_sep - 10.0) < 1e-9
    assert abs(dunn_far.max_diam - 1.0) < 1e-9
    assert dunn_far.dunn > 5 * dunn_near.dunn


def test_cluster_medoid_prefers_central_member(spark, tmp_path):
    """A 3-doc near-dup cluster where doc 2 shares high Jaccard with
    BOTH 1 and 3, while 1 and 3 are each similar mainly to 2: the
    medoid (max summed edge Jaccard) must be doc 2 — the
    keep-the-longest policy (dedup4) would pick the longest instead."""
    base = "the quick brown fox jumps over the lazy dog again and again today " * 3
    words = base.split()
    mid = " ".join(words)
    # doc 1 / doc 3: mid with a DIFFERENT long distinct tail each —
    # both stay >=0.5-similar to mid, but less similar to each other
    t1 = mid + " alpha beta gamma delta epsilon"
    t3 = mid + " zeta eta theta iota kappa"
    sf = str(tmp_path / "medoid_sf")
    rows = [
        (1, t1, "en", "src0", len(t1)),
        (2, mid, "en", "src0", len(mid)),
        (3, t3, "en", "src0", len(t3)),
        # far-away singleton, never clustered
        (4, "completely unrelated content about spark query engines", "en", "src1", 54),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = q_cluster_medoid(spark, sf).collect()
    assert len(out) == 1
    (row,) = out
    assert row.medoid_doc == 2
    assert row.n_members == 3
    # doc 2 touches both edges; its sum must beat either leaf's
    assert row.total_sim > 1.0  # two edges, each jaccard >= 0.5


def test_ngram_novelty_epoch0_is_one_and_repeats_are_stale(spark, tmp_path):
    """Epoch 0 is 1.0 by construction; a source that repeats epoch-0
    text verbatim in the last epoch scores novelty 0 there, while a
    source with fresh text stays at 1.0."""
    sf = str(tmp_path / "novelty_sf")
    n = 40  # doc_ids 0..39 → epochs of 10 docs each
    rows = []
    early = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(n):
        epoch = (i * N_EPOCHS) // n
        if i % 2 == 0:  # srcA: repeats the early text forever
            rows.append((i, early, "en", "srcA", len(early)))
        else:  # srcB: fresh tokens every doc
            txt = f"fresh{i} tokens{i} never{i} seen{i} before{i}"
            rows.append((i, txt, "en", "srcB", len(txt)))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {(r.source, r.epoch): r for r in q_ngram_novelty(spark, sf).collect()}
    for (src, ep), r in out.items():
        assert abs(r.novelty - r.n_novel / r.n_grams) < 1e-12
        if ep == 0:
            assert r.novelty == 1.0, (src, ep)
    assert out[("srcA", N_EPOCHS - 1)].novelty == 0.0  # pure repeats
    assert out[("srcB", N_EPOCHS - 1)].novelty == 1.0  # always fresh


def test_ivfpq_recall_and_exact_rerank(spark, sf_dir):
    """IVF-PQ shortlist + exact re-rank recovers most of the true L2
    top-k (same 0.5 pin as the plain-PQ test), and every emitted
    distance equals the true exact L2 (the re-rank must be exact even
    when the shortlist is approximate)."""
    out = q_ivfpq_topk(spark, sf_dir).collect()
    assert len(out) == TOP_K
    emb = load_table(spark, sf_dir, "embeddings")
    from timestream_travel_spark.operators.similarity import _query_vec

    qv = _query_vec(spark, sf_dir)
    exact = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            F.round(
                _l2sq_lit(to_double_array(F.col("embedding")), qv), 6
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(TOP_K)
        .collect()
    )
    truth = {r.vec_id for r in exact}
    got = [r.vec_id for r in out]
    assert len(truth & set(got)) / len(truth) >= 0.5
    # emitted distances are the EXACT distances, ascending
    exact_d = {
        r.vec_id: r.d
        for r in emb.filter(F.col("vec_id").isin(got))
        .select(
            "vec_id",
            F.round(
                _l2sq_lit(to_double_array(F.col("embedding")), qv), 6
            ).alias("d"),
        )
        .collect()
    }
    ds = [r.l2sq for r in out]
    assert ds == sorted(ds)
    for r in out:
        assert r.l2sq == exact_d[r.vec_id]
