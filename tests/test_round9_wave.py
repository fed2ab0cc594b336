"""SURVEY §5.6 sanity tests for the round-9 first wave: OPQ rotation
(orthonormality, MSE gain over plain PQ, recall), IVFADC per-cell
recall audit, STOMP matrix profile parity with the pair-join plan,
loss-mask manifest on a planted duplicate, and quality-card verdict
consistency."""

from __future__ import annotations

from timestream_travel_spark.tables import load_table

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_opq_rotation_orthonormal_and_mse_gain(spark, sf_dir):
    import numpy as np

    from timestream_travel_spark.operators.similarity8 import (
        DIM,
        q_opq_mse_gain,
        train_opq,
    )

    R, books = train_opq(spark, sf_dir)
    Rn = np.asarray(R, dtype=np.float64)
    assert np.abs(Rn @ Rn.T - np.eye(DIM)).max() < 1e-10  # orthonormal
    row = q_opq_mse_gain(spark, sf_dir).collect()[0]
    # OPQ seeds from the PQ solution and each alternation lowers the
    # shared objective — the gain is nonnegative by construction
    assert row.opq_mse <= row.pq_mse + 1e-9, row
    assert row.gain_pct >= 0.0
    # on the isotropic fixture the gain is material (measured ~15%)
    assert row.gain_pct > 1.0, row


def test_opq_ann_recall_vs_brute_force(spark, sf_dir):
    import numpy as np

    from timestream_travel_spark.operators.similarity import _query_vec
    from timestream_travel_spark.operators.similarity8 import q_opq_ann_topk

    approx = [r.vec_id for r in q_opq_ann_topk(spark, sf_dir).collect()]
    assert len(approx) == 10
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = np.asarray(_query_vec(spark, sf_dir))
    d = {
        r.vec_id: float(np.sum((np.asarray(r.embedding, dtype=np.float64) - q) ** 2))
        for r in emb
        if r.vec_id != 0
    }
    exact = [k for k, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:10]]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"OPQ ANN recall too low: {recall}"
    # re-rank reports exact distances for what it kept
    got = {r.vec_id: r.l2sq for r in q_opq_ann_topk(spark, sf_dir).collect()}
    for vid, l2 in got.items():
        assert abs(l2 - d[vid]) < 1e-4, (vid, l2, d[vid])


def test_ivfpq_cell_recall_audit(spark, sf_dir):
    from timestream_travel_spark.operators.clusterqual2 import q_ivfpq_cell_recall
    from timestream_travel_spark.operators.similarity7 import _ivfpq_state

    rows = q_ivfpq_cell_recall(spark, sf_dir).collect()
    cents, _ = _ivfpq_state(spark, sf_dir)
    assert len(rows) == len(cents)  # every coarse cell audited
    n_total = sum(r.n_vectors for r in rows)
    for r in rows:
        assert 0.0 <= r.recall <= 1.0, r
        assert 1 <= r.k <= 10 and r.k <= r.n_vectors, r
    weighted = sum(r.n_vectors * r.recall for r in rows) / n_total
    # random top-k overlap would be ~k/|cell| (~0.2 here); the ADC
    # ranking must be far better than chance (measured 0.53)
    rand = sum(r.n_vectors * (r.k / r.n_vectors) for r in rows) / n_total
    assert weighted >= 0.35, (weighted, [r.recall for r in rows])
    assert weighted > rand + 0.05


def test_stomp_profile_equals_pair_join_profile(spark, sf_dir):
    """The STOMP diagonal recurrence is integer-exact here, so its
    output must equal the O(span²) pair-join matrix profile ROW FOR
    ROW — same neighbors, same distances (shared oracle in the
    registry makes the same claim vs DuckDB)."""
    from timestream_travel_spark.operators.timeseries16 import q_matrix_profile
    from timestream_travel_spark.operators.timeseries19 import q_matrix_profile_stomp

    exact = {
        (r.event_type, r.win_start): (r.nn_start, r.nn_dist)
        for r in q_matrix_profile(spark, sf_dir).collect()
    }
    stomp = {
        (r.event_type, r.win_start): (r.nn_start, r.nn_dist)
        for r in q_matrix_profile_stomp(spark, sf_dir).collect()
    }
    assert exact == stomp and len(exact) > 0


def test_loss_mask_manifest_planted(spark, tmp_path):
    """Doc 2 quotes a 6-token span of doc 1 → doc 1 (min doc_id) is
    canonical, doc 2 gets one contiguous masked run covering the
    quoted span's token positions; an unrelated doc masks nothing."""
    from timestream_travel_spark.operators.llm_text22 import q_loss_mask_manifest

    quoted = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{quoted} one two three four five", "en", "s0", 60),
        (2, f"intro words here {quoted} outro tail words", "en", "s0", 70),
        (3, "completely different text with no shared spans at all here",
         "en", "s0", 60),
    ]
    sf = str(tmp_path / "sf_mask")
    spark.createDataFrame(rows, _DOC_SCHEMA).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    out = {r.doc_id: r for r in q_loss_mask_manifest(spark, sf).collect()}
    assert out[1].n_masked == 0 and out[1].mask_ranges == ""  # canonical
    assert out[3].n_masked == 0 and out[3].mask_frac == 0.0
    # doc 2: quoted tokens sit at positions 4..9 (1-based); both
    # 5-grams inside the 6-token quote duplicate, covering 4..9
    assert out[2].n_masked == 6
    assert out[2].n_runs == 1
    assert out[2].mask_ranges == "4-9"
    assert abs(out[2].mask_frac - 6 / out[2].n_tok) < 1e-9


def test_quality_card_verdict_consistency(spark, sf_dir):
    """The keep verdict must be exactly its published rule over the
    card's own columns, terciles must cover each language ~equally,
    and signals stay in range."""
    from timestream_travel_spark.operators.llm_text22 import (
        DUP_DEN,
        DUP_NUM,
        KEEP_BUCKET,
        q_quality_card,
    )

    rows = q_quality_card(spark, sf_dir).collect()
    assert len(rows) > 0
    langs = {}
    for r in rows:
        assert 0.0 < r.ttr <= 1.0 and r.wc > 0
        assert r.ppl_bucket in (1, 2, 3)
        assert 0.0 <= r.dup_frac <= 1.0
        want = int(
            r.gopher_pass == 1
            and DUP_DEN * round(r.dup_frac * r.n_spans) <= DUP_NUM * r.n_spans
            and r.ppl_bucket <= KEEP_BUCKET
        )
        assert r.keep == want, r
        langs.setdefault(r.lang, []).append(r.ppl_bucket)
    for lang, buckets in langs.items():
        if len(buckets) >= 9:
            for b in (1, 2, 3):  # ntile balance within ±1
                assert abs(buckets.count(b) - len(buckets) / 3) <= 1 + len(buckets) * 0.01


def test_ivfpq_cell_recall_from_index_matches_direct(spark, sf_dir, tmp_path):
    """The persisted-index audit path reads stored codes (no
    re-encode) and must reproduce the direct query's per-cell recall
    rows exactly — same learned state, same tie policy."""
    from timestream_travel_spark.operators.clusterqual2 import (
        ivfpq_cell_recall_from_index,
        q_ivfpq_cell_recall,
    )
    from timestream_travel_spark.operators.similarity7 import build_ivfpq_index

    idx = str(tmp_path / "ivfpq_idx")
    build_ivfpq_index(spark, sf_dir, idx)
    direct = sorted(map(tuple, q_ivfpq_cell_recall(spark, sf_dir).collect()))
    from_idx = sorted(
        map(tuple, ivfpq_cell_recall_from_index(spark, sf_dir, idx).collect())
    )
    assert direct == from_idx and len(direct) > 1
