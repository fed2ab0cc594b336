"""HDBSCAN MSF + condensed-tree/EOM extraction (clusterqual5):
hand-computed dendrogram parity for the pure extraction function,
planted-fixture ground truth through the full Spark pipeline, and
registry-surface invariants on the real fixture."""

from __future__ import annotations

import math

from timestream_travel_spark.operators.clusterqual5 import (
    MIN_CLUSTER_SIZE,
    _condense_and_select,
    hdbscan_mst_edges,
)
from timestream_travel_spark.registry import QUERIES


def test_condense_hand_computed_two_clusters():
    """12 points: two 5-chains at d=0.1 bridged at d=1.0 plus two
    stragglers at d=2.0. Hand-derived condensed tree (m=3):
    stab(A)=stab(B)=5·(10−1)=45 each, root=2·0.5+2·5·1=11 →
    EOM selects A and B; stragglers fall out of the unselected root
    → noise. All probabilities 1.0 (every member's λ_p = λ_max)."""
    ids = list(range(100, 112))
    edges = sorted(
        [(0.1, i, i + 1) for i in range(0, 4)]
        + [(0.1, i, i + 1) for i in range(5, 9)]
        + [(1.0, 4, 5), (2.0, 9, 10), (2.0, 10, 11)]
    )
    got = _condense_and_select(12, ids, edges, 3)
    assert {i for i in got} == set(range(10))
    assert {got[i][0] for i in range(0, 5)} == {100}
    assert {got[i][0] for i in range(5, 10)} == {105}
    assert all(abs(got[i][1] - 1.0) < 1e-12 for i in got)
    assert 10 not in got and 11 not in got


def test_condense_single_component_is_one_cluster():
    """A single dense chain is ONE cluster (the declared
    allow_single_cluster-per-component semantics), not all-noise."""
    ids = [7, 8, 9, 10, 11, 12]
    edges = [(0.1, i, i + 1) for i in range(5)]
    got = _condense_and_select(6, ids, edges, 3)
    assert {i for i in got} == set(range(6))
    assert {got[i][0] for i in got} == {7}


def test_condense_small_component_is_noise():
    got = _condense_and_select(3, [1, 2, 3], [(0.1, 0, 1), (0.1, 1, 2)], 5)
    assert got == {}


def _write_embeddings(spark, path, pts):
    """pts: list of (vec_id, label, [coords])."""
    spark.createDataFrame(
        [(int(v), [float(x) for x in c], int(l)) for v, l, c in pts],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _blob(start_id, label, x0, n, spacing):
    return [
        (start_id + i, label, [x0 + spacing * i, 0.0, 0.0, 0.0])
        for i in range(n)
    ]


def test_planted_two_components_and_noise(spark, tmp_path):
    """Two tight blobs in separate ε-components + isolated noise:
    exactly two clusters labelled by their min vec_id, noise = -1."""
    pts = (
        _blob(0, 0, 0.0, 8, 0.1)
        + _blob(100, 0, 10.0, 8, 0.1)
        + [(900, 0, [5.0, 0, 0, 0]), (901, 0, [5.0, 5.0, 0, 0])]
    )
    _write_embeddings(spark, tmp_path, pts)
    out = {
        r.vec_id: (r.cluster, r.prob)
        for r in QUERIES["q_hdbscan_clusters"](spark, str(tmp_path)).collect()
    }
    assert {out[v][0] for v in range(0, 8)} == {0}
    assert {out[v][0] for v in range(100, 108)} == {100}
    assert out[900] == (-1, 0.0) and out[901] == (-1, 0.0)
    assert all(0.0 < out[v][1] <= 1.0 for v in list(range(8)) + list(range(100, 108)))
    # the MSF spans each blob: 7 edges per blob
    mst = hdbscan_mst_edges(spark, str(tmp_path))
    assert mst.count() == 14


def test_planted_bridged_blobs_split_by_eom(spark, tmp_path):
    """Two dense blobs bridged WITHIN ε (one MSF component): EOM must
    prefer the two children over the merged root — density structure
    inside a single component is recovered, which plain DBSCAN at
    this ε cannot do (it reads the component as one cluster)."""
    pts = _blob(0, 0, 0.0, 8, 0.05) + _blob(100, 0, 1.55, 8, 0.05)
    _write_embeddings(spark, tmp_path, pts)
    mst = hdbscan_mst_edges(spark, str(tmp_path))
    assert mst.count() == 15  # 16 nodes, ONE component
    out = {
        r.vec_id: r.cluster
        for r in QUERIES["q_hdbscan_clusters"](spark, str(tmp_path)).collect()
    }
    assert {out[v] for v in range(0, 8)} == {0}
    assert {out[v] for v in range(100, 108)} == {100}


def test_real_fixture_invariants(spark):
    """sf0.001 registry surface: every selected cluster has ≥
    MIN_CLUSTER_SIZE members, carries its min member vec_id as the
    label, probs in (0,1]; noise has prob 0."""
    rows = QUERIES["q_hdbscan_clusters"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    by_cluster: dict[int, list] = {}
    for r in rows:
        if r.cluster == -1:
            assert r.prob == 0.0
        else:
            assert 0.0 < r.prob <= 1.0 + 1e-12
            by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    assert by_cluster, "expected at least one cluster on the real fixture"
    for cid, members in by_cluster.items():
        assert len(members) >= MIN_CLUSTER_SIZE
        assert min(members) == cid


def test_lambda_zero_distance_guard():
    """Duplicate points (d = 0) must not divide by zero: the λ cap
    routes them into the cluster with probability 1."""
    ids = [1, 2, 3, 4, 5, 6]
    edges = [(0.0, 0, 1)] + [(0.1, i, i + 1) for i in range(1, 5)]
    got = _condense_and_select(6, ids, edges, 3)
    assert {i for i in got} == set(range(6))
    assert math.isfinite(sum(p for _, p in got.values()))
