"""Round-6 tests: large-star/small-star connected components parity
(vs the FastSV engine) and convergence on adversarial graph shapes,
plus the PMI top-V pruning contract.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from timestream_travel_spark.operators.dedup2 import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {r["node"]: r["cluster"] for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src bigint, dst bigint"
    )


def _python_cc(pairs):
    """Driver-side union-find ground truth (test-only)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then relabel to component MIN (both engines'
    # contract)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_star_cc_parity_on_chain(spark):
    """2000-node chain: the shape FastSV's docstring worries about
    (diameter-bound propagation). Both engines agree with union-find;
    measured round counts go to SCALING.md."""
    pairs = [(i, i + 1) for i in range(2000)]
    truth = _python_cc(pairs)
    st_fast: dict = {}
    st_star: dict = {}
    fast = _labels(connected_components(_edges_df(spark, pairs), stats=st_fast))
    star = _labels(
        connected_components_star(_edges_df(spark, pairs), stats=st_star)
    )
    assert fast == truth
    assert star == truth
    # both engines must beat the 2000-round diameter bound by a
    # log-ish margin
    assert st_fast["rounds"] <= 16
    assert st_star["rounds"] <= 16


def test_star_cc_parity_on_random_graphs(spark):
    rng = random.Random(6)
    for trial in range(3):
        n = 300
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(200 + 100 * trial)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        truth = _python_cc(pairs)
        fast = _labels(connected_components(_edges_df(spark, pairs)))
        star = _labels(connected_components_star(_edges_df(spark, pairs)))
        assert fast == truth, f"trial {trial}"
        assert star == truth, f"trial {trial}"


def test_star_cc_degenerate_shapes(spark):
    # single edge, already-a-star, two components, duplicate +
    # reversed edges
    cases = [
        [(7, 3)],
        [(1, 2), (1, 3), (1, 4)],
        [(1, 2), (2, 3), (10, 11), (11, 12)],
        [(5, 6), (6, 5), (5, 6), (8, 9)],
    ]
    for pairs in cases:
        truth = _python_cc(pairs)
        star = _labels(connected_components_star(_edges_df(spark, pairs)))
        assert star == truth, pairs


def test_star_cc_matches_fastsv_on_neardup_graph(spark, sf_dir):
    """Parity on the real workload: the LSH-verified near-dup pair
    graph over documents (the q_dedup_clusters input)."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs
    from timestream_travel_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_verified_pairs(d, threshold=0.5).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    fast = _labels(connected_components(edges))
    star = _labels(connected_components_star(edges))
    assert fast == star
    assert len(fast) > 0


def test_pmi_topv_pruning_bounds_pairs(spark, sf_dir):
    """The top-V vocabulary cut must bound the within-doc pair
    fan-out: with a tight V the candidate pair count collapses, and
    every surviving term is inside the top-V cut."""
    from timestream_travel_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("term"),
    ).distinct()
    tc = toks.groupBy("term").agg(F.count("*").alias("df"))
    topv = tc.orderBy(F.desc("df"), F.asc("term")).limit(5).select("term")
    pt = toks.join(F.broadcast(topv), "term", "left_semi")
    full = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .count()
    )
    pruned = (
        pt.alias("a")
        .join(
            pt.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .count()
    )
    # V=5 over any real vocab must cut pairs hard (≤ C(5,2) per doc)
    n_docs = docs.count()
    assert pruned <= 10 * n_docs
    assert pruned < full
