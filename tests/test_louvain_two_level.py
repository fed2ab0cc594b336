"""Full two-level Louvain (graph11): hand-computed two-clique ground
truth through the identical pipeline, and the algorithm's monotonicity
guarantees on the real backbone."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from timestream_travel_spark.operators.graph11 import (
    MAX_SWEEPS,
    louvain_two_level,
)
from timestream_travel_spark import registry
from timestream_travel_spark.registry import QUERIES

registry.load_all()


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "u long, v long, w long"
    )


def test_two_cliques_bridge_ground_truth(spark):
    """Two K4s joined by one bridge edge (m=13): the sweep loop must
    recover exactly the two cliques — Q = 11/26 ≈ 0.423077, the known
    optimum for this graph (level 1 reaches it in 3 accepted sweeps;
    level 2 then has nothing left to merge)."""
    k4a = list(itertools.combinations(range(4), 2))
    k4b = list(itertools.combinations(range(4, 8), 2))
    row = louvain_two_level(spark, _edges_df(spark, k4a + k4b + [(3, 4)])).collect()[0]
    assert row["w_total"] == 13
    assert row["n_comm_l2"] == 2
    assert abs(row["modularity_l2"] - 0.423077) < 1e-9
    assert row["modularity_l2"] >= row["modularity_l1"]


def test_single_clique_collapses_to_one_community(spark):
    """A lone K5 has no community structure beyond itself: the loop
    must end with one community and modularity 0."""
    k5 = list(itertools.combinations(range(5), 2))
    row = louvain_two_level(spark, _edges_df(spark, k5)).collect()[0]
    assert row["n_comm_l2"] == 1
    assert row["modularity_l2"] == 0.0


def test_backbone_monotonicity_and_bounds(spark, sf_dir):
    """On the real backbone: accepted-sweep counts within MAX_SWEEPS,
    level-2 modularity ≥ level-1 (identity-start loop only accepts
    improvements), and the final modularity beats the singleton
    start (which is strictly negative on any graph with an edge)."""
    row = QUERIES["q_louvain_two_level"](spark, sf_dir).collect()[0]
    assert 0 <= row["n_sweeps_l1"] <= MAX_SWEEPS
    assert 0 <= row["n_sweeps_l2"] <= MAX_SWEEPS
    assert row["modularity_l2"] >= row["modularity_l1"]
    assert row["n_comm_l2"] <= row["n_comm_l1"]
    assert row["modularity_l1"] > -1.0
    if row["n_sweeps_l1"] > 0:
        assert row["modularity_l1"] > -0.07  # above the singleton start


def test_two_level_beats_one_sweep_refinement(spark, sf_dir):
    """The r11 verdict's pinned bound: full Louvain's final modularity
    ≥ the one-sweep LPA refinement's (q_louvain_one_level)."""
    two = QUERIES["q_louvain_two_level"](spark, sf_dir).collect()[0]
    one = QUERIES["q_louvain_one_level"](spark, sf_dir).collect()[0]
    assert two["modularity_l2"] >= one["modularity_after"]
