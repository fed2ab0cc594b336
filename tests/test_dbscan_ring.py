"""Boundary-ring DBSCAN (clusterqual6): the planted cross-label
ε-pair the label-blocked variant misses and the ring catches, exact
parity of the ring pair set vs brute-force all-pairs, and the
ring-census relationship to the blocked census on the real fixture."""

from __future__ import annotations

import itertools
import math

from timestream_travel_spark.operators.clusterqual3 import DBSCAN_EPS2, _eps_pairs
from timestream_travel_spark.operators.clusterqual6 import (
    ring_eps_pairs,
    ring_members,
)
from timestream_travel_spark.registry import QUERIES

# Two well-separated label blobs plus a planted cross-label ε-pair
# (vec_id 6 at x=5.0 label 0, vec_id 7 at x=5.5 label 1: d=0.5 < ε)
# sitting in the no-man's-land between the blobs.
_PLANTED = [
    (0, [0.0, 0.0, 0.0, 0.0], 0),
    (1, [0.3, 0.0, 0.0, 0.0], 0),
    (2, [0.0, 0.4, 0.0, 0.0], 0),
    (3, [10.0, 0.0, 0.0, 0.0], 1),
    (4, [10.3, 0.0, 0.0, 0.0], 1),
    (5, [10.0, 0.4, 0.0, 0.0], 1),
    (6, [5.0, 0.0, 0.0, 0.0], 0),
    (7, [5.5, 0.0, 0.0, 0.0], 1),
]


def _planted_df(spark):
    return spark.createDataFrame(
        _PLANTED, "vec_id long, embedding array<float>, label int"
    )


def _brute_pairs():
    eps2 = DBSCAN_EPS2
    out = set()
    for (ia, va, _), (ib, vb, _) in itertools.combinations(_PLANTED, 2):
        if sum((x - y) ** 2 for x, y in zip(va, vb)) <= eps2:
            out.add((min(ia, ib), max(ia, ib)))
    return out


def test_planted_cross_label_pair_blocked_misses_ring_catches(spark):
    emb = _planted_df(spark)
    blocked = {
        (r["va"], r["vb"])
        for r in _eps_pairs(spark, "unused", emb=emb).collect()
    }
    ring = {(r["va"], r["vb"]) for r in ring_eps_pairs(spark, emb).collect()}
    assert (6, 7) not in blocked  # labels differ → invisible to the block
    assert (6, 7) in ring  # the ring replicates across the cell face
    assert blocked <= ring  # ring is a strict superset here


def test_ring_pairs_equal_brute_force_all_pairs(spark):
    emb = _planted_df(spark)
    ring = {(r["va"], r["vb"]) for r in ring_eps_pairs(spark, emb).collect()}
    assert ring == _brute_pairs()


def test_ring_pairs_deduped_and_ordered(spark):
    emb = _planted_df(spark)
    rows = ring_eps_pairs(spark, emb).collect()
    keys = [(r["va"], r["vb"]) for r in rows]
    assert len(keys) == len(set(keys))  # cross-cell dedup is exact
    assert all(a < b for a, b in keys)
    for r in rows:
        assert r["dd"] <= DBSCAN_EPS2


def test_ring_members_cover_every_point_once_at_home(spark):
    emb = _planted_df(spark)
    m = ring_members(spark, emb).collect()
    homes = [r["vec_id"] for r in m if r["is_home"] == 1]
    assert sorted(homes) == [p[0] for p in _PLANTED]  # exactly one home
    # replicas never duplicate a (cell, vec_id) slot
    slots = [(r["cell"], r["vec_id"]) for r in m]
    assert len(slots) == len(set(slots))


def test_ring_census_dominates_blocked_census_on_fixture(spark, sf_dir):
    """The unblocked neighbor count is ≥ the label-blocked count for
    every point (cross-label ε-pairs only ADD neighbors), and on the
    isotropic fixture strictly greater somewhere."""
    blocked = {
        r["vec_id"]: r["n_neighbors"]
        for r in QUERIES["q_dbscan_core_census"](spark, sf_dir).collect()
    }
    ring = {
        r["vec_id"]: r["n_neighbors"]
        for r in QUERIES["q_dbscan_core_census_ring"](spark, sf_dir).collect()
    }
    assert set(ring) == set(blocked)
    assert all(ring[v] >= blocked[v] for v in blocked)
    assert any(ring[v] > blocked[v] for v in blocked)
