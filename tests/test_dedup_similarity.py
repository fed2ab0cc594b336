"""Dedup + similarity behavior tests: MinHash recall against exact
Jaccard, SimHash locality, ANN recall vs brute force, dedup
idempotence (SURVEY.md §5.5 property checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timestream_travel_spark.operators.dedup import (
    minhash_candidates,
    normalized_text,
    simhash64,
    word_shingles,
)
from timestream_travel_spark.operators.similarity import TOP_K, cosine_topk, _query_vec
from timestream_travel_spark.tables import load_table


def _with_near_dups(spark, sf_dir):
    """documents ∪ perturbed copies of 20 docs (ids +10000): drop the
    last word — Jaccard vs the original stays ≳0.9."""
    d = load_table(spark, sf_dir, "documents")
    dups = (
        d.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')").alias(
                "text"
            ),
            "lang",
            "source",
            "n_chars",
        )
    )
    return d.unionByName(dups)


def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    docs = _with_near_dups(spark, sf_dir)
    cands = minhash_candidates(docs).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in cands}
    planted = {(i, i + 10000) for i in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall} (found {len(found & planted)}/20)"
    # estimated jaccard for planted pairs should be high
    est = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in cands}
    planted_found = [est[p] for p in planted if p in est]
    assert min(planted_found) > 0.5


def test_lsh_verified_pairs_match_exact(spark, sf_dir):
    """The LSH-gated exact-Jaccard flow must reproduce the brute-force
    pairs ≥ threshold (fixture dups sit at j≈0.97 where LSH recall is
    ~1), and its plan must contain no corpus self-join on block keys —
    every join is equi on the LSH bucket or a doc id."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs

    docs = _with_near_dups(spark, sf_dir).cache()
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in lsh_verified_pairs(docs, threshold=0.5).collect()
    }
    sh = docs.select("doc_id", word_shingles("text").alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    brute = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard"))
        .filter((inter / union) >= 0.5)
        .collect()
    }
    docs.unpersist()
    assert got == brute
    # plan shape: no cartesian / non-equi corpus join in the gated flow
    plan = lsh_verified_pairs(docs, threshold=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_index_roundtrip(spark, sf_dir, tmp_path):
    """Candidates from a persisted signature index must equal the
    direct computation (hashes are deterministic)."""
    from timestream_travel_spark.operators.dedup import (
        build_minhash_index,
        minhash_candidates_from_index,
    )

    docs = _with_near_dups(spark, sf_dir)
    idx = str(tmp_path / "sig_idx")
    build_minhash_index(docs, idx)
    from_index = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_candidates_from_index(spark, idx).collect()
    }
    direct = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_candidates(docs).collect()
    }
    assert from_index == direct and from_index


def test_exact_dedup_idempotent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    doubled = d.unionByName(d)
    deduped = doubled.dropDuplicates(["text"])
    assert deduped.count() == d.select("text").distinct().count()
    # idempotence: dedup(dedup(x)) == dedup(x)
    assert deduped.dropDuplicates(["text"]).count() == deduped.count()


def test_simhash_locality(spark, sf_dir):
    docs = _with_near_dups(spark, sf_dir)
    sh = docs.select("doc_id", simhash64("text").alias("h"))
    pairs = (
        sh.filter(F.col("doc_id") >= 10000)
        .select((F.col("doc_id") - 10000).alias("doc_id"), F.col("h").alias("h_dup"))
        .join(sh, "doc_id")
        .select(F.bit_count(F.col("h").bitwiseXOR(F.col("h_dup"))).alias("hamming"))
        .collect()
    )
    assert pairs, "no planted pairs joined"
    avg_ham = sum(r["hamming"] for r in pairs) / len(pairs)
    # near-dup docs should agree on most of 32 bits; random pairs average ~16
    assert avg_ham < 8, f"simhash not locality-sensitive: avg hamming {avg_ham}"


def test_word_shingles_shape(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(word_shingles("text").alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == ["a b"]  # shorter than k -> whole text


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = [r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in qs["q_ann_lsh_topk"](spark, sf_dir).collect()]
    assert len(approx) == TOP_K
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"ANN recall vs brute force too low: {recall}"
    # every approx hit must carry a cosine <= the exact best
    e = load_table(spark, sf_dir, "embeddings")
    best = cosine_topk(e, _query_vec(spark, sf_dir), 1).collect()[0]["cos_sim"]
    adf = qs["q_ann_lsh_topk"](spark, sf_dir).collect()
    assert all(r["cos_sim"] <= best for r in adf)


def test_normalized_text(spark):
    df = spark.createDataFrame([("  Hello   WORLD  ",)], "text string")
    assert df.select(normalized_text("text").alias("t")).collect()[0]["t"] == "hello world"


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = [r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in qs["q_ann_ivf_topk"](spark, sf_dir).collect()]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"IVF recall vs brute force too low: {recall}"


def test_ann_ivf_kmeans_recall(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    exact = [r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in qs["q_ann_ivf_kmeans_topk"](spark, sf_dir).collect()]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"kmeans-IVF recall too low: {recall}"


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation handles a 6-node chain (diameter > 1
    round), a triangle, and an isolated pair; cluster id is the min
    node of each component."""
    from timestream_travel_spark.operators.dedup2 import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain 1..6
         (10, 11), (11, 12), (10, 12),             # triangle
         (20, 21)],                                 # pair
        "src long, dst long",
    )
    got = {r["node"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_ann_ivf_kmeanspp_recall_and_spread(spark, sf_dir):
    import __spark_entry__ as entrymod

    from timestream_travel_spark.operators.similarity2 import kmeanspp_init

    qs = entrymod.queries()
    exact = [r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in qs["q_ann_ivf_kmeanspp_topk"](spark, sf_dir).collect()]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"kmeans++-IVF recall too low: {recall}"
    # seeding is deterministic and produces k distinct centroids
    e = load_table(spark, sf_dir, "embeddings")
    c1 = kmeanspp_init(e, 4)
    c2 = kmeanspp_init(e, 4)
    assert c1 == c2 and len({tuple(c) for c in c1}) == 4


def test_ann_ivf_kmeanspar_recall_and_spread(spark, sf_dir):
    """k-means‖-shape seeding: recall holds vs brute force, the init
    is deterministic, produces k distinct centers, and its minimum
    pairwise spread is within 2× of the sequential farthest-point
    init's — while costing O(passes) scans instead of k−1."""
    import __spark_entry__ as entrymod

    from timestream_travel_spark.operators.similarity2 import (
        kmeans_parallel_init,
        kmeanspp_init,
    )

    qs = entrymod.queries()
    exact = [r["vec_id"] for r in qs["q_cosine_topk"](spark, sf_dir).collect()]
    approx = [r["vec_id"] for r in qs["q_ann_ivf_kmeanspar_topk"](spark, sf_dir).collect()]
    assert len(approx) == 10
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3, f"kmeans‖-IVF recall too low: {recall}"

    e = load_table(spark, sf_dir, "embeddings")
    c1 = kmeans_parallel_init(e, 4)
    c2 = kmeans_parallel_init(e, 4)
    assert c1 == c2 and len({tuple(c) for c in c1}) == 4

    def py_cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / ((sum(x * x for x in a) ** 0.5) * (sum(x * x for x in b) ** 0.5))

    def min_spread(cents):
        return min(
            1 - py_cos(a, b)
            for i, a in enumerate(cents)
            for b in cents[i + 1 :]
        )

    seq = kmeanspp_init(e, 4)
    assert min_spread(c1) >= 0.5 * min_spread(seq), (
        f"k-means‖ seed spread {min_spread(c1):.4f} collapsed vs "
        f"sequential {min_spread(seq):.4f}"
    )


def test_connected_components_long_chain_log_rounds(spark):
    """Pointer-doubling contract: a 500-node path (diameter 499) must
    converge in ~log2 rounds — plain min-label propagation would need
    ~499 rounds and blow max_iter=20. Node ids are shuffled so labels
    can't ride a monotone id layout."""
    import random

    from timestream_travel_spark.operators.dedup2 import connected_components

    ids = list(range(1000, 1500))
    random.Random(42).shuffle(ids)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)], "src long, dst long"
    )
    stats: dict = {}
    labels = connected_components(edges, max_iter=20, stats=stats)
    got = {r["node"]: r["cluster"] for r in labels.collect()}
    assert set(got) == set(ids)
    assert set(got.values()) == {min(ids)}, "single component must share the min label"
    assert stats["rounds"] <= 11, (
        f"expected ~log2(500)+2 rounds with pointer doubling, took {stats['rounds']}"
    )


def test_update_minhash_index_incremental(spark, sf_dir, tmp_path):
    """Appending an ingest batch to the signature index must (a) skip
    already-indexed ids, (b) make index-based candidates identical to
    a full rebuild over the combined corpus."""
    from timestream_travel_spark.operators.dedup import (
        build_minhash_index,
        minhash_candidates_from_index,
        update_minhash_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 4 != 0)  # overlaps old on %4==2
    idx = str(tmp_path / "idx")
    build_minhash_index(old, idx)
    n_added = update_minhash_index(new, idx)
    assert n_added == new.join(old, "doc_id", "left_anti").count()
    # no duplicate ids in the index
    idx_df = spark.read.parquet(idx)
    assert idx_df.count() == idx_df.select("id").distinct().count()

    combined = old.unionByName(new.join(old, "doc_id", "left_anti"))
    idx2 = str(tmp_path / "idx2")
    build_minhash_index(combined, idx2)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates_from_index(spark, idx).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates_from_index(spark, idx2).collect()
    }
    assert got == want


def test_connected_components_random_graph_matches_union_find(spark):
    """FastSV labels on a 3000-edge random graph (mixed component
    shapes/sizes) match a pure-Python union-find exactly — the
    generic-topology complement of the chain/clique fixtures."""
    import random

    from timestream_travel_spark.operators.dedup2 import connected_components

    rng = random.Random(7)
    n = 2000
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(3000)
    ]
    edge_list = [(a + 1, b + 1) for a, b in edge_list if a != b]

    parent = list(range(n + 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edge_list for v in e}
    # union-find roots are not necessarily component minima after path
    # compression ordering; normalize via min per root
    comp_min: dict[int, int] = {}
    for v in nodes:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in nodes}

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    stats: dict = {}
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(edges, max_iter=20, stats=stats).collect()
    }
    assert got == want
    assert stats["rounds"] <= 8, stats
