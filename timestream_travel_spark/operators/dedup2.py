"""Dedup clustering: connected components over the near-duplicate
pair graph — the step that turns pairwise matches into dedup groups
(keep one representative per component, drop the rest).

Scale design: Shiloach-Vishkin-style parent-pointer iteration (the
FastSV formulation: Zhang/Azad/Hu, "FastSV: A Distributed-Memory
Connected Component Algorithm with Fast Convergence") — each round
does grandparent hooking (stochastic: update at the parent;
aggressive: update at the node) plus pointer shortcutting, all as
equi-joins + min-aggregations. Tree heights halve per round, so a
D-diameter chain converges in O(log D) rounds where plain min-label
propagation needs D rounds. Near-dup clusters are quasi-cliques (2-3
rounds either way), but a 100 TB graph with chain-shaped components
must not blow past max_iter. Per-round driver traffic is ONE scalar
(the changed-label count); labels never leave the cluster, and each
round's labels are localCheckpoint'ed to stop the self-join lineage
growing 2^rounds. Not a driver-side union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timestream_travel_spark.registry import query
from timestream_travel_spark.tables import load_table


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """(node, cluster) for every node in `edges`, cluster = min node
    id reachable — deterministic representative labeling.

    FastSV round over the parent-pointer map f (f[v] starts as v, ends
    as the component min). With g = f∘f (grandparent, a labels
    self-join):

    1. stochastic hooking — for each edge endpoint u, propose
       min-over-neighbors g to u's PARENT: f[f[u]] ← min nbr g. This
       merges whole trees, not single nodes.
    2. aggressive hooking — the same proposal lands at u itself:
       f[u] ← min nbr g.
    3. shortcutting — f[u] ← g[u] halves tree height.

    All three are (target, candidate) pairs min-aggregated per target,
    so one round = two joins + one aggregation + the final update
    join. Every candidate is an id inside the target's component
    (neighbors' grandparents), so labels only move down within the
    component and the fixpoint is the component min. Fixpoint when no
    label changes.

    Each round's labels are localCheckpoint'ed: the grandparent
    self-join doubles the logical plan per round, and without lineage
    truncation the DRIVER dies on plan analysis (2^rounds nodes) long
    before any data moves. On a cluster with a reliable checkpoint dir
    df.checkpoint() is the fault-tolerant equivalent.

    `stats`, when given, receives {"rounds": n} for convergence
    assertions."""
    # Symmetrize in ONE pass over `edges` (explode both directions
    # per row). The union-of-two-projections form reads the edges
    # lineage twice — when edges is an expensive unpersisted pipeline
    # (LSH candidates → exact verify), that doubles the dominant cost
    # of the whole clustering job.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    rounds = 0
    for _ in range(max_iter):
        # g = f∘f : grandparent of every node (parent is always a
        # known node, so the self-join is total)
        lut = labels.select(F.col("node").alias("pnode"), F.col("cluster").alias("pcluster"))
        g = (
            labels.join(lut, labels.cluster == lut.pnode)
            .select("node", F.col("cluster").alias("parent"), F.col("pcluster").alias("gp"))
        ).persist()

        # min grandparent over each node's neighbors
        nbr_g = (
            sym.join(g, sym.a == g.node)
            .groupBy(F.col("b").alias("tgt_node"))
            .agg(F.min("gp").alias("nbr_gp"))
        )

        # (target, candidate) proposals:
        hooked = g.join(nbr_g, g.node == F.col("tgt_node"), "left")
        cands = (
            # stochastic hooking: candidate lands on u's parent
            hooked.filter(F.col("nbr_gp").isNotNull()).select(
                F.col("parent").alias("tgt"), F.col("nbr_gp").alias("cand")
            )
            # aggressive hooking: candidate lands on u itself
            .union(
                hooked.filter(F.col("nbr_gp").isNotNull()).select(
                    F.col("node").alias("tgt"), F.col("nbr_gp").alias("cand")
                )
            )
            # shortcutting: u adopts its grandparent
            .union(g.select(F.col("node").alias("tgt"), F.col("gp").alias("cand")))
            .groupBy("tgt")
            .agg(F.min("cand").alias("new_cand"))
        )
        # the old label rides along into the checkpoint so convergence
        # is a column comparison on the checkpointed rows — not a
        # separate old-vs-new equi-join job per round
        with_old = (
            labels.join(cands, labels.node == cands.tgt, "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce("new_cand", "cluster")).alias(
                    "cluster"
                ),
                F.col("cluster").alias("old_cluster"),
            )
            # lazy checkpoint: the convergence count below is the
            # round's one materializing job — an eager checkpoint here
            # would add a second full computation per round
            .localCheckpoint(eager=False)
        )
        changed = with_old.filter(F.col("cluster") != F.col("old_cluster")).count()
        new_labels = with_old.select("node", "cluster")
        g.unpersist()
        labels = new_labels
        rounds += 1
        if changed == 0:
            break
    sym.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if changed != 0:
        # silent non-convergence would return split components — a
        # chain longer than max_iter must be an explicit error
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing — graph diameter exceeds max_iter)"
        )
    return labels


# one task comfortably union-finds this many (a, b) edges (two narrow
# columns ≈ tens of MB); beyond it the star rounds shrink the graph
# distributed until a later level fits
_ENDGAME_EDGES = 5_000_000


def _contract_local(e: DataFrame) -> DataFrame:
    """Partition-local union-find contraction: replace each
    partition's edge set by the spanning star of each LOCAL component,
    rooted at the local min node id (so emitted edges keep a < b).
    Connectivity across partitions is preserved — a node seen by k
    partitions emits up to k star edges, which chain its local roots
    together — so global components are unchanged. Per-task memory is
    O(nodes in partition): partition-bounded, never graph-bounded."""

    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra  # root stays the component min
        out_a, out_b = [], []
        for n in parent:
            r = find(n)
            if r != n:
                out_a.append(r)
                out_b.append(n)
        if out_a:
            yield pd.DataFrame({"a": out_a, "b": out_b})

    return e.mapInPandas(contract, e.schema)


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, cluster) by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm). Same contract as
    `connected_components` (cluster = component-min node id); a
    second, independently-derived engine for the same answer.

    Each round rewrites the EDGE set toward a star per component:

    - large-star: per node u with closed neighborhood min
      m = min(Γ(u) ∪ {u}), re-attach every STRICTLY LARGER neighbor
      to m — emit (v, m) for v ∈ Γ(u), v > u. Each undirected edge
      is processed at exactly one endpoint (the smaller), so the
      output edge count never grows.
    - small-star: orient every edge to its smaller endpoint, then per
      node u re-attach u and all its (now strictly smaller) neighbors
      to m — emit (u, m) and (v, m) for v ∈ Γ(u) \\ {m}.

    Both are one groupBy-min plus one broadcast-shaped join per
    round — no grandparent self-join — and the paper proves
    O(log² n) rounds worst-case (O(log n) in practice), so
    chain-shaped 100 TB graphs converge without the per-round label
    table that FastSV shortcuts through. Convergence = the small-star
    output reaches a fixpoint, detected by a one-scan (count,
    hash-sum, min, max) signature of the canonical edge set; each
    round's edges are localCheckpoint'ed to truncate lineage. The
    parity pytest (test_round6.py) pins this against
    `connected_components` on the documents near-dup graph, random
    graphs, and a 2000-node chain; SCALING.md records measured round
    counts for both engines."""
    # checkpoint the RAW edge list first: `nodes` and `e` both
    # consume it, and the caller's edge pipeline is typically the
    # expensive part (LSH verify) — deriving each eagerly from the
    # un-materialized input would execute that pipeline twice
    raw = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    # every endpoint must appear in the output even if its only edge
    # is a self-loop (dropped from the iteration below) — same
    # contract as connected_components
    nodes = raw.select(F.explode(F.array("a", "b")).alias("node")).distinct()
    # r15 (guide §1.2 step 1): partition-local contraction pre-pass.
    # Each task union-finds ITS OWN partition's edges and emits the
    # spanning star of every local component, rooted at the local
    # min id — a connectivity-preserving rewrite on the same vertex
    # set (Kiveris et al. §3 use exactly this reduction argument for
    # their star operations; merging edges a task already holds needs
    # no communication). The round loop below then starts from a
    # near-star graph and converges in 1-2 rounds instead of
    # O(log n) — each avoided round was a groupBy+join+distinct+
    # checkpoint+signature job cascade at ANY scale. Per-task state
    # is bounded by the partition's edge count (the 128 MB split),
    # NOT the graph: this is the standard two-phase CC decomposition,
    # not a driver collect. The label contract (component-min id) is
    # algorithm-independent, so results are bit-identical — pinned by
    # the engine-parity pytests on chains/random graphs/documents.
    e = (
        _contract_local(
            raw.filter(F.col("a") != F.col("b")).select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
        )
        .localCheckpoint(eager=True)
    )
    # Single-task endgame (the standard distributed-CC finish): once
    # the contracted star-edge set is small enough for one task —
    # ≤ _ENDGAME_EDGES edges, two narrow columns — a second
    # contraction over coalesce(1) sees EVERY edge in one union-find
    # and its output IS the exact global min-id star set: no rounds,
    # no per-round signature jobs. Size-gated on the actual contracted
    # edge count (data-derived, like tables.spread): graphs whose
    # contraction still exceeds the gate take the round loop below
    # unchanged. At 100 TB the first contraction is what shrinks a
    # corpus-scale edge list toward this gate; until it passes, the
    # loop's large/small-star rounds do the shrinking distributed.
    if e.count() <= _ENDGAME_EDGES:
        star_fix = _contract_local(e.coalesce(1)).localCheckpoint(eager=True)
        if stats is not None:
            stats["rounds"] = 0
        star = (
            star_fix.select(F.col("b").alias("node"), F.col("a").alias("cluster"))
            .union(
                star_fix.select(F.col("a").alias("node"), F.col("a").alias("cluster"))
            )
            .distinct()
        )
        return nodes.join(star, "node", "left").select(
            "node", F.coalesce("cluster", "node").alias("cluster")
        )

    def _signature(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a long sum of xxhash64 overflows
            # under ANSI mode
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
            F.min("a").alias("mna"),
            F.max("b").alias("mxb"),
        ).collect()[0]
        return (row["n"], row["h"], row["mna"], row["mxb"])

    sig = _signature(e)
    rounds = 0
    converged = False
    for _ in range(max_iter):
        # large-star: neighbors from BOTH orientations; only larger
        # neighbors re-attach, so process each edge at its smaller end
        sym = e.select("a", "b").union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        # persisted: the small-star step reads `large` twice (group
        # mins + re-attach join) — without this the large-star joins
        # re-execute per consumer
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("m").alias("a"), F.col("b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
        # small-star: edges already oriented (a < b) = to the smaller
        # endpoint; group at the LARGER endpoint u=b over neighbors
        # v=a < u, m = min neighbor; re-attach u and non-min neighbors
        smins = large.groupBy("b").agg(F.min("a").alias("m"))
        small = (
            large.join(smins, "b")
            .select(
                F.col("m").alias("a"),
                F.when(F.col("a") == F.col("m"), F.col("b")).otherwise(
                    F.col("a")
                ).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds += 1
        new_sig = _signature(small)
        large.unpersist()
        e = small
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint edges are stars (node → component min); roots self-map;
    # self-loop-only/isolated endpoints fall back to their own id
    star = (
        e.select(F.col("b").alias("node"), F.col("a").alias("cluster"))
        .union(e.select(F.col("a").alias("node"), F.col("a").alias("cluster")))
        .distinct()
    )
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce("cluster", "node").alias("cluster")
    )


@query(
    "q_dedup_clusters",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) - 2, 1)),
               i -> array_to_string(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    ), sym AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst, src FROM pairs
    ), reach AS (
      WITH RECURSIVE walk(node, seen) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, w.seen FROM walk w JOIN sym s ON s.a = w.node
      )
      SELECT * FROM walk
    )
    SELECT node, MIN(seen) AS cluster FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup groups: connected components over the LSH-verified
    near-dup pairs (≥0.5 true Jaccard). Spark side: LSH candidates →
    exact verify → large-star/small-star CC (round-6 swap: ~0.5-1 s
    faster than FastSV on the near-dup graph at sf0.1 — no per-round
    grandparent self-join; both engines parity-pinned in
    test_round6.py and both converge in 2 rounds on quasi-clique
    components). Oracle: all-pairs edges + recursive CTE
    reachability. The outputs match because the verified pair set is
    itself oracle-equal (q_lsh_verified_jaccard)."""
    from timestream_travel_spark.operators.dedup import lsh_verified_pairs_cached

    edges = lsh_verified_pairs_cached(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components_star(edges)


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) - 2, 1)),
               i -> array_to_string(regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5
    ), sym AS (
      SELECT src AS a, dst AS b FROM pairs
      UNION
      SELECT dst, src FROM pairs
    ), reach AS (
      WITH RECURSIVE walk(node, seen) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, w.seen FROM walk w JOIN sym s ON s.a = w.node
      )
      SELECT * FROM walk
    ), cc AS (
      SELECT node, MIN(seen) AS cluster FROM reach GROUP BY node
    ), lab AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster, d.n_chars
      FROM documents d LEFT JOIN cc c ON d.doc_id = c.node
    ), ranked AS (
      SELECT cluster, doc_id, n_chars,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM lab
    )
    SELECT cluster,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM ranked GROUP BY cluster
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup materialization manifest: every document is assigned to
    its near-dup cluster (connected components over LSH-verified
    pairs; unmatched docs are their own singleton cluster) and the
    KEPT representative is the longest member (n_chars desc, doc_id
    tiebreak) — the keep-the-longest policy common in corpus dedup,
    instead of q_dedup_clusters' min-id labeling. The argmax is one
    window pass per cluster partition; singletons join in with a
    left join + coalesce, so the corpus scans once. CC runs the
    large-star/small-star engine (round-6 swap, see
    q_dedup_clusters)."""
    from pyspark.sql.window import Window

    from timestream_travel_spark.operators.dedup import lsh_verified_pairs_cached

    d = load_table(spark, sf_dir, "documents")
    edges = lsh_verified_pairs_cached(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components_star(edges)
    lab = (
        d.select("doc_id", "n_chars")
        .join(labels, d.doc_id == labels.node, "left")
        .select(
            "doc_id",
            F.coalesce("cluster", "doc_id").alias("cluster"),
            "n_chars",
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = lab.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
    )
