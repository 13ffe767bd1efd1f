"""Graph operators for dedup clustering: connected components over a
near-duplicate pair set.

The dedup pipeline is pairs → components → one canonical doc per cluster;
the reference has no graph stage (its dedup surface is absent entirely,
SURVEY §2.3), so this follows the standard large-scale design:

- **min-label propagation**: each node takes the min label among itself
  and its neighbors; iterate to fixpoint. Near-dup clusters are tiny and
  dense, so the iteration count is the cluster diameter (≤ ~5 in
  practice); each round is one shuffle (groupBy node) and lineage is cut
  with ``localCheckpoint`` so plans don't grow (iterative-loop hygiene).
- At extreme diameters (long chains), the alternating large-star/
  small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14) halves rounds to O(log n); label
  propagation is chosen here because near-dup graphs are
  diameter-bounded, not for simplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id reachable (deterministic canonical
    representative — the dedup 'keeper').
    """
    # Materialize the edge plan ONCE before the symmetric union: the union
    # references `edges` twice, and Spark evaluates common subplans twice —
    # for LSH-produced pair sets that would re-run the whole candidate
    # generation + verify pipeline.
    edges = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # Fixpoint detection without a compare-join: labels only ever decrease
    # (min-propagation is monotone), so the label sum is strictly decreasing
    # until convergence — one cheap aggregate on the already-checkpointed
    # frame replaces a per-round shuffle join.
    #
    # Measured dead end (kept as a note so it isn't retried): running TWO
    # propagation steps per checkpoint+sum to halve driver sync points is
    # NOT faster — propagate() references its input twice (neighbor join +
    # label join), so the un-checkpointed mid step is either recomputed per
    # branch or needs a persist() whose concurrent parent stages race the
    # cache and still double-compute. A/B at sf0.01/sf0.1: single-step
    # 0.9-1.8 s, double-step 1.4-1.8 s for the whole loop; the clusters
    # query's cost lives in LSH candidate generation, not this loop.
    def propagate(lbl: DataFrame) -> DataFrame:
        neighbor_min = (
            sym.join(lbl, sym["b"] == lbl["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        return lbl.join(neighbor_min, lbl["node"] == neighbor_min["a"], "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        )

    prev_sum = None
    for _ in range(max_iter):
        labels = propagate(labels).localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(
    pairs: DataFrame, id1: str = "d1", id2: str = "d2", cc_fn=None
) -> DataFrame:
    """Near-dup pair set → (doc_id, cluster_id, is_canonical): every
    clustered document labeled with its cluster's min doc id. ``cc_fn``
    selects the components algorithm (default min-label propagation;
    pass :func:`connected_components_logstar` for the diameter-
    independent variant) — ONE home for the output mapping either way."""
    cc = (cc_fn or connected_components)(pairs, id1, id2)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


PR_SCALE = 1_000_000


def pagerank_int(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Integer-quantized PageRank over an undirected pair set — ranks
    documents *within* near-dup clusters (the authority-based canonical
    choice, vs connected_components' min-id choice). Hash-verifiable by
    the same discipline as the k-means and BPE operators: ranks live in
    integer ``scale`` units, per-edge contributions are
    ``floor(rank / degree)`` (one IEEE division of exact integers +
    floor), the damped update is
    ``floor(0.15·scale) + floor(0.85 · Σ contrib)`` — every float op is a
    correctly-rounded operation on exactly-representable integers, so
    ``n_iter`` rounds produce identical ranks on any engine and any
    partitioning.

    Scale shape: each round is one join of the rank table onto the edge
    list (both co-keyed on the node, AQE-coalesced) and one
    partial-combined sum per destination; lineage is cut per round with
    ``localCheckpoint`` (the connected_components hygiene). The symmetric
    near-dup graph has no dangling nodes (every endpoint has degree ≥ 1),
    so no dangling-mass term is needed.

    Returns (node, deg, rank_int) for every node in ``edges``.
    """
    # materialize the edge plan ONCE before the symmetric union (the
    # connected_components lesson above: the union references the input
    # twice, and for LSH/Jaccard-produced pair sets that re-runs the whole
    # candidate pipeline); distinct() makes the operator safe for inputs
    # that already carry both orientations or repeated pairs — the graph
    # contract is unweighted, matching connected_components
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).localCheckpoint(
        eager=True
    )
    sym = (
        e.unionByName(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("s").agg(F.count("*").alias("deg"))
    base = (scale * (100 - damping_pct)) // 100
    ranks = deg.select(
        F.col("s").alias("node"), "deg", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = F.floor(F.col("r").cast("double") / F.col("deg")).cast("long")
        summed = (
            sym.join(ranks, sym["s"] == ranks["node"])
            .select(F.col("t"), contrib.alias("c"))
            .groupBy("t")
            .agg(F.sum("c").alias("sc"))
        )
        new_r = (
            F.lit(base)
            + F.floor(F.lit(damping_pct / 100.0) * F.col("sc")).cast("long")
        ).cast("long")
        ranks = (
            deg.join(summed, deg["s"] == summed["t"])
            .select(F.col("s").alias("node"), "deg", new_r.alias("r"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "deg", F.col("r").alias("rank_int"))


def connected_components_logstar(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond"):
    converges in O(log n) rounds *independent of graph diameter*, versus
    the min-label propagation of :func:`connected_components`, which
    needs diameter-many rounds. Near-dup graphs are clique-ish (tiny
    diameter), so both are fast there — this variant is the 100 TB choice
    for chain/mesh-shaped graphs (citation chains, web graphs) where the
    diameter is large.

    large-star: every node connects its strictly-larger neighbors to the
    minimum of its closed neighborhood; small-star: every edge is
    oriented (max → min) and each node connects its smaller neighbors
    (and itself) to that minimum. The alternation strictly shrinks a
    monotone potential; at the fixpoint the edge set is a star forest
    rooted at each component's minimum. Both phases are one groupBy over
    the (symmetrized / oriented) edge list — two shuffles per round,
    lineage cut with ``localCheckpoint`` per round, convergence detected
    by an order-independent edge-set checksum (count + id sums + xxhash
    sum) on the checkpointed frame.

    Returns (node, component) for every node appearing in ``edges`` —
    the same contract as :func:`connected_components` (equivalence is
    property-tested against a union-find model and the sibling operator).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def large_star(ed: DataFrame) -> DataFrame:
        sym = ed.unionByName(
            ed.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        return (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # orient max → min
        o = ed.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        m = o.groupBy("a").agg(F.min("b").alias("m"))
        nbrs = o.join(m, "a").filter(F.col("b") != F.col("m")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        selfe = m.select(F.col("a"), F.col("m").alias("b"))
        return nbrs.unionByName(selfe).filter(
            F.col("a") != F.col("b")
        ).distinct()

    def checksum(ed: DataFrame):
        row = ed.agg(
            F.count("*").alias("n"),
            # pmod-bound EVERY summed term, ids included: raw node ids on
            # the graphs this operator targets (xxhash64-derived doc ids,
            # web-graph ids) are billion-plus magnitude, and their int64
            # sum overflows under ANSI mode exactly like the raw hash sum
            # the comment below fixed — the fingerprint only needs
            # order-independence, not the true sums
            F.sum(F.pmod(F.col("a"), F.lit(1 << 31))).alias("sa"),
            F.sum(F.pmod(F.col("b"), F.lit(1 << 31))).alias("sb"),
            # pmod-bound each hash term: a raw xxhash64 sum overflows
            # int64 (ANSI error) after a few billion-magnitude terms
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1 << 31))).alias("h"),
        ).first()
        return (row["n"], row["sa"], row["sb"], row["h"])

    prev, converged = None, False
    for _ in range(max_iter):
        # checkpoint BETWEEN the phases too: small_star references its
        # input in three branches, and an un-materialized large-star plan
        # would re-run per branch (the recomputation trap documented at
        # the top of this file)
        mid = large_star(e).localCheckpoint(eager=True)
        e = small_star(mid).localCheckpoint(eager=True)
        cur = checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # an unconverged edge set is NOT a star forest — the join below
        # would emit duplicate (node, component) rows; fail loud instead
        raise RuntimeError(
            f"connected_components_logstar: no fixpoint in {max_iter} rounds"
        )
    # fixpoint: e is a star forest (child → root); roots map to themselves
    comp = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return all_nodes.join(comp, "node", "left").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
    )
