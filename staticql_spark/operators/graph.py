"""Graph propagation operators (beyond-reference analytics family).

The reference engine has no graph surface at all; near-dup clustering
(dedup.connected_components) was the first propagation operator in this
repo, and :func:`pagerank` generalizes the family: iterative message
passing as plain DataFrame joins + map-side-combined aggregations, with
``localCheckpoint`` lineage truncation per round (the standard Spark
iterative-algorithm discipline — without it the plan doubles per
iteration and the driver becomes the bottleneck).

Scale shape per iteration: one equi join of edges⨝ranks on the source id
(both sides hash-partitioned on it), one groupBy-sum keyed by destination
(map-side combined — shuffle volume is |nodes|, not |edges|), and a
1-row dangling-mass aggregate broadcast back.  At 100 TB of edges each
round is two shuffles over node-keyed rows; no step ever materializes to
the driver.

A FIXED small iteration count keeps the whole computation SQL-expressible
by unrolling — the same oracle strategy as similarity.kmeans_fit — so the
``events_pagerank`` driver query gets full value-hash verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Standard power iteration: every node starts at 1/N; each round a node
    sends rank/out_degree along its out-edges, and ranks refresh as
    (1-d)/N + d * (received + dangling_mass/N).  Dangling nodes (no
    out-edges) redistribute their mass uniformly, so total rank stays 1.

    Determinism: no RNG anywhere; the only cross-engine fp sensitivity is
    summation order, handled by rounding the FINAL ranks (``round_to``) —
    with a handful of iterations the accumulated noise stays orders of
    magnitude below the rounding granularity.

    The node count and per-round dangling mass are 1-row aggregates
    broadcast back into the plan (the doc_rebalance idiom) — no driver
    collect in the loop.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("__n"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("__deg"))

    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__recv"))
        )
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__recv"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", round_to).alias("rank"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    -> (node, community).  Every node starts labeled with its own id;
    each round every node adopts the most frequent label among its
    in-neighbors (pass a bidirected edge list for undirected semantics),
    ties broken to the SMALLEST label — the synchronous schedule plus the
    deterministic tie-break removes the RNG the classic async LPA needs,
    so results are reproducible and SQL-expressible.  Communities are a
    coarser, density-driven complement to connected_components: a bridge
    edge keeps two dense near-dup blobs in one component but LPA keeps
    their labels apart — the granularity a curation keep-one-per-cluster
    rule usually wants.

    Scale shape per round (same discipline as :func:`pagerank`): one
    edges⨝labels equi join on the source id, one (node, label) count
    aggregate (map-side combined), one argmax-by-struct-min per node —
    shuffle volume is O(|edges|) message rows of (id, label), never
    vector or text payloads; ``localCheckpoint`` truncates lineage per
    round.  A FIXED small ``iters`` keeps the whole computation
    unrollable by the DuckDB oracle (the kmeans_fit strategy).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(iters):
        msgs = e.join(labels, e.src == labels.node).select(
            F.col("dst").alias("node"), "community"
        )
        counts = msgs.groupBy("node", "community").agg(F.count("*").alias("__c"))
        new = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("__c")).alias("nc"), F.col("community"))
                ).alias("__m")
            )
            .select("node", F.col("__m.community").alias("__new"))
        )
        labels = (
            labels.join(new, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("community")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def label_propagation_incr(
    old_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 1,
) -> DataFrame:
    """Incremental label propagation: fold a BATCH of new edges into an
    existing community assignment without re-running LPA over the full
    graph — the graph member of the repo's incremental family
    (incremental LSH / SemDeDup / IVF append: daily cost tracks the
    batch, never the corpus).  Nodes keep their old community as the
    frozen prior; a node incident to new edges re-votes from its
    NEW-edge neighbors' labels (most frequent; ties favor the node's
    current label, then smallest — deterministic, and an established
    node never flips on a 1-1 tie); nodes the
    batch never touches are passed through untouched, so the only work
    is O(|new edges|) message rows plus one join against the old
    assignment.

    Semantics note: this is the standard one-shot fold — labels can lag
    a full re-run when a batch edge SHOULD cascade relabels deep into
    the old graph (the same freshness trade the other incremental
    operators document); re-run :func:`label_propagation` periodically
    to re-converge.
    """
    e = (
        new_edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # prior: old community where known, self-label for brand-new nodes
    prior = (
        touched.join(old_labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("community"), F.col("node")).alias("community"),
        )
    )
    labels = prior
    for _ in range(iters):
        # messages travel over the NEW edges only; senders vote with
        # their current incremental label (old nodes: frozen prior).
        # Each ESTABLISHED node (one with a real old-assignment prior)
        # also casts ONE self-vote for its own current label — without
        # it a node with 50 old-graph edges and 1 new edge would flip to
        # the lone new neighbor (the new-edge view has no memory of old
        # support) — and ties break in FAVOR of the node's current label
        # (then min): a lone new vote merely ties the self-vote, so an
        # established node never flips on a 1-1 tie regardless of how
        # the community ids happen to sort (r6 ADVICE: the old min-label
        # tie-break still flipped whenever the new id sorted first).
        # Brand-new nodes get NO self-vote: their self-label is mere
        # initialization, not support — a single real neighbor vote
        # should win, so a 1-edge newcomer adopts its neighbor's
        # community instead of lingering as a singleton.
        self_votes = labels.join(
            old_labels.select("node"), "node", "left_semi"
        ).select("node", "community")
        msgs = e.join(labels, e.src == labels.node).select(
            F.col("dst").alias("node"), "community"
        ).unionByName(self_votes)
        counts = msgs.groupBy("node", "community").agg(F.count("*").alias("__c"))
        cur = labels.select("node", F.col("community").alias("__prior"))
        new = (
            counts.join(cur, "node")
            .groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c")).alias("nc"),
                        F.when(F.col("community") == F.col("__prior"), 0)
                        .otherwise(1)
                        .alias("np"),
                        F.col("community"),
                    )
                ).alias("__m")
            )
            .select("node", F.col("__m.community").alias("__new"))
        )
        labels = (
            labels.join(new, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("__new"), F.col("community")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
    untouched = old_labels.join(touched, "node", "left_anti")
    return untouched.unionByName(labels)


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph — the
    local clustering signal (on a near-dup pair graph, a node's triangle
    count says whether its duplicate family is a dense template cluster
    or a chain of borderline matches).

    Input edges may be directed/duplicated; they are canonicalized to
    a < b and deduplicated first.  Enumeration uses DEGREE ORIENTATION
    (each edge points from its lower-(degree, id) endpoint): every
    wedge-join then fans out by a vertex's ORIENTED out-degree, which is
    O(sqrt(|E|)) even for hub nodes — the standard fix for the
    celebrity-vertex blow-up that kills naive id-ordered enumeration at
    scale.  Each triangle is found exactly once (at its lowest-order
    apex), then credited to all three corners with one explode +
    map-side-combined count.

    Returns (node, n_triangles), nodes with >= 1 triangle.
    """
    # the canonical edge set is referenced three times (degrees, the
    # oriented wedges, and the closing-edge probe) — an eager checkpoint
    # evaluates the (possibly expensive — LSH pairs) upstream ONCE, the
    # same recompute fix as connected_components' symmetrize (r6)
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select("b"))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, id): u -> w iff (d_u, u) < (d_w, w)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    w1 = oriented.select(F.col("u"), F.col("w").alias("w1"))
    w2 = oriented.select(F.col("u"), F.col("w").alias("w2"))
    wedges = w1.join(w2, "u").filter(F.col("w1") < F.col("w2"))
    # a wedge u->w1, u->w2 closes iff (w1, w2) is an oriented edge in
    # EITHER direction — membership in the canonical a<b set suffices
    closed = wedges.join(
        e.select(F.col("a").alias("w1"), F.col("b").alias("w2")).unionAll(
            e.select(F.col("b"), F.col("a"))
        ),
        ["w1", "w2"],
    )
    corners = closed.select(
        F.explode(F.array("u", "w1", "w2")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """Personalized PageRank from a seed set -> (node, rank, is_seed) —
    graph-based data SELECTION: seed a few trusted/high-quality
    documents, run PPR over the similarity/link graph, and the rank
    ranks the rest of the corpus by multi-hop proximity to the seeds
    (the classic seed-expansion recipe, e.g. Eisenstein-style quality
    propagation; same family as TrustRank).

    Differs from :func:`pagerank` only in the reset distribution: all
    restart mass (teleport AND dangling) returns to the SEEDS uniformly
    instead of to every node — so rank concentrates in the seeds'
    neighborhood and decays with graph distance.  Nodes unreachable from
    the seeds get rank exactly 0.

    Same scale shape as pagerank: per round one edge⨝rank join, one
    dest-keyed map-side-combined sum, 1-row broadcast aggregates, eager
    localCheckpoint lineage truncation; unrolled fixed rounds keep it
    SQL-expressible for the oracle.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct().join(nodes, "node")
    ns = sd.agg(F.count("*").cast("double").alias("__ns"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("__deg"))
    seed_flag = nodes.join(
        sd.withColumn("__seed", F.lit(1.0)), "node", "left"
    ).select("node", F.coalesce("__seed", F.lit(0.0)).alias("__seed"))

    ranks = seed_flag.crossJoin(F.broadcast(ns)).select(
        "node", (F.col("__seed") / F.col("__ns")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__recv"))
        )
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        ranks = (
            seed_flag.join(contrib, seed_flag.node == contrib.dst, "left")
            .crossJoin(F.broadcast(ns))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) * F.col("__seed") / F.col("__ns")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__recv"), F.lit(0.0))
                        + F.col("__dang") * F.col("__seed") / F.col("__ns")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(sd.withColumn("__is", F.lit(True)), "node", "left")
        .select(
            "node",
            F.round("rank", round_to).alias("rank"),
            F.coalesce("__is", F.lit(False)).alias("is_seed"),
        )
    )
