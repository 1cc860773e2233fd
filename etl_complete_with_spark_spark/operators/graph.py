"""Iterative graph operators on DataFrames: connected components.

Near-duplicate pairs form *clusters* (A~B, B~C ⇒ {A,B,C} even when A~C
fails the threshold). Proper dedup keeps exactly one representative per
connected component — the drop-every-id2 rule used by simple pipelines is
conservative (it can drop an entire chain). Connected components is the
canonical iterative-algorithm-on-DataFrames pattern:

- label propagation: every vertex starts labeled with itself; each round
  every vertex takes the min label in its neighborhood; converges in
  O(component diameter) rounds (near-dup clusters: 2-4).
- each round is one self-join + groupBy-min — pure DataFrame ops.
- ``localCheckpoint`` every round truncates the lineage, which otherwise
  grows linearly and blows up Catalyst analysis at iteration 10+ (the
  classic iterative-Spark trap).
- the convergence check (one ``count`` per round) is the only driver
  round-trip.

At 100 TB-scale graphs the same loop holds; production systems switch to
the large-star/small-star variant (fewer rounds on high-diameter graphs),
which this implementation's loop structure accommodates directly.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label connected components -> (id, component).

    ``edges``: undirected pairs (each pair listed once is enough).
    ``vertices``: optional full vertex set — isolated vertices (no edges)
    come back as their own singleton component. Deterministic: the
    component id is the minimum vertex id in the component.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        # NO distinct(): min-aggregation is duplicate-tolerant, and the
        # canonical id1<id2 pair input has no duplicates to begin with —
        # a distinct here was a full extra shuffle of the edge set (the
        # largest intermediate) for nothing
        # materialize once: every iteration joins sym, and without this the
        # whole upstream (e.g. a shingle-posting self-join producing the
        # near-dup edges) would re-execute per round
        .localCheckpoint()
    )
    verts = sym.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        verts = vertices.select(F.col(vertices.columns[0]).alias("id")).unionByName(verts).distinct()

    labels = verts.withColumn("component", F.col("id")).localCheckpoint()
    changed = 1
    for _ in range(max_iterations):
        # neighborhood minimum: each vertex adopts min(own, neighbors')
        neighbor_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
            .withColumnRenamed("a", "id")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
        ).localCheckpoint()  # truncate lineage every round
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    if changed != 0:
        # loud, not silent: labels from an unconverged propagation are a
        # WRONG component assignment, not an approximation
        warnings.warn(
            f"connected_components: not converged after {max_iterations} "
            "rounds (graph diameter exceeds the iteration budget); labels "
            "are incomplete — raise max_iterations or use "
            "connected_components_star",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "id1",
    dst: str = "id2",
    max_iterations: int = 25,
) -> DataFrame:
    """Large-star/small-star connected components -> (id, component).

    The production-scale variant of :func:`connected_components` for
    HIGH-DIAMETER graphs (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): min-label propagation needs O(diameter)
    rounds — fine for near-dup clusters (diameter 2-4), ruinous for a
    100 TB graph with million-hop chains — while alternating star
    operations converge in O(log n) rounds on any graph:

    - **large-star**: every vertex attaches its strictly-LARGER
      neighbors to the minimum of its neighborhood (including itself);
    - **small-star**: every vertex attaches its smaller-or-equal
      neighbors (and itself) to that minimum.

    Each operation is one groupBy-min + one join (same shuffle shape as
    a min-label round), one `localCheckpoint` per round truncates
    lineage, and the only driver traffic is the convergence signature:
    (edge count, sum of 64-bit edge hashes) — a fixpoint in the edge set
    is a fixpoint of the algorithm. The signature is collected via
    ``Dataset.observe`` ON the checkpoint action itself (metrics fire
    when the checkpoint materializes), so convergence costs ZERO extra
    jobs per round. Same output contract as the min-label variant:
    component id = minimum vertex id; isolated vertices (only via
    ``vertices``) are singletons; property-tested against a union-find
    oracle AND row-identical to `connected_components`.
    """
    # hash-sum in decimal(38): a long sum overflows ANSI arithmetic
    # after ~2^63/2^63-worth of edges; decimal can't
    sig_metrics = (
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    )
    obs0 = Observation()
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(obs0, *sig_metrics)
        .localCheckpoint()
    )
    all_verts = e.select(F.col("u").alias("id")).unionByName(
        e.select(F.col("v").alias("id"))
    )
    if vertices is not None:
        all_verts = all_verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("id"))
        )
    all_verts = all_verts.distinct().localCheckpoint()

    def large_star(cur: DataFrame) -> DataFrame:
        sym = cur.unionByName(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        # NO distinct here: the output is ≤ 2|e| rows (one per oriented
        # sym edge with v>u), small_star's groupBy-min and final distinct
        # absorb the duplicates — dropping the dedup saves a full shuffle
        # of the round's largest intermediate
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )

    def small_star(cur: DataFrame) -> DataFrame:
        # orient every edge high -> low, group by the high endpoint
        directed = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = directed.groupBy("u").agg(F.min("v").alias("m"))
        attach_lows = (
            directed.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        attach_self = m.select("u", F.col("m").alias("v"))
        return (
            attach_lows.unionByName(attach_self)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    got = obs0.get
    sig = (got["n"], got["h"])
    converged = False
    for _ in range(max_iterations):
        obs = Observation()
        e = (
            small_star(large_star(e))
            .observe(obs, *sig_metrics)
            .localCheckpoint()
        )
        got = obs.get
        new_sig = (got["n"], got["h"])
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # loud, not silent: labels from an unconverged edge set are a
        # WRONG component assignment, not an approximation
        warnings.warn(
            f"connected_components_star: edge-set fixpoint not reached "
            f"after {max_iterations} rounds; labels may be incomplete — "
            "raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )

    # after convergence the edges are star edges (vertex -> component min)
    roots = e.groupBy("u").agg(F.min("v").alias("component")).withColumnRenamed(
        "u", "id"
    )
    return (
        all_verts.join(roots, "id", "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("component"))
    )


def connected_components_auto(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "id1",
    dst: str = "id2",
    driver_threshold_edges: int = 1_000_000,
    star_threshold_edges: int = 100_000_000,
) -> DataFrame:
    """Adaptive components: pick the cheapest correct strategy by size.

    After near-dup filtering, the edge residue is usually TINY relative to
    the corpus — a million edges is ~16 MB of longs, and a driver-side
    union-find beats any distributed loop by orders of magnitude there
    (this is the small-graph shortcut production graph systems take).
    Above that, min-label propagation (few rounds, low per-round cost)
    up to ``star_threshold_edges``, then large-star/small-star (round
    count stays O(log n) on adversarial diameters). All three strategies
    produce the IDENTICAL labeling (component = min vertex id) — parity
    is what the tests pin, so the switch is purely a cost decision.

    The catalog queries deliberately call the distributed variants
    directly (the oracle gate must prove the distributed algorithms, not
    the shortcut); this entry point is the production default.

    The driver shortcut is taken only when the VERTEX side is also safe
    to collect: edge residues are often tiny while ``vertices`` is the
    corpus-sized id universe (passed for isolated-singleton output) —
    collecting that would OOM the driver at exactly the scale the
    distributed variants exist for. In that case only the edges are
    solved driver-side and the singleton fill-in stays distributed.
    """
    # materialize the (often expensive: shingle-posting self-join) edge
    # computation ONCE — the routing count would otherwise execute it and
    # the chosen branch would re-execute it from scratch
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    if n_edges <= driver_threshold_edges:
        # no cast: ids keep the distributed variants' contract (any
        # orderable type — longs or string doc-ids); NULL endpoints are
        # dropped like the distributed joins drop them
        rows = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
            .collect()
        )
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for r_ in rows:
            a, b = r_["a"], r_["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so the label contract holds directly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        spark = edges.sparkSession
        id_type = edges.schema[src].dataType
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("component", id_type)]
        )
        from ..localdata import local_rows_df

        labels = local_rows_df(spark, [(v, find(v)) for v in parent], schema)
        if vertices is None:
            return labels
        # singleton fill-in WITHOUT collecting the (possibly corpus-sized)
        # vertex set: a broadcast left join against the tiny label table
        verts = vertices.select(F.col(vertices.columns[0]).alias("id")).distinct()
        return verts.join(F.broadcast(labels), "id", "left").select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
        )
    if n_edges <= star_threshold_edges:
        return connected_components(edges, vertices, src, dst)
    return connected_components_star(edges, vertices, src, dst)


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    scale: int = 10**9,
) -> DataFrame:
    """PageRank in SCALED INTEGER arithmetic -> (node, rank) after a fixed
    number of power iterations.

    Why integers: float PageRank sums partial contributions in shuffle
    order, so two engines (or two runs) disagree in the last ulp and the
    drift compounds per iteration — unacceptable for an exact oracle AND
    for reproducible production reruns. Here ranks are int64 in units of
    1/``scale``: contrib = (rank * damping_pct) div (100 * out_degree),
    new rank = (scale * (100-damping_pct)) div 100 + sum(contribs).
    Integer sums are order-independent, so the result is bit-identical
    across engines, partitionings and retries. Quantization error is
    <= out_degree/scale per node per round — irrelevant for ranking.

    ``edges`` is directed (pass both directions for an undirected
    graph). Nodes = union of endpoints, so every node has out_degree
    >= 1 and there is no dangling-mass term. Per iteration: ONE join of
    the degree-annotated edge table onto the rank table and one
    groupBy-sum — the same bounded-round shape as connected_components;
    ``localCheckpoint`` per round truncates lineage. (The out-degree is
    denormalized onto the edge table once up front instead of re-joined
    every round; and when one upfront count shows every node has an
    in-edge — true for any undirected/bipartite-both-ways construction —
    the per-round left-join against the node table is skipped entirely,
    because the contribution aggregate already covers every node.
    Halves the per-round shuffles; measured 9.4 s -> ~4 s at sf0.1 on
    the supplier graph.) Fixed iteration count (the production norm at
    scale) rather than convergence polling: zero extra driver jobs.
    """
    # Lazy-checkpoint the RAW edge list first: deg, nodes, the degree
    # join and the receives-probe counts are SEPARATE driver jobs, and
    # without the cache each re-evaluates the caller's whole upstream
    # plan (for pagerank_suppliers: the orders⋈lineitem distinct, ~3
    # extra passes — measured in SCALING.md's round-8 ABAB table).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=False
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)  # ranks init + receives-probe count
    )
    # denormalize the out-degree onto the edge list ONCE; reused each round
    e = e.join(deg, "src").localCheckpoint()
    teleport = (scale * (100 - damping_pct)) // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long")).localCheckpoint()
    every_node_receives = (
        e.select(F.col("dst").alias("node")).distinct().count()
        == nodes.count()
    )
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * {damping_pct}) div (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("recv"))
        )
        if every_node_receives:
            ranks = contribs.select(
                "node",
                (F.lit(teleport) + F.col("recv")).cast("long").alias("rank"),
            ).localCheckpoint(eager=False)
        else:
            ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (F.lit(teleport) + F.coalesce(F.col("recv"), F.lit(0)))
                    .cast("long")
                    .alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count via the degree-ordered node-iterator join.

    Returns a single-row DataFrame ``(n_nodes, n_edges, n_triangles)``
    over the undirected simple graph induced by ``edges`` (self-loops
    dropped, direction and duplicates collapsed).

    Scale design: each undirected edge is *oriented* from its lower to
    its higher endpoint under the total order (degree, id). Orientation
    makes the graph a DAG in which every triangle ``a < b < c`` appears
    as exactly the edge pattern ``a->b, a->c, b->c``, so summing
    ``|N_out(u) ∩ N_out(v)|`` over oriented edges ``(u, v)`` counts each
    triangle exactly once. The out-neighborhoods are materialized as
    per-vertex sorted arrays — bounded by O(sqrt(m)) elements under
    degree orientation, so a row never blows up on hub vertices — and
    the count is two joins of the edge list against that adjacency
    table plus an array intersection per edge. Versus the classic
    wedge-enumeration join (generate all N_out(u)² wedge rows, probe
    the edge set), this never shuffles the O(m^1.5) wedge stream: the
    shuffled volume stays O(m · sqrt(m) worst case, O(m · avg_outdeg)
    typical) inside array payloads, with the intersection done
    map-side. Everything is joins + aggregates, no driver-side state.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()
    # three consumers (degrees, orientation join, edge count)
    und = und.localCheckpoint(eager=False)
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    oriented = (
        und.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("s")
        )
        .select("s.u", "s.v")
        # two consumers (adjacency build + the per-edge intersection scan)
        .localCheckpoint(eager=False)
    )
    # per-vertex out-neighborhood, sorted — O(sqrt(m))-bounded arrays
    adj = oriented.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    tri = (
        oriented.join(adj.select(F.col("u"), F.col("nbrs").alias("nu")), "u")
        .join(
            adj.select(F.col("u").alias("v"), F.col("nbrs").alias("nv")),
            "v",
            "left",  # sinks of the orientation DAG have no out-list
        )
        .select(
            F.size(
                F.array_intersect(F.col("nu"), F.coalesce(F.col("nv"), F.array()))
            ).alias("t")
        )
        .agg(F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``rounds`` iterations of k-core peeling: each round removes every
    vertex whose CURRENT degree is below k (and its edges), then
    recomputes. Returns (node, deg) of the surviving subgraph.

    Fixed round count, like kmeans_int: the job graph stays static and
    the whole iteration is replayable as chained SQL CTEs (the oracle of
    ``kcore_coorder_parts``). Production wraps the same body in a
    converge-until-stable loop — one count per round, same shape as
    connected_components. Per round: one degree aggregation + two
    semi-joins against the (shrinking) survivor set; lineage is
    checkpointed per round so Catalyst analysis stays O(1) per
    iteration. Everything shuffles on vertex ids — no driver state.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    for _ in range(rounds):
        keep = degrees(und).filter(F.col("deg") >= k).select("v")
        und = (
            und.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return degrees(und).select(
        F.col("v").alias("node"), F.col("deg").cast("long").alias("deg")
    )


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Unweighted multi-source BFS, ``rounds`` frontier expansions ->
    (node, dist) for every node within ``rounds`` hops of any source.

    Each round: one join of the current distance table onto the
    (symmetrized) edge list + one groupBy-min — the relational frontier
    expansion. Fixed round count keeps the job graph static and makes
    the whole iteration CTE-replayable (``bfs_coorder_parts``), exactly
    like kmeans_int / kcore_peel; production swaps in a
    converge-when-frontier-empty loop with the same body. Lineage is
    checkpointed per round. Distances are exact integers.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = sources.select(
        F.col(sources.columns[0]).alias("node"), F.lit(0).cast("long").alias("dist")
    ).localCheckpoint(eager=False)
    frontier = visited
    for r in range(1, rounds + 1):
        # FRONTIER-ONLY expansion: join edges against the last level's
        # nodes, not the whole visited set — per-round work tracks the
        # frontier size (the textbook BFS invariant; at 100 TB the
        # visited set dwarfs the frontier after a few hops), and the
        # anti-join discards already-settled nodes so the min-dist
        # groupBy only deduplicates WITHIN the new level.
        frontier = (
            sym.join(
                frontier.select(F.col("node").alias("a")), "a"
            )
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(r).cast("long"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(frontier).localCheckpoint(eager=False)
    return visited


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection, ``rounds``
    fixed iterations -> (node, label).

    Every node starts labeled with itself; each round every node adopts
    the label most frequent among its NEIGHBORS' current labels (ties
    to the smallest label — fully deterministic, unlike the classic
    randomized-order LPA). Per round: one edge join + one (node, label)
    count + one per-node top-1 window (partitioned by node — bounded
    partitions). Fixed rounds + deterministic tie-break ⇒ chained-CTE
    replay oracle, like kmeans/kcore/BFS. Nodes are the edge endpoints,
    so every node has a neighbor and the adopt step is total.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        # top-1 label per node as a max-of-struct AGGREGATE, not a rank
        # window: (c, -label) maximized == highest count, ties to the
        # smallest label — two hash aggregates instead of a per-node
        # sort, and map-side partials cap the second shuffle at
        # node-cardinality rows per partition.
        labels = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("top")
            )
            .select("node", (-F.col("top.nl")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


def hits_scores(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**6,
) -> DataFrame:
    """HITS hubs & authorities in scaled-integer arithmetic ->
    (node, role, score) with role in {'hub', 'auth'}.

    Directed edges: hubs live on the src side, authorities on the dst
    side (a node appearing on both sides carries both scores). Each
    round: auth'(v) = Σ hub(u) over in-edges, hub'(u) = Σ auth(v) over
    out-edges, each renormalized to max = ``scale`` by integer
    multiply-then-truncate-divide — the same exactness contract as
    pagerank_fixed_point (integer sums are shuffle-order-independent,
    so results are bit-identical across engines and the whole iteration
    replays as chained CTEs). The per-round max is a 1-row aggregate
    cross-joined back (never collected). int64 headroom: scores <=
    scale, degree sums <= deg·scale, rescale multiplies by scale —
    safe while deg·scale² < 2^63 (deg up to ~9e3 at scale 1e6). The
    bound is ENFORCED, not assumed: the max in/out-degree is measured
    up front (one aggregate over the deduped edge set) and, if
    deg·scale² would overflow, ``scale`` shrinks to the largest safe
    value with a RuntimeWarning — coarser score granularity, never a
    silent int64 wraparound.
    """
    if iters < 1:
        raise ValueError(f"hits_scores: iters must be >= 1, got {iters}")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg_max = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .count()
        .agg(F.max("count").alias("m"))
        .first()[0]
    )
    if deg_max is None:
        raise ValueError("hits_scores: empty edge set")
    if deg_max * scale * scale >= 2**63:
        safe = math.isqrt((2**63 - 1) // deg_max)
        warnings.warn(
            f"hits_scores: max degree {deg_max} at scale {scale} would "
            f"overflow int64 (deg*scale^2 >= 2^63); rescaled to "
            f"scale={safe}",
            RuntimeWarning,
            stacklevel=2,
        )
        scale = safe
    hub = (
        e.select(F.col("u").alias("node")).distinct()
        .withColumn("score", F.lit(scale).cast("long"))
        .localCheckpoint(eager=False)
    )
    auth = None
    for _ in range(iters):
        raw_auth = (
            e.join(hub.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("score").alias("s"))
        )
        am = raw_auth.agg(F.max("s").alias("m"))
        auth = (
            raw_auth.crossJoin(F.broadcast(am))
            .select("node", F.expr(f"s * {scale} div m").alias("score"))
            .localCheckpoint(eager=False)
        )
        raw_hub = (
            e.join(auth.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("score").alias("s"))
        )
        hm = raw_hub.agg(F.max("s").alias("m"))
        hub = (
            raw_hub.crossJoin(F.broadcast(hm))
            .select("node", F.expr(f"s * {scale} div m").alias("score"))
            .localCheckpoint(eager=False)
        )
    return hub.select("node", F.lit("hub").alias("role"), "score").unionByName(
        auth.select("node", F.lit("auth").alias("role"), "score")
    )
