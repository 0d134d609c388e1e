"""Relational graph analytics over an edge list — the co-occurrence /
similarity-graph readouts a training-data pipeline runs downstream of
the kNN-graph and entity-resolution operators (mutual_knn_graph in
operators/similarity.py, er blocking in operators/fuzzy.py): triangle
census for clustering structure, PageRank for node importance.

Everything is DataFrame joins — no driver-side graph, no GraphX/RDD:

- ``triangle_stats``: exact triangle count + wedge count + global
  clustering coefficient. Spark side orients each undirected edge from
  its lower-(degree, id) endpoint to the higher one, so the wedge join
  fans out on sum(out_deg^2) with out-degree bounded by ~sqrt(2|E|)
  (the standard compact-forward bound, Chiba-Nishizeki / Cohen's
  MapReduce formulation) — a whale node of degree 1M contributes
  out-wedges only up to its rank among neighbors, not 10^12 pairs.
  Count is identical to the naive u<v<w enumeration the SQL oracle
  runs, only the join order differs.
- ``pagerank``: K power-iteration steps with damping, unrolled as K
  join+groupBy rounds (each round = one shuffle keyed by node, the
  plan AQE-sizes independently). Deterministic closed recurrence, so a
  SQL oracle replays the same K rounds as chained CTEs. Dangling nodes
  (isolated after edge dedup) cannot occur in a symmetrized edge list,
  so mass is conserved exactly.

Scale shape: degree computation, orientation, and each PR round are
single-key shuffles on the node id; the only quadratic-looking step
(wedge enumeration) is the degree-bounded self-join above. For 100 TB
graphs, checkpoint/persist the oriented edge list once and reuse it
across both statistics (callers pass the same ``edges``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v; self-loops
    dropped. One groupBy-free distinct keyed on the canonical pair."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )


def triangle_stats(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """1 row (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_coeff): exact global triangle census of the undirected
    simple graph; clustering_coeff = 3 * triangles / wedges (0.0 for a
    wedge-free graph), rounded to 6.
    """
    # The canonical edge list is read three times (degrees, wedge
    # probe, edge count): cut the upstream lineage once so the
    # dedup/join producing it runs once, not three times.
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient each edge from the lower-(deg, id) endpoint: out-degree of
    # every node is then O(sqrt(|E|)), bounding the wedge self-join.
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        e.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    o2 = oriented.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    # Wedge at pivot a: two out-neighbors b, c (b != c); closing edge
    # may point either way under the orientation, so probe the
    # canonical (min, max) pair against the undirected edge set.
    wedges = (
        oriented.join(o2, F.col("a") == F.col("a2"))
        .filter(F.col("b") < F.col("c"))
        .select("a", F.col("b").alias("u"), F.col("c").alias("v"))
    )
    tri = wedges.join(e, ["u", "v"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles"))
    base = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # coalesce: SUM over an edgeless graph (e.g. self-loops only)
        # is NULL, the census should read 0
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long"),
            F.lit(0),
        ).alias("n_wedges"),
    )
    return (
        nodes.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
            .alias("clustering_coeff"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int = 5,
    damping: float = 0.85,
    copartition: bool = False,
) -> DataFrame:
    """PageRank on the undirected simple graph (each edge walked both
    ways): (node, pr) after ``iterations`` power steps from the uniform
    start, pr rounded to 6. r_{k+1}(u) = (1-d)/N + d * sum_{v~u}
    r_k(v) / deg(v); symmetrized edges have no dangling nodes, so the
    recurrence is mass-conserving and exactly replayable by an oracle
    that unrolls the same K rounds.

    ``copartition`` picks the power-step join strategy (both produce
    identical results; A/B-measured in round 11):

    - False (default): let AQE broadcast the rank vector into each
      step at runtime — the adjacency streams, neither side shuffles,
      and the only per-step exchange is the contribution regroup.
      Measured faster through sf1 (7.0s vs 8.7s steady-state sf1;
      2.5s vs 4.9s sf0.1): a static SMJ chain with no shuffle
      boundaries also denies AQE its replanning points.
    - True: bake HashPartitioning(u) into the checkpointed adjacency
      (captured with AQE momentarily off — under AQE the checkpoint's
      pre-execution partitioning is unknown and every step would
      re-shuffle the adjacency). The scale path for BILLION-node
      graphs, where the rank vector itself is too large to broadcast
      and per-step SMJ against the pinned adjacency partitioning is
      the only shuffle-bounded plan.
    """
    e = _canon_edges(edges, src, dst)
    both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # Materialize the degree-joined adjacency ONCE: the lineage cut
    # keeps iteration k from replaying the edge dedup k times and the
    # unrolled plan flat for Catalyst.
    spark = edges.sparkSession
    if copartition:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        aqe = "spark.sql.adaptive.enabled"
        prev = spark.conf.get(aqe, "true")
        spark.conf.set(aqe, "false")
        try:
            adj = (
                both.join(deg, "u")
                .repartition(nparts, "u")
                .localCheckpoint(eager=False)
            )
        finally:
            spark.conf.set(aqe, prev)
    else:
        adj = both.join(deg, "u").localCheckpoint(eager=False)
    n_nodes = deg.agg(F.count(F.lit(1)).alias("__n"))
    # rank table: (u, r). Uniform start; each round is one shuffle.
    r = deg.crossJoin(F.broadcast(n_nodes)).select(
        "u", (F.lit(1.0) / F.col("__n")).alias("r"))
    if copartition:
        r = r.repartition(nparts, "u")
    for _ in range(iterations):
        contrib = (
            adj.join(r, "u")
            .select(F.col("v").alias("u"), (F.col("r") / F.col("deg")).alias("__c"))
            .groupBy("u")
            .agg(F.sum("__c").alias("__in"))
        )
        r = contrib.crossJoin(F.broadcast(n_nodes)).select(
            "u",
            ((1 - damping) / F.col("__n") + damping * F.col("__in")).alias("r"),
        )
    return r.select(F.col("u").alias("node"), F.round("r", 6).alias("pr"))


def kcore(
    edges: DataFrame,
    src: str,
    dst: str,
    k: int,
    rounds: int = 6,
) -> DataFrame:
    """k-core of the undirected simple graph by ``rounds`` unrolled
    peeling rounds: (node, degree) for nodes surviving with core-
    subgraph degree >= k. Each round drops every node of current
    degree < k along with its edges; the TRUE k-core is the fixpoint —
    ``rounds`` bounds the unrolled plan (each round is one aggregate +
    two semi joins), and a converged run's last round is a no-op
    (convergence is the testable signal; the oracle replays the SAME
    bounded rounds as chained CTEs, so the contract is exact either
    way). Peeling removes at least one node per non-converged round, so
    rounds >= the peel depth — in practice O(log n) for social-ish
    degree distributions — reaches the fixpoint.

    The degeneracy core (max non-empty k) is this operator in a driver
    loop over k; at 100 TB each round's shuffle is degree-bounded and
    the edge list shrinks monotonically.
    """
    e = _canon_edges(edges, src, dst)
    both = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    for i in range(rounds):
        deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        both = (
            both.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
        )
        # cut the lineage every other round: the unrolled semi-join
        # chain would otherwise replay all prior rounds per action
        if i % 2 == 1 and i < rounds - 1:
            both = both.localCheckpoint(eager=False)
    return (
        both.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )


def adamic_adar(
    edges: DataFrame,
    src: str,
    dst: str,
    max_center_degree: int = 64,
    min_common: int = 2,
) -> DataFrame:
    """Link prediction over the undirected simple graph: for every
    NON-adjacent node pair sharing >= ``min_common`` common neighbors
    (through centers of degree <= ``max_center_degree``), emit
    (x, y, common_neighbors, adamic_adar) with
    adamic_adar = sum over common neighbors w of 1/ln(deg(w))
    (Adamic-Adar 2003) — the "these two SHOULD be connected" readout a
    pipeline runs on the kNN/co-occurrence graph to propose merges the
    edge threshold missed.

    The degree cap is part of the CONTRACT, not an approximation knob:
    a hub shared by everything (deg ~ |V|) carries ~zero Adamic-Adar
    weight by design (1/ln(deg) -> 0) yet would contribute deg^2
    candidate pairs — production link prediction excludes hub centers
    outright (the celebrity problem). Centers of degree 1 can't form a
    wedge and ln(1) = 0, so degree >= 2 is implicit.

    Scale shape: wedge enumeration joins the edge list to itself ON
    THE CENTER after a broadcast-joined degree filter, so fan-out is
    sum over kept centers of deg^2 <= max_center_degree * 2|E| —
    linear in edges for a fixed cap. The adjacency anti-join removes
    existing edges; everything is equi-keyed, nothing collected.
    """
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    b = e.select(F.col("u").alias("w"), F.col("v").alias("n")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = b.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = b.join(
        F.broadcast(
            deg.filter(
                (F.col("deg") >= 2) & (F.col("deg") <= max_center_degree))),
        "w",
    )
    x, y = centers.alias("x"), centers.alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.w") == F.col("y.w"))
            & (F.col("x.n") < F.col("y.n")),
        )
        .select(
            F.col("x.n").alias("u"),
            F.col("y.n").alias("v"),
            F.col("x.deg").alias("wdeg"),
        )
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.round(F.sum(1.0 / F.log("wdeg")), 6).alias("adamic_adar"),
    )
    return (
        scored.filter(F.col("common_neighbors") >= min_common)
        .join(e, ["u", "v"], "left_anti")
        .select(
            F.col("u").alias("x"),
            F.col("v").alias("y"),
            "common_neighbors",
            "adamic_adar",
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str,
    dst: str,
    rounds: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    2007) with a DETERMINISTIC tie-break: ``rounds`` unrolled update
    steps, each node adopting its neighborhood's most frequent label
    (ties -> smallest label; a node's own current label competes as one
    extra vote, which also keeps isolated-in-round nodes stable).
    Returns (node, community) — community ids are node ids, so two
    nodes share a community iff they converged to the same label.

    Synchronous + deterministic tie-break makes the recurrence a
    closed function of the edge list, so a SQL oracle replays the SAME
    rounds as chained CTEs; the classic async/random variant trades
    that reproducibility for faster convergence — wrong trade for a
    pipeline that must re-produce its own clustering.

    Scale shape: each round is one neighbor join keyed by node, one
    (node, label) count aggregate, and one max_by window-free argmax
    (struct-max) — three node-keyed shuffles per round, no driver
    state; the bounded unroll keeps the whole thing ONE plan AQE can
    size.
    """
    e = _canon_edges(edges, src, dst)
    both = (
        e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    labels = both.select("u").distinct().select(
        "u", F.col("u").alias("label"))
    for i in range(rounds):
        # neighbor votes + the node's own label as one extra vote
        votes = (
            both.join(
                labels.select(
                    F.col("u").alias("v"), F.col("label")), "v")
            .select("u", "label")
            .unionAll(labels.select("u", "label"))
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # argmax by (count desc, label asc) via a single struct max:
        # max of (n, -label) picks highest count, then smallest label
        labels = (
            votes.groupBy("u")
            .agg(F.max(F.struct(F.col("n"), (-F.col("label")).alias("nl")))
                 .alias("m"))
            .select("u", (-F.col("m.nl")).alias("label"))
        )
        if i % 2 == 1 and i < rounds - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels.select(F.col("u").alias("node"),
                         F.col("label").alias("community"))


def modularity(
    edges: DataFrame,
    src: str,
    dst: str,
    labels: DataFrame,
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community assignment over the
    undirected simple graph: 1 row (n_communities, n_edges,
    intra_edges, modularity). Q = sum over communities of
    (e_c / m - (deg_c / (2m))^2) — the quality score that says whether
    ``label_propagation``'s clusters beat a degree-preserving random
    graph (Q > ~0.3 = real structure). NULL for an edgeless graph.

    Scale shape: two broadcast-or-hash joins of the label table onto
    the edge list (node-keyed), one community aggregate, one bounded
    fold over |communities| rows — no pair enumeration anywhere.
    """
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    # Materialize the label table once: it feeds THREE join legs
    # (deg_c and both sides of intra), and when the caller passes a
    # label_propagation result the whole multi-round recurrence would
    # otherwise re-execute per leg (measured ~3x the LPA cost in
    # graph_modularity). Node-sized, so the checkpoint is cheap.
    lab = labels.select(
        F.col(node_col).alias("__n"), F.col(community_col).alias("__c")
    ).localCheckpoint(eager=False)
    m = e.agg(F.count(F.lit(1)).alias("__m"))
    both = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg_c = (
        both.join(lab.select(F.col("__n").alias("u"), "__c"), "u")
        .groupBy("__c").agg(F.count(F.lit(1)).alias("deg_c"))
    )
    intra = (
        e.join(lab.select(F.col("__n").alias("u"),
                          F.col("__c").alias("__cu")), "u")
        .join(lab.select(F.col("__n").alias("v"),
                         F.col("__c").alias("__cv")), "v")
        .filter(F.col("__cu") == F.col("__cv"))
        .groupBy(F.col("__cu").alias("__c"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    per_c = deg_c.join(intra, "__c", "left").na.fill({"e_c": 0})
    per_c = per_c.crossJoin(F.broadcast(m))
    q_c = (
        F.col("e_c") / F.col("__m")
        - (F.col("deg_c") / (2.0 * F.col("__m")))
        * (F.col("deg_c") / (2.0 * F.col("__m")))
    )
    return per_c.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.max("__m").alias("n_edges"),
        F.sum("e_c").alias("intra_edges"),
        F.when(F.max("__m") > 0, F.round(F.sum(q_c), 6)).alias("modularity"),
    )


def clustering_coefficient(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """Watts-Strogatz average LOCAL clustering coefficient: 1 row
    (n_nodes, n_eligible, n_closed, avg_local_cc, transitivity) — the
    per-node sibling of ``triangle_stats``'s global census.
    avg_local_cc averages 2*t_i / (deg_i * (deg_i - 1)) over nodes
    with deg >= 2 (n_eligible; nodes in no wedge have no defined
    coefficient and are excluded, the networkx convention for
    ``average_clustering(count_zeros=True)`` restricted to eligible
    nodes); n_closed counts nodes in >= 1 triangle; transitivity is
    the global 3*triangles/wedges for cross-checking.

    Same degree-oriented wedge enumeration as ``triangle_stats`` (each
    triangle materialized ONCE from its orientation-minimal pivot,
    Chiba-Nishizeki bound), then exploded to its 3 member nodes for the
    per-node counts — one extra node-keyed aggregate over 3x the
    triangle list, nothing quadratic beyond the bounded wedge join.
    avg rounded to 6. Zero-triangle/empty graphs report 0.0 averages.
    """
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        e.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    o2 = oriented.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    tri = (
        oriented.join(o2, F.col("a") == F.col("a2"))
        .filter(F.col("b") < F.col("c"))
        .select("a", F.col("b").alias("u"), F.col("c").alias("v"))
        .join(e, ["u", "v"], "left_semi")
    )
    per_node = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("u").alias("n")))
        .unionAll(tri.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("t"))
    )
    nd = deg.join(per_node, "n", "left").select(
        "n", "deg", F.coalesce("t", F.lit(0)).alias("t"))
    dd = F.col("deg").cast("double")
    local = F.col("t").cast("double") * 2 / (dd * (dd - 1))
    agg = nd.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("deg") >= 2, 1).otherwise(0)).alias("n_eligible"),
        F.sum(F.when(F.col("t") > 0, 1).otherwise(0)).alias("n_closed"),
        F.sum(F.when(F.col("deg") >= 2, local).otherwise(0.0)).alias("__cc"),
        F.sum(F.when(F.col("deg") >= 2, dd * (dd - 1) / 2).otherwise(0.0))
        .alias("__wedges"),
        (F.sum("t") / 3).cast("long").alias("__tri"),
    )
    return agg.select(
        "n_nodes", "n_eligible", "n_closed",
        F.when(F.col("n_eligible") > 0,
               F.round(F.col("__cc") / F.col("n_eligible"), 6))
        .otherwise(F.lit(0.0)).alias("avg_local_cc"),
        F.when(F.col("__wedges") > 0,
               F.round(3.0 * F.col("__tri") / F.col("__wedges"), 6))
        .otherwise(F.lit(0.0)).alias("transitivity"),
    )


def assortativity(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Degree assortativity (Newman 2002): 1 row (n_edges, n_nodes,
    mean_deg, r) — the Pearson correlation of endpoint degrees over
    every directed edge stub. r > 0: hubs attach to hubs (social
    shape); r < 0: hubs attach to leaves (hub-and-spoke / star shape —
    the signature of a dedup cluster collapsing onto one canonical
    doc). Pearson is shift-invariant, so degree and Newman's
    "remaining degree" (deg - 1) give the identical r.

    Scale shape: canonical edge dedup, one node-keyed degree
    aggregate, two broadcast-or-hash joins to stamp endpoint degrees,
    one 1-row moment aggregate — linear in edges, no wedge join at
    all. r is NULL for degree-regular graphs (zero variance); moments
    are integer sums (exact), only the final ratio is rounded (6 dp).
    """
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    # both directions: each undirected edge contributes 2 stubs
    stubs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    j = (
        stubs.join(deg.select(F.col("n").alias("u"), F.col("deg").alias("ju")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("deg").alias("jv")), "v")
    )
    ju = F.col("ju").cast("double")
    jv = F.col("jv").cast("double")
    m = j.agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(ju).alias("__sj"),
        F.sum(ju * ju).alias("__sjj"),
        F.sum(ju * jv).alias("__sjk"),
    )
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("deg").alias("__sdeg"),
    )
    mm = F.col("__m").cast("double")
    var = F.col("__sjj") / mm - (F.col("__sj") / mm) * (F.col("__sj") / mm)
    cov = F.col("__sjk") / mm - (F.col("__sj") / mm) * (F.col("__sj") / mm)
    return m.crossJoin(F.broadcast(nodes)).select(
        (F.col("__m") / 2).cast("long").alias("n_edges"),
        "n_nodes",
        F.round(F.col("__sdeg").cast("double") / F.col("n_nodes"), 6)
        .alias("mean_deg"),
        F.when(var > 0, F.round(cov / var, 6)).alias("r"),
    )


def jaccard_links(
    edges: DataFrame,
    src: str,
    dst: str,
    max_center_degree: int = 64,
    min_common: int = 2,
) -> DataFrame:
    """Jaccard-coefficient link prediction: for every non-adjacent
    pair sharing >= ``min_common`` common neighbors (through centers
    of degree <= ``max_center_degree``), emit (x, y, common_neighbors,
    jaccard) with jaccard = |N(x) ∩ N(y)| / |N(x) ∪ N(y)| — the
    normalized sibling of ``adamic_adar`` (AA weights rare centers
    up; Jaccard asks what FRACTION of the combined neighborhoods is
    shared, the right score when endpoint degrees vary wildly).

    Same wedge enumeration and celebrity-cap contract as
    ``adamic_adar`` (the cap bounds the candidate fan-out, and common
    counts through capped centers only). For internal consistency the
    union term uses the CAPPED neighborhood sizes too (|{w in N(x):
    2 <= deg(w) <= cap}|), so the score is the exact Jaccard of the
    capped neighborhoods rather than a capped numerator over full
    denominators, which systematically understated pairs sharing
    high-degree centers (r11 advice).
    """
    e = _canon_edges(edges, src, dst).localCheckpoint(eager=False)
    b = e.select(F.col("u").alias("w"), F.col("v").alias("n")).unionAll(
        e.select(F.col("v").alias("w"), F.col("u").alias("n")))
    deg = b.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    centers = b.join(
        F.broadcast(
            deg.filter(
                (F.col("deg") >= 2) & (F.col("deg") <= max_center_degree))
            .select("w")),
        "w",
    )
    x, y = centers.alias("x"), centers.alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.w") == F.col("y.w"))
            & (F.col("x.n") < F.col("y.n")),
        )
        .select(F.col("x.n").alias("u"), F.col("y.n").alias("v"))
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"))
    # capped neighborhood size per endpoint: how many of its neighbors
    # are eligible centers — the denominator consistent with the
    # capped common count (every scored endpoint has >= min_common
    # such neighbors, so the inner joins below drop nothing)
    cdeg = centers.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    du = cdeg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = cdeg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    union_sz = (
        F.col("du") + F.col("dv") - F.col("common_neighbors")
    ).cast("double")
    return (
        scored.filter(F.col("common_neighbors") >= min_common)
        .join(e, ["u", "v"], "left_anti")
        .join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.col("u").alias("x"),
            F.col("v").alias("y"),
            "common_neighbors",
            F.round(F.col("common_neighbors") / union_sz, 6)
            .alias("jaccard"),
        )
    )
