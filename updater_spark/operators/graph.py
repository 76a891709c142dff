"""Graph centrality over an edge list — fixed-iteration PageRank.

A large-scale training-data pipeline ranks documents by link-graph
authority (the original web-quality signal: Brin & Page 1998; used
today to pick crawl frontiers and to weight corpus sampling — e.g.
Common Crawl's harmonic-centrality ordering). The reference engine
has no graph operator (its sibling of "derived global signal" is the
tribe_stats rollup, /root/reference/src/download.py:607-637); this is
extension surface, same family as ``operators/clusters.py``'s
connected components.

Spark-first shape (per iteration):

- ``contrib``: one equi-join of the rank vector onto the edge list on
  ``src`` + one ``groupBy(dst).sum`` — the classic two-shuffle
  PageRank step. The EDGE LIST is the big side and is hash-partitioned
  on ``src`` ONCE up front (``repartition(src)`` + persist); the rank
  vector (|V| rows, two columns) re-shuffles each round, which is the
  cheap side. At 100 TB the edges never move after the initial
  partitioning — the same "partition the static side once" discipline
  as ``clusters.connected_components``.
- dangling mass (nodes with no out-edges) is a 1-row aggregate
  collected per iteration — a k-row-bounded collect (k=1), never a
  corpus collect.
- lineage is truncated each round with ``localCheckpoint`` (same
  rationale as clusters.py: a DataFrame loop otherwise grows a plan
  linear in rounds and Catalyst analysis time blows up).

Fixed ``iterations`` (not convergence-tested) keeps the operator
deterministic and ORACLE-expressible: the DuckDB twin is the same
recurrence unrolled as chained CTEs. Rank values are rounded only at
the very end (``round_digits``) — intermediate rounding would
compound across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    round_digits: int = 6,
    broadcast_node_limit: int = 500_000,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Recurrence (the standard formulation with dangling-mass
    redistribution):

        pr_0(v)   = 1/N
        pr_t+1(v) = (1-d)/N
                    + d * ( Σ_{(u,v)∈E} pr_t(u)/outdeg(u)
                            + dangling_t / N )
        dangling_t = Σ_{u: outdeg(u)=0} pr_t(u)

    Duplicate edges are collapsed (a repeated link is one link — the
    crawl-graph convention); self-loops are kept (they are valid
    out-edges). Returns ``(node, pr)`` with ``pr`` rounded to
    ``round_digits`` at the end only.

    PERSONALIZED PageRank: pass ``seeds`` (a single-column DataFrame
    of node ids) and the teleport distribution becomes uniform over
    the seed set instead of all nodes — ``base(v) = 1/|S|`` for seeds,
    0 elsewhere; both the ``(1−d)`` restart mass and the dangling mass
    redistribute per ``base``. This is seed-set corpus expansion (the
    WebText-style "documents close to a trusted set" curation signal):
    rank concentrates in the seeds' neighborhood instead of global
    authority. Seeds not present in the graph are ignored; an empty
    intersection raises.

    When the measured node count is under ``broadcast_node_limit``
    the rank vector and degree table broadcast into every iteration's
    joins — the persisted edge list then NEVER re-shuffles (map-side
    contrib join; the only exchange left is the 2-column partial-agg
    of contributions). Above the limit the joins fall back to shuffles
    against the once-partitioned edges: since the edges keep their
    ``src`` hash partitioning, the fallback only ever moves the
    rank-vector side, which beats re-broadcasting it per iteration
    once |V| is large (measured crossover on local[32], warm,
    ``bench_scale.py pagerank``: broadcast 1.09× at 200k nodes,
    0.79× at 2M — hence the 500k default). The gate is a measured
    count, not a guess (the broadcast-gating discipline from
    plans/cdc.py)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        # ONE exchange: hash-partition on the join key, then dedupe —
        # HashPartitioning(src) already co-locates equal (src, dst)
        # rows, so the planner satisfies the dedup's clustering
        # requirement without a second shuffle (distinct-then-
        # repartition would shuffle twice)
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    try:
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()  # also materializes the persists
        small = n < broadcast_node_limit

        def _bc(df: DataFrame) -> DataFrame:
            return F.broadcast(df) if small else df

        outdeg = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint(eager=True)
        )

        # teleport distribution: uniform (classic) or seed-uniform
        # (personalized); base rides the nodes frame through every
        # iteration's final select
        if seeds is None:
            nodes_b = nodes.select(
                "node", F.lit(1.0 / n).alias("base")
            ).localCheckpoint(eager=True)
        else:
            if len(seeds.columns) != 1:
                raise ValueError(
                    f"seeds must be a single-column id frame; got "
                    f"{seeds.columns}"
                )
            seed_ids = seeds.select(
                F.col(seeds.columns[0]).alias("node")
            ).distinct()
            in_graph = nodes.join(seed_ids, "node", "semi")
            s = in_graph.count()
            if s == 0:
                raise ValueError(
                    "no seed id is present in the graph — the teleport "
                    "distribution would be empty"
                )
            nodes_b = nodes.join(
                in_graph.withColumn("_s", F.lit(1)), "node", "left"
            ).select(
                "node",
                F.when(F.col("_s").isNotNull(), F.lit(1.0 / s))
                .otherwise(F.lit(0.0))
                .alias("base"),
            ).localCheckpoint(eager=True)

        pr = nodes_b.select("node", F.col("base").alias("pr"))
        prev = None
        for _ in range(iterations):
            pr = pr.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = pr
            # 1-row bounded collect: the dangling mass this round
            dangling = (
                pr.join(
                    _bc(outdeg), pr["node"] == outdeg["src"], "anti"
                )
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
                .collect()[0][0]
            )
            contrib = (
                e.join(_bc(outdeg), "src")
                .join(
                    _bc(pr.select(F.col("node").alias("src"), "pr")),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("pr") / F.col("deg")).alias("contrib"))
            )
            pr = nodes_b.join(_bc(contrib), "node", "left").select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("base")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(dangling) * F.col("base")
                    )
                ).alias("pr"),
            )
        out = pr.select(
            "node", F.round(F.col("pr"), round_digits).alias("pr")
        )
        # materialize before releasing the cached inputs
        out = out.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        return out
    finally:
        e.unpersist()
        try:
            nodes.unpersist()
        except Exception:
            pass


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, made deterministic): every node starts labeled with
    its own id; each round, every node adopts the label most frequent
    among its neighbors (edges treated as undirected), breaking count
    ties by MINIMUM label; an isolated convention-free update order is
    what makes classic LPA nondeterministic — synchronous rounds + the
    total (count DESC, label ASC) tie-break make this run
    reproducible AND oracle-expressible (the unrolled-CTE discipline
    of ``pagerank``). Fixed ``iterations`` (communities in near-clique
    graphs settle in 2-4 rounds; synchronous LPA can 2-cycle on
    bipartite structures, which a fixed cutoff simply truncates).

    The graph trio this completes: ``pagerank`` (centrality, this
    module), ``clusters.connected_components`` (reachability),
    label propagation (density — a bridge edge joins two components
    into one CC but LPA keeps the dense sides apart).

    Spark shape per round: one join of the label vector onto the
    symmetrized edge list + one two-key groupBy + one per-node argmax
    window — the edge list is hash-partitioned on ``a`` once and
    persisted; lineage truncated per round. Returns ``(node, label)``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    half = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    sym = (
        half.union(
            half.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))  # self-loops don't vote
        .repartition("a")
        .dropDuplicates(["a", "b"])
        .persist()
    )
    try:
        nodes = sym.select(F.col("a").alias("node")).distinct().persist()
        nodes.count()
        from pyspark.sql import Window

        lab = nodes.select("node", F.col("node").alias("label"))
        prev = None
        for _ in range(iterations):
            lab = lab.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = lab
            votes = (
                sym.join(
                    lab.select(F.col("node").alias("b"), "label"), "b"
                )
                .groupBy(F.col("a").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            w = Window.partitionBy("node").orderBy(
                F.col("n").desc(), F.col("label").asc()
            )
            lab = (
                votes.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("node", "label")
            )
        out = lab.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        return out
    finally:
        sym.unpersist()
        try:
            nodes.unpersist()
        except Exception:
            pass


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over the undirected distinct edge set
    (self-loops dropped) — the local clustering signal (a node in many
    triangles sits in a dense community; spam link-farms are
    triangle-poor, organic link neighborhoods triangle-rich — the
    classic web-spam feature, Becchetti et al. 2008).

    Algorithm: DEGREE-ORDERED ORIENTATION (the "compact-forward" /
    node-iterator++ scheme, Latapy 2008; the MapReduce formulation is
    Suri & Vassilvitskii WWW'11): rank nodes by the total order
    ``(degree, id)`` and orient every undirected edge from the
    lower-ranked to the higher-ranked endpoint. Every triangle then
    has EXACTLY ONE wedge ``u→v, u→w`` with ``rank(v) < rank(w)``
    closed by the oriented edge ``v→w`` — counted once, no
    per-triangle dedup pass. The orientation is the scale lever: the
    oriented out-degree is bounded by O(sqrt(m)) on any graph (and by
    the core number on real graphs), so the wedge generation —
    Σ C(outdeg, 2), the term that explodes around hub nodes in a
    naive neighbor-pair scheme — stays polynomial even with
    power-law hubs. The rank is NEVER materialized as a global
    row_number (that would be a single-reducer sort); the comparison
    ``(deg_u, u) < (deg_v, v)`` is evaluated inline in each join.

    Spark shape: one degree aggregate, the orientation select, one
    self-equi-join on the wedge apex (hash partition on ``src``), and
    one equi-join on the closing edge pair — all hash equi-joins with
    the rank inequality as a residual filter, never a cartesian.
    Returns ``(node, triangles)`` with zero rows for triangle-free
    nodes included."""
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .dropDuplicates(["a", "b"])
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient low-rank -> high-rank; carry the dst endpoint's (deg, id)
    # so the wedge pairing below needs no further join
    wd = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = wd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    ).repartition("src").persist()
    try:
        oriented.count()
        e1 = oriented.select(
            "src",
            F.col("dst").alias("v"),
            F.col("ddst").alias("dv"),
        )
        e2 = oriented.select(
            "src",
            F.col("dst").alias("w"),
            F.col("ddst").alias("dw"),
        )
        # wedges with rank(v) < rank(w): equi-join on the apex, the
        # rank inequality is a residual filter on the matched rows
        wedges = e1.join(e2, "src").filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        # at most ONE oriented (v, w) edge can close a given wedge, so
        # a semi join counts each triangle exactly once and ships no
        # right-side columns
        tri = wedges.join(
            oriented.select(
                F.col("src").alias("v"), F.col("dst").alias("w")
            ),
            ["v", "w"],
            "semi",
        ).select(F.col("src").alias("u"), "v", "w")
        per_node = (
            tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("triangles"))
        )
        out = nodes.join(per_node, "node", "left").select(
            "node",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        oriented.unpersist()


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node (out_deg, in_deg) over the distinct edge set — the
    companion diagnostic (skew in either degree predicts PageRank
    shuffle skew; a super-hub's in-edges all land in one reduce key,
    the same failure mode ``operators/skew.py`` salts)."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    outd = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        outd.join(ind, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
