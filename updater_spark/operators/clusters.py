"""Connected components + canonical-document resolution for dedup.

The LSH/SimHash/Jaccard operators (operators/dedup.py) emit candidate
PAIRS, but an actual dedup pass must resolve pairs into CLUSTERS and
keep one canonical document per cluster: near-duplication is not
transitive (A~B, B~C need not imply A~C above threshold), yet keeping
"one per pair" independently either over-deletes or leaves dupes.
The standard resolution (used by every large crawl-dedup pipeline) is
connected components over the pair graph, canonical = min id.

Algorithm: iterative hash-min label propagation — each vertex adopts
the minimum label among itself and its neighbors until fixpoint.
Rounds needed = graph diameter; dedup graphs are near-cliques of
copies (diameter ≤ 2–3 in practice), so 2–4 rounds close almost any
real corpus. Each round is one join + one groupBy (two shuffles) on
the edge list — at 100 TB scale that is O(rounds · shuffle(|E|)),
with |E| already sub-quadratic thanks to LSH banding. For adversarial
long-chain graphs, large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) converges in
O(log² n) rounds with the same per-round shape; hash-min is the
right default for dedup workloads and keeps the plan simple.

Lineage is truncated every round with ``localCheckpoint`` — an
iterative DataFrame loop otherwise accumulates a plan that grows
linearly in rounds and blows up Catalyst analysis time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    stats_out: dict | None = None,
) -> DataFrame:
    """``(id, component)`` for every vertex appearing in ``pairs``;
    ``component`` is the minimum vertex id reachable from ``id``.

    Terminates early at fixpoint (no label changed in a round);
    raises if ``max_iter`` rounds don't converge — a signal the pair
    graph has pathological chains and the large-star variant is
    needed.

    ``stats_out``: optional dict the call fills with convergence
    telemetry (``rounds``: label-propagation rounds to fixpoint,
    ``edges``: symmetric edge count) — the scale-probe observable for
    the O(log diameter) claim (bench_scale.py semantic).
    """
    # symmetric edge list; self-loops are harmless but dropped early
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    if stats_out is not None:
        stats_out["edges"] = edges.count()
    for rnd in range(max_iter):
        # min label among neighbors, per vertex
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.coalesce("nbr_component", "component") < F.col("component"))
                .alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("_changed").limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            if stats_out is not None:
                stats_out["rounds"] = rnd + 1
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use large-star/small-star for long-chain graphs"
    )


def resolve_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every document its dedup cluster: ``(id_col, cluster_id,
    is_keeper)``. Docs in no pair are their own singleton cluster;
    the keeper (canonical copy) is the cluster's min id — the row set
    ``is_keeper`` selects is the deduplicated corpus.
    """
    comps = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "id", id_col
    )
    return (
        df.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


def resolve_clusters_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware canonical selection: like ``resolve_clusters``
    but the keeper is the cluster member with the HIGHEST
    ``score_col`` (ties → min id), not the min id. This is what the
    crawl pipelines actually ship — RefinedWeb keeps the longest
    member of a dup cluster, FineWeb the highest-quality-scored one —
    because near-dup clusters mix truncated/boilerplate-wrapped
    variants of one page and min-id keeps an arbitrary variant.

    Returns ``(id_col, score_col, cluster_id, is_keeper)``. NULL
    scores lose to any non-NULL score (desc NULLS LAST in both
    engines); an all-NULL cluster falls back to the min-id rule via
    the tie-break.

    Scale shape: the same hash-min component rounds, then ONE
    row_number window partitioned by cluster_id — cluster sizes are
    dup-group sizes (bounded small by construction; a banding cap
    upstream bounds them hard), so no skewed window partitions.
    Catalyst's WindowGroupLimit pushes the rank-1 cut map-side."""
    from pyspark.sql import Window

    comps = connected_components(pairs, id_a, id_b).withColumnRenamed(
        "id", id_col
    )
    assigned = (
        df.select(id_col, score_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            score_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return assigned.withColumn(
        "is_keeper", F.row_number().over(w) == F.lit(1)
    )
