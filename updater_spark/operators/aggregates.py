"""Derived per-tribe aggregates (SURVEY.md §2.3 J3/J4, §2.4 A2-A4).

Re-expresses /root/reference/src/post_update.py:18-91:

- ``tribe_active``: per-tribe member counts restricted to members
  *updated this run* — tribe ⋈ member ⋈ player_new, COUNT(id_member)
  as members, COUNT(p.id) as active, sqrt(members) (post_update.py:
  23-39). The "counts only updated members" behavior is an observed
  reference quirk preserved for parity.
- ``tribe_stats``: per-tribe SUM(stat)/sqrt-divisor for every
  discovered stat column, with two branches (post_update.py:44-91):
  bootstrap (tribe ⋈ member ⋈ player LEFT JOIN player_new, divisor
  computed in-query) and incremental (tribe_active ⋈ member ⋈ player,
  divisor = precomputed members_sqrt).

Scale notes: member→player is a large-large equi-join → sort-merge
with both sides shuffled on the player id; tribe (small dim) is
broadcast. The groupBy on id_tribe partial-aggregates map-side before
the shuffle, so the shuffle carries one row per (partition, tribe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tribe_active(
    tribe: DataFrame,
    member: DataFrame,
    player_new: DataFrame,
    tribe_key: str = "id",
) -> DataFrame:
    """``(id, members, active, members_sqrt)`` per tribe
    (post_update.py:23-39). COUNT of non-null = Spark ``count(col)``,
    matching MySQL ``COUNT(col)``."""
    t = tribe.select(F.col(tribe_key).alias("id"))
    m = member.select(
        F.col("id_member").alias("_m_id"), F.col("id_tribe").alias("_m_tribe")
    )
    p = player_new.select(F.col("id").alias("_p_id"))
    joined = t.join(m, t["id"] == m["_m_tribe"], "inner").join(
        p, m["_m_id"] == p["_p_id"], "inner"
    )
    return joined.groupBy("id").agg(
        F.count("_m_id").alias("members"),
        F.count("_p_id").alias("active"),
        F.sqrt(F.count("_m_id")).alias("members_sqrt"),
    )


def tribe_stats(
    tribe_or_active: DataFrame,
    member: DataFrame,
    player: DataFrame,
    stat_columns: list[str],
    bootstrap: bool,
    player_new: DataFrame | None = None,
) -> DataFrame:
    """Per-tribe stat sums scaled by 1/sqrt(members)
    (post_update.py:44-91).

    Incremental branch: ``tribe_or_active`` is the ``tribe_active``
    output; ``members``/``active``/``members_sqrt`` are reused.
    Bootstrap branch: ``tribe_or_active`` is the raw tribe table;
    counts are computed in-query and ``active`` counts non-null
    player_new matches via LEFT JOIN (COUNT(col) semantics).
    """
    m = member.select(
        F.col("id_member").alias("_m_id"), F.col("id_tribe").alias("_m_tribe")
    )
    p = player.select(F.col("id").alias("_p_id"), *stat_columns)
    if bootstrap:
        t = tribe_or_active.select(F.col("id"))
        joined = t.join(m, t["id"] == m["_m_tribe"], "inner").join(
            p, p["_p_id"] == m["_m_id"], "inner"
        )
        if player_new is None:
            raise ValueError("bootstrap tribe_stats requires player_new")
        pn = player_new.select(F.col("id").alias("_pn_id"))
        joined = joined.join(pn, joined["_p_id"] == pn["_pn_id"], "left")
        div_by = F.sqrt(F.count("_m_id"))
        aggs = [
            F.count("_m_id").alias("members"),
            F.count("_pn_id").alias("active"),
        ] + [(F.sum(c) / div_by).alias(c) for c in stat_columns]
        return joined.groupBy("id").agg(*aggs)

    t = tribe_or_active.select("id", "members", "active", "members_sqrt")
    joined = t.join(m, t["id"] == m["_m_tribe"], "inner").join(
        p, p["_p_id"] == m["_m_id"], "inner"
    )
    aggs = [
        F.first("members").alias("members"),
        F.first("active").alias("active"),
    ] + [(F.sum(c) / F.first("members_sqrt")).alias(c) for c in stat_columns]
    return joined.groupBy("id").agg(*aggs)


def group_quantiles(
    df,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
):
    """Per-group EXACT quantiles (linear interpolation — numerically
    identical to DuckDB's ``quantile_cont``, verified bit-exact in the
    driver oracle) plus count/min/max: the corpus-profile aggregate a
    data-quality dashboard wants per source/language.

    ``percentile`` is exact and buffers each group's values — the
    right call for bounded groups (sources, languages). For unbounded
    or skewed group sizes at 100 TB use
    ``approx_percentile(col, probs, accuracy)`` instead: mergeable
    KLL-style sketch, map-side combinable, no per-group buffering."""
    arr = ", ".join(repr(p) for p in probs)
    q = F.expr(f"percentile({value_col}, array({arr}))")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).cast("long").alias("vmin"),
        F.max(value_col).cast("long").alias("vmax"),
        *[
            F.round(q[i], 6).alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )
