"""Privacy screens for training-data release: k-anonymity suppression
and l-diversity auditing over quasi-identifier columns (Sweeney 2002;
Machanavajjhala et al. 2007).

``pii_redact`` (operators/text.py) scrubs direct identifiers INSIDE
text; these operators handle the other leak: a combination of
innocuous-looking columns (region x segment x age band) that is unique
enough to re-identify a row. The standard release gates:

- k-anonymity: every released row shares its quasi-identifier tuple
  with at least k-1 others — groups smaller than k are suppressed.
- l-diversity: within each quasi-group, the SENSITIVE column takes at
  least l distinct values, otherwise group membership itself discloses
  the sensitive value (the homogeneity attack k-anonymity misses).

Spark-first shape: both are one grouped aggregate over the quasi
columns (partial-combining, |groups| rows after the shuffle) plus —
for suppression — one join back on those columns (AQE broadcasts the
group frame when small). NULL quasi values are grouped AS NULL
(null-safe equality in the join): rows with missing quasi-identifiers
form their own group rather than silently passing or vanishing.

Reference scope: the reference engine has no privacy operators —
north-star extension, same tier as the decontamination family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymize",
    "k_anonymity_stats",
    "l_diversity_violations",
    "generalize_numeric",
]


def _group_counts(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_gn"))


def k_anonymize(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Suppress every row whose quasi-identifier group has fewer than
    ``k`` members. Exact, deterministic, column-order preserving.

    The join back uses NULL-SAFE equality on the quasi columns so a
    NULL-valued group is suppressed or kept as a unit like any
    other."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keep = _group_counts(df, quasi_cols).filter(F.col("_gn") >= k)
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(keep[c])
        cond = eq if cond is None else cond & eq
    return df.join(keep, cond, "left_semi").select(*df.columns)


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """One-row audit: the dataset's effective k (smallest group), the
    number of quasi-groups, and how many rows sit in groups below
    common release thresholds. The groups frame never leaves the
    executors — this is an aggregate OF the aggregate."""
    groups = _group_counts(df, quasi_cols)
    return groups.agg(
        F.min("_gn").alias("effective_k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("_gn") < 2, F.col("_gn")).otherwise(F.lit(0))).alias(
            "rows_unique"
        ),
        F.sum(F.when(F.col("_gn") < 5, F.col("_gn")).otherwise(F.lit(0))).alias(
            "rows_below_5"
        ),
        F.sum(F.when(F.col("_gn") < 10, F.col("_gn")).otherwise(F.lit(0))).alias(
            "rows_below_10"
        ),
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """Quasi-groups whose sensitive column shows fewer than
    ``l_threshold`` distinct values — the homogeneity-attack surface
    k-anonymity leaves open. Returns (quasi..., group_size,
    distinct_sensitive) for each violating group; empty = pass."""
    if l_threshold < 1:
        raise ValueError(f"l_threshold must be >= 1, got {l_threshold}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.countDistinct(sensitive_col).alias("distinct_sensitive"),
        )
        .filter(F.col("distinct_sensitive") < l_threshold)
    )


def generalize_numeric(
    df: DataFrame,
    numeric_col: str,
    quasi_cols: list[str],
    k: int = 5,
    ladder: tuple[float, ...] = (100.0, 1000.0, 10000.0),
    band_col: str = "band",
    width_col: str = "width",
) -> DataFrame:
    """k-anonymity by GENERALIZATION before suppression (the Sweeney
    ladder): coarsen a numeric quasi-identifier into ``floor(x/w)``
    bands, walking ``ladder`` from finest to coarsest and keeping the
    FIRST width where every (quasi..., band) group reaches ``k`` —
    maximal utility under the constraint. If even the coarsest width
    leaves under-k groups, those rows are suppressed at that width
    (``k_anonymize``), so the output is ALWAYS k-anonymous.

    Scale shape: one grouped count per candidate width (each a
    partial-combining scan; |ladder| is small by construction) to
    pick the width on the driver — one long each — then a single
    banded projection (plus the suppression semi-join only on the
    fallback path). Deterministic: the choice depends only on data,
    k, and the ladder.

    Returns the input columns plus ``band`` (floor(x/width)) and
    ``width``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not ladder:
        raise ValueError("ladder must be non-empty")
    widths = [float(w) for w in ladder]
    if sorted(widths) != widths or len(set(widths)) != len(widths):
        raise ValueError(f"ladder must be strictly increasing, got {ladder}")
    if widths[0] <= 0:
        raise ValueError(f"ladder widths must be > 0, got {ladder}")

    def banded(w: float) -> DataFrame:
        return df.withColumn(
            band_col,
            F.floor(F.col(numeric_col) / F.lit(w)).cast("long"),
        ).withColumn(width_col, F.lit(w))

    chosen = None
    for w in widths:
        m = (
            banded(w)
            .groupBy(*quasi_cols, band_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.min("_n"))
            .first()[0]
        )
        if m is None or m >= k:
            chosen = w
            break
    if chosen is not None:
        return banded(chosen)
    # fallback: coarsest width + suppression of the remaining leaks
    out = banded(widths[-1])
    return k_anonymize(out, [*quasi_cols, band_col], k=k)
