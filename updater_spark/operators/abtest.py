"""Experiment readout: per-experiment two-sample Welch t statistics
over an events table — the A/B-test summary every product warehouse
computes (Welch 1947; the unequal-variance form, because real
variants never have equal variance). The reference engine has no
statistics surface; this extends the events-analytics family
(funnel.py, anomaly.py).

Spark-first shape: ONE partial-combining aggregate computes each
(experiment, variant)'s (n, mean, var) — the shuffle carries one row
per variant, never events — then a self-join pairs control vs
treatment per experiment (tiny frame, broadcastable). All closed
form: t statistic, Welch–Satterthwaite degrees of freedom, relative
lift. No sampling, no UDF, exactly SQL-expressible.

The significance flag uses the NORMAL approximation (|t| >= 1.96 at
95%): exact Student-t p-values need an incomplete-beta that neither
engine exposes, and at experiment sample sizes (dof in the
thousands) the normal approximation is the textbook answer; for
small-n experiments read the dof column and look up t critical
values downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def welch_ttest(
    df: DataFrame,
    experiment_col: str,
    variant_col: str,
    value_col: str,
    control: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """One row per (experiment, treatment-variant) against
    ``control``: ``(experiment, variant, n_c, n_t, mean_c, mean_t,
    lift, t_stat, dof, significant)``.

    - ``lift`` = (mean_t − mean_c) / mean_c (NULL when mean_c = 0)
    - ``t_stat`` = (mean_t − mean_c) / sqrt(var_t/n_t + var_c/n_c)
      (NULL when both variances are 0 — degenerate data)
    - ``dof`` = Welch–Satterthwaite
    - ``significant`` = |t| >= z_crit (normal approximation; see
      module docstring). Variants need n >= 2 for a sample variance;
      smaller arms surface NULL t and a NULL verdict, never a silent
      drop."""
    stats = (
        df.filter(
            F.col(experiment_col).isNotNull()
            & F.col(variant_col).isNotNull()
        )
        .groupBy(
            F.col(experiment_col).alias("experiment"),
            F.col(variant_col).alias("variant"),
        )
        .agg(
            F.count(F.col(value_col)).cast("double").alias("n"),
            F.avg(F.col(value_col)).alias("mean"),
            F.var_samp(F.col(value_col)).alias("var"),
        )
    )
    c = stats.filter(F.col("variant") == control).select(
        "experiment",
        F.col("n").alias("n_c"),
        F.col("mean").alias("mean_c"),
        F.col("var").alias("var_c"),
    )
    t = stats.filter(F.col("variant") != control)
    j = t.join(F.broadcast(c), "experiment")
    se2 = F.col("var") / F.col("n") + F.col("var_c") / F.col("n_c")
    tstat = F.when(
        se2 > 0, (F.col("mean") - F.col("mean_c")) / F.sqrt(se2)
    )
    dof = F.when(
        se2 > 0,
        (se2 * se2)
        / (
            F.pow(F.col("var") / F.col("n"), 2)
            / (F.col("n") - 1)
            + F.pow(F.col("var_c") / F.col("n_c"), 2)
            / (F.col("n_c") - 1)
        ),
    )
    return j.select(
        "experiment",
        "variant",
        F.col("n_c").cast("long").alias("n_c"),
        F.col("n").cast("long").alias("n_t"),
        F.col("mean_c").alias("mean_c"),
        F.col("mean").alias("mean_t"),
        F.when(
            F.col("mean_c") != 0,
            (F.col("mean") - F.col("mean_c")) / F.col("mean_c"),
        ).alias("lift"),
        tstat.alias("t_stat"),
        dof.alias("dof"),
        F.when(
            tstat.isNotNull(), F.abs(tstat) >= F.lit(float(z_crit))
        ).alias("significant"),
    )
