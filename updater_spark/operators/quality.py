"""Declarative data-quality constraint checking over a DataFrame —
the "unit tests for data" idea (Deequ: Schelter et al., VLDB 2018;
also Great Expectations): a pipeline ingesting 100 TB cannot eyeball
its inputs, so each batch is gated on a declared constraint suite and
the metrics become a time series (drift in `completeness(col)` is the
first symptom of an upstream schema accident — exactly the failure
mode the reference's dynamic column discovery papers over silently,
/root/reference/src/table.py:66-75).

Spark-first shape — the pass structure is the whole design:

- ALL row-level metrics (row_count / completeness / min / max / mean /
  sum / match_ratio) for ANY number of checks fuse into ONE aggregate
  over ONE scan: a single `df.agg(...)` whose every term is an
  individually cheap partial-combining aggregate. 40 checks on a
  100 TB table still read it once.
- GROUP metrics (uniqueness / distinctness / approx-free exact
  countdistinct) need a per-column shuffle; checks naming the same
  column SHARE one two-level aggregate (`groupBy(col).count` then a
  1-row summary — the classic re-aggregation, never a global
  distinct-then-count over rows).
- REFERENTIAL checks (foreign-key orphan ratio) are one left-anti
  join each against the parent's key projection — the parent side is
  a single-column distinct, broadcastable when small.

Nothing collects: the result is a UNION of 1-row DataFrames, k rows
for k checks, assembled lazily so Catalyst sees one plan. Values are
DOUBLE; `passed` is evaluated engine-side from (value, op, threshold).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_METRICS = {
    "row_count",
    "completeness",
    "min",
    "max",
    "mean",
    "sum",
    "match_ratio",
}
_GROUP_METRICS = {"uniqueness", "distinctness", "count_distinct"}
_OPS = {
    ">=": lambda v, t: v >= t,
    "<=": lambda v, t: v <= t,
    "==": lambda v, t: v == t,
    ">": lambda v, t: v > t,
    "<": lambda v, t: v < t,
}


@dataclass(frozen=True)
class Check:
    """One constraint: measure ``metric`` (optionally over ``column``
    / ``predicate``), then assert ``value <op> threshold``. A check
    with ``threshold=None`` is metric-only (recorded, never failing —
    the profiling mode).

    Metrics:

    - ``row_count`` — COUNT(*) (no column)
    - ``completeness`` — fraction of non-NULL values in ``column``
    - ``min`` / ``max`` / ``mean`` / ``sum`` — over numeric ``column``
      (NULLs ignored, the SQL convention)
    - ``match_ratio`` — fraction of rows satisfying ``predicate``
      (a SQL boolean expression; NULL counts as non-match)
    - ``uniqueness`` — fraction of DISTINCT values of ``column`` that
      occur exactly once (Deequ's definition)
    - ``distinctness`` — COUNT(DISTINCT column) / COUNT(column)
    - ``count_distinct`` — exact distinct count of ``column``
    - ``referential`` — fraction of non-NULL ``column`` values with NO
      match in the parent key set (orphan ratio; 0.0 = clean FK).
      Pass the parent via ``check_constraints(..., parents={name:
      (parent_df, key_col)})``.
    """

    name: str
    metric: str
    column: str | None = None
    predicate: str | None = None
    op: str = ">="
    threshold: float | None = None


def _row_expr(c: Check) -> F.Column:
    if c.metric == "row_count":
        return F.count(F.lit(1)).cast("double")
    if c.metric == "completeness":
        return (
            F.count(F.col(c.column)) / F.count(F.lit(1))
        ).cast("double")
    if c.metric == "match_ratio":
        return (
            F.sum(
                F.when(F.expr(c.predicate), F.lit(1)).otherwise(F.lit(0))
            )
            / F.count(F.lit(1))
        ).cast("double")
    agg = {"min": F.min, "max": F.max, "mean": F.avg, "sum": F.sum}[
        c.metric
    ]
    return agg(F.col(c.column)).cast("double")


def check_constraints(
    df: DataFrame,
    checks: list[Check],
    parents: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate ``checks`` against ``df`` and return one row per
    check: ``(check, metric, column, value, threshold, passed)``.

    ``value`` is DOUBLE (NaN-free: empty-input aggregates surface as
    NULL); ``passed`` is NULL for metric-only checks (no threshold)
    and FALSE when the value is NULL and a threshold exists (a metric
    that could not be computed fails its gate — loud by default).

    Scan economics are documented in the module docstring: one scan
    for every row-level check combined, one two-level aggregate per
    DISTINCT group-metric column, one anti-join per referential check.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    parents = parents or {}
    spark = df.sparkSession

    for c in checks:
        if c.metric not in _ROW_METRICS | _GROUP_METRICS | {"referential"}:
            raise ValueError(f"{c.name}: unknown metric {c.metric!r}")
        if c.op not in _OPS:
            raise ValueError(f"{c.name}: unknown op {c.op!r}")
        if c.metric == "match_ratio" and not c.predicate:
            raise ValueError(f"{c.name}: match_ratio needs predicate")
        if (
            c.metric not in ("row_count", "match_ratio")
            and c.column is None
        ):
            raise ValueError(f"{c.name}: metric {c.metric} needs column")
        if c.metric == "referential" and c.name not in parents:
            raise ValueError(
                f"{c.name}: referential check needs parents[{c.name!r}]"
            )

    def _struct(c: Check, value: F.Column) -> F.Column:
        """One check's output row as a struct over an aggregate row."""
        v = value.cast("double")
        passed = (
            F.lit(None).cast("boolean")
            if c.threshold is None
            else F.coalesce(
                _op_col(c.op, v, F.lit(float(c.threshold))),
                F.lit(False),
            )
        )
        return F.struct(
            F.lit(c.name).alias("check"),
            F.lit(c.metric).alias("metric"),
            F.lit(c.column or c.predicate or "*").alias("column"),
            v.alias("value"),
            F.lit(None if c.threshold is None else float(c.threshold))
            .cast("double")
            .alias("threshold"),
            passed.alias("passed"),
        )

    def _explode(agg_row: DataFrame, structs: list[F.Column]) -> DataFrame:
        """k check rows out of ONE aggregate row — explode, not a
        k-way union of the same aggregate (which would re-run the
        scan per branch)."""
        return agg_row.select(
            F.explode(F.array(*structs)).alias("_r")
        ).select("_r.*")

    pieces: list[DataFrame] = []

    # -- one fused scan for every row-level metric --------------------
    row_checks = [c for c in checks if c.metric in _ROW_METRICS]
    if row_checks:
        agg = df.agg(
            *[_row_expr(c).alias(f"_m{i}") for i, c in enumerate(row_checks)]
        )
        pieces.append(
            _explode(
                agg,
                [
                    _struct(c, F.col(f"_m{i}"))
                    for i, c in enumerate(row_checks)
                ],
            )
        )

    # -- group metrics: shared two-level aggregate per column ---------
    group_checks = [c for c in checks if c.metric in _GROUP_METRICS]
    by_col: dict[str, list[Check]] = {}
    for c in group_checks:
        by_col.setdefault(c.column, []).append(c)
    for col, cs in by_col.items():
        counts = (
            df.filter(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        summary = counts.agg(
            F.count(F.lit(1)).cast("double").alias("_distinct"),
            F.sum(
                F.when(F.col("_n") == 1, F.lit(1)).otherwise(F.lit(0))
            ).cast("double").alias("_singletons"),
            F.sum("_n").cast("double").alias("_values"),
        )
        structs = []
        for c in cs:
            if c.metric == "uniqueness":
                v = F.col("_singletons") / F.col("_distinct")
            elif c.metric == "distinctness":
                v = F.col("_distinct") / F.col("_values")
            else:  # count_distinct
                v = F.col("_distinct")
            structs.append(_struct(c, v))
        pieces.append(_explode(summary, structs))

    # -- referential: anti-join orphan ratio per check -----------------
    for c in checks:
        if c.metric != "referential":
            continue
        parent_df, key_col = parents[c.name]
        child = df.filter(F.col(c.column).isNotNull()).select(
            F.col(c.column).alias("_k")
        )
        parent = (
            parent_df.select(F.col(key_col).alias("_k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        # ONE left join + ONE agg (no cross join of the two counts):
        # orphan ratio = mean of the per-row miss indicator
        ratio = child.join(parent, "_k", "left").agg(
            F.coalesce(
                F.avg(
                    F.when(F.col("_hit").isNull(), F.lit(1.0)).otherwise(
                        F.lit(0.0)
                    )
                ),
                F.lit(0.0),
            ).alias("_v")
        )
        pieces.append(_explode(ratio, [_struct(c, F.col("_v"))]))

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    # stable output order = declaration order
    order = {c.name: i for i, c in enumerate(checks)}
    order_col = F.create_map(
        *[x for n, i in order.items() for x in (F.lit(n), F.lit(i))]
    )
    return (
        out.withColumn("_ord", order_col[F.col("check")])
        .orderBy("_ord")
        .drop("_ord")
    )


def _op_col(op: str, value: F.Column, threshold: F.Column) -> F.Column:
    if op == ">=":
        return value >= threshold
    if op == "<=":
        return value <= threshold
    if op == "==":
        return value == threshold
    if op == ">":
        return value > threshold
    return value < threshold


def suite_passed(result: DataFrame) -> bool:
    """Driver-side gate: True iff no thresholded check failed. A 1-row
    bounded collect (the k-row result is itself bounded by the number
    of declared checks)."""
    n_failed = result.filter(F.col("passed") == F.lit(False)).count()
    return n_failed == 0


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    with_distinct: bool = False,
) -> DataFrame:
    """Whole-table profiling in ONE scan: for every column (or the
    named subset), completeness — plus min/max/mean for numeric
    columns — emitted as ``(column, metric, value)`` rows through the
    same explode-one-aggregate-row machinery as check_constraints.
    ``with_distinct=True`` adds an exact count_distinct per column —
    one two-level aggregate (shuffle) EACH, so it's opt-in; at 100 TB
    prefer the HLL sketch (operators/sketches.py) for cardinality.

    This is the look-before-you-load step of a new source: run once,
    read the metrics, then write the constraint suite the numbers
    justify."""
    from pyspark.sql import types as T

    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType,
            (
                T.IntegerType,
                T.LongType,
                T.ShortType,
                T.ByteType,
                T.FloatType,
                T.DoubleType,
                T.DecimalType,
            ),
        )
    }
    checks: list[Check] = [Check("rows:row_count", "row_count")]
    for c in cols:
        checks.append(Check(f"{c}:completeness", "completeness", column=c))
        if c in numeric:
            checks.append(Check(f"{c}:min", "min", column=c))
            checks.append(Check(f"{c}:max", "max", column=c))
            checks.append(Check(f"{c}:mean", "mean", column=c))
        if with_distinct:
            checks.append(
                Check(f"{c}:count_distinct", "count_distinct", column=c)
            )
    res = check_constraints(df, checks)
    return res.select(
        F.col("column"),
        F.col("metric"),
        F.col("value"),
    )
