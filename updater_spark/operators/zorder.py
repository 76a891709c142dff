"""Multi-column Z-order (Morton) clustering for data-skipping scans.

Why: ``TableStore.write_clustered`` (1-D range clustering) makes
parquet footer stats disjoint on ONE sort key — predicates on that
key prune files, but a second column's per-file min/max still spans
the whole domain, so filters on it read everything. Z-ordering
interleaves the bits of several columns into one sort key, so each
file covers a bounded hyper-rectangle of the clustered space and a
selective predicate on ANY clustered dimension prunes files. This is
the public Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea (Morton codes,
Morton 1966) re-expressed as plain Catalyst bit arithmetic — no UDFs,
no engine extension.

The reference engine has no layout management at all (it re-reads
full MySQL snapshots, cheeseformice/updater download.py); this is
part of the 100 TB extension surface: at scale, scan pruning is the
difference between reading gigabytes and reading the lake.

Cost/semantics contract:
- One ``min/max`` aggregate over the input (O(k) driver constants —
  the same closed-form-constant discipline as classifier.py), one
  range exchange, one within-partition sort. Content is NEVER
  changed — clustering must be invisible to query results, which is
  exactly what the driver oracle checks.
- Linear min/max scaling into ``bits``-bit grid cells. Heavily skewed
  columns concentrate in few cells and weaken (never break) pruning —
  the documented trade; rank-based scaling would need a global sort.
  ``bits * len(cols)`` must fit a signed long (≤ 63 bits).
- NULLs scale to cell 0 (first files), matching parquet stats
  semantics (nulls tracked separately from min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_expr", "add_zvalue", "Z_COL"]

Z_COL = "_z"


def zvalue_expr(
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Morton code of ``cols`` scaled into ``2**bits`` cells each.

    Bit ``i`` of column ``j`` lands at output position
    ``i * k + (k - 1 - j)`` — round-robin interleave, column 0 most
    significant within each round, so equal-prefix z-ranges are
    hyper-rectangles of the grid."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    top = (1 << bits) - 1
    scaled = []
    for c, mn, mx in zip(cols, mins, maxs):
        span = float(mx) - float(mn)
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
            continue
        cell = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(span)
            * F.lit(float(top))
        ).cast("long")
        # clamp: values outside the sampled min/max (appends, float
        # edges) clip to the boundary cells instead of corrupting bits
        cell = F.least(F.greatest(cell, F.lit(0)), F.lit(top))
        scaled.append(F.coalesce(cell, F.lit(0)))
    z = F.lit(0).cast("long")
    for j, cell in enumerate(scaled):
        for i in range(bits):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - j)))
    return z


def add_zvalue(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append the ``_z`` Morton column; one min/max agg over the
    input provides the scaling constants (collected — O(k) doubles)."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    mins = [row[f"mn_{i}"] for i in range(len(cols))]
    maxs = [row[f"mx_{i}"] for i in range(len(cols))]
    if any(v is None for v in mins + maxs):
        # all-null column: every cell is 0, clustering degrades to
        # the remaining columns rather than erroring
        mins = [0.0 if v is None else v for v in mins]
        maxs = [0.0 if v is None else v for v in maxs]
    return df.withColumn(Z_COL, zvalue_expr(cols, mins, maxs, bits))
