"""Dynamic schema discovery and column classification.

The reference never hardcodes column lists — it introspects
``information_schema.columns`` at runtime and classifies columns by
name (/root/reference/src/table.py:59-91):

- ``score_``-prefixed columns on ``player`` are *computed*: excluded
  from the fetch/fingerprint set, re-created as projections
  (table.py:80-88); ``score_overall`` is applied in a second pass
  (download.py:534-544).
- the write set keeps every physical column (table.py:91).
- per-tribe stat columns are discovered from the sink schema skipping
  ``id``/``members``/``active`` (post_update.py:57-66).

Here the same rules are driven off ``df.columns`` so the engine adapts
to whatever columns exist, exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

SCORE_PREFIX = "score_"
OVERALL = "score_overall"


@dataclass(frozen=True)
class TableSpec:
    """Per-table static config: name + primary key (table.py:61-63)."""

    name: str
    primary_key: str
    has_scores: bool = False
    normalize_name_col: str | None = None

    def classify(self, columns: list[str]) -> "ColumnSets":
        """Split a physical column list into data vs computed columns,
        mirroring table.py:76-91."""
        data, scores = [], []
        for c in columns:
            if self.has_scores and c.startswith(SCORE_PREFIX):
                scores.append(c)
            else:
                data.append(c)
        if self.primary_key not in data:
            raise ValueError(
                f"primary key {self.primary_key!r} not in columns {columns}"
            )
        return ColumnSets(data_columns=data, score_columns=scores)


@dataclass(frozen=True)
class ColumnSets:
    """``data_columns`` enter the fingerprint (download.py:133) and are
    fetched from the source; ``score_columns`` are computed
    projections present only in the sink (table.py:80-91)."""

    data_columns: list[str] = field(default_factory=list)
    score_columns: list[str] = field(default_factory=list)

    @property
    def write_columns(self) -> list[str]:
        return self.data_columns + self.score_columns


# The three reference entity tables (start.py:50-52, table.py:61-63).
PLAYER = TableSpec("player", "id", has_scores=True, normalize_name_col="name")
TRIBE = TableSpec("tribe", "id")
MEMBER = TableSpec("member", "id_member")


def classify_df(spec: TableSpec, df: DataFrame) -> ColumnSets:
    return spec.classify(list(df.columns))


def align_to_schema(df: DataFrame, target_schema) -> DataFrame:
    """Project ``df`` onto exactly ``target_schema``'s columns: columns
    ``df`` lacks are NULL-backfilled at the target type, extra columns
    are dropped, order matches the target. The schema-evolution
    primitive: when a source gains or loses columns between CDC epochs
    (the reference re-reads ``information_schema`` every run,
    table.py:66-75, so its column set silently follows the DBA), the
    surviving replica rows are re-shaped through this projection
    before merging with the new-schema delta."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    return df.select(
        *[
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target_schema.fields
        ]
    )


def stat_columns(tribe_stats_columns: list[str]) -> list[str]:
    """Discover aggregatable stat columns from the tribe_stats sink
    schema, skipping the bookkeeping columns (post_update.py:57-66)."""
    return [c for c in tribe_stats_columns if c not in ("id", "members", "active")]
