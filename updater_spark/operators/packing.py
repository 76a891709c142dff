"""Training-data assembly operators: deterministic dataset splits and
sequence packing.

These are the last-mile operators of an LLM data pipeline — after
dedup/quality filtering (operators/dedup.py, operators/text.py) the
corpus is split into train/val/test and documents are packed into
fixed-token-budget context windows.

Everything here is engine-portable by construction:

- ``dataset_split`` buckets on the first 4 hex chars of
  ``md5(id || salt)`` compared lexicographically against fraction
  thresholds — identical output in Spark and any SQL oracle, stable
  under repartitioning, resharding, and re-runs (a row's split never
  depends on what other rows exist).
- ``pack_chunks`` is the concat-and-chunk assignment used by most
  pretraining loaders (documents concatenated in deterministic order,
  sliced every ``budget`` tokens): pure window cumsum, SQL-expressible.
- ``pack_greedy`` is true first-fit greedy packing (a pack closes when
  the next document would overflow the budget) — inherently a
  sequential scan per shard, so it runs as ``applyInPandas`` over
  bounded shards with a pure-Python oracle in tests.

Scale notes (100 TB): both packers window/group by a ``shard`` column
so no single ordering spans the corpus — parallelism = number of
shards, and each shard's window state is one partition. The split is
a stateless per-row projection (scan-speed, no shuffle at all).

Reference scope: the reference engine (cheeseformice/updater) has no
equivalent — these are north-star extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

__all__ = ["dataset_split", "pack_chunks", "pack_greedy", "shard_by_hash"]


def _split_key(id_col: str, salt: str) -> F.Column:
    # First 16 bits of md5(id || salt) as 4 lowercase hex chars.
    # Lexicographic comparison on hex digits == numeric comparison,
    # and every SQL engine renders md5 the same way, so thresholds
    # are portable string literals.
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")),
        1,
        4,
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row a deterministic train/val/test label.

    ``fractions`` maps label -> fraction (must sum to ~1.0); order of
    the dict is the bucket order. The assignment is a pure function of
    (id, salt): re-running on a grown corpus never reassigns an
    existing row, which is the property that keeps eval sets
    uncontaminated across dataset versions.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    labels = list(fractions)
    key = _split_key(id_col, salt)
    expr = F.lit(labels[-1])
    cum = 0.0
    thresholds: list[tuple[str, str]] = []
    for label in labels[:-1]:
        cum += fractions[label]
        thresholds.append((label, format(int(cum * 65536), "04x")))
    for label, hx in reversed(thresholds):
        expr = F.when(key < F.lit(hx), F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def shard_by_hash(
    df: DataFrame, id_col: str = "doc_id", num_shards: int = 16, salt: str = "shard-v1"
) -> DataFrame:
    """Deterministic shard id in [0, num_shards) from md5(id || salt).

    Uses the first 8 hex chars (32 bits) so shards stay balanced for
    any practical ``num_shards``; conv() keeps it portable (DuckDB:
    ``from_hex``-free via arithmetic on the same hex prefix)."""
    hx = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")), 1, 8
    )
    val = F.conv(hx, 16, 10).cast("long")
    return df.withColumn("shard", (val % num_shards).cast("long"))


def pack_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    shard_col: str = "shard",
) -> DataFrame:
    """Concat-and-chunk pack assignment.

    Documents are ordered by ``id_col`` within each shard and
    notionally concatenated; ``pack_id`` is the index of the
    ``budget``-token context window in which the document *starts*
    (exclusive running sum // budget). ``pack_offset`` is the token
    offset of the document inside its shard stream. Pure window
    arithmetic — no Python, no extra shuffle beyond the shard
    partitioning.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        cum_excl.alias("pack_offset"),
        F.floor(cum_excl / budget).cast("long").alias("pack_id"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    shard_col: str = "shard",
) -> DataFrame:
    """First-fit greedy packing: walk documents in ``id_col`` order
    within a shard, close the current pack when the next document
    would push it past ``budget``. Documents larger than the budget
    get a pack of their own (never split).

    The per-shard scan is inherently sequential state, so it runs as
    an Arrow-batched ``applyInPandas`` — one pandas group per shard,
    parallel across shards. Output pack ids are ``(shard, pack_seq)``
    pairs, unique corpus-wide only together with the shard.
    """
    schema = StructType(
        [
            StructField(shard_col, LongType(), False),
            StructField(id_col, LongType(), False),
            StructField(tokens_col, LongType(), False),
            StructField("pack_seq", LongType(), False),
            StructField("pack_fill", LongType(), False),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pack_seq, fill = 0, 0
        seqs, fills = [], []
        for t in pdf[tokens_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                pack_seq += 1
                fill = 0
            fill += int(t)
            seqs.append(pack_seq)
            fills.append(fill)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col].astype("int64"),
                id_col: pdf[id_col].astype("int64"),
                tokens_col: pdf[tokens_col].astype("int64"),
                "pack_seq": pd.Series(seqs, dtype="int64"),
                "pack_fill": pd.Series(fills, dtype="int64"),
            }
        )

    slim = df.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(id_col).cast("long").alias(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return slim.groupBy(shard_col).applyInPandas(_pack, schema=schema)
