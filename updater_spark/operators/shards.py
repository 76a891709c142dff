"""Deterministic sharded export: the training-data sink.

The end of an LLM data pipeline is N shard files in a reproducible
global order (so a training run can resume mid-epoch, and two builds
of the same corpus are byte-comparable), plus a manifest a trainer can
check before reading anything. Spark-first shape:

- shard id = ``pos * n_shards // total`` from the deterministic
  position (operators/sampling.py::deterministic_shuffle) — N nearly
  equal CONTIGUOUS slabs of the global order, so shard k can be read
  (or re-derived) independently and concatenating shards 0..N-1
  reproduces the exact order.
- one write: repartition by shard id (the only shuffle this operator
  adds), sort within each shard by position, one file per shard.
- manifest: per-shard row count + an order-sensitive content hash,
  computed with a map-side-combined aggregate (one row per shard
  reaches the driver). The hash folds md5(id || pos) through
  sum/xor — associative + commutative, so any partitioning computes
  the same value; including ``pos`` makes it order-sensitive.

Verification cost for a consumer: re-run the manifest aggregate over
the shard directory and compare JSON — no row-level diff needed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.sampling import deterministic_shuffle

__all__ = ["write_shards", "shard_manifest", "read_shards"]

# underscore prefix: Spark's file index skips _-prefixed files, so the
# manifest can live inside the shard directory without breaking reads
MANIFEST = "_manifest.json"


def _content_hash_cols(id_col: str, pos_col: str):
    h = F.conv(F.substring(F.md5(F.concat_ws("|", id_col, pos_col)), 1, 15), 16, 10).cast(
        "long"
    )
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).alias("hash_sum"),
        F.min(pos_col).alias("pos_min"),
        F.max(pos_col).alias("pos_max"),
    ]


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
) -> dict:
    """Shuffle ``df`` deterministically, split into ``n_shards``
    contiguous slabs of the global order, write one parquet file per
    shard plus ``manifest.json``. Returns the manifest dict."""
    total = df.count()
    ordered = deterministic_shuffle(df, id_col=id_col, salt=salt)
    sharded = ordered.withColumn(
        "shard", (F.col("pos") * n_shards / F.lit(total)).cast("long")
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    manifest = shard_manifest(
        df.sparkSession.read.parquet(out_dir), id_col=id_col
    )
    manifest["salt"] = salt
    manifest["n_shards"] = n_shards
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def shard_manifest(sharded: DataFrame, id_col: str = "doc_id") -> dict:
    """Per-shard counts + order-sensitive content hashes from one
    map-side-combined aggregate — re-runnable by any consumer to
    verify a shard directory without a row-level diff."""
    rows = (
        sharded.groupBy("shard")
        .agg(*_content_hash_cols(id_col, "pos"))
        .orderBy("shard")
        .collect()
    )
    return {
        "total_rows": int(sum(r["n_rows"] for r in rows)),
        "shards": {
            str(r["shard"]): {
                "n_rows": int(r["n_rows"]),
                "hash_sum": int(r["hash_sum"]),
                "pos_min": int(r["pos_min"]),
                "pos_max": int(r["pos_max"]),
            }
            for r in rows
        },
    }


def read_shards(spark, out_dir: str) -> DataFrame:
    """Read a shard directory in training order (shard, pos)."""
    return spark.read.parquet(out_dir).orderBy("shard", "pos")
