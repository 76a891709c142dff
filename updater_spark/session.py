"""SparkSession factory with scale-oriented defaults.

The engine targets a multi-executor cluster reading ~100 TB; locally we
run ``local[N]``. Session defaults are chosen so the same logical plans
survive the scale-up:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions.
- ANSI off: MySQL (the reference engine, see
  /root/reference/src/table.py:5-44) yields NULL on division by zero;
  Spark 4 defaults to ANSI (error). Non-ANSI Spark matches MySQL's
  NULL-on-/0, which the score formulas rely on.
- Arrow on: any Pandas-UDF path (multimodal stubs) uses Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "updater_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    32) when no cluster master is configured — on a real cluster the
    master comes from spark-submit and this argument is ignored.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 32)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # The driver's events table stores tz-less parquet timestamps
        # (Spark 4 reads TIMESTAMP_NTZ); a pinned UTC session tz makes
        # the NTZ→LTZ normalization in demo.load_events deterministic
        # and oracle-identical (DuckDB treats naive values as UTC).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
