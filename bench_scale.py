"""Scale probe beyond the driver's sf0.1: synthesize N-row snapshots
with ``spark.range`` (no testdata writes) and measure the engine's
core loops — fingerprint scan, diff join, delta fetch — at 10M+ rows.

Usage: ``python bench_scale.py [n_rows]`` (default 10_000_000).
Prints one JSON line. Not run by the driver; evidence for the
100×-scale-up question (README 'Measured throughput').
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from updater_spark import get_spark
from updater_spark.functions.fingerprints import fingerprint_table
from updater_spark.operators.diff import snapshot_diff


def main(n: int) -> None:
    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.range(1, n + 1, numPartitions=64)
        .withColumnRenamed("id", "pk")
        .withColumn("name", F.concat(F.lit("player"), F.col("pk")))
        .withColumn("cheese", F.pmod(F.xxhash64("pk"), F.lit(100000)))
        .withColumn("rounds", F.pmod(F.xxhash64("name"), F.lit(5000)))
    )
    cols = ["pk", "name", "cheese", "rounds"]
    # previous snapshot: 1% modified, 0.5% missing (inserts), plus
    # replica-only rows (deletes)
    old = (
        base.filter(F.col("pk") % 200 != 0)
        .withColumn(
            "cheese",
            F.when(F.col("pk") % 100 == 0, F.col("cheese") + 1).otherwise(
                F.col("cheese")
            ),
        )
        .unionByName(
            base.filter(F.col("pk") % 333 == 0).withColumn(
                "pk", F.col("pk") + 2 * n
            )
        )
    )

    timings = {}

    def run(name, df):
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    src_fp = fingerprint_table(base, "pk", cols, algo="xxhash64")
    rep_fp = fingerprint_table(old, "pk", cols, algo="xxhash64")
    run("fingerprint_scan", src_fp)
    diff = snapshot_diff(src_fp, rep_fp)
    run("diff_join", diff.groupBy("change_type").count())
    run(
        "crc32_fingerprint_scan",
        fingerprint_table(base, "pk", cols, algo="crc32"),
    )

    diff_rows = 2 * n
    print(
        json.dumps(
            {
                "n_rows": n,
                "timings_sec": timings,
                "fingerprint_rows_per_sec": round(n / timings["fingerprint_scan"]),
                "diff_rows_per_sec": round(diff_rows / timings["diff_join"]),
                "reference_rows_per_sec": 150_000,
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
