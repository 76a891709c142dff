"""Dump ``.explain("formatted")`` for registered queries.

Usage::

    python plans/r11/_dump_plan.py <suffix> <query> [<query> ...]

Writes ``plans/r11/<query>_<suffix>.txt`` for each query, built
against ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``)
on ``local[$SPARK_GRAFT_CPUS]`` (default 32). Plan capture only —
nothing is executed, so the files reflect the static plan the
optimizer produces (AQE finalization happens at run time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"plan-dump-{suffix}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
