"""Bucketed fingerprint tables ⇒ shuffle-free diff join (the 100 TB
co-location strategy, README 'Design for 100 TB')."""

from pyspark.sql import Row, functions as F

from updater_spark.operators.diff import snapshot_diff
from updater_spark.sources.store import TableStore


def test_bucketed_diff_join_has_no_exchange(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    rows_a = [Row(id=i, hashed=i * 7) for i in range(1, 2001)]
    rows_b = [Row(id=i, hashed=i * 7 + (i % 50 == 0)) for i in range(5, 2005)]
    a = store.write_bucketed("fp_src", spark.createDataFrame(rows_a), "id", 8)
    b = store.write_bucketed("fp_rep", spark.createDataFrame(rows_b), "id", 8)

    diff = snapshot_diff(a, b)
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # no shuffle: bucket-local merge join

    got = {r["change_type"]: 1 for r in diff.select("change_type").distinct().collect()}
    assert set(got) == {"unchanged", "update", "insert", "delete"}

    n_updates = diff.filter(F.col("change_type") == "update").count()
    assert n_updates == len([i for i in range(5, 2001) if i % 50 == 0])

    spark.sql("DROP TABLE IF EXISTS fp_src")
    spark.sql("DROP TABLE IF EXISTS fp_rep")


def test_unbucketed_diff_join_shuffles(spark):
    a = spark.createDataFrame([Row(id=i, hashed=i) for i in range(100)])
    b = spark.createDataFrame([Row(id=i, hashed=i) for i in range(100)])
    plan = snapshot_diff(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the baseline the bucketed path removes
