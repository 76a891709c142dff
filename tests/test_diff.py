"""Diff-join classification (J1) and split semantics."""

from pyspark.sql import Row

from updater_spark.operators.diff import snapshot_diff, split_diff


def fp(spark, pairs):
    return spark.createDataFrame([Row(id=i, hashed=h) for i, h in pairs])


def test_classification(spark):
    source = fp(spark, [(1, 11), (2, 22), (3, 99), (5, 55)])
    replica = fp(spark, [(1, 11), (2, 20), (3, 99), (4, 44)])
    diff = snapshot_diff(source, replica)
    got = {r["id"]: r["change_type"] for r in diff.collect()}
    assert got == {1: "unchanged", 2: "update", 3: "unchanged", 4: "delete", 5: "insert"}


def test_split(spark):
    source = fp(spark, [(1, 11), (2, 22), (5, 55)])
    replica = fp(spark, [(1, 10), (2, 22), (4, 44)])
    parts = split_diff(snapshot_diff(source, replica))
    assert {r["id"] for r in parts.upserts.collect()} == {1, 5}
    assert {r["id"] for r in parts.updates.collect()} == {1}
    assert {r["id"] for r in parts.deletes.collect()} == {4}
    # upserts carry the NEW hash for the fingerprint cache
    assert {r["new_hash"] for r in parts.upserts.collect()} == {11, 55}
