"""Continuous-aggregate rollups: merge and coarsen exactness."""

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.rollup import (
    bucket_rollup,
    rollup_coarsen,
    rollup_merge,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from updater_spark import demo

    return demo.load_events(spark, sf_dir).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_halves_equals_whole(events):
    """rollup(A) ⊎ rollup(B) == rollup(A ∪ B) — the property that makes
    per-micro-batch incremental maintenance exact."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    ra = bucket_rollup(a, "ts", "value", ["event_type"])
    rb = bucket_rollup(b, "ts", "value", ["event_type"])
    whole = bucket_rollup(events, "ts", "value", ["event_type"])
    assert _rows(rollup_merge(ra, rb, ["event_type"])) == _rows(whole)


def test_coarsen_equals_direct(events):
    """daily-from-hourly == daily-from-raw: the pyramid loses nothing."""
    hourly = bucket_rollup(events, "ts", "value", ["event_type"], "hour")
    daily_direct = bucket_rollup(events, "ts", "value", ["event_type"], "day")
    assert _rows(rollup_coarsen(hourly, ["event_type"], "day")) == _rows(
        daily_direct
    )


def test_merge_is_idempotent_free_of_shuffle_order(events):
    """Merging the same batches in either order yields identical state."""
    thirds = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    rs = [bucket_rollup(t, "ts", "value", ["event_type"]) for t in thirds]
    fwd = rollup_merge(rollup_merge(rs[0], rs[1], ["event_type"]), rs[2], ["event_type"])
    rev = rollup_merge(rollup_merge(rs[2], rs[0], ["event_type"]), rs[1], ["event_type"])
    assert _rows(fwd) == _rows(rev)
