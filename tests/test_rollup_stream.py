"""Streaming continuous aggregate: incremental state equals batch
aggregation of everything that has arrived, and per-trigger writes
only touch the day-partitions the batch hits."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.rollup import bucket_rollup
from updater_spark.sources.store import TableStore
from updater_spark.streaming.rollup_stream import (
    apply_rollup_delta,
    run_rollup_stream,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from updater_spark import demo

    return demo.load_events(spark, sf_dir).cache()


def _state(store, table):
    return sorted(
        tuple(r)
        for r in store.read_partitioned(table).drop("_pday").collect()
    )


def _expected(events):
    return sorted(
        tuple(r)
        for r in bucket_rollup(events, "ts", "value", ["event_type"]).collect()
    )


def test_stream_drains_drops_to_exact_state(spark, events, tmp_path):
    """Three drops (disjoint event_id residues) through the real
    file-source stream: final state ≡ one batch rollup over all rows."""
    drops = str(tmp_path / "drops")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(
            drops
        )
    store = TableStore(spark, str(tmp_path / "store"))
    q = run_rollup_stream(
        spark,
        store,
        "ev_rollup",
        drops,
        events.schema,
        str(tmp_path / "ckpt"),
        keys=["event_type"],
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _state(store, "ev_rollup") == _expected(events)


def test_incremental_merge_applies_per_batch(spark, events, tmp_path):
    """Driving apply_rollup_delta directly: after each batch the state
    equals the batch aggregation of everything arrived so far."""
    store = TableStore(spark, str(tmp_path / "store"))
    seen = None
    for i in range(3):
        batch = events.filter(F.col("event_id") % 3 == i)
        apply_rollup_delta(
            store, "ev_rollup", batch, "ts", "value", ["event_type"]
        )
        seen = batch if seen is None else seen.unionByName(batch)
        assert _state(store, "ev_rollup") == _expected(seen)


def test_write_is_partition_pruned(spark, events, tmp_path):
    """A batch touching one day rewrites only that day's partition."""
    store = TableStore(spark, str(tmp_path / "store"))
    apply_rollup_delta(
        store, "ev_rollup", events, "ts", "value", ["event_type"]
    )
    root = os.path.join(str(tmp_path / "store"), "ev_rollup", "pdata")
    days = sorted(glob.glob(os.path.join(root, "_pday=*")))
    assert len(days) >= 2  # events span multiple days

    def mtimes():
        return {
            d: max(os.path.getmtime(f) for f in glob.glob(os.path.join(d, "*.parquet")))
            for d in days
        }

    before = mtimes()
    one_day = events.orderBy("ts").limit(50)
    apply_rollup_delta(
        store, "ev_rollup", one_day, "ts", "value", ["event_type"]
    )
    after = mtimes()
    touched = {d for d in days if after[d] != before[d]}
    n_days = one_day.select(F.to_date("ts")).distinct().count()
    assert len(touched) <= n_days  # only the hit partitions rewritten
    assert len(touched) < len(days)
    # and the merged state is still exact
    assert _state(store, "ev_rollup") == _expected(
        events.unionByName(one_day)
    )
