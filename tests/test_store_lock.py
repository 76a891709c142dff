"""TableStore single-writer contract: pointer-swapping ops hold a
per-table lock; a racing second writer fails LOUDLY with
ConcurrentWriteError and never corrupts ``_CURRENT``; locks left by
crashed writers (dead pid / expired age) are broken automatically.

Reference context: the reference's updater is a single sequential
process (download.py runs tables one by one), so its double-buffer
rotation never faces concurrent writers; generalizing the store makes
the implicit contract explicit and enforced. Production escalation:
Delta/Iceberg optimistic commits (SURVEY §7.2).
"""

import os
import subprocess
import time

import pytest

from updater_spark.sources.store import ConcurrentWriteError, TableStore


def _df(spark, n=10):
    return spark.range(n).withColumnRenamed("id", "k")


def test_two_writers_loser_fails_loudly(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s"))
    store.write("t", _df(spark, 5))
    before = store.current_path("t")
    # a LIVE writer (this very process) holds the lock...
    lock = store._lock_path("t")
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}:{time.time()}")
    try:
        with pytest.raises(ConcurrentWriteError, match="single-writer"):
            store.write("t", _df(spark, 7))
    finally:
        os.unlink(lock)
    # the loser published nothing: pointer untouched, data readable
    assert store.current_path("t") == before
    assert store.read("t").count() == 5
    # with the lock gone the same write succeeds
    store.write("t", _df(spark, 7))
    assert store.read("t").count() == 7


def test_dead_holder_lock_is_broken(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s"))
    store.write("t", _df(spark, 3))
    # a crashed writer: pid of a subprocess that has already exited
    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(store._lock_path("t"), "w") as f:
        f.write(f"{proc.pid}:{time.time()}")
    store.write("t", _df(spark, 4))  # breaks the stale lock, proceeds
    assert store.read("t").count() == 4
    assert not os.path.exists(store._lock_path("t"))


def test_expired_lock_is_broken_even_if_pid_alive(spark, tmp_path):
    # cross-host crash model: pid liveness unverifiable, age decides
    store = TableStore(spark, str(tmp_path / "s"), lock_stale_after=0.05)
    store.write("t", _df(spark, 3))
    with open(store._lock_path("t"), "w") as f:
        f.write(f"{os.getpid()}:{time.time() - 1.0}")
    store.write("t", _df(spark, 6))
    assert store.read("t").count() == 6


def test_lock_released_after_write_and_unreadable_lock_refused(
    spark, tmp_path
):
    store = TableStore(spark, str(tmp_path / "s"))
    store.write("t", _df(spark, 2))
    assert not os.path.exists(store._lock_path("t"))
    # garbage lock content: refuse to break (fail loudly, not guess)
    with open(store._lock_path("t"), "w") as f:
        f.write("not-a-lock")
    try:
        with pytest.raises(ConcurrentWriteError):
            store.write("t", _df(spark, 9))
    finally:
        os.unlink(store._lock_path("t"))


def test_bucketed_rotation_also_locked(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s"))
    store.write_bucketed_versioned("bt", _df(spark, 8), "k", num_buckets=2)
    lock = store._lock_path("bt")
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}:{time.time()}")
    try:
        with pytest.raises(ConcurrentWriteError):
            store.write_bucketed_versioned(
                "bt", _df(spark, 9), "k", num_buckets=2
            )
    finally:
        os.unlink(lock)
    assert store.read_bucketed_versioned("bt").count() == 8
