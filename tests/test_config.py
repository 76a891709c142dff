"""Env-driven configuration (reference utils.py parity)."""

import os

from pyspark.sql import Row

from updater_spark.config import EngineConfig, engine_from_env
from updater_spark.schema import TableSpec


def test_defaults():
    cfg = EngineConfig()
    assert cfg.fingerprint_algo == "crc32"
    assert cfg.delete_guard == 100_000
    assert cfg.partition_buckets == 0


def test_env_overrides(monkeypatch, spark, tmp_path):
    monkeypatch.setenv("UPDATER_STORE_ROOT", str(tmp_path / "env_store"))
    monkeypatch.setenv("UPDATER_DELETE_GUARD", "7")
    monkeypatch.setenv("UPDATER_FINGERPRINT_ALGO", "xxhash64")
    monkeypatch.setenv("UPDATER_PARTITION_BUCKETS", "4")
    monkeypatch.setenv("PIPE_SIZE", "100")  # legacy knob: accepted, ignored
    engine = engine_from_env(spark)
    assert engine.delete_guard == 7
    assert engine.algo == "xxhash64"
    assert engine.partition_buckets == 4

    spec = TableSpec("cfg_t", "id")
    stats = engine.update(spec, spark.createDataFrame([Row(id=i, v=i) for i in range(20)]))
    assert stats.total_rows == 20
    assert os.path.isdir(str(tmp_path / "env_store"))


def test_hostile_session_confs_rescued(spark, sf_dir):
    """The driver builds its own SparkSession — Spark 4 defaults ANSI
    on, and nothing pins its timezone. Every queries() entry must
    rescue the session via _with_confs: division-by-zero score rows
    still yield NULL (MySQL parity), and event timestamps still
    resolve as UTC."""
    import __spark_entry__ as em

    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        qs = em.queries()
        # p2_scores divides by zero on ~1/7 of rows — ANSI would throw
        scores = qs["p2_scores"](spark, sf_dir)
        n = scores.count()
        assert n > 0
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # events path: NTZ normalization must land on UTC epochs
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        sess = qs["events_sessionize"](spark, sf_dir)
        assert sess.count() > 0
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        em._ensure_confs(spark)
