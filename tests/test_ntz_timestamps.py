"""TIMESTAMP_NTZ tolerance.

The driver's events.parquet stores ``ts`` as parquet TIMESTAMP with no
timezone — Spark 4 reads that as TIMESTAMP_NTZ, which ``unix_micros``
rejects. Round 1 shipped green pytest (all fixtures built LTZ via
``to_timestamp``) while the driver crashed on the real files; these
tests read an NTZ parquet fixture exactly like the driver's.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ntz_events_dir(tmp_path_factory):
    """events-shaped parquet with ts as timestamp[us] WITHOUT timezone
    (the driver testdata's physical type, verified via pyarrow)."""
    root = tmp_path_factory.mktemp("ntz_sf")
    base = dt.datetime(2024, 3, 1, 12, 0, 0)  # naive
    rows = []
    for i in range(200):
        rows.append(
            {
                "event_id": i,
                "ts": base + dt.timedelta(minutes=7 * i),
                "user_id": i % 5,
                "event_type": ["click", "purchase", "view"][i % 3],
                "value": float(i % 11),
                "props": "{}",
            }
        )
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # no tz ⇒ Spark TIMESTAMP_NTZ
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, str(root / "events.parquet"))
    return str(root)


def test_fixture_reads_as_ntz(spark, ntz_events_dir):
    raw = spark.read.parquet(f"{ntz_events_dir}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz"


def test_load_events_normalizes_ntz(spark, ntz_events_dir):
    from updater_spark import demo

    ev = demo.load_events(spark, ntz_events_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # UTC session tz ⇒ naive wall clock == epoch instant
    got = ev.filter(F.col("event_id") == 0).select(
        F.unix_micros("ts").alias("us")
    ).head()["us"]
    assert got == int(
        dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )


def test_sessionize_accepts_ntz(spark, ntz_events_dir):
    from updater_spark.operators.sessionize import sessionize

    raw = spark.read.parquet(f"{ntz_events_dir}/events.parquet")
    out = sessionize(raw, gap_minutes=30)
    # 5 users, events every 7*5=35 min per user > 30 min gap ⇒ every
    # event its own session
    assert out.count() == 200


def test_interval_join_accepts_ntz(spark, ntz_events_dir):
    from updater_spark.operators.rangejoin import interval_join

    raw = spark.read.parquet(f"{ntz_events_dir}/events.parquet")
    points = raw.select("event_id", "user_id", "ts")
    intervals = raw.filter(F.col("event_id") % 50 == 0).select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 70 MINUTES")).alias("end_ts"),
    )
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", bin_width=3600
    )
    # each interval covers its own event plus the next 9 (7-min grid,
    # 70-min half-open window)
    assert out.count() == 4 * 10


def test_asof_join_events_query_on_ntz(spark, ntz_events_dir):
    """The full driver-query path (load_events → asof_join →
    unix_micros outputs) over NTZ input."""
    import __spark_entry__ as em

    out = em.queries()["asof_join_events"](spark, ntz_events_dir)
    rows = out.count()
    assert rows > 0
    assert dict(out.dtypes)["ts_us"] == "bigint"


def test_conf_failures_recorded_not_swallowed(spark):
    """A non-settable static conf must be RECORDED, not silently
    dropped (the r1 silent `except: pass` hid the NTZ bug)."""
    import __spark_entry__ as em

    saved = dict(em._REQUIRED_CONFS)
    try:
        # warehouse.dir is a STATIC SQL conf — spark.conf.set on a
        # live session must fail, and that failure must be recorded
        em._REQUIRED_CONFS["spark.sql.warehouse.dir"] = "/nonexistent/wh"
        em.CONF_FAILURES.clear()
        em._ensure_confs(spark)
        assert "spark.sql.warehouse.dir" in em.CONF_FAILURES
        # the settable ones did apply
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        em._REQUIRED_CONFS.clear()
        em._REQUIRED_CONFS.update(saved)
        em.CONF_FAILURES.clear()


def test_load_events_is_session_tz_independent(spark, ntz_events_dir):
    """load_events must not mutate session state, and its NTZ
    normalization must yield the same instants under any session
    timezone (the instant = the naive value read as UTC wall-clock)."""
    from updater_spark import demo

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        from pyspark.sql import functions as F

        ev = demo.load_events(spark, ntz_events_dir)
        # no side effect on the session
        assert spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo"
        tokyo = sorted(
            r[0] for r in ev.select(F.unix_micros("ts")).collect()
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(
            r[0]
            for r in demo.load_events(spark, ntz_events_dir)
            .select(F.unix_micros("ts"))
            .collect()
        )
        assert tokyo == utc and len(tokyo) > 0
        # and the instants equal the naive wall clock read as UTC
        import datetime

        raw = spark.read.parquet(f"{ntz_events_dir}/events.parquet")
        naive = sorted(
            int(
                r[0]
                .replace(tzinfo=datetime.timezone.utc)
                .timestamp()
                * 1_000_000
            )
            for r in raw.select("ts").collect()
        )
        assert naive == utc
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
