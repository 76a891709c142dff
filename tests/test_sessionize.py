"""Sessionization vs a Python oracle + concurrent multi-table update."""

import datetime as dt

from pyspark.sql import Row

from updater_spark.operators.sessionize import sessionize


def _ev(eid, user, minute, value=1.0):
    return Row(
        event_id=eid,
        ts=dt.datetime(2026, 1, 1, minute // 60, minute % 60),
        user_id=user,
        value=value,
    )


def py_sessions(events, gap_min=30):
    out = {}
    by_user = {}
    for e in sorted(events, key=lambda e: (e.user_id, e.ts, e.event_id)):
        by_user.setdefault(e.user_id, []).append(e)
    for user, evs in by_user.items():
        idx = 0
        prev = None
        for e in evs:
            if prev is None or (e.ts - prev).total_seconds() > gap_min * 60:
                idx += 1
            out.setdefault((user, idx), []).append(e)
            prev = e.ts
    return {
        k: (
            min(e.ts for e in v),
            max(e.ts for e in v),
            len(v),
            sum(e.value for e in v),
        )
        for k, v in out.items()
    }


def test_sessionize_matches_python(spark):
    events = [
        _ev(1, 1, 0),
        _ev(2, 1, 10),
        _ev(3, 1, 50),  # 40min gap → new session
        _ev(4, 1, 60),
        _ev(5, 2, 5),
        _ev(6, 2, 200),  # isolated second session
        _ev(7, 3, 30),
    ]
    df = spark.createDataFrame(events)
    got = {
        (r["user_id"], r["session_idx"]): (
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["sum_value_e6"],
        )
        for r in sessionize(df, gap_minutes=30).collect()
    }
    expected = py_sessions(events)
    assert set(got) == set(expected)
    for k, (start, end, n, sv) in expected.items():
        g = got[k]
        assert g[0] == int(start.timestamp() * 1_000_000)
        assert g[1] == int(end.timestamp() * 1_000_000)
        assert g[2] == n
        assert g[3] == int(round(sv * 1_000_000))


def test_update_many_concurrent(spark, tmp_store):
    from updater_spark.plans.cdc import CdcEngine
    from updater_spark.schema import TableSpec

    engine = CdcEngine(tmp_store)
    specs = [TableSpec(f"t{i}", "id") for i in range(3)]
    jobs = [
        (spec, spark.createDataFrame([Row(id=j, v=j * (i + 1)) for j in range(50)]))
        for i, spec in enumerate(specs)
    ]
    stats = engine.update_many(jobs)
    assert all(stats[f"t{i}"].total_rows == 50 for i in range(3))
    # incremental round, concurrently again
    jobs2 = [
        (
            spec,
            spark.createDataFrame(
                [Row(id=j, v=j * (i + 1) + (1 if j < 5 else 0)) for j in range(50)]
            ),
        )
        for i, spec in enumerate(specs)
    ]
    stats2 = engine.update_many(jobs2)
    assert all(stats2[f"t{i}"].upserts == 5 for i in range(3))
