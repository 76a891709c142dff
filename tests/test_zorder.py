"""Z-order layout: Morton math vs a Python reference, and the
observable pruning claim — a 2-D clustered copy skips files for
selective predicates on EITHER dimension, where 1-D clustering only
skips on its own sort key."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.zorder import Z_COL, add_zvalue, zvalue_expr
from updater_spark.sources.store import TableStore


def _py_morton(cells, bits):
    k = len(cells)
    z = 0
    for j, c in enumerate(cells):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * k + (k - 1 - j))
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [Row(a=a, b=b) for a in [0, 3, 7, 100] for b in [0, 5, 42, 100]]
    df = spark.createDataFrame(rows)
    got = df.select(
        "a", "b", zvalue_expr(["a", "b"], [0, 0], [100, 100], bits=8).alias("z")
    ).collect()
    top = (1 << 8) - 1
    for r in got:
        ca = min(max(int(r.a / 100 * top), 0), top)
        cb = min(max(int(r.b / 100 * top), 0), top)
        assert r.z == _py_morton([ca, cb], 8), (r.a, r.b)


def test_zvalue_edge_cases(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=None, b=2), Row(a=5, b=5)]
    )
    out = add_zvalue(df, ["a", "b"], bits=4)
    vals = {(r.a, r.b): r[Z_COL] for r in out.collect()}
    assert all(v is not None for v in vals.values())  # nulls → cell 0
    with pytest.raises(ValueError):
        zvalue_expr(["a", "b"], [0, 0], [1, 1], bits=32)  # 64 bits > long
    # constant column: span 0 degrades to the other dimension
    const = spark.createDataFrame([Row(a=7, b=i) for i in range(4)])
    zs = [r[Z_COL] for r in add_zvalue(const, ["a", "b"], 4).collect()]
    assert len(set(zs)) == 4


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """events z-ordered on (user_id, event_id): a selective predicate
    on EITHER column touches a strict subset of files; the 1-D copy
    clustered on event_id reads everything for the user_id filter.
    Content round-trips exactly (layout must be invisible)."""
    from updater_spark import demo

    events = demo.load_events(spark, sf_dir)
    store = TableStore(spark, str(tmp_path / "store"))
    store.write_zordered(
        "ev_z", events, ["user_id", "event_id"], bits=12, num_files=16
    )
    store.write_clustered("ev_1d", events, ["event_id"], num_files=16)

    n = events.count()
    users = [r[0] for r in events.select("user_id").distinct().collect()]
    users.sort()
    u_lo, u_hi = users[0], users[max(0, len(users) // 20 - 1)]  # ~5% of users
    e_lo, e_hi = n // 2, n // 2 + n // 50  # ~2% of event ids
    u_pred = F.col("user_id").between(u_lo, u_hi)
    e_pred = F.col("event_id").between(e_lo, e_hi)

    def touched(table, pred):
        return (
            store.read(table)
            .filter(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    # either dimension prunes the z-ordered copy
    assert touched("ev_z", u_pred) <= 8
    assert touched("ev_z", e_pred) <= 8
    # 1-D copy prunes its own key but NOT the other dimension
    assert touched("ev_1d", e_pred) <= 2
    assert touched("ev_1d", u_pred) >= 14
    # layout is invisible to content
    assert store.read("ev_z").count() == n
    assert (
        store.read("ev_z").agg(F.sum("event_id")).first()[0]
        == events.agg(F.sum("event_id")).first()[0]
    )
    assert store.read("ev_z").columns == events.columns
