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


def test_engine_bucketed_fingerprints_cycle(spark, tmp_path):
    """CdcEngine(fingerprint_buckets=N): the fingerprint cache lives in
    double-buffered bucketed catalog tables; results must match the
    plain engine and the diff's replica side must scan shuffle-free."""
    from pyspark.sql import Row

    from updater_spark.plans.cdc import CdcEngine
    from updater_spark.schema import TableSpec

    spec = TableSpec(name="acct", primary_key="id")
    rows = [Row(id=i, v=i * 3) for i in range(1, 1001)]
    src = spark.createDataFrame(rows)
    mutated = spark.createDataFrame(
        [Row(id=i, v=i * 3 + (1 if i % 100 == 0 else 0)) for i in range(1, 1001)]
        + [Row(id=2000, v=0)]
    ).filter(F.col("id") != 17)

    stores = {
        "plain": TableStore(spark, str(tmp_path / "plain")),
        "bucketed": TableStore(spark, str(tmp_path / "bucketed")),
    }
    engines = {
        "plain": CdcEngine(stores["plain"]),
        "bucketed": CdcEngine(stores["bucketed"], fingerprint_buckets=8),
    }
    stats = {}
    for kind, eng in engines.items():
        eng.bootstrap(spec, src)
        stats[kind] = eng.update(spec, mutated)

    for field in ("upserts", "updates", "deletes", "total_rows"):
        assert getattr(stats["plain"], field) == getattr(
            stats["bucketed"], field
        ), field
    a = stores["plain"].read("acct").orderBy("id").collect()
    b = stores["bucketed"].read("acct").orderBy("id").collect()
    assert a == b

    # rotation: two runs promoted opposite buffers each time
    eng_b = engines["bucketed"]
    buf_after_run2 = stores["bucketed"].current_bucketed("acct__fingerprints")
    eng_b.update(spec, mutated)
    buf_after_run3 = stores["bucketed"].current_bucketed("acct__fingerprints")
    assert buf_after_run2 != buf_after_run3

    # plan: replica (bucketed) side contributes no Exchange — only the
    # fresh source fingerprints shuffle into the bucket partitioning.
    rep = eng_b._read_fp("acct")
    fresh = spark.createDataFrame(rows).select(
        "id", (F.col("v") * 7).alias("hashed")
    )
    plan = snapshot_diff(fresh, rep)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan

    for buf in (0, 1):
        spark.sql(f"DROP TABLE IF EXISTS acct__fingerprints__buf{buf}")


def test_unbucketed_diff_join_shuffles(spark):
    a = spark.createDataFrame([Row(id=i, hashed=i) for i in range(100)])
    b = spark.createDataFrame([Row(id=i, hashed=i) for i in range(100)])
    plan = snapshot_diff(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # the baseline the bucketed path removes
