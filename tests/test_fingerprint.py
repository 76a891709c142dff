"""Hash-fidelity tests (SURVEY.md §4 'physical-execution risks').

MySQL ``CRC32(CONCAT_WS('', ...))`` must equal Spark
``crc32(concat_ws('', ...))`` for identical logical rows. Both equal
``zlib.crc32`` over the UTF-8 rendering, which is the oracle here.
"""

import zlib

from pyspark.sql import Row

from updater_spark.functions.fingerprints import fingerprint_table, row_fingerprint


def mysql_concat_ws(*vals) -> str:
    # CONCAT_WS skips NULLs; integers render as decimal strings.
    return "".join(str(v) for v in vals if v is not None)


def test_crc32_matches_zlib(spark):
    rows = [
        Row(id=1, name="Tigrounette#0001", cheese=12345),
        Row(id=2, name="mouse", cheese=0),
        Row(id=3, name=None, cheese=7),  # NULL skipped by concat_ws
        Row(id=4, name="Ünïcødé#字", cheese=99),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", row_fingerprint(["id", "name", "cheese"]).alias("fp")
        ).collect()
    }
    for r in rows:
        expected = zlib.crc32(
            mysql_concat_ws(r.id, r.name, r.cheese).encode("utf-8")
        )
        assert got[r.id] == expected, r


def test_fingerprint_table_shape(spark):
    df = spark.createDataFrame([Row(pk=10, a="x", b=1)])
    fp = fingerprint_table(df, "pk", ["pk", "a", "b"])
    assert fp.columns == ["id", "hashed"]
    row = fp.collect()[0]
    assert row["id"] == 10
    assert row["hashed"] == zlib.crc32(b"10x1")


def test_fingerprint_changes_with_any_column(spark):
    base = Row(id=1, a="x", b=5)
    variants = [Row(id=1, a="y", b=5), Row(id=1, a="x", b=6), Row(id=2, a="x", b=5)]
    df = spark.createDataFrame([base] + variants)
    fps = [
        r["fp"]
        for r in df.select(row_fingerprint(["id", "a", "b"]).alias("fp")).collect()
    ]
    assert len(set(fps)) == len(fps)
