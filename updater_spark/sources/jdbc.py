"""JDBC source: partitioned reads from the upstream RDBMS.

The reference streams two MySQL servers with server-side cursors
(/root/reference/src/utils.py:30, download.py:89-141). On Spark the
same scan is a *partitioned JDBC read*: N executors each pull a key
range, so the 150k rows/s single-connection ceiling becomes
N × per-connection throughput. The fingerprint expression (S2) can be
pushed into the source with ``query`` so only ``(pk, CRC32(...))``
crosses the wire — the reference's 4-bytes-per-row trick, preserved.

No MySQL driver/jar ships in this container, so this module is exercised
only for option construction; at deploy time add
``--packages com.mysql:mysql-connector-j:<ver>``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    query: str | None = None,
    properties: dict[str, str] | None = None,
):
    """Configured partitioned-JDBC DataFrameReader (call ``.load()``).

    ``fetch_size`` keeps per-connection memory flat (the SSCursor
    equivalent); ``num_partitions`` key-range-slices the table across
    executors.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    if query is not None:
        # e.g. SELECT id, CRC32(CONCAT_WS('', ...)) AS hashed FROM t —
        # compute the fingerprint server-side, ship 12 bytes/row
        reader = reader.option("query", query)
    else:
        reader = reader.option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def fingerprint_pushdown_query(
    table: str, primary_key: str, data_columns: list[str]
) -> str:
    """The S2 scan as server-side SQL (download.py:131-141): MySQL
    computes CRC32(CONCAT_WS('', cols)) so only (pk, hash) crosses the
    wire. Matches updater_spark.functions.fingerprints bit-for-bit
    (tests/test_fingerprint.py proves CRC32/concat_ws parity)."""
    cols = ", ".join(f"`{c}`" for c in data_columns)
    return (
        f"SELECT `{primary_key}` AS id, "
        f"CRC32(CONCAT_WS('', {cols})) AS hashed FROM `{table}`"
    )
