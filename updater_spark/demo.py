"""Deterministic demo scenarios binding the engine's operators to the
driver's TPC-H-ish test tables (TESTDATA.md).

The reference's CDC semantics need *two* snapshots (external source vs
internal replica). The test data ships one state per table, so the
"previous replica state" is derived deterministically from ``customer``
with pure modulo arithmetic — identical CTE logic exists in the DuckDB
oracle SQL (__spark_entry__.oracle_sql), so both engines see the same
simulated history:

- keys ``% 13 == 0``  → replica holds an older c_nationkey (+1) → UPDATE
- keys ``% 17 == 0``  → absent from the replica → INSERT
- synthetic keys ``+1_000_000`` for ``% 29 == 0`` → replica-only → DELETE

Fingerprints here use md5 (DuckDB has no crc32); the production path
uses crc32 for MySQL parity (tests/test_fingerprint.py) — semantics
identical, hash function swapped via the ``algo`` argument.

Only int/string columns enter the fingerprint, mirroring the reference
(FIXTURES.md: floats never enter the hash) and avoiding
double-to-string rendering skew between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CUSTOMER_FP_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` plus scale-adaptive scan parallelism for CPU-heavy map
    chains (r11, guide §2.5 "input skew"): a sub-split-size local
    parquet (one file, one row group) scans as ONE task, serializing
    expensive per-row expression work — the char-gram build measured
    2.4 s on 1 task vs 0.8 s repartitioned across 32 at sf0.1. The
    repartition fires only when the scan has fewer partitions than
    ``defaultParallelism`` (derived from the cluster, not a constant);
    at real scale inputs arrive in many splits and this is a no-op.
    Row-content is unchanged — only placement — so every oracle value
    is identical; the shuffle moves the sub-split file once.

    Applied SELECTIVELY, not blanket: only at entry sites where the
    A/B measured a win (char-gram / tokenizer-fold / hashing chains:
    langid_trained 4.41→1.13 s, dedup_char_lsh 2.72→1.30 s). Queries
    that consume the docs scan through several branches (bm25/hybrid/
    backoff: +1.2 s each) or whose per-row work is light relative to
    the added round-robin exchange (the near-dup family: +0.5–0.8 s)
    measured slower and keep the plain ``load``."""
    df = load(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        df = df.repartition(p)
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP with no
    timezone, which Spark 4 reads as TIMESTAMP_NTZ — a type
    ``unix_micros`` and friends reject. Normalize ONCE here, scoped to
    the returned DataFrame (no session-state side effects): rebuild
    the instant from the NTZ wall-clock fields with an explicit 'UTC'
    zone argument, so the result is identical under ANY session
    timezone and ``unix_micros`` equals DuckDB's ``epoch_us`` on the
    same naive values. (A plain NTZ→TIMESTAMP cast routes through the
    session timezone — correct only if the session happens to be UTC;
    driver queries pin UTC via _ensure_confs, but library callers
    shouldn't have their session mutated by a table load.)

    The bigint branch covers sessions where
    ``spark.sql.legacy.parquet.nanosAsLong`` was set at build time
    (nanos arrive as epoch-nanos long)."""
    ev = load(spark, sf_dir, "events")
    dt = dict(ev.dtypes)["ts"]
    if dt == "bigint":
        # integer division — float division of epoch-nanos (~1.7e18)
        # exceeds double's 53-bit mantissa and corrupts microseconds
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dt == "timestamp_ntz":
        # date_part('SECOND') keeps the microsecond fraction (DECIMAL)
        ev = ev.withColumn(
            "ts",
            F.expr(
                "make_timestamp(year(ts), month(ts), dayofmonth(ts), "
                "hour(ts), minute(ts), date_part('SECOND', ts), 'UTC')"
            ),
        )
    return ev


def new_snapshot(customer: DataFrame) -> DataFrame:
    """The external source's current state: customer, data cols only."""
    return customer.select(*CUSTOMER_FP_COLS)


def old_snapshot(customer: DataFrame) -> DataFrame:
    """The internal replica's previous state (see module docstring)."""
    c = F.col("c_custkey")
    base = (
        customer.select(*CUSTOMER_FP_COLS)
        .filter(c % 17 != 0)
        .withColumn(
            "c_nationkey",
            F.when(c % 13 == 0, F.col("c_nationkey") + 1).otherwise(
                F.col("c_nationkey")
            ),
        )
    )
    extra = (
        customer.select(*CUSTOMER_FP_COLS)
        .filter(c % 29 == 0)
        .withColumn("c_custkey", c + 1_000_000)
    )
    return base.unionByName(extra)


# SQL twin of old_snapshot/new_snapshot for the DuckDB oracle.
OLD_SNAPSHOT_SQL = """
    SELECT c_custkey,
           c_name,
           CASE WHEN c_custkey % 13 = 0 THEN c_nationkey + 1
                ELSE c_nationkey END AS c_nationkey,
           c_mktsegment
    FROM customer
    WHERE c_custkey % 17 <> 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, c_nationkey, c_mktsegment
    FROM customer
    WHERE c_custkey % 29 = 0
"""

NEW_SNAPSHOT_SQL = "SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer"

FP_SQL = (
    "md5(concat_ws('', c_custkey, c_name, c_nationkey, c_mktsegment))"
)


def fingerprint_md5(snapshot: DataFrame) -> DataFrame:
    """``(id, hashed)`` over a customer-shaped snapshot (md5 variant of
    S2, /root/reference/src/download.py:131-141)."""
    from updater_spark.functions.fingerprints import fingerprint_table

    return fingerprint_table(snapshot, "c_custkey", CUSTOMER_FP_COLS, algo="md5")


def player_shaped(orders: DataFrame) -> DataFrame:
    """Derive a player-stat table from ``orders`` with pure integer
    arithmetic (identical SQL twin below) — exercises every score
    formula including zero denominators (~1/7 of rows)."""
    k = F.col("o_orderkey")
    return orders.select(
        k.alias("id"),
        (k % 1000).alias("cheese_gathered"),
        (k % 50).alias("first"),
        (k % 7).alias("round_played"),  # zeros → NULL scores
        (k % 300).alias("shaman_cheese"),
        (k % 120).alias("saved_mice"),
        (k % 60).alias("saved_mice_hard"),
        (k % 30).alias("saved_mice_divine"),
        (k % 90).alias("survivor_survivor_count"),
        (k % 45).alias("survivor_mouse_killed"),
        (k % 11).alias("survivor_shaman_count"),
        (k % 13).alias("survivor_round_played"),
        (k % 25).alias("racing_first"),
        (k % 40).alias("racing_podium"),
        (k % 9).alias("racing_round_played"),
        (k % 17).alias("racing_finished_map"),
        (k % 500).alias("defilante_points"),
        (k % 5).alias("defilante_round_played"),
        (k % 19).alias("defilante_finished_map"),
    )


PLAYER_SHAPED_SQL = """
    SELECT o_orderkey AS id,
           o_orderkey % 1000 AS cheese_gathered,
           o_orderkey % 50  AS first,
           o_orderkey % 7   AS round_played,
           o_orderkey % 300 AS shaman_cheese,
           o_orderkey % 120 AS saved_mice,
           o_orderkey % 60  AS saved_mice_hard,
           o_orderkey % 30  AS saved_mice_divine,
           o_orderkey % 90  AS survivor_survivor_count,
           o_orderkey % 45  AS survivor_mouse_killed,
           o_orderkey % 11  AS survivor_shaman_count,
           o_orderkey % 13  AS survivor_round_played,
           o_orderkey % 25  AS racing_first,
           o_orderkey % 40  AS racing_podium,
           o_orderkey % 9   AS racing_round_played,
           o_orderkey % 17  AS racing_finished_map,
           o_orderkey % 500 AS defilante_points,
           o_orderkey % 5   AS defilante_round_played,
           o_orderkey % 19  AS defilante_finished_map
    FROM orders
"""
