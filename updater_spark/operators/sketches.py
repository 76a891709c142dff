"""Mergeable cardinality sketches — HyperLogLog (Flajolet et al.
2007) over a PORTABLE hash. At 100 TB, exact COUNT(DISTINCT key) is
a full shuffle of every distinct key; an HLL register table is 2^b
integers that (a) computes in one partial-combining aggregate pass,
(b) MERGES across partitions/days/shards by register-max — the
property that makes pre-aggregated rollups composable (the reason
every warehouse ships approx_count_distinct). Spark's builtin
``approx_count_distinct`` is exactly this but its register state is
opaque; this implementation exposes the REGISTER TABLE as data, so
sketches can be stored per-partition (the rollup.py discipline),
merged later, and — because the hash is md5 (the repo's portable-
uniform convention, sampling.py) — reproduced bit-for-bit by any SQL
engine: the driver oracle recomputes the registers AND the estimate
in DuckDB.

Register math (standard HLL, no sparse mode, no HLL++ bias table —
the corrections are data-independent closed forms, so the oracle
stays a literal translation):

- register index = low ``b`` bits of the 60-bit hash prefix
- rho = number of leading zeros + 1 of the REMAINING 60−b bits
  (capped at 60−b+1 by construction of the window)
- estimate = alpha_m · m² / Σ 2^(−M_j), with the small-range
  linear-counting correction when E ≤ 2.5m and zero registers exist.

Shapes: ``hll_sketch`` = one groupBy(register).max — shuffle carries
≤ m rows per upstream partition. ``hll_merge`` = the same aggregate
over unioned register tables. ``hll_estimate`` = a 1-row fold over m
rows. No corpus-sized state anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(
    df: DataFrame, key_col: str, b: int = 12, hasher: str = "md5"
) -> DataFrame:
    """Build the register table ``(register, rho)`` for the distinct
    values of ``key_col`` (NULLs excluded, the COUNT DISTINCT
    convention): one partial-combining max aggregate; at most
    ``m = 2^b`` output rows. Hash = first 15 hex chars of
    md5(cast to string) read as a 60-bit integer (fits BIGINT
    exactly, so register/payload splits are pure integer arithmetic)
    — portable to any engine with md5."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    if hasher not in ("md5", "xxhash64"):
        raise ValueError("hasher must be md5 or xxhash64")
    m = 1 << b
    # md5 (default): 60-bit hash (15 hex chars) so every step is
    # EXACT BIGINT arithmetic — no decimal division, no float log2
    # (whose boundary rounding can differ across engines) — and any
    # SQL engine reproduces the registers (the oracle path).
    # xxhash64 (deploy path): JVM-side, no string materialization,
    # ~same register math over |hash| mod 2^60 — measurably faster
    # at corpus scale (PROBES sketches probe) but Spark-specific.
    # register = low b bits, payload = the remaining 60-b bits, and
    # floor(log2(payload)) = length(bin(payload)) - 1, an integer
    # identity both Spark and DuckDB evaluate exactly.
    if hasher == "md5":
        h = F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
    else:
        h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(1 << 60)).cast(
            "long"
        )
    width = 60 - b
    rho = F.when(
        F.col("_payload") == 0, F.lit(width + 1)
    ).otherwise(
        F.lit(width) - (F.length(F.bin(F.col("_payload"))) - 1)
    ).cast("int")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            (h % F.lit(m)).cast("int").alias("register"),
            # exact integer >> b (a double division would round past
            # 2^53 and corrupt high payloads)
            F.shiftright(h, b).alias("_payload"),
        )
        .withColumn("rho", rho)
        .groupBy("register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables and keep the max rho per register — the
    HLL merge. Input sketches must share the same ``b``."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, b: int = 12) -> DataFrame:
    """The cardinality estimate from a register table: one fold over
    ≤ m rows. Returns a 1-row frame ``(estimate, raw_estimate,
    zero_registers)`` — ``estimate`` applies the standard small-range
    linear-counting correction; both are DOUBLE (round at the edge).
    Missing registers count as zero (the sketch only stores touched
    registers)."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
    )
    alpha = _alpha(m)
    # absent registers contribute 2^0 = 1 each to the denominator
    denom = F.col("_s") + (F.lit(m) - F.col("_nz"))
    raw = F.lit(alpha * m * m) / denom
    zeros = (F.lit(m) - F.col("_nz")).cast("long")
    small = raw <= F.lit(2.5 * m)
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / zeros.cast("double")
    )
    est = F.when(small & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        est.alias("estimate"),
        raw.alias("raw_estimate"),
        zeros.alias("zero_registers"),
    )


def hll_error_bound(b: int) -> float:
    """The theoretical relative standard error 1.04/sqrt(m)."""
    return 1.04 / math.sqrt(1 << b)


# -- Count-Min sketch: mergeable frequency estimation ------------------


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    hasher: str = "md5",
) -> DataFrame:
    """Count-Min register table (Cormode & Muthukrishnan 2005) for
    the frequency of every value of ``key_col``: ``depth`` rows of
    ``width`` counters; counter (r, c) sums every key with
    ``hash_r(key) % width == c``. ONE groupBy((r, c)) count after a
    depth-way explode — shuffle carries ≤ depth·width rows per
    upstream partition, and sketches MERGE by counter addition
    (``cm_merge``), the same composability contract as hll_sketch.

    Estimates OVERCOUNT, never undercount (min over rows caps the
    collision noise at ~2n/width with probability 1−2^−depth) — the
    right tool for heavy-hitter screening at 100 TB where exact
    per-key counts would shuffle the corpus by key. Hash_r = the
    60-bit md5 prefix of ``r || ':' || key`` — portable, so the
    oracle reproduces every counter exactly.

    r11: counts pre-aggregate per DISTINCT key before the depth-way
    explode and hash (guide §2.3 "aggregate before you shuffle"):
    counter (r, c) = Σ over keys hashing there of the key's count —
    identical registers, but the md5 chain (concat + md5 + hex conv)
    runs depth·|distinct keys| times instead of depth·N (measured
    2.4 M → 4.3 k evaluations on the sf0.1 lineitem supplier query,
    5.7 s → sub-second). The added key shuffle carries one row per
    (task, distinct key) thanks to partial aggregation — at any
    skew, hot keys collapse map-side."""
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    if hasher not in ("md5", "xxhash64"):
        raise ValueError("hasher must be md5 or xxhash64")
    keyed = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("_k"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    rows = keyed.select(
        "_k",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("row"),
    )
    h = _cm_hash(hasher)
    return (
        rows.select(
            "row", (h % F.lit(width)).cast("int").alias("col"), "_n"
        )
        .groupBy("row", "col")
        .agg(F.sum("_n").cast("long").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise addition of Count-Min register tables (same
    depth/width required)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def _cm_hash(hasher: str) -> F.Column:
    """Row-salted key hash: md5 over 'row:key' (portable — any SQL
    engine reproduces every counter: the oracle path) or xxhash64
    (JVM-native, no string build: the deploy path; same counters in
    Spark-only pipelines). Sketch and estimate must use the SAME
    hasher or every probe misses."""
    if hasher == "md5":
        return F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("row"), F.col("_k"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    return F.pmod(
        F.xxhash64(F.col("row"), F.col("_k")), F.lit(1 << 60)
    ).cast("long")


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    hasher: str = "md5",
) -> DataFrame:
    """Point-estimate the frequency of each key in ``keys``: probe
    the ``depth`` counters a key hashes to and take the MIN (absent
    counters read 0 — the key was never seen). The probe is a hash
    equi-join on (row, col); the keys side is usually tiny
    (candidate heavy hitters) and broadcasts."""
    if hasher not in ("md5", "xxhash64"):
        raise ValueError("hasher must be md5 or xxhash64")
    probes = keys.select(F.col(key_col)).distinct().select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("_k"),
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("row"),
    )
    h = _cm_hash(hasher)
    probes = probes.select(
        key_col, "row", (h % F.lit(width)).cast("int").alias("col")
    )
    return (
        probes.join(sketch, ["row", "col"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cm_count")
        )
    )
