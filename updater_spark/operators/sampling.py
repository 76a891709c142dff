"""Deterministic sampling operators for training-data assembly.

A 100 TB pipeline cannot use ``df.sample`` (seeded per-partition RNG:
resharding or recovery changes the sample) — every selection here is a
pure function of (row id, salt), so samples are reproducible across
reruns, repartitioning, and engines, and composable with the split /
packing operators (operators/packing.py).

- ``hash_sample``: keep a fraction of rows by md5-prefix threshold.
- ``stratified_sample``: per-stratum fractions (e.g. per language or
  per quality band), same mechanism.
- ``mixture_resample``: domain re-weighting by *expected copy count* —
  the up/down-sampling step that turns a raw corpus into a training
  mixture (floor(w) guaranteed copies + one more with probability
  frac(w), decided by the row's own hash). Emits ``copy_idx`` so
  downstream shuffles can decorrelate duplicate copies.

Scale notes: all three are stateless per-row projections (the resample
adds a generate/explode) — they run at scan speed inside whole-stage
codegen, shuffle nothing, and preserve the input partitioning. The
selection hash is 32 bits of md5: collision-free "is this row in the
sample" thresholds down to fractions of ~1e-9, independent per salt.

Reference scope: the reference engine (cheeseformice/updater) has no
sampling — north-star extension per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "stratified_sample",
    "mixture_resample",
    "hash_unit",
    "deterministic_shuffle",
    "domain_quota",
    "stratified_exact",
    "budget_select",
]

_SCALE = float(1 << 32)


def hash_unit(id_col: str, salt: str) -> F.Column:
    """Uniform [0,1) value from the first 32 bits of md5(id || salt).

    Portable: every engine renders md5 hex identically, and the hex →
    int conversion is exact for 8 hex digits.
    """
    hx = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")),
        1,
        8,
    )
    return F.conv(hx, 16, 10).cast("double") / F.lit(_SCALE)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row iff hash_unit(id, salt) < fraction.

    Deterministic Bernoulli sample: membership depends only on the
    row's own id, so it is stable under corpus growth (a kept row is
    kept forever) and disjoint salts give independent samples.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_unit(id_col, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "strata-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling.

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_fraction``. One scan, no shuffle — the
    per-row threshold is a CASE over the stratum column.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    thr: F.Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value), F.lit(float(frac))).otherwise(
            thr
        )
    return df.filter(hash_unit(id_col, salt) < thr)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
    round_digits: int = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, A-Res): key_i = ln(u_i)/w_i with the
    portable md5 uniform, keep the k LARGEST keys. Inclusion
    probability is proportional to weight without replacement — the
    training-mixture construction primitive (``mixture_resample``
    reweights BETWEEN strata with replacement; this picks k distinct
    rows BY per-row weight, e.g. a quality score).

    Deterministic: u depends only on (id, salt), so the sample is
    reproducible and stable across partitionings. The ranking key is
    ROUNDED (then id-tie-broken) so the selected SET is a total order
    both engines reproduce (the bm25 discipline — raw ln/division can
    differ in the last ulp across libm implementations).

    Scale shape: one narrow key computation + ``TakeOrdered`` top-k
    (per-partition heaps, k rows to the driver side of the sort — no
    full sort, no shuffle of the corpus). Zero-or-negative weights are
    excluded (their inclusion probability is 0).

    Returns the sampled rows with their ``_key`` column attached."""
    if k < 1:
        raise ValueError("k must be >= 1")
    key = F.round(
        F.log(hash_unit(id_col, salt)) / F.col(weight_col).cast("double"),
        round_digits,
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    pos_col: str = "pos",
    n_buckets: int | None = None,
) -> DataFrame:
    """Global deterministic shuffle: assign every row a contiguous
    0-based position in md5(id || salt) order — the reproducible
    training-order shuffle of an LLM data pipeline (same corpus + salt
    ⇒ same order on any engine, any partitioning, any rerun).

    Scale shape: the naive ``row_number() OVER (ORDER BY h)`` collapses
    the whole table into ONE window partition — a non-starter at
    100 TB. Instead, the partition of a row is a pure function of its
    own hash (bucket = high 32 bits of md5 ÷ bucket width), so:
    (1) a scan-level count agg over buckets — map-side combined, one
    long per bucket to the driver, NO sort, NO persist of the data;
    (2) positions = broadcast-joined cumulative bucket offset + the
    row's rank within its bucket, via a window partitioned by bucket —
    every bucket ranks in parallel. Hash-bucket ordering is monotone
    with full-hash ordering (hex strings compare numerically), which
    is what makes the bucket offsets globally consistent.

    The data moves through exactly ONE shuffle (the window's hash
    exchange); the counting pass re-scans instead of caching — at
    100 TB a persist is infeasible while a second columnar scan is
    cheap. (Alternatives measured at 10M rows: range-sort + persist +
    mapInPandas stamp ~24 s; range-sort + persist +
    monotonically_increasing_id ~15 s — the persist materialization
    dominates both; this formulation ~10 s and O(1) memory.)
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    width = (1 << 32) // n_buckets + 1
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    bucket = (
        F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long")
        / F.lit(width)
    ).cast("long")
    staged = df.withColumn("__h", h).withColumn("__b", bucket)
    counts = dict(
        staged.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__b long, __off long")
    w = Window.partitionBy("__b").orderBy(F.col("__h"), F.col(id_col))
    return (
        staged.join(F.broadcast(off_df), "__b")
        .withColumn(
            pos_col,
            (F.col("__off") + F.row_number().over(w) - F.lit(1)).cast("long"),
        )
        .drop("__h", "__b", "__off")
    )


def domain_quota(
    df: DataFrame,
    cap: int,
    domain_col: str,
    order_col: str | None = None,
    id_col: str = "doc_id",
    prune_buckets: int = 0,
    strategy: str = "window",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain — the RefinedWeb-style
    per-source/URL quota that stops a handful of mega-domains from
    dominating a crawl-derived corpus. Within an over-cap domain the
    SURVIVORS are the top rows by ``order_col`` (a quality score,
    descending; ``None`` ranks by id), tie-broken by id — a total
    order, so the kept set is deterministic on any engine.

    Two strategies, same exact result (pinned by test):

    - ``"window"`` (default): one ranking window over all rows.
      ONE scan, one exchange of the corpus. Measured FASTER on a
      single node (10.6s vs 21.0s at 20M × 400-byte rows, PROBES
      quota_20m): a local shuffle is a memory copy, so the exchange
      is cheaper than the second scan two-phase pays.
    - ``"two_phase"``: a count agg finds over-cap domains; under-cap
      rows pass through a (broadcastable, ≤ total/cap entries)
      anti-join and only over-cap rows enter the ranking exchange.
      Shuffle VOLUME drops to the over-cap slice (30% in the probe,
      typically far less in a crawl corpus) at the cost of extra
      scans (the count aggregate plus the two filtered passes) — the
      right trade when the exchange is network-bound (a real
      cluster, wide rows), not on local[*].

    Either strategy: one mega-domain lands its rows in a single
    window partition. ``prune_buckets > 1`` bounds that skew with an
    EXACT pre-prune: rows first rank within (domain, xxhash64(id) %
    prune_buckets) and only each bucket's top ``cap`` advance — the
    global top-cap of a domain is a subset of the union of
    per-bucket top-caps, so the final window sees at most
    ``cap * prune_buckets`` rows per domain no matter how hot the
    domain is. The pre-window adds ~10% locally (no mega-domain is
    task-breaking at 20M); it exists for the corpus where one host
    is 30% of the crawl and the single-task sort would OOM."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if strategy not in ("window", "two_phase"):
        raise ValueError(
            f"strategy must be 'window' or 'two_phase', got {strategy!r}"
        )
    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )

    def ranked_cap(rows: DataFrame) -> DataFrame:
        if prune_buckets > 1:
            bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(prune_buckets))
            w_pre = Window.partitionBy(F.col(domain_col), bucket).orderBy(
                *order
            )
            rows = (
                rows.withColumn("__rk", F.row_number().over(w_pre))
                .filter(F.col("__rk") <= cap)
                .drop("__rk")
            )
        w = Window.partitionBy(domain_col).orderBy(*order)
        return (
            rows.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap)
            .drop("__rk")
        )

    if strategy == "window":
        return ranked_cap(df)
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # null-SAFE split: the window strategy treats NULL domain as its
    # own group and caps it; a plain equi anti-join would never match
    # NULL against "heavy" and let an over-cap NULL domain through
    # uncapped, breaking the two-strategies-same-result contract
    heavy = counts.filter(F.col("__n") > cap).select(
        F.col(domain_col).alias("__heavy_dom")
    )
    split = df[domain_col].eqNullSafe(F.col("__heavy_dom"))
    light_rows = df.join(heavy, split, "left_anti")
    heavy_rows = df.join(heavy, split, "left_semi")
    return light_rows.unionByName(ranked_cap(heavy_rows)).select(*df.columns)


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 1.0,
) -> DataFrame:
    """Re-weight domains by expected copy count.

    A row in a domain with weight ``w`` is emitted ``floor(w)`` times,
    plus one more iff hash_unit(id, salt) < w - floor(w) — so the
    expected multiplicity is exactly ``w`` and the realized counts are
    deterministic. ``w < 1`` downsamples, ``w > 1`` upsamples; the
    output carries ``copy_idx`` (0-based) distinguishing the copies.

    This is the standard mixture step of an LLM data pipeline
    (domain-balanced pretraining corpora); expressed as a generate
    (array_repeat + explode) it stays in codegen with no shuffle.
    """
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    w: F.Column = F.lit(float(default_weight))
    for value, weight in sorted(weights.items()):
        w = F.when(F.col(domain_col) == F.lit(value), F.lit(float(weight))).otherwise(w)
    base = F.floor(w).cast("int")
    extra = (hash_unit(id_col, salt) < (w - F.floor(w))).cast("int")
    n_copies = (base + extra).alias("n_copies")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.col("__n_copies") - 1).cast("long"),
                )
            ),
        )
        .drop("__n_copies")
    )


def stratified_exact(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "strataN-v1",
) -> DataFrame:
    """EXACTLY ``n`` rows per stratum (strata smaller than n pass
    through whole) — the balanced-evaluation-set builder.
    ``stratified_sample`` above keeps a FRACTION per stratum (row
    count varies with stratum size); benchmark/eval assembly usually
    wants a fixed count per class/language instead.

    Selection = the n smallest md5(id||salt) hashes per stratum: the
    per-stratum sample is a uniform without-replacement draw,
    deterministic across engines/partitionings (hash-rank order), and
    REFRESH-STABLE in expectation only — unlike the fractional
    sampler, exact-n membership necessarily shifts as a stratum
    grows (a new row can displace rank n); salt it per release.

    Scale shape: one ranking window keyed by the stratum — the
    domain_quota shape, and its prune applies the same way if one
    stratum dwarfs the rest."""
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def budget_select(
    df: DataFrame,
    budget: float,
    cost_col: str,
    order_col: str,
    id_col: str = "doc_id",
    bucket_granularity: float = 1.0,
) -> DataFrame:
    """Greedy budget-constrained selection: walk rows in quality
    order (``order_col`` descending, id ties) and keep each row whose
    cumulative ``cost_col`` still fits the budget, stopping at the
    first row that would cross it — "take the best documents until
    the token budget is spent", the assembly step that turns a scored
    corpus into a fixed-size training set.

    Scale shape: the naive form is a running sum over ONE global
    window — a single-partition sort at 100 TB. Here the
    deterministic_shuffle decomposition applies because the walk
    order has a computable coarse prefix: rows bucket by
    ``floor(order_col * bucket_granularity)`` (monotone with the walk
    order), per-bucket cost totals cumulate on the DRIVER (|buckets|
    longs — no data movement), and each row's global running cost =
    its bucket's offset + an intra-bucket running sum (windows per
    bucket, all in parallel). One exchange, no global sort.

    ``bucket_granularity`` matters whenever the order column's values
    concentrate in a narrow range: quality scores live in [0, 1), so
    plain ``floor`` would put EVERY row in bucket 0 and the
    intra-bucket window would silently become the single global sort
    this decomposition exists to avoid. Pick a granularity that
    spreads the score range over hundreds of buckets (1000 for a
    [0, 1) score); for wide-range integer columns (char/token counts)
    the default 1.0 is already fine.

    Costs must be > 0 (validated in the same pass that collects the
    bucket totals): the greedy prefix is only well-defined when the
    cumulative cost is strictly increasing — a zero/negative cost row
    after the first budget crossing could otherwise re-enter. The
    result is exact for integer costs (pinned against the naive
    global-window form in tests); for fractional costs the per-bucket
    sums can differ from the sequential walk in the last ulp, which
    can flip a row sitting exactly on the budget boundary.

    Rows with NULL cost or order are excluded up front (they have no
    place in the walk). Returns the kept rows plus ``cum_cost``
    (cost consumed through and including the row)."""
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if bucket_granularity <= 0:
        raise ValueError(
            f"bucket_granularity must be > 0, got {bucket_granularity}"
        )
    base = df.filter(
        F.col(cost_col).isNotNull() & F.col(order_col).isNotNull()
    )
    bucket = F.floor(
        F.col(order_col) * F.lit(float(bucket_granularity))
    ).cast("long")
    staged = base.withColumn("__b", bucket)
    agg_rows = (
        staged.groupBy("__b")
        .agg(
            F.sum(F.col(cost_col).cast("double")).alias("t"),
            F.min(F.col(cost_col).cast("double")).alias("m"),
        )
        .collect()
    )
    bad = [r for r in agg_rows if r["m"] is not None and r["m"] <= 0]
    if bad:
        raise ValueError(
            f"budget_select requires {cost_col} > 0 for every row "
            f"(monotone greedy prefix); found min cost {bad[0]['m']}"
        )
    totals = {r["__b"]: r["t"] for r in agg_rows}
    offsets, acc = [], 0.0
    for b in sorted(totals, reverse=True):  # walk = order_col DESC
        offsets.append((b, acc))
        acc += totals[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0.0)], "__b long, __off double")
    w = Window.partitionBy("__b").orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    cum = F.col("__off") + F.sum(F.col(cost_col).cast("double")).over(w)
    return (
        staged.join(F.broadcast(off_df), "__b")
        .withColumn("cum_cost", cum)
        .filter(F.col("cum_cost") <= F.lit(float(budget)))
        .drop("__b", "__off")
    )
