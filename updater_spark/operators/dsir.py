"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus, by importance weighting in a
fixed low-dimensional feature space and Gumbel top-k resampling.

The pipeline (all Catalyst, no UDFs):

1. **Hashed n-gram features** — word unigrams and bigrams hashed into
   ``B = 2^hash_bits`` buckets (the paper's 10k-bucket bag-of-hashed-
   ngrams). Hashing makes the feature space FIXED-SIZE regardless of
   vocabulary, which is the whole scale story: the model state is B
   longs, not a web-scale vocab.
2. **Two bag-of-buckets models** — bucket counts over the target and
   the raw corpus, Laplace-smoothed; their per-bucket log-ratio
   ``ln p_target(b) - ln p_raw(b)`` is the importance direction.
3. **Per-document log importance weight** — sum of bucket log-ratios
   over the document's feature occurrences (one broadcast join of the
   B-row ratio table + one per-doc agg).
4. **Gumbel top-k resampling** — sampling WITHOUT replacement with
   probability ∝ weight is exactly "add Gumbel noise to the log
   weight, take the k largest" (Vieira 2014); the Gumbel uses the
   portable md5 uniform so the selected SET is deterministic and
   engine-reproducible (the weighted_sample discipline,
   operators/sampling.py).

Scale shape at 100 TB: two scans of the token stream (target + raw
bucket counts — partial aggs collapse each to B rows before the
shuffle), one scoring scan (broadcast-joined B-row ratio table, per-doc
partial sums), one TakeOrdered top-k (per-partition heaps, no global
sort). Nothing is ever vocab-sized or corpus-squared; the only
broadcast is 2^hash_bits rows.

Reference scope: the reference engine (cheeseformice/updater) has no
data selection — north-star extension per BASELINE.json, same family
as the Naive-Bayes trained filter (operators/classifier.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dedup import md5_hash32, tokens
from updater_spark.operators.sampling import hash_unit

__all__ = [
    "hashed_ngram_buckets",
    "dsir_log_ratios",
    "dsir_weights",
    "dsir_select",
    "corpus_divergence",
    "hashed_text_embedding",
]


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    hasher: str = "md5",
) -> DataFrame:
    """One row per feature OCCURRENCE: ``(id, bucket)`` for every word
    unigram and bigram, hashed into ``2^hash_bits`` buckets.

    Unigrams and bigrams are built from one pre-materialized token
    array (the ``tokenize`` O(len²)-inlining discipline,
    operators/dedup.py:35) and concatenated before the explode, so the
    text splits once per row. Empty-string tokens (the split-on-empty
    quirk) are dropped — they are not features.

    ``hasher``: ``"md5"`` is the engine-portable default (a DuckDB
    oracle reproduces buckets exactly); ``"xxhash64"`` is the deploy
    twin — pure JVM, no hex round-trip, measured 3.2× faster end-to-
    end at 2M docs (PROBES: dsir_2m) with identical selection
    QUALITY semantics (any uniform bucket hash works for DSIR; only
    the concrete bucket ids differ). Same split as the crc32/md5
    fingerprint and sketch hasher twins."""
    if hasher not in ("md5", "xxhash64"):
        raise ValueError(f"hasher must be 'md5' or 'xxhash64', got {hasher!r}")
    b = F.lit(1 << hash_bits)
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    unis = F.filter(F.col("_toks"), lambda t: t != F.lit(""))
    bis = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - F.lit(1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at("_toks", i),
                F.element_at("_toks", i + F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        F.col(id_col), F.explode(F.concat(unis, bis)).alias("_feat")
    )
    base = (
        md5_hash32(F.col("_feat"))
        if hasher == "md5"
        else F.xxhash64(F.col("_feat"))
    )
    return feats.select(
        F.col(id_col), F.pmod(base, b).alias("bucket")
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    alpha: float = 1.0,
    hasher: str = "md5",
) -> DataFrame:
    """The B-row model: ``(bucket, log_ratio)`` with Laplace-smoothed
    ``ln((t_b+α)/(T+αB)) - ln((r_b+α)/(R+αB))``.

    Buckets are enumerated EXPLICITLY (a ``sequence`` generate of all
    2^hash_bits ids) rather than outer-joining the two count frames:
    every bucket gets a ratio, including ones seen in neither corpus
    (their smoothed ratio, -ln((T+αB)/(R+αB)), is what a held-out
    feature must score). Both totals fold on the driver as literals —
    the unigram_logprob stance: no scalar-subquery cartesian.

    Driver-memory note (ADVICE r11): the two count tables are
    COLLECTED (2^hash_bits rows each) to pin them as local relations,
    so driver memory is O(2^hash_bits). The DSIR paper's operating
    range (and every caller here) uses hash_bits ≤ 16 (≤ 64k rows,
    ~1 MB); hash_bits ≥ ~26 would collect tens of millions of rows —
    size the driver accordingly or shrink the bucket space."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    b_count = 1 << hash_bits
    spark = raw.sparkSession

    def counts(frame: DataFrame, out: str) -> DataFrame:
        return (
            hashed_ngram_buckets(frame, id_col, text_col, hash_bits, hasher)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    # The count tables are bounded at B rows by construction, and the
    # totals were ALREADY a driver action at build time — so collect
    # the counts themselves and derive the totals in Python (same
    # integers). Before, the `.agg(sum)` action ran each count job
    # once for the total and the ratio plan then re-ran the SAME
    # count subtree (= one more tokenize+explode scan of each corpus)
    # per execution; pinning the collected rows as local relations
    # makes each corpus scan happen exactly once (r11, guide §1.2
    # "don't compute what you throw away" — the dsir_select
    # materialize_model discipline pushed down to the model builder).
    t_df = counts(target, "_t")
    r_df = counts(raw, "_r")
    t_rows = t_df.collect()
    r_rows = r_df.collect()
    t_total = sum(row["_t"] for row in t_rows)
    r_total = sum(row["_r"] for row in r_rows)
    if t_total == 0 or r_total == 0:
        raise ValueError(
            f"empty feature stream (target={t_total}, raw={r_total})"
        )
    t_cnt = spark.createDataFrame(t_rows, t_df.schema)
    r_cnt = spark.createDataFrame(r_rows, r_df.schema)
    all_b = spark.range(b_count).select(F.col("id").alias("bucket"))
    t_denom = float(t_total + alpha * b_count)
    r_denom = float(r_total + alpha * b_count)
    ratio = (
        all_b.join(F.broadcast(t_cnt), "bucket", "left")
        .join(F.broadcast(r_cnt), "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_t"), F.lit(0)) + F.lit(alpha))
                    / F.lit(t_denom)
                )
                - F.log(
                    (F.coalesce(F.col("_r"), F.lit(0)) + F.lit(alpha))
                    / F.lit(r_denom)
                )
            ).alias("log_ratio"),
        )
    )
    return ratio


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    alpha: float = 1.0,
    round_digits: int = 4,
    hasher: str = "md5",
    materialize_model: bool = False,
) -> DataFrame:
    """Per-document log importance weight: ``(id, n_feats,
    log_weight)`` — the sum of bucket log-ratios over the document's
    feature occurrences, rounded (cross-engine float-sum tolerance).

    Documents with no features (empty text) keep log_weight 0 — a
    featureless document is distribution-neutral, and dropping it
    silently would make ``dsir_select``'s output set input-dependent
    in a way callers can't see."""
    ratios = dsir_log_ratios(
        raw, target, id_col, text_col, hash_bits, alpha, hasher
    )
    if materialize_model:
        # the model is bounded at 2^hash_bits rows by construction
        # (the "2B longs of state" contract) — pin it as a local
        # relation so the scoring pass is the ONLY corpus scan: left
        # lazy, every execution re-tokenizes BOTH corpora twice more
        # just to rebuild the same B-row table (r11; the k-means /
        # unigram-vocab train-collect discipline). collect() →
        # createDataFrame round-trips Python floats as IEEE doubles,
        # bit-exact.
        spark = raw.sparkSession
        ratios = spark.createDataFrame(ratios.collect(), ratios.schema)
    feats = hashed_ngram_buckets(raw, id_col, text_col, hash_bits, hasher)
    scored = (
        feats.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("log_ratio"), round_digits).alias("log_weight"),
        )
    )
    return (
        raw.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def _gumbel(id_col: str, salt: str) -> Column:
    """Standard Gumbel noise from the portable md5 uniform:
    ``-ln(-ln(u))``, deterministic per (id, salt)."""
    return -F.log(-F.log(hash_unit(id_col, salt)))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    alpha: float = 1.0,
    salt: str = "dsir-v1",
    round_digits: int = 4,
    key_digits: int = 6,
    hasher: str = "md5",
    materialize_model: bool = False,
) -> DataFrame:
    """Select ``k`` documents from ``raw`` with probability ∝ their
    importance weight, without replacement (Gumbel top-k over the log
    weights). Returns ``(id, n_feats, log_weight, _key)`` for the
    selected rows.

    The ranking key is built from the ROUNDED log weight plus Gumbel
    noise, itself rounded and id-tie-broken — the total order both
    engines reproduce (the weighted_sample / bm25 discipline)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    weights = dsir_weights(
        raw, target, id_col, text_col, hash_bits, alpha, round_digits,
        hasher, materialize_model,
    )
    key = F.round(
        F.col("log_weight") + _gumbel(id_col, salt), key_digits
    )
    return (
        weights.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    alpha: float = 1.0,
    round_digits: int = 6,
    hasher: str = "md5",
) -> DataFrame:
    """Distribution-drift metrics between two corpora over the hashed
    n-gram feature space: KL(a||b), KL(b||a), their symmetric sum
    (Jeffreys divergence), and the Population Stability Index

        PSI = sum_b (p_a(b) - p_b(b)) * ln(p_a(b) / p_b(b))

    — the monitoring statistic ops teams alert on (common rule of
    thumb: PSI < 0.1 stable, > 0.25 investigate). Over full smoothed
    distributions PSI is algebraically the Jeffreys divergence
    (KL(a||b) + KL(b||a)) — reported once, with its two asymmetric
    halves alongside. Both distributions
    are Laplace-smoothed over the SAME fixed bucket space, so the
    metric is well-defined even when one side has unseen features,
    and the state is 2B longs regardless of vocabulary (the DSIR
    model shape — this IS the dsir_log_ratios aggregation read as a
    scalar instead of a per-bucket direction).

    Scale shape: two token-stream scans collapsing to B rows each,
    one B-row join, one global agg — nothing corpus-sized ever
    shuffles. Returns ONE row: (psi, kl_ab, kl_ba, n_buckets,
    n_feats_a, n_feats_b) with psi == kl_ab + kl_ba by identity."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    b_count = 1 << hash_bits
    spark = a.sparkSession

    def counts(frame: DataFrame, out: str) -> DataFrame:
        return (
            hashed_ngram_buckets(frame, id_col, text_col, hash_bits, hasher)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    # Same bounded-collect discipline as dsir_log_ratios (r11): the
    # totals were already a build-time action per side; collecting
    # the B-row count tables instead makes each corpus side scan
    # ONCE — before, the per-bucket join re-ran both count subtrees
    # (= one more tokenize+explode scan of each corpus) at execution.
    a_df = counts(a, "_a")
    b_df = counts(b, "_b")
    a_rows = a_df.collect()
    b_rows = b_df.collect()
    a_total = sum(row["_a"] for row in a_rows)
    b_total = sum(row["_b"] for row in b_rows)
    if a_total == 0 or b_total == 0:
        raise ValueError(
            f"empty feature stream (a={a_total}, b={b_total})"
        )
    a_cnt = spark.createDataFrame(a_rows, a_df.schema)
    b_cnt = spark.createDataFrame(b_rows, b_df.schema)
    all_b = spark.range(b_count).select(F.col("id").alias("bucket"))
    pa = (F.coalesce(F.col("_a"), F.lit(0)) + F.lit(alpha)) / F.lit(
        float(a_total + alpha * b_count)
    )
    pb = (F.coalesce(F.col("_b"), F.lit(0)) + F.lit(alpha)) / F.lit(
        float(b_total + alpha * b_count)
    )
    ratio = F.log(pa / pb)
    per_bucket = (
        all_b.join(F.broadcast(a_cnt), "bucket", "left")
        .join(F.broadcast(b_cnt), "bucket", "left")
        .select(
            (pa * ratio).alias("_kl_ab"),
            (-pb * ratio).alias("_kl_ba"),
            ((pa - pb) * ratio).alias("_psi"),
        )
    )
    return per_bucket.agg(
        F.round(F.sum("_psi"), round_digits).alias("psi"),
        F.round(F.sum("_kl_ab"), round_digits).alias("kl_ab"),
        F.round(F.sum("_kl_ba"), round_digits).alias("kl_ba"),
        F.lit(b_count).cast("long").alias("n_buckets"),
        F.lit(int(a_total)).cast("long").alias("n_feats_a"),
        F.lit(int(b_total)).cast("long").alias("n_feats_b"),
    )


def hashed_text_embedding(
    df: DataFrame,
    dim: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 12,
    round_digits: int = 4,
) -> DataFrame:
    """Model-free dense text embeddings by feature hashing + sign
    random projection: bucket counts (the DSIR feature space) times a
    deterministic ±1 matrix, scaled 1/sqrt(dim) — the hashing-trick
    embedding (Weinberger et al. 2009 features; Achlioptas 2003 sign
    projection). Inner products approximate the (hashed) bag-of-
    n-grams kernel, so the output column drops straight into every
    ANN/IVF/PQ operator here WITHOUT an embedding model — the cheap
    text→vector bridge for similarity search, clustering, and
    near-dup candidate generation when no model is available.

    The projection matrix is never materialized: all ``dim`` signs of
    a bucket derive from the parity of single hex digits of ONE
    md5(bucket) — engine-portable (the DuckDB oracle reproduces every
    sign), one hash per (doc, bucket) row, and capped at dim <= 32
    (an md5 has 32 hex digits; a wider target should PQ/JL an
    existing embedding instead, operators/projection.py).

    Scale shape: one token scan collapsing to (doc, bucket, cnt) —
    partial aggs bound the explode before its shuffle — then dim
    conditional sums in ONE grouped aggregate by doc; no joins, no
    UDFs, no per-element Python. Returns (id, embedding
    array<double>) with components rounded; all-zero documents
    (empty text) get the zero vector."""
    if not 1 <= dim <= 32:
        raise ValueError(f"dim must be in [1, 32], got {dim}")
    feats = hashed_ngram_buckets(df, id_col, text_col, hash_bits, "md5")
    cnts = feats.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # Signs depend ONLY on the bucket id, and the bucket space is
    # fixed at 2^hash_bits — so the md5 sign derivation runs once per
    # BUCKET in a B-row broadcast table instead of dim times per
    # (doc, bucket) row (r11; the old inline shape evaluated
    # md5+conv+substring dim·|cnts| times — 24M evaluations at sf0.1
    # against 4096 buckets). Same sign values, same per-row products,
    # integer sums — bit-identical output.
    hexstr = F.md5(F.col("bucket").cast("string").cast("binary"))
    signs_tbl = (
        df.sparkSession.range(1 << hash_bits)
        .select(F.col("id").alias("bucket"))
        .select(
            "bucket",
            F.array(
                *[
                    F.when(
                        F.conv(F.substring(hexstr, j + 1, 1), 16, 10)
                        .cast("int")
                        .bitwiseAND(F.lit(1))
                        == 0,
                        F.lit(1),
                    ).otherwise(F.lit(-1))
                    for j in range(dim)
                ]
            ).alias("_signs"),
        )
    )
    scale = 1.0 / float(dim) ** 0.5
    sums = [
        F.round(
            F.sum(F.col("_cnt") * F.element_at("_signs", j + 1))
            * F.lit(scale),
            round_digits,
        ).alias(f"_v{j}")
        for j in range(dim)
    ]
    vecs = (
        cnts.join(F.broadcast(signs_tbl), "bucket")
        .groupBy(id_col)
        .agg(*sums)
    )
    out = vecs.select(
        F.col(id_col),
        F.array(*[F.col(f"_v{j}") for j in range(dim)]).alias("embedding"),
    )
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return (
        df.select(id_col)
        .distinct()
        .join(out, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("embedding", zero).alias("embedding"),
        )
    )
