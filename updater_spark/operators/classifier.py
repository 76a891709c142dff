"""Model-based corpus filtering: a multinomial Naive Bayes text
classifier trained in ONE aggregation pass and scored with one
broadcast-gated join.

Why this operator exists: the reference engine (cheeseformice/updater,
``src/`` — pure SQL diff/upsert plumbing) has no model-based
filtering; this is part of the LLM-training-pipeline extension
surface. Production pipelines filter web corpora with *trained*
classifiers, not just heuristics: CCNet (Wenzek et al., 2019) uses a
fastText language classifier plus a wiki-trained LM; GPT-3 (Brown et
al., 2020, Appendix A) uses a logistic-regression quality classifier
over hashed features. Multinomial Naive Bayes is the closed-form
member of that family — training IS one grouped count, so it maps
onto Spark with no iterative solver, no MLlib dependency, and an
exact SQL oracle.

Spark-first shape (what each stage costs at 100 TB):

- ``nb_train``: explode tokens → ONE shuffle (``groupBy(tok)``) with
  map-side partial *conditional* sums — K label columns in a single
  pass, not K passes. The ``min_df`` cut bounds the model exactly
  like the df-cut bounds posting lists in ``dedup.py``: hapax tokens
  (the long tail, typically >50% of a web vocabulary) never leave the
  aggregation. Label totals + vocabulary size come from one small agg
  over the vocab-sized frame; document priors from a tiny
  ``groupBy(label)``. The only driver collects are those O(K)
  constants — they parameterize the closed form.
- ``nb_score``: explode tokens → join the model on ``tok`` →
  ONE ``groupBy(id)``. The model is broadcast when its row count is
  under ``max_broadcast_vocab`` (vocab × (K+1) narrow columns — a
  5M-token model is ~200 MB, comfortably broadcastable); above that
  it degrades to a shuffle join on ``tok`` rather than a multi-GB
  broadcast (the measured-gate discipline from ``plans/cdc.py``).
- ``hash_bits=b`` (the hashing trick, Weinberger et al., 2009):
  tokens map to ``pmod(md5_hash32(tok), 2**b)`` buckets, so the model
  is bounded at ``2**b × K`` rows REGARDLESS of corpus size, the
  vocabulary-count pass disappears (V is 2**b by definition), and
  collisions merge counts — the standard memory/accuracy trade every
  web-scale classifier makes. With ``b ≤ 22`` the model always
  broadcasts.

Float/oracle contract: per-token log-likelihoods are
``ln((cnt + α) / (N_label + α·V))`` with the SAME operand order in
Spark and in the DuckDB oracle, summed per document and rounded to 4
decimals only at the output edge (the ``unigram_logprob``
discipline); argmax ties break by fixed label order in both engines.

Everything is built-in Catalyst (split/explode/conditional agg/log) —
no Python UDFs; the plan-lint suite verifies no ``BatchEvalPython``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dedup import md5_hash32, tokens


@dataclass(frozen=True)
class NBModelMeta:
    """Closed-form constants that accompany the per-token model frame."""

    labels: tuple[str, ...]
    smoothing: float
    vocab_size: int  # V in the smoothing denominator (2**bits if hashed)
    label_tokens: dict[str, int]  # N_label: token mass of retained vocab
    priors: dict[str, float]  # ln(docs_label / docs_total)
    oov: dict[str, float]  # ln(α / (N_label + α·V)) — unseen-token ll
    hash_bits: int | None = None
    # set by langid_train only: the char-gram order the model was
    # trained over. langid_score validates its n_max against this —
    # a mismatch silently degrades predictions otherwise (the
    # DedupIndex shingle_unit sidecar-validation discipline). None
    # for plain word-token NB models and legacy metas.
    gram_n_max: int | None = None


def _bucketize(c, hash_bits: int | None):
    """Identity for exact-vocab models; md5-bucket for hashed ones.

    Applied AFTER the explode (generators can't nest inside other
    expressions), on the portable ``md5_hash32`` base so the DuckDB
    oracle reproduces bucket ids exactly."""
    if hash_bits is None:
        return c
    return F.pmod(md5_hash32(c), F.lit(1 << hash_bits)).cast("long")


def _exploded_tokens(
    df: DataFrame,
    text_col: str,
    hash_bits: int | None,
    *lead_cols: str,
    keep_empty: bool = False,
) -> DataFrame:
    """``keep_empty=True`` uses ``explode_outer`` so a NULL-text
    document survives as one NULL-token row — scoring keeps the doc
    (priors-only) instead of silently dropping it from the output."""
    exp = F.explode_outer if keep_empty else F.explode
    raw = df.select(
        *[F.col(c) for c in lead_cols], exp(tokens(text_col)).alias("_t")
    )
    return raw.select(
        *[F.col(c) for c in lead_cols],
        _bucketize(F.col("_t"), hash_bits).alias("tok"),
    )


def nb_train(
    df: DataFrame,
    label_col: str,
    text_col: str,
    labels: list[str],
    smoothing: float = 1.0,
    min_df: int = 1,
    hash_bits: int | None = None,
) -> tuple[DataFrame, NBModelMeta]:
    """Train multinomial NB; returns ``(model, meta)``.

    ``model`` is one row per retained token (or hash bucket) with a
    ``ll_<label>`` double column per label; ``meta`` carries the O(K)
    closed-form constants (priors, OOV log-likelihoods, V, N_label).

    ``labels`` is explicit and ordered — the caller pins the class
    set so the conditional-sum columns, the argmax tie-break, and the
    SQL oracle all agree on one deterministic order (collecting
    distinct labels would work but make column order data-dependent).

    ``labels`` must name at least two classes: the argmax chain and
    the margin (best − runner-up) are undefined for a single class —
    fail loudly instead of crashing inside ``F.greatest``.

    ``min_df`` drops tokens whose TOTAL count across labels is below
    the cut *after* counting — totals and V are computed over the
    retained vocabulary, so the smoothing geometry is self-consistent
    and SQL-reproducible. ``hash_bits`` switches to hashed features
    (V fixed at ``2**hash_bits``; no vocabulary-count dependence).
    """
    if len(labels) < 2:
        raise ValueError(
            f"nb_train needs >= 2 labels, got {list(labels)!r}: argmax "
            "and margin (best - runner-up) are undefined for one class"
        )
    toks = _exploded_tokens(
        df.select(F.col(label_col).alias("_lbl"), F.col(text_col)),
        text_col,
        hash_bits,
        "_lbl",
    )
    counts = toks.groupBy("tok").agg(
        *[
            F.sum(F.when(F.col("_lbl") == lbl, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"c_{i}")
            for i, lbl in enumerate(labels)
        ]
    )
    if min_df > 1:
        total = sum(F.col(f"c_{i}") for i in range(len(labels)))
        counts = counts.filter(total >= F.lit(min_df))

    # O(K) closed-form constants: one agg over the vocab-sized frame.
    agg_row = counts.agg(
        F.count(F.lit(1)).alias("v"),
        *[F.sum(f"c_{i}").alias(f"n_{i}") for i in range(len(labels))],
    ).collect()[0]
    vocab_size = 1 << hash_bits if hash_bits is not None else int(agg_row["v"])
    label_tokens = {
        lbl: int(agg_row[f"n_{i}"] or 0) for i, lbl in enumerate(labels)
    }

    prior_rows = df.groupBy(F.col(label_col).alias("_lbl")).count().collect()
    doc_counts = {r["_lbl"]: r["count"] for r in prior_rows}
    total_docs = sum(doc_counts.get(lbl, 0) for lbl in labels)
    empty = [lbl for lbl in labels if doc_counts.get(lbl, 0) == 0]
    if total_docs == 0 or empty:
        # fail loudly instead of math.log(0): a label with no
        # training docs has an undefined prior, and silently -inf'ing
        # it would make every prediction for it impossible anyway
        raise ValueError(
            f"no training documents for label(s) {empty or labels}"
        )
    priors = {
        lbl: math.log(doc_counts.get(lbl, 0) / total_docs) for lbl in labels
    }
    oov = {
        lbl: math.log(
            smoothing / (label_tokens[lbl] + smoothing * vocab_size)
        )
        for lbl in labels
    }

    model = counts.select(
        "tok",
        *[
            F.log(
                (F.col(f"c_{i}") + F.lit(smoothing))
                / (
                    F.lit(float(label_tokens[lbl]))
                    + F.lit(smoothing * vocab_size)
                )
            ).alias(f"ll_{i}")
            for i, lbl in enumerate(labels)
        ],
    )
    meta = NBModelMeta(
        labels=tuple(labels),
        smoothing=smoothing,
        vocab_size=vocab_size,
        label_tokens=label_tokens,
        priors=priors,
        oov=oov,
        hash_bits=hash_bits,
    )
    return model, meta


def nb_score(
    df: DataFrame,
    model: DataFrame,
    meta: NBModelMeta,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    max_broadcast_vocab: int = 5_000_000,
) -> DataFrame:
    """Score documents against a trained model.

    Returns one row per document: ``id_col``, any ``keep_cols``
    (passed through the aggregation key — true labels for an accuracy
    readout, split tags, …), ``pred`` (argmax label, ties to the
    first label in ``meta.labels`` order), and ``margin`` (best minus
    runner-up log-posterior, rounded 4 — the filter threshold knob).

    The model side broadcasts only when its row count is under
    ``max_broadcast_vocab`` (hashed models always qualify); above the
    gate it falls back to a shuffle join on the token key rather than
    forcing a multi-GB broadcast.

    Zero-token documents (NULL text — ``split`` of NULL is NULL and a
    plain ``explode`` would drop the row) are KEPT: ``explode_outer``
    carries them as one NULL-token row whose likelihood contribution
    is pinned to 0, so they score priors-only instead of vanishing
    from the output. Same single-shuffle plan — no extra join.
    """
    k = len(meta.labels)
    doc_toks = _exploded_tokens(
        df, text_col, meta.hash_bits, id_col, *keep_cols, keep_empty=True
    )

    if meta.hash_bits is not None:
        rhs = F.broadcast(model)  # ≤ 2**bits rows by construction
    elif max_broadcast_vocab > 0 and model.count() <= max_broadcast_vocab:
        rhs = F.broadcast(model)
    else:
        rhs = model
    joined = doc_toks.join(rhs, "tok", "left")

    posts = [
        (
            F.sum(
                F.when(F.col("tok").isNull(), F.lit(0.0)).otherwise(
                    F.coalesce(F.col(f"ll_{i}"), F.lit(meta.oov[lbl]))
                )
            )
            + F.lit(meta.priors[lbl])
        ).alias(f"post_{i}")
        for i, lbl in enumerate(meta.labels)
    ]
    scored = joined.groupBy(F.col(id_col), *[F.col(c) for c in keep_cols]).agg(
        *posts
    )

    # Deterministic argmax: first label (in the pinned order) whose
    # posterior is >= all others — exact-tie behavior matches the SQL
    # oracle's CASE chain.
    best = F.greatest(*[F.col(f"post_{i}") for i in range(k)])
    pred = F.lit(meta.labels[-1])
    for i in range(k - 2, -1, -1):
        pred = F.when(F.col(f"post_{i}") >= best, F.lit(meta.labels[i])).otherwise(
            pred
        )
    runner_up = F.array_sort(F.array(*[F.col(f"post_{i}") for i in range(k)]))[
        k - 2
    ]
    return scored.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        pred.alias("pred"),
        F.round(best - runner_up, 4).alias("margin"),
    )


@dataclass(frozen=True)
class LogRegModel:
    """Weights for a batch-gradient-descent logistic regression.

    ``weights[0]`` is the bias; ``weights[1:]`` align with
    ``feature_cols``. Training constants are carried so scoring (and
    audits) can state exactly how the model was fit."""

    weights: tuple[float, ...]
    feature_cols: tuple[str, ...]
    lr: float
    iters: int
    grad_digits: int


def _dot(feature_cols: tuple[str, ...], weights) -> "F.Column":
    z = F.lit(float(weights[0]))
    for col, w in zip(feature_cols, weights[1:]):
        z = z + F.lit(float(w)) * F.col(col).cast("double")
    return z


def _sigmoid(z: "F.Column") -> "F.Column":
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    lr: float = 0.5,
    iters: int = 4,
    grad_digits: int = 8,
) -> LogRegModel:
    """Logistic regression by full-batch gradient descent — the
    GPT-3-style trained quality filter (Brown et al. 2020, App. A)
    in its solver form, complementing the closed-form Naive Bayes
    above. ``w_{t+1} = w_t + lr * avg((y - σ(w·x)) · [1,x])`` from
    ``w_0 = 0``, a FIXED number of iterations.

    Spark-first shape: each iteration is ONE aggregation over a
    narrow (label + d features) projection — partial aggs make it a
    map-side-combined scan; only d+1 doubles reach the driver per
    iteration. At 100 TB that is ``iters`` narrow columnar scans (or
    one persist of the projected features, the caller's choice) — no
    MLlib, no per-row Python.

    Determinism contract: every gradient component is ROUNDED to
    ``grad_digits`` decimals before the update, so the weight vector
    is an exact function of the (engine-independent) rounded values
    — a DuckDB oracle unrolling the same iterations reproduces the
    weights bit-for-bit, and double-sum ordering differences across
    engines/partitionings can never leak into the model."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    cols = tuple(feature_cols)
    feats = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    weights = [0.0] * (len(cols) + 1)
    for _ in range(iters):
        resid = F.col("_y") - _sigmoid(_dot(cols, weights))
        aggs = [F.round(F.avg(resid), grad_digits).alias("_g0")] + [
            F.round(F.avg(resid * F.col(c)), grad_digits).alias(f"_g{i+1}")
            for i, c in enumerate(cols)
        ]
        grad = feats.agg(*aggs).first()
        weights = [w + lr * g for w, g in zip(weights, grad)]
    return LogRegModel(
        weights=tuple(weights),
        feature_cols=cols,
        lr=lr,
        iters=iters,
        grad_digits=grad_digits,
    )


def logreg_score(
    df: DataFrame,
    model: LogRegModel,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Score rows under a trained model: ``(id, prob, keep)`` with
    ``prob = σ(w·x)`` rounded at the output edge and ``keep`` the
    0.5-threshold decision. Pure per-row projection — scan speed,
    no shuffle, composable with any downstream filter."""
    prob = F.round(_sigmoid(_dot(model.feature_cols, model.weights)), round_digits)
    return df.select(
        F.col(id_col),
        prob.alias("prob"),
        (prob >= F.lit(0.5)).cast("int").alias("keep"),
    )


def classifier_eval(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: list[float],
    round_digits: int = 6,
) -> DataFrame:
    """Binary-classifier evaluation — the filter-tuning primitive the
    trained quality filters (nb_score / logreg) feed: per-threshold
    confusion counts with precision/recall/F1, plus the
    ties-averaged ROC-AUC (the Mann-Whitney U statistic), all exact.

    Scale shape: the confusion matrix for ALL thresholds is ONE
    conditional aggregate over the scored frame (4 sums per
    threshold, map-side combined — the declarative-quality-suite
    fusion discipline); AUC groups by ROUNDED score first, so the
    one ordered cumulative window runs over |distinct rounded
    scores| rows — bounded by 10^round_digits ONLY for scores in
    [0, 1] (probabilities, the nb_score/logreg_score contract). Raw
    logits/margins are UNBOUNDED: their distinct rounded values grow
    with the corpus and the unpartitioned ``Window.orderBy`` would
    degenerate into a single-partition near-corpus sort — min-max or
    sigmoid-squash such scores into [0, 1] before calling (ADVICE
    r9). Rows with NULL label or score are excluded up front and
    reported in ``n_excluded``.

    AUC with ties = sum over score groups of
    ``pos_g * (neg_below + 0.5 * neg_g) / (P * N)`` — the average-
    rank convention, NULL when either class is absent. Scores are
    compared at ``round_digits`` precision (also what makes the
    cumulative window scale-bounded and the oracle exact).

    Returns one row per threshold:
    ``(threshold, tp, fp, fn, tn, precision, recall, f1, auc,
    n_excluded)`` — predicted positive is ``score >= threshold``;
    precision/recall/F1 are NULL on empty denominators (MySQL
    division semantics, the p2_scores discipline)."""
    from pyspark.sql import Window

    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError("duplicate thresholds")
    lab = F.col(label_col).cast("int")
    sc = F.round(F.col(score_col).cast("double"), round_digits)
    # persist: three actions read this frame (exclusion count, AUC
    # aggregate, confusion aggregate) and the caller's score column
    # is often an expensive lineage (logreg_score, nb_score) that
    # must not recompute per action; two narrow columns, eval-sized
    staged = df.select(lab.alias("_y"), sc.alias("_s")).persist()
    n_excluded = staged.filter(
        F.col("_y").isNull() | F.col("_s").isNull()
    ).count()
    base = staged.filter(F.col("_y").isNotNull() & F.col("_s").isNotNull())

    # AUC: grouped cumulative over distinct rounded scores
    grouped = base.groupBy("_s").agg(
        F.sum("_y").cast("double").alias("_pos"),
        F.sum(1 - F.col("_y")).cast("double").alias("_neg"),
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    contrib = grouped.select(
        (
            F.col("_pos")
            * (
                F.coalesce(F.sum("_neg").over(w), F.lit(0.0))
                + F.lit(0.5) * F.col("_neg")
            )
        ).alias("_u"),
        "_pos",
        "_neg",
    ).agg(
        F.sum("_u").alias("u"),
        F.sum("_pos").alias("p"),
        F.sum("_neg").alias("n"),
    )
    row = contrib.first()
    auc = (
        round(row["u"] / (row["p"] * row["n"]), round_digits)
        if row and row["p"] and row["n"]
        else None
    )

    # all thresholds in ONE conditional aggregate
    aggs = []
    for i, t in enumerate(sorted(thresholds)):
        pred = (F.col("_s") >= F.lit(float(t))).cast("int")
        aggs += [
            F.sum(pred * F.col("_y")).cast("long").alias(f"tp_{i}"),
            F.sum(pred * (1 - F.col("_y"))).cast("long").alias(f"fp_{i}"),
            F.sum((1 - pred) * F.col("_y")).cast("long").alias(f"fn_{i}"),
            F.sum((1 - pred) * (1 - F.col("_y"))).cast("long").alias(f"tn_{i}"),
        ]
    counts = base.agg(*aggs).first()
    staged.unpersist()
    spark = df.sparkSession
    out_rows = []
    for i, t in enumerate(sorted(thresholds)):
        tp, fp = counts[f"tp_{i}"] or 0, counts[f"fp_{i}"] or 0
        fn, tn = counts[f"fn_{i}"] or 0, counts[f"tn_{i}"] or 0
        prec = round(tp / (tp + fp), round_digits) if tp + fp else None
        rec = round(tp / (tp + fn), round_digits) if tp + fn else None
        # F1 from the ROUNDED prec/rec (what the oracle replays);
        # explicit None checks — prec == 0.0 is falsy but valid, and
        # prec + rec == 0 is the 0/0 NULL (MySQL semantics)
        f1 = (
            round(2 * prec * rec / (prec + rec), round_digits)
            if prec is not None and rec is not None and (prec + rec) > 0
            else None
        )
        out_rows.append(
            (float(t), tp, fp, fn, tn, prec, rec, f1, auc, n_excluded)
        )
    return spark.createDataFrame(
        out_rows,
        "threshold double, tp long, fp long, fn long, tn long,"
        " precision double, recall double, f1 double, auc double,"
        " n_excluded long",
    )


# ---------------------------------------------------------------------------
# Trained language ID — char-n-gram Naive Bayes (the CCNet-style
# replacement for text.py's heuristic text_langid)
# ---------------------------------------------------------------------------


def langid_gram_text(
    df: DataFrame, text_col: str, n_max: int = 3, out: str = "_lid_grams"
) -> DataFrame:
    """Bridge column for char-n-gram NB: the text's character 1..n_max
    grams as ONE space-joined string, so the word-tokenizing
    ``nb_train``/``nb_score`` machinery consumes character features
    unchanged (grams never contain spaces — whitespace runs collapse
    to '_' first, the classic langid boundary marker, making
    cross-word transitions like 'e_t' real features).

    Char grams are what make language ID TRAINABLE and script-robust
    where the whitespace heuristic fails: a spaceless CJK document
    has no "words" to look stopwords up in, but its char distribution
    is unmistakable. substr counts codepoints in both engines (the
    char_shingles_of guarantee), so the oracle replays grams exactly.

    Map-only expansion (~3× text length in gram chars), fuses with
    the scan; NULL text stays NULL so NB's explode_outer keeps the
    doc priors-only. Texts shorter than n yield their single partial
    gram per n (the char_shingles_of convention).

    r11: grams come from O(1) slices of a pre-materialized
    split-to-chars column instead of per-position ``substr`` —
    ``substr(i, n)`` re-scans the UTF-8 bytes from the start to find
    codepoint ``i``, making the old build O(len²) per document; this
    projection was measured as 3.7 s of langid_trained's 6.5 s at
    sf0.1 (1.6× faster with slices, byte-identical gram strings —
    the ``_char_grams`` shared helper)."""
    if n_max < 1:
        raise ValueError("n_max must be >= 1")
    from updater_spark.operators.dedup import _char_grams

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", "_")
    staged = df.withColumn("_lid_norm", norm).withColumn(
        "_lid_chars", F.split(F.col("_lid_norm"), "")
    )
    t = F.col("_lid_norm")
    per_n = [
        _char_grams(t, F.col("_lid_chars"), n)
        for n in range(1, n_max + 1)
    ]
    gram_string = F.concat_ws(" ", F.flatten(F.array(*per_n)))
    return staged.withColumn(
        out, F.when(t.isNull(), None).otherwise(gram_string)
    ).drop("_lid_norm", "_lid_chars")


def langid_train(
    df: DataFrame,
    label_col: str,
    text_col: str,
    labels: list[str],
    n_max: int = 3,
    smoothing: float = 1.0,
    min_df: int = 1,
    hash_bits: int | None = None,
) -> tuple[DataFrame, NBModelMeta]:
    """Char-n-gram Naive Bayes language-ID training — the TRAINED
    operator CCNet-style pipelines use where ``text_langid``'s
    stopword/charset heuristic stops working (unseen languages,
    spaceless scripts). Pure composition: ``langid_gram_text`` turns
    chars into features, ``nb_train`` does its ONE-shuffle
    conditional-count pass — same scale shape, same exact-oracle
    algebra, same hashing-trick bound for web-scale gram
    vocabularies.

    The returned meta records ``gram_n_max`` = this ``n_max``;
    ``langid_score`` refuses a mismatched n_max (the gram feature
    space is part of the model identity — scoring 1..2-grams against
    a 1..3-gram model silently degrades instead of erroring)."""
    import dataclasses

    model, meta = nb_train(
        langid_gram_text(df, text_col, n_max),
        label_col,
        "_lid_grams",
        labels,
        smoothing=smoothing,
        min_df=min_df,
        hash_bits=hash_bits,
    )
    return model, dataclasses.replace(meta, gram_n_max=n_max)


def langid_score(
    df: DataFrame,
    model: DataFrame,
    meta: NBModelMeta,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 3,
    keep_cols: tuple[str, ...] = (),
    max_broadcast_vocab: int = 5_000_000,
) -> DataFrame:
    """Score documents with a ``langid_train`` model: one
    broadcast-gated join + one groupBy(doc), returning
    ``(id, *keep_cols, pred, margin)`` — ``margin`` is the
    best-minus-runner-up log-posterior, the confidence knob a corpus
    filter thresholds on. ``n_max`` must match training (the gram
    feature space); the meta carries ``gram_n_max`` from
    ``langid_train`` and a mismatch raises here instead of silently
    degrading. Metas from a plain ``nb_train`` call (or persisted
    before the field existed) have ``gram_n_max=None`` and skip the
    check — the legacy-sidecar convention."""
    trained_n = getattr(meta, "gram_n_max", None)
    if trained_n is not None and trained_n != n_max:
        raise ValueError(
            f"langid_score n_max={n_max} does not match the model's "
            f"training gram order gram_n_max={trained_n}; pass "
            f"n_max={trained_n} (the gram feature space is part of "
            "the model identity)"
        )
    return nb_score(
        langid_gram_text(df, text_col, n_max),
        model,
        meta,
        id_col=id_col,
        text_col="_lid_grams",
        keep_cols=keep_cols,
        max_broadcast_vocab=max_broadcast_vocab,
    )
