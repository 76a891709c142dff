"""Regenerate PLANS.md: physical-plan evidence for flagship queries.

Usage: ``python -m tests.plan_audit [sf_dir]``.
"""

from __future__ import annotations

import re
import sys

CHECKS = {
    "html_extract": (
        "ZERO exchanges, zero Python — the entire tag/entity chain is "
        "one projection over the scan; at 100 TB this is a map-only "
        "stage fusing with whatever filter follows."
    ),
    "bpe_bytes": (
        "same shape as bpe_tokens: one projection carrying the merge "
        "fold (hex-pair byte symbols), no exchange, no UDF — the "
        "alphabet change costs nothing structurally."
    ),
    "url_canonical": (
        "the normalize stage is a pure projection (zero exchanges "
        "before the dedup aggregate); the one shuffle carries "
        "canonical keys, never pages."
    ),
    "encoding_quality": (
        "ZERO exchanges, zero Python — three regexp counts in one "
        "projection over the scan, the html_extract shape."
    ),
    "classifier_eval": (
        "the per-threshold confusion matrix is ONE conditional "
        "aggregate (all thresholds fused); the AUC window orders "
        "distinct ROUNDED scores, never corpus rows."
    ),
    "hybrid_search": (
        "both halves' top-k outputs union (k rows per query per list); "
        "fusion is one map-side-combined HashAggregate + a per-query "
        "window over <= 2k rows — the corpus appears only inside the "
        "two retrieval stages, never in the fusion."
    ),
    "j1_diff_classify": (
        "SortMergeJoin FullOuter on the key — the distributed twin of the "
        "reference's streaming symmetric hash merge; goes Exchange-free when "
        "both fingerprint tables are bucketed by pk (tests/test_bucketing.py)."
    ),
    "j2_semi_join_fetch": (
        "BroadcastHashJoin LeftSemi — the changed-key set ships to every "
        "executor; the source scan never shuffles."
    ),
    "q3_shipping_priority": (
        "c_mktsegment = 'BUILDING' appears in PushedFilters — the predicate "
        "reaches the parquet scan, not a post-scan Filter."
    ),
    "q5_local_supplier": (
        "all five dimension joins are BroadcastHashJoin — one pass over the "
        "fact table, zero fact shuffles before the final aggregate."
    ),
    "q1_pricing_summary": (
        "partial aggregation before the Exchange — map-side combine means "
        "the shuffle carries one row per (partition, group)."
    ),
    "dedup_minhash_lsh": (
        "single explode+groupBy for signatures, one more shuffle for bands — "
        "no self-joins of raw text. No Filter node below the shingle "
        "Generate (explode_outer dodges InferFiltersFromGenerate's "
        "re-inlined gram build)."
    ),
    "asof_join_events": (
        "exactly ONE Exchange (the key shuffle for the window) — the "
        "union+window as-of form never expands to |matches| rows the way a "
        "range join would."
    ),
    "decontam_ngram": (
        "benchmark gram set is BroadcastExchange'd; the corpus side's only "
        "Exchange is the per-doc hit-count aggregate — corpus text never "
        "shuffles."
    ),
    "text_repetition": (
        "zero Exchanges — dup-fraction stats are a pure scan-fused "
        "projection; ReadSchema prunes to (doc_id, text)."
    ),
    "changelog_replay": (
        "no Window operator — the first-post-epoch entry is a min_by "
        "HashAggregate (partial-combined map-side), then ONE keyed "
        "full-outer join against the replica."
    ),
    "shuffle_order": (
        "no SINGLE-PARTITION Window — global positions come from "
        "per-hash-bucket windows (parallel) + broadcast-joined cumulative "
        "bucket offsets; the data's only wide op is one hashpartitioning "
        "Exchange on the bucket id, and nothing is persisted."
    ),
    "quality_filter": (
        "per-language p25 threshold table is BroadcastExchange'd — the "
        "corpus-side gate never shuffles document rows."
    ),
    "corpus_top_terms": (
        "both aggregation levels show partial HashAggregates before their "
        "Exchange — the shuffle carries (doc,term)/vocab rows, never the "
        "token stream; the final top-k window runs on the vocab only."
    ),
    "rollup_multires": (
        "both aggregation levels partial-agg before their Exchange: the "
        "first shuffle carries one row per (hour, type) per input "
        "partition, the second carries only |hourly-state| rows — the "
        "pyramid's coarsen step never re-reads raw events. ReadSchema is "
        "pruned to the 3 referenced columns."
    ),
    "decontam_bloom": (
        "the Bloom probe is scan-stage integer arithmetic (literal array "
        "+ shifts — no UDF, no BroadcastExchange feeding it); only Bloom "
        "survivors reach the exact-verify join, and the doc-keyed "
        "aggregate carries a few longs per doc, never corpus text."
    ),
    "events_sessionize": (
        "ONE Exchange on user_id serves both window functions AND the "
        "session aggregate — lag, gap-flag running sum, and the final "
        "groupBy all reuse the same hashpartitioning."
    ),
    "interval_join_events": (
        "the range predicate rides a HASH equi-join on the bin — no "
        "BroadcastNestedLoopJoin, no cartesian product anywhere in the "
        "plan (the naive inequality-join formulation degenerates to one)."
    ),
    "dup_spans": (
        "the positional-window explode feeds ONE md5-keyed aggregate "
        "(partial count-distinct, so hot boilerplate windows don't "
        "single-reduce), one hash join back to positions, and one "
        "doc-keyed window for island merging — three key-bounded "
        "Exchanges, no self-join of window rows."
    ),
    "dedup_strip_spans": (
        "span coverage is an array-lambda filter over the per-doc span "
        "list — no non-equi join, no BroadcastNestedLoopJoin; the only "
        "joins are the md5 hash join and the doc-keyed span-list join."
    ),
    "semantic_dedup": (
        "the pair join is keyed by the centroid CELL (hash equi-join, "
        "output bounded by cell sizes) — never an all-pairs product; "
        "the assignment is persisted so the unit-normalization lambda "
        "tree is evaluated once, not per candidate pair."
    ),
    "pipeline_e2e": (
        "five stages in one DAG: the per-lang threshold table and the "
        "benchmark gram set are BroadcastExchange'd; corpus text "
        "shuffles only for the exact-dedup groupBy and the shingle "
        "aggregate; stage boundaries are persisted so no branch "
        "re-derives the corpus from parquet."
    ),
    "semantic_dedup_capped": (
        "the hot-cell cut is a tiny cell-count aggregate joined back "
        "as a BroadcastHashJoin semi filter on the cell id BEFORE the "
        "pair self-join — never a per-row window; the pair join stays "
        "a cell-keyed hash equi-join over the surviving cells only."
    ),
    "semantic_dedup_arrow": (
        "the deploy path's Python stages are Arrow-batched and "
        "confined to assignment (MapInPandas GEMM argmax) and per-cell "
        "pair scoring (FlatMapGroupsInPandas, block-chunked GEMM); "
        "NO row-at-a-time BatchEvalPython anywhere, and the CC/output "
        "joins around them remain JVM hash equi-joins."
    ),
    "ann_ivfpq_topk": (
        "the corpus side is a codes-only scan (cell + M codes, no "
        "float vectors) feeding one MapInPandas ADC stage; the only "
        "Exchange after it is the per-query top-k window — the corpus "
        "is never shuffled and the query matrix rides in as broadcast "
        "python state, not a join side."
    ),
    "ann_ivfpq_refined": (
        "the exact re-score joins the ADC shortlist back to the "
        "corpus by neighbor id (hash equi-join bounded by Q x "
        "shortlist rows) — refinement cost scales with the shortlist, "
        "not the corpus."
    ),
    "semantic_dedup_incremental": (
        "the final output is a scan of the index's cell-partitioned "
        "state left-joined to the (eagerly computed, checkpointed) "
        "component table — epoch maintenance cost lives in the "
        "fixture build, not in this plan; verify_pairs is two hash "
        "equi-joins bounded by |candidate pairs|."
    ),
    "nb_classifier": (
        "training is ONE groupBy(token) with partial conditional sums; "
        "scoring joins the model via BroadcastHashJoin (the gated small "
        "side) and aggregates per doc — no CartesianProduct, no Python."
    ),
    "fuzzy_join_parts": (
        "candidates come from hash equi-joins on (gram, position bucket) "
        "— the |Δpos|≤k test is IN the join key; no CartesianProduct / "
        "BroadcastNestedLoopJoin anywhere despite the similarity-join "
        "semantics; levenshtein runs only on the verified pair set."
    ),
    "ivm_join_view": (
        "the spliced view read is a plain partitioned scan; repair work "
        "(bucket-pruned joins + dynamic partition overwrite) happens at "
        "fixture build — this plan must show NO join wider than the "
        "stored view itself."
    ),
    "embed_project": (
        "zero Exchanges, zero joins — every projected component is a "
        "scan-fused aggregate over zip_with against literal signs; "
        "ReadSchema prunes to (vec_id, embedding)."
    ),
    "wordpiece_tokens": (
        "zero Exchanges, zero joins, no Python — the longest-match "
        "fold is a runtime aggregate over sequence(1, len(word)); the "
        "literal vocabulary lives inside the projection, so the whole "
        "tokenizer is one scan."
    ),
    "zorder_scan": (
        "both range predicates appear in PushedFilters (GreaterThanOr"
        "Equal/LessThanOrEqual on user_id AND event_id) — footer-stat "
        "pruning gets both dimensions; file-count evidence lives in "
        "tests/test_zorder.py and the 20M probe."
    ),
    "decontam_semantic": (
        "one MapInPandas over one corpus scan, zero Exchanges, zero "
        "joins — the benchmark's unit vectors ride the task closure "
        "(max_benchmark-guarded) and each Arrow batch pays one "
        "|batch|×|benchmark| GEMM; embarrassingly parallel at 100 TB."
    ),
    "bpe_tokens": (
        "zero Exchanges, zero joins, no Python — the merge loop is a "
        "runtime fold whose per-step best-pair search probes a "
        "constant-folded literal rank map; the whole tokenizer is one "
        "scan, exactly the wordpiece shape."
    ),
    "wordpiece_tokens_8k": (
        "one MapInPandas over one scan, zero Exchanges, zero joins — "
        "the 8k-piece vocabulary ships in the task closure and every "
        "cursor is an O(1) set probe; this is the declared arrow "
        "deploy path past the Catalyst fold's vocab ceiling "
        "(PROBES_r7: 3.1M vs 114k pieces/s at 8k pieces)."
    ),
    "graph_triangles": (
        "the returned plan is the post-localCheckpoint scan (the "
        "operator truncates lineage like pagerank/LPA); the physical "
        "claims — wedge apex + closing-edge joins are hash equi-joins "
        "with the degree-rank inequality as a residual filter, no "
        "global row_number, no cartesian — are pinned by the hub "
        "probe: oriented out-degree 20 vs raw degree 190k at 20M "
        "edges, 108M wedges vs 18.1B naive (PROBES_r8 triangles_20m)."
    ),
    "quality_checks": (
        "ALL row-level metrics ride ONE HashAggregate over ONE file "
        "scan (the k check rows come from an explode of the single "
        "aggregate row, not a k-way union re-running the scan); each "
        "group-metric column adds exactly one two-level aggregate; "
        "the referential check is one left join + avg."
    ),
    "events_anomaly": (
        "ONE Exchange (hashpartitioning on user_id) serves the whole "
        "detector — count/avg/stddev all evaluate in one Window node "
        "over the same sort; no UDF, no state."
    ),
    "events_cusum": (
        "the closed-form rewrite shows up as Window nodes over one "
        "user_id Exchange (prefix sums + running min) instead of any "
        "recursion; the per-key stats join is a broadcast."
    ),
    "embed_pca": (
        "pca_fit runs EAGERLY inside the query fn (one MapInPandas "
        "moment pass + one d²+d+1-key Exchange + a bounded collect — "
        "not part of the returned plan); the captured plan is the "
        "projection only: one file scan, ZERO exchanges, zero joins — "
        "scan-fused aggregate/zip_with with the components as "
        "literals."
    ),
    "events_funnel": (
        "each funnel step joins on user_id; at this SF the shrinking "
        "per-step aggregates are small enough that AQE BROADCASTS "
        "them (6 BroadcastHashJoins — better than re-shuffling), at "
        "scale they fall back to co-partitioned joins on the same "
        "key; the final counts are one exploded aggregate row, and "
        "the step predicates are PUSHED to the parquet scans."
    ),
    "events_gapfill": (
        "the dense grid comes from sequence+explode over the per-key "
        "span aggregate (no cross join against a calendar table); "
        "the sparse-aggregate join back is co-partitioned on the key "
        "and the LOCF fill is one Window over the same Exchange."
    ),
    "events_retention": (
        "two aggregates (distinct activity, first-touch) + one key "
        "join; at this SF the one-row-per-key first-touch side "
        "broadcasts — at scale it hash-joins co-partitioned on the "
        "key it was just aggregated by."
    ),
    "hll_distinct": (
        "register build = one partial-combining max aggregate whose "
        "Exchange carries at most 2^b rows per upstream partition; "
        "the estimate is a 1-row fold; the only loop join is the "
        "allowlisted 1x1 aggregate combine (plan lint, reason on "
        "record)."
    ),
    "cm_heavy_hitters": (
        "sketch build = one groupBy((row, col)) count after the "
        "depth-way explode — the Exchange carries counter cells, "
        "never corpus rows; estimation probes join on (row, col) and "
        "the exact-count compare is a key join on the 100-supplier "
        "side."
    ),
    "streaming_anomaly": (
        "the returned plan reads the DRAINED parquet (the stream ran "
        "in the query fn via applyInPandasWithState); the streaming "
        "claims — one fixed window-sized buffer per key, in-order "
        "drops equal the batch operator — are pinned in "
        "tests/test_anomaly_stream.py."
    ),
    "events_ewma": (
        "one ArrowEvalPython-free applyInPandas (FlatMapGroupsInPandas"
        ") over one user_id Exchange — the sequential recurrence "
        "runs vectorized per key; no BatchEvalPython, no iteration "
        "in the plan."
    ),
    "graph_pagerank": (
        "post-localCheckpoint scan (the iteration loop truncates "
        "lineage each round — a 5-round plan would otherwise nest 5 "
        "join trees); per-round shape (contrib equi-join on the "
        "once-partitioned edges + 2-column partial agg, 1-row "
        "dangling collect) is pinned by tests/test_graph.py and the "
        "broadcast-vs-shuffle gate by PROBES_r7/r8 pagerank probes."
    ),
    "graph_ppr": (
        "same checkpointed shape as graph_pagerank; the seed-set "
        "teleport only changes the base distribution column, not the "
        "physical plan."
    ),
    "graph_communities": (
        "post-localCheckpoint scan; per-round shape (one label join "
        "on the once-partitioned symmetrized edges + two-key groupBy "
        "+ per-node argmax window) pinned by tests/test_graph.py "
        "against a pure-Python LPA evaluation."
    ),
    "sample_weighted": (
        "no Exchange for the data path: the weighted top-k is "
        "TakeOrderedAndProject over the scan (per-partition heaps + "
        "driver merge of k rows) — the corpus is never shuffled for "
        "a k-row sample."
    ),
    "bm25_search": (
        "all three corpus-sized aggregations (postings, doc length, "
        "df) partial-combine before their Exchange — shuffles carry "
        "vocab/doc-sized rows, never the token stream; the query-set "
        "join broadcasts; the final top-k window runs per query id."
    ),
    "bm25_champion": (
        "the champion cut is ONE per-term row_number window that "
        "Catalyst splits via WindowGroupLimit into a Partial "
        "(map-side, BEFORE the exchange) and a Final limit — every "
        "input partition pre-prunes to its local top-champion_n, so "
        "the shuffle carries <= champion_n x n_partitions rows per "
        "term and no task sorts a full Zipf-head posting list; the "
        "query join then fans <= champion_n rows per term (measured "
        "110s -> 29s at 1M x 10k, recall@10 0.97). df/dl aggregates "
        "stay on the full postings."
    ),
    "dedup_char_lsh": (
        "char shingles change shuffle WIDTH, not plan shape: the "
        "same one-explode-one-groupBy signature pass, one (band, "
        "hash) banding shuffle, and a verify join that touches "
        "candidate pairs only — ~5x gram volume rides existing "
        "exchanges (measured flat buckets at 1M/10M spaceless docs: "
        "volume, not skew)."
    ),
    "decontam_char": (
        "the benchmark gram-hash set folds to a broadcast; the "
        "corpus side is ONE gram pass (explode carries the set size "
        "alongside each gram) into a doc-keyed groupBy — no second "
        "gram build, no corpus-text shuffle, same shape as the word "
        "unit at ~n-fold gram width."
    ),
    "image_dedup_dhash": (
        "one Arrow mapInPandas scan emits 8-byte hashes; the "
        "banding join and the expansion-estimate aggregate only "
        "ever touch (id, hash) rows — payloads never shuffle; "
        "identical shape to image_dedup_phash, only the packing "
        "differs."
    ),
    "vocab_build": (
        "piece candidates explode once, then a two-level aggregate "
        "(partial counts map-side); the vocab_size cut is a window "
        "over the aggregated piece table only — corpus text shuffles "
        "zero times."
    ),
    "bpe_train": (
        "the trainer runs EAGERLY (per-round 1-row best-pair "
        "collects over the word-frequency table — corpus-to-state "
        "ratio measured ~1000x in PROBES_r8 bpetrain_2m); the "
        "returned frame is the k-row merge list (local scan)."
    ),
    "events_transitions": (
        "one key Exchange serves lag, row_number AND the per-key "
        "count window; the two-key aggregate partial-combines; the "
        "row normalization windows over the |states|^2 table, never "
        "events."
    ),
    "events_abtest": (
        "one partial-combining (experiment, variant) aggregate — the "
        "Exchange carries one row per variant, never events; the "
        "control/treatment pairing is a BroadcastHashJoin over the "
        "variant-level frame; everything downstream is closed-form "
        "projection."
    ),
    "streaming_cusum": (
        "the returned plan reads the drained parquet; the streaming "
        "claim is the STATE BOUND — two floats per key, no buffer at "
        "all (the fixed in-control target removes the need for "
        "history) — pinned with the cross-batch recurrence equality "
        "in tests/test_anomaly_stream.py."
    ),
    "text_bigram_lm": (
        "train and score are two partial-combining aggregates over "
        "the exploded bigram stream; |V| folds in as a driver "
        "literal — no scalar-subquery cartesian against the corpus; "
        "shuffles carry (gram) rows, never document text."
    ),
    "dsir_select": (
        "the B-row (2^hash_bits) ratio table is the ONLY broadcast; "
        "both count passes partial-combine to B rows before their "
        "exchange; the final selection is TakeOrderedAndProject "
        "(per-partition heaps), never a global sort of the corpus."
    ),
    "domain_quota": (
        "one ranking-window exchange on the derived domain; the scan "
        "is column-pruned to (doc_id, n_chars, source). The "
        "two_phase strategy's shuffle-volume trade and the exact "
        "prune are measured in PROBES quota_20m, equal results "
        "pinned in tests/test_sampling.py."
    ),
    "text_pmi": (
        "shuffles carry the vocab and bigram-vocab aggregates only; "
        "both totals fold as driver literals; the top-k is "
        "TakeOrderedAndProject, so the token stream is never "
        "exchanged or globally sorted."
    ),
    "lr_quality_filter": (
        "the SCORING plan has zero exchanges — a pure per-row "
        "projection under whole-stage codegen (training's per-"
        "iteration aggregates ran eagerly at build time, one "
        "map-side-combined scan each)."
    ),
    "hard_negatives": (
        "one narrow MapInPandas GEMM scan of the corpus (id, vec, "
        "label only); the label mask is applied inside the batch "
        "before the local top-k, so the window ranks k rows per "
        "(query, batch), never the corpus."
    ),
    "events_mad_outliers": (
        "two grouped EXACT percentile aggregates (partial-combining, "
        "shuffled by key) + joins back on the key — no window over "
        "the raw event stream, no driver collect."
    ),
    "k_anonymity": (
        "one grouped count over the quasi columns, then a LeftSemi "
        "join back (broadcast — the group frame is |groups| rows); "
        "the customer scan is column-pruned."
    ),
    "kmeans_clusters": (
        "the final assignment is ONE scan with k rounded quadratic "
        "forms + array argmin — no join, no exchange (training's "
        "per-iteration aggregates ran eagerly at build time; the "
        "arrow twin swaps this scan for a MapInPandas GEMM)."
    ),
    "events_ohlc": (
        "one exchange on (key, bucket) reused by BOTH row_number "
        "windows (two in-partition sorts, ascending/descending) and "
        "the final partial-combining aggregate."
    ),
    "events_cep_pattern": (
        "one key-shuffled collect_list aggregate; the regex runs "
        "once per key as a scalar projection over the assembled "
        "sequence string — no join, no second exchange."
    ),
    "q4_order_priority": (
        "the correlated EXISTS is a LeftSemi join (equi on the order "
        "key + residual date predicate), never a per-row subquery; "
        "the priority aggregate partial-combines."
    ),
    "q17_small_qty_revenue": (
        "the correlated scalar average decorrelates into one grouped "
        "aggregate joined back on partkey; the brand filter reaches "
        "the part scan as a pushed filter."
    ),
    "q18_large_volume": (
        "the HAVING subquery is a filtered aggregate joined through "
        "orders/customer (AQE broadcasts the shrunken sides); the "
        "top-100 is TakeOrderedAndProject, no global sort."
    ),
    "dedup_text_model_free": (
        "the pair join is keyed by the k-means CELL — the "
        "anti-quadratic bound — with the id_a < id_b residual; no "
        "cartesian anywhere in the chain (embed scan -> assignment "
        "scan -> cell-keyed self-join)."
    ),
    "sample_stratified_exact": (
        "one stratum-keyed ranking window over a column-pruned scan "
        "— the domain_quota shape."
    ),
    "unigram_tokens": (
        "the Viterbi apply is a zero-exchange projection over the "
        "scan — the trained vocabulary rides the plan as ONE "
        "constant-folded literal map, and every DP sum is int64 "
        "arithmetic inside the fold (training already happened in "
        "the query fn's EM loop: one corpus word-count, then "
        "distinct-word-sized iterations)."
    ),
    "image_dedup_phash": (
        "payload bytes enter exactly ONE Arrow scan (the aHash "
        "mapInPandas); everything after — pigeonhole banding, bucket "
        "self-join, Hamming verify — carries 8-byte hashes only."
    ),
    "langid_trained": (
        "scoring is the NB shape on char-gram features: gram "
        "expansion fused with the scan, the vocab-sized model "
        "BroadcastExchange'd, ONE doc-keyed aggregate — corpus text "
        "never shuffles."
    ),
}
# Not string-audited here, each for the same reason: the query fn
# materializes its result through a temp store, so the returned plan
# is a LocalTableScan / plain state scan and the interesting physical
# evidence is asserted by tests instead —
# - ann_ivf_indexed / ann_ivfpq_indexed / *_maintained: partition
#   pruning (PartitionFilters on the stored cell column) in
#   tests/test_similarity.py::test_indexed_search_prunes_partitions
#   and tests/test_ann_index.py;
# - streaming_rollup / rollup_cdc_repair: partition-pruned day
#   overwrites asserted by mtime in tests/test_rollup_stream.py and
#   tests/test_rollup.py (only touched day directories rewrite);
# - unigram_train: the EM loop runs inside the query fn (bounded
#   vocab-sized collects per iteration, the bpe_train discipline);
#   the returned frame is a vocab-sized LocalTableScan — the
#   distinct-word iteration shape is the same fold unigram_tokens'
#   entry audits;
# - cdc_schema_evolution / cdc_schema_replay: the epoch runs inside
#   the query fn against a temp store (returned plan is a collect'd
#   LocalTableScan); the interesting physical claims — rebase churn
#   proportional to real mutations, narrow (pk, added) backfill join,
#   boundary rewrite via dynamic overwrite — are pinned in
#   tests/test_schema_evolution.py (changelog row counts, bucket
#   layout preserved, next-epoch pruned writes).

JOIN_RE = re.compile(r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)\b")
TYPE_RE = re.compile(r"\b(FullOuter|LeftSemi|LeftAnti|LeftOuter|RightOuter|Inner|Cross)\b")


def main(sf_dir: str) -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from updater_spark import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    # long PushedFilters lists are truncated to 100 chars ("...") in
    # plan strings, which silently read as "pushed filters: none" in
    # the report (bit the zorder_scan entry: both range predicates
    # WERE pushed but invisible)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan evidence for the flagship queries",
        "",
        "Captured from `queryExecution().executedPlan()` at sf0.01 (plan",
        "shape is scale-independent; AQE re-plans sizes at runtime).",
        "Regenerate with `python -m tests.plan_audit`.",
        "",
    ]
    qs = entrymod.queries()
    for name, note in CHECKS.items():
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        # the plan STRING reprints each InMemoryRelation's cached
        # DEFINITION beneath every InMemoryTableScan reference (with
        # fresh expr ids, so they aren't even identical lines) —
        # strip those subtrees so a persisted stage isn't counted
        # once per read
        kept, skip_depth = [], None
        for line in plan.splitlines():
            m = re.search(r"[A-Za-z(]", line)
            depth = m.start() if m else 0
            if skip_depth is not None:
                if depth > skip_depth:
                    continue
                skip_depth = None
            kept.append(line)
            if "InMemoryRelation" in line:
                skip_depth = depth
        plan = "\n".join(kept)
        joins = JOIN_RE.findall(plan)
        jtypes = TYPE_RE.findall(plan)
        pushed = [p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]
        imts = plan.count("InMemoryTableScan")
        cached = f", cached-stage reads: {imts}" if imts else ""
        out += [
            f"## {name}",
            "",
            f"**Check:** {note}",
            "",
            f"- join operators: `{joins}` (types seen: `{sorted(set(jtypes))}`)",
            f"- pushed filters: `{pushed[:3]}`" if pushed else "- pushed filters: none",
            f"- exchanges: {plan.count('Exchange')}, file scans: {plan.count('FileScan')},"
            f" hash aggregates: {plan.count('HashAggregate')}{cached}",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
