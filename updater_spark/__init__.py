"""updater_spark — a PySpark-native re-expression of the
cheeseformice/updater CDC + derived-analytics engine, extended with
large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.0): no translation of the reference's
asyncio coroutine/queue pipeline. Three layers:

1. ``operators``/``functions`` — pure DataFrame functions (fingerprint,
   diff, merge, scores, aggregates, dedup, similarity, text).
2. ``plans`` — CDC orchestration (bootstrap / incremental update /
   post_update) composing layer 1 with fingerprint-table state.
3. ``streaming`` — Structured Streaming ``foreachBatch`` wrapper for
   the continuous incremental loop.

Everything stays in built-in Catalyst expressions (zero row-at-a-time
Python UDFs in any hot path) so plans remain whole-stage-codegen'd
and scale to a real cluster.
"""

from updater_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
