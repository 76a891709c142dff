from updater_spark.operators.diff import snapshot_diff, split_diff
from updater_spark.operators.merge import (
    apply_deletes,
    changelog_preimages,
    merge_upsert,
    semi_join_fetch,
)
from updater_spark.operators.aggregates import tribe_active, tribe_stats

__all__ = [
    "snapshot_diff",
    "split_diff",
    "merge_upsert",
    "apply_deletes",
    "changelog_preimages",
    "semi_join_fetch",
    "tribe_active",
    "tribe_stats",
]
