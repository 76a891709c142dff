"""Environment-driven engine configuration.

The reference is configured entirely through environment variables
(/root/reference/src/utils.py:5-27: DB hosts/credentials,
``PIPE_SIZE``/``BATCH_SIZE`` at start.py:45-46). A user migrating from
it configures this engine the same way; knobs that only existed to
tune the asyncio pipeline are accepted-and-ignored with a note, since
Spark owns batching/backpressure now.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from updater_spark.operators.merge import DELETE_GUARD_DEFAULT


def _int_env(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


@dataclass(frozen=True)
class EngineConfig:
    """Resolved engine settings (env → defaults)."""

    # storage root for the TableStore (replaces the internal MySQL DB,
    # utils.py:14 `cfm_db`)
    store_root: str = field(
        default_factory=lambda: os.environ.get("UPDATER_STORE_ROOT", "./cdc_store")
    )
    # source JDBC url (replaces the external MySQL pool, utils.py:9;
    # empty → parquet-snapshot sources)
    source_jdbc_url: str = field(
        default_factory=lambda: os.environ.get("UPDATER_SOURCE_JDBC_URL", "")
    )
    fingerprint_algo: str = field(
        default_factory=lambda: os.environ.get("UPDATER_FINGERPRINT_ALGO", "crc32")
    )
    # delete safety valve (download.py:326)
    delete_guard: int = field(
        default_factory=lambda: _int_env("UPDATER_DELETE_GUARD", DELETE_GUARD_DEFAULT)
    )
    # hash-partitioned main tables; 0 → full-rewrite mode
    partition_buckets: int = field(
        default_factory=lambda: _int_env("UPDATER_PARTITION_BUCKETS", 0)
    )
    jdbc_partitions: int = field(
        default_factory=lambda: _int_env("UPDATER_JDBC_PARTITIONS", 32)
    )

    def __post_init__(self):
        # Legacy knobs: meaningful only for the reference's bounded-
        # queue pipeline; Spark handles batching/backpressure.
        for legacy in ("PIPE_SIZE", "BATCH_SIZE"):
            if legacy in os.environ:
                import logging

                logging.getLogger(__name__).info(
                    "%s is a reference-pipeline knob; ignored (Spark "
                    "owns batching/backpressure)",
                    legacy,
                )


def engine_from_env(spark):
    """Build a ready CdcEngine from the environment."""
    from updater_spark.plans.cdc import CdcEngine
    from updater_spark.sources.store import TableStore

    cfg = EngineConfig()
    return CdcEngine(
        TableStore(spark, cfg.store_root),
        fingerprint_algo=cfg.fingerprint_algo,
        delete_guard=cfg.delete_guard,
        partition_buckets=cfg.partition_buckets or None,
    )
