"""Custom stateful streaming operator: first-seen dedup.

A training-data ingest stream wants exactly-once admission per content
fingerprint: the first document with a given hash passes, every later
duplicate (same batch or any later micro-batch) is dropped. Built-in
``dropDuplicates`` keeps unbounded state with no control and can't
report duplicate counts; this uses ``applyInPandasWithState`` — the
escape hatch for stateful logic the built-in operators can't express
(per-group state object, explicit timeout control).

State: one flag + counter per fingerprint group, persisted in the
checkpoint across micro-batches and restarts. Scale: state is
partitioned by the grouping key across executors exactly like any
keyed aggregation; GroupStateTimeout can bound retention where the
dedup horizon is finite (e.g. 30-day crawl windows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_dupes_so_far", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("seen", LongType()),  # total occurrences seen
        StructField("keeper", LongType()),  # doc_id admitted first
    ]
)


def _first_seen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen, keeper = state.get if state.exists else (0, None)
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")
        for doc_id in pdf["doc_id"]:
            if seen == 0:
                keeper = int(doc_id)
                out.append((key[0], keeper, 0))
            seen += 1
    state.update((seen, keeper))
    if out:
        yield pd.DataFrame(out, columns=["fp", "doc_id", "n_dupes_so_far"])


def streaming_first_seen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Admit only the first document per content fingerprint across
    the whole stream. Input: a streaming DataFrame with (id, text)."""
    keyed = docs.select(
        F.md5(F.col(text_col).cast("binary")).alias("fp"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _first_seen,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
