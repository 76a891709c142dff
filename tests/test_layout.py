"""Range-clustered layout: parquet footer stats become narrow and
nearly disjoint, and a selective filter's rows concentrate in few
files — the observable form of data skipping."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from updater_spark.sources.store import TableStore


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from updater_spark import demo

    return demo.load_events(spark, sf_dir).cache()


def _file_ranges(path, col):
    """(min, max) of ``col`` per parquet file, from footer stats."""
    out = {}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out[f] = (lo, hi)
    return out


def test_clustered_files_have_disjoint_ranges(spark, events, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    path = store.write_clustered(
        "ev_sorted", events, ["event_id"], num_files=8
    )
    ranges = sorted(_file_ranges(path, "event_id").values())
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # range-partitioned: files never overlap

    # round-trip: clustering reorders, never changes content
    got = store.read("ev_sorted")
    assert got.count() == events.count()
    assert (
        got.agg(F.sum("event_id")).first()[0]
        == events.agg(F.sum("event_id")).first()[0]
    )


def test_selective_filter_concentrates_in_few_files(spark, events, tmp_path):
    """The same 1%-selectivity range predicate touches ~1 clustered
    file but nearly every unclustered one."""
    store = TableStore(spark, str(tmp_path / "store"))
    n = events.count()
    lo, hi = n // 2, n // 2 + n // 100  # ~1% of the id range
    pred = F.col("event_id").between(lo, hi)

    store.write_clustered("ev_sorted", events, ["event_id"], num_files=8)
    clustered_files = (
        store.read("ev_sorted")
        .filter(pred)
        .select(F.input_file_name())
        .distinct()
        .count()
    )

    store.write("ev_plain", events.repartition(8), num_files=8)
    plain_files = (
        store.read("ev_plain")
        .filter(pred)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert clustered_files <= 2
    assert plain_files >= 6
    assert clustered_files < plain_files
