"""Property-based CDC invariants (SURVEY.md §5.3): for ANY pair of
snapshots, after an incremental update the replica equals the new
snapshot, the changelog holds exactly the pre-images of updated keys,
and fingerprints equal the new snapshot's fingerprints."""

import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from updater_spark.plans.cdc import CdcEngine
from updater_spark.schema import TableSpec
from updater_spark.sources.store import TableStore

# a snapshot: dict id -> (name, counter)
snapshot_st = st.dictionaries(
    keys=st.integers(min_value=1, max_value=60),
    values=st.tuples(
        st.text(alphabet="ab#", min_size=0, max_size=4),
        st.integers(min_value=0, max_value=5),
    ),
    max_size=40,
)


def to_rows(snap):
    return [Row(id=i, name=n, counter=c) for i, (n, c) in sorted(snap.items())]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(s0=snapshot_st, s1=snapshot_st)
def test_cdc_invariants(spark, tmp_path_factory, s0, s1):
    if not s0:
        s0 = {1: ("a", 1)}
    store = TableStore(spark, str(tmp_path_factory.mktemp("prop_store")))
    engine = CdcEngine(store)
    spec = TableSpec("t", "id")

    engine.update(spec, spark.createDataFrame(to_rows(s0)))
    if not s1:
        return
    stats = engine.update(spec, spark.createDataFrame(to_rows(s1)))

    # replica ≡ s1
    replica = {
        r["id"]: (r["name"], r["counter"]) for r in store.read("t").collect()
    }
    assert replica == s1

    # classification counts
    updated = {i for i in s0 if i in s1 and s0[i] != s1[i]}
    inserted = set(s1) - set(s0)
    deleted = set(s0) - set(s1)
    assert stats.updates == len(updated)
    assert stats.upserts == len(updated) + len(inserted)
    assert stats.deletes == len(deleted)

    # changelog = pre-images of updated keys (old values)
    if updated:
        chg = {
            r["id"]: (r["name"], r["counter"])
            for r in store.read_appendable("t__changelog").collect()
        }
        assert chg == {i: s0[i] for i in updated}

    # fingerprints ≡ CRC32(CONCAT_WS('', id, name, counter)) of s1
    fps = {r["id"]: r["hashed"] for r in store.read("t__fingerprints").collect()}
    expected = {
        i: zlib.crc32(f"{i}{n}{c}".encode()) for i, (n, c) in s1.items()
    }
    assert fps == expected
