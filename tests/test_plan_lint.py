"""Plan lint over EVERY registered driver query: the hot-path
guarantees the engine claims ("no cartesian products, no row-at-a-time
Python UDFs") asserted mechanically instead of by docstring.

Runs at sf0.001 — plan SHAPE is scale-independent.
"""

from __future__ import annotations

import pytest

# queries whose plan legitimately contains a nested-loop/cross join,
# with the reason on record
BNLJ_ALLOWED = {
    # the didactic Catalyst twin of sim_topk_arrow: deliberately a
    # broadcast cross product (its docstring forbids optimizing it —
    # its role is to be the plainly-readable oracle of the ANN paths)
    "sim_topk_cosine",
    # deliberately the exact brute-force verifier: the LSH-bucketed
    # operator (embedding_near_dup_pairs) misses hyperplane-boundary
    # pairs by design (measured 48/50 at sf0.001), so the DRIVER query
    # must stay exact to hash-match its oracle; the bucketed scale
    # path is recall-tested in tests/test_similarity.py
    "dedup_embedding_neardup",
    # the SQ8 didactic Catalyst twin (sq_topk): the same deliberate
    # broadcast cross product as sim_topk_cosine, scoring dequantized
    # codes; ann_sq8_arrow is the deploy path (mapInPandas scan over
    # the int8 codes — no join at all) and shares the exact oracle
    "ann_sq8_topk",
    # a 1-row x 1-row combine of two global aggregates (the HLL
    # estimate row + the exact-distinct row, joined only for the
    # recorded rel_err): the literal join key constant-folds away and
    # the planner rightly leaves a broadcast loop over ONE row —
    # bounded by construction, never corpus-sized
    "hll_distinct",
}


def _all_plans(spark, sf_dir):
    import __spark_entry__ as em

    for name, fn in em.queries().items():
        df = fn(spark, sf_dir)
        yield name, df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return dict(_all_plans(spark, sf_dir))


def test_no_cartesian_products(plans):
    bad = {
        name
        for name, plan in plans.items()
        if "CartesianProduct" in plan
        or (
            "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED
        )
    }
    assert not bad, f"unexpected cross/nested-loop joins in: {sorted(bad)}"


def test_no_row_at_a_time_python_udfs(plans):
    """BatchEvalPython = pickled row-at-a-time Python UDF — never
    allowed anywhere. ArrowEvalPython / mapInPandas (vectorized) are
    the sanctioned Python escape hatches."""
    bad = {n for n, p in plans.items() if "BatchEvalPython" in p}
    assert not bad, f"row-at-a-time Python UDFs in: {sorted(bad)}"


def test_allowlist_still_needed(plans):
    """If an allowlisted plan stops being a BNLJ, the allowlist entry
    must go — stale exemptions hide regressions."""
    for name in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" in plans[name], name
