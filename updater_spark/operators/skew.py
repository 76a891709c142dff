"""Skew mitigation: salted joins for hot keys.

When one join key owns a large fraction of the rows, the shuffle
partition holding it becomes the straggler. First defenses, in order:

1. ``broadcast()`` the small side — no shuffle at all, skew
   irrelevant. The engine's CDC joins (operators/merge.py) already do
   this for key sets.
2. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in session.py) — splits oversized sort-merge partitions at
   runtime.

``salted_join`` is for the cases those can't reach: the dimension is
too big to broadcast AND the join can't be a sort-merge AQE can
re-plan (stream-stream/stateful joins, or engines/paths with AQE
off). It decorrelates the hot key by appending a salt in
[0, salt_factor): the big side picks one salt per row, the small side
is replicated once per salt, and the join key becomes (key, salt) —
the hot key's rows spread over ``salt_factor`` partitions at the cost
of a ``salt_factor``× blow-up of the SMALL side only.

Reference scope: the reference engine (cheeseformice/updater) joins on
unique primary keys and never skews — north-star extension per
BASELINE.json's 100 TB design goals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join of ``big`` against ``small`` on column
    ``on`` (same name both sides), semantically identical to
    ``big.join(small, on, how)`` for ``inner``/``left``.

    The big side's salt is ``monotonically_increasing_id() %
    salt_factor`` — round-robin within each partition, so a hot key's
    rows land in ``salt_factor`` different shuffle partitions
    regardless of how the key itself hashes. Any salt assignment is
    correct (the small side carries every salt value), so even a task
    retry that re-derives ids preserves the join result.
    """
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    small_rep = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salt_factor - 1))),
    )
    big_s = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))
    )
    return big_s.join(small_rep, [on, "__salt"], how).drop("__salt")
