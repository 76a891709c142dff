"""Computed score projections + name normalization.

Formulas from /root/reference/src/table.py:5-44 (P2/P3 in SURVEY.md
§2.2), applied at fetch time (table.py:85-88) and post-load
(download.py:534-544). Name normalization from download.py:546-555
(P4).

Division semantics: MySQL yields NULL when the divisor is 0 (fresh
players with ``round_played = 0`` etc.). Non-ANSI Spark's ``Divide``
also returns NULL for a zero divisor, but ``mysql_div`` keeps the
guard explicit so the plans are correct even under
``spark.sql.ansi.enabled=true``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mysql_div(num: Column, den: Column) -> Column:
    """MySQL ``a / b``: NULL when b is 0 or NULL."""
    return F.when(den != 0, num / den)


def _c(name: str) -> Column:
    return F.col(name)


def _quartic_root(x: Column) -> Column:
    """``POWER(x, 0.25)`` as ``sqrt(sqrt(x))``: IEEE-754 sqrt is
    correctly rounded on every platform, while ``pow`` is libm-
    dependent (Java vs C can differ in the last ulp) — this keeps the
    formulas bit-reproducible across engines and executor JVMs."""
    return F.sqrt(F.sqrt(x))


def score_expressions() -> dict[str, Column]:
    """The five per-mode formulas (table.py:5-28), keyed by column."""
    return {
        # (cheese_gathered + first*3) / POWER(round_played, 0.25)
        # (table.py:6-8)
        "score_stats": mysql_div(
            _c("cheese_gathered") + _c("first") * 3,
            _quartic_root(_c("round_played")),
        ),
        # (shaman_cheese*0.05 + saved_mice*0.2 + saved_mice_hard*0.35
        #  + saved_mice_divine*0.5) / POWER(round_played, 0.25)
        # (table.py:9-14 — divides by *round_played*, not a
        #  shaman-specific counter)
        "score_shaman": mysql_div(
            _c("shaman_cheese") * 0.05
            + _c("saved_mice") * 0.2
            + _c("saved_mice_hard") * 0.35
            + _c("saved_mice_divine") * 0.5,
            _quartic_root(_c("round_played")),
        ),
        # (1.6*survivor_survivor_count + 0.8*survivor_mouse_killed) /
        #   POWER(survivor_shaman_count * survivor_round_played, 0.25)
        # (table.py:15-19)
        "score_survivor": mysql_div(
            _c("survivor_survivor_count") * 1.6 + _c("survivor_mouse_killed") * 0.8,
            _quartic_root(_c("survivor_shaman_count") * _c("survivor_round_played")),
        ),
        # (2*racing_first + racing_podium) /
        #   POWER(racing_round_played * racing_finished_map, 0.25)
        # (table.py:20-24)
        "score_racing": mysql_div(
            _c("racing_first") * 2 + _c("racing_podium"),
            _quartic_root(_c("racing_round_played") * _c("racing_finished_map")),
        ),
        # defilante_points /
        #   POWER(defilante_round_played * defilante_finished_map, 0.25)
        # (table.py:25-28)
        "score_defilante": mysql_div(
            _c("defilante_points"),
            _quartic_root(_c("defilante_round_played") * _c("defilante_finished_map")),
        ),
    }


# score_overall weights (table.py:30-43): each mode score divided by a
# calibration constant, summed.
OVERALL_WEIGHTS: dict[str, float] = {
    "score_stats": 35.564,
    "score_shaman": 24.956,
    "score_survivor": 1.580,
    "score_racing": 0.861,
    "score_defilante": 2.851,
}


def score_overall_expression() -> Column:
    """Weighted sum (table.py:30-43), applied post-load
    (download.py:534-544). MySQL treats NULL mode scores as NULL-
    propagating through ``+`` — a single NULL score NULLs the sum, as
    in the reference's UPDATE expression."""
    total = None
    for col_name, divisor in OVERALL_WEIGHTS.items():
        term = _c(col_name) / F.lit(divisor)
        total = term if total is None else total + term
    return total


def apply_scores(df: DataFrame) -> DataFrame:
    """Attach the five per-mode score columns (fetch-time projections,
    table.py:85-88). Catalyst fuses these into the scan stage."""
    exprs = score_expressions()
    return df.withColumns({name: expr for name, expr in exprs.items()})


def apply_score_overall(df: DataFrame) -> DataFrame:
    """Second-pass ``score_overall`` (download.py:534-544)."""
    return df.withColumn("score_overall", score_overall_expression())


def normalize_names(df: DataFrame, name_col: str = "name") -> DataFrame:
    """``UPDATE ... SET name=CONCAT(name,'#0000') WHERE name NOT LIKE
    '%#%'`` (download.py:546-555)."""
    c = F.col(name_col)
    return df.withColumn(
        name_col,
        F.when(~c.like("%#%"), F.concat(c, F.lit("#0000"))).otherwise(c),
    )
