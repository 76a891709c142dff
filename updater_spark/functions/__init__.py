from updater_spark.functions.fingerprints import row_fingerprint
from updater_spark.functions.scores import (
    apply_score_overall,
    apply_scores,
    mysql_div,
    normalize_names,
)

__all__ = [
    "row_fingerprint",
    "apply_scores",
    "apply_score_overall",
    "mysql_div",
    "normalize_names",
]
