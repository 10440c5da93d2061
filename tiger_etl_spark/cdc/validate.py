"""Validation / quarantine routing.

Reference analog: Pydantic wire-schema validation
(``system/system/database_functions/sessions_management/validations.py:49-430``
— positive-int ids :52-57, charset :88-102, format checks :104-114),
which raises per row. Spark can't raise per-row, so invalid rows are
*routed*: boolean check columns → a reason array → quarantine table
(SURVEY.md §1.3, §4 custom-work #5). Rules per FIXTURES.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")

def _checks() -> list[tuple[str, F.Column]]:
    """(reason, predicate-for-violation) — all JVM-side expressions.
    Built lazily: Column construction needs an active SparkContext."""
    return [
        ("empty_url", F.col("url").isNull() | (F.length("url") == 0)),
        ("nonpositive_op_seq", F.col("op_seq").isNull() | (F.col("op_seq") <= 0)),
        ("bad_op", F.col("op").isNull() | ~F.col("op").isin(*VALID_OPS)),
        ("null_warc_ts", F.col("warc_ts").isNull()),
    ]


def with_validation(df: DataFrame) -> DataFrame:
    reasons = F.array_compact(
        F.array(*[F.when(pred, F.lit(name)) for name, pred in _checks()])
    )
    return df.withColumn("_invalid_reasons", reasons)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (valid rows, quarantine rows with `_invalid_reasons`).

    One pass of check expressions; the two outputs are complementary
    filters over the same scan (Catalyst reuses the exchange under AQE).
    """
    checked = with_validation(df)
    valid = checked.where(F.size("_invalid_reasons") == 0).drop("_invalid_reasons")
    quarantined = checked.where(F.size("_invalid_reasons") > 0)
    return valid, quarantined
