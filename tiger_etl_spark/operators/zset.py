"""Redis sorted-set (ZSET) analog — mutation + range over a score table.

Reference: ``system/system/database_connections/redis_db.py:78-132``
(``zadd``/``zrem``/``zrange``). The read side (rank ranges) lives in
``crud.zset_range``; this module adds the mutation side two ways:

- ``resolve_updates``: pure-DataFrame resolution of a zadd/zrem update
  stream to the final member→score map (latest update per member wins;
  a trailing zrem removes the member). Associative ``max_by`` — the same
  skew-proof shape as the CDC LWW core.
- ``ZSet``: a durable sorted set backed by a small LakeTable — zadd is a
  MERGE upsert, zrem a tombstone delete, zrange a top-(stop+1) rank
  range. Bookkeeping-table scale (members ≪ events), snapshot-committed
  like any lake table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators.crud import zset_range

ZADD, ZREM = "Z_ADD", "Z_REM"


def resolve_updates(
    updates: DataFrame,
    member_col: str,
    order_cols: list[str],
    op_col: str,
    score_col: str,
) -> DataFrame:
    """Final member→score after an ordered stream of zadd/zrem updates:
    the newest update per member decides (zadd → its score, zrem →
    member absent). One associative hash agg, no window sort."""
    winner = (
        updates.groupBy(member_col)
        .agg(
            F.max_by(
                F.struct(F.col(op_col).alias("_op"), F.col(score_col).alias("_s")),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("_w")
        )
        .where(F.col("_w._op") == ZADD)
        .select(member_col, F.col("_w._s").alias(score_col))
    )
    return winner


class ZSet:
    """Durable ZSET on a LakeTable(member string, ts timestamp,
    score double); update order = (ts, op_seq) with ts derived from
    op_seq, so callers only supply monotone sequence numbers (Redis has
    no event time)."""

    SCHEMA = "member string, warc_ts timestamp, score double"

    def __init__(self, table: LakeTable):
        self.table = table

    @classmethod
    def create(cls, path: str, num_buckets: int = 4) -> "ZSet":
        return cls(
            LakeTable.create(
                path, cls.SCHEMA, key_col="member", num_buckets=num_buckets
            )
        )

    @classmethod
    def load(cls, path: str) -> "ZSet":
        return cls(LakeTable.load(path))

    @staticmethod
    def _ts(op_seq: int) -> dt.datetime:
        return dt.datetime(2000, 1, 1) + dt.timedelta(seconds=op_seq)

    def _batch(self, spark: SparkSession, rows: list[tuple], op: str, op_seq: int):
        return spark.createDataFrame(
            [
                (op, op_seq + i, m, self._ts(op_seq + i), s)
                for i, (m, s) in enumerate(rows)
            ],
            f"op string, op_seq long, {self.SCHEMA}",
        )

    def zadd(self, spark: SparkSession, scores: dict[str, float], op_seq: int) -> int:
        """Upsert member scores (MERGE, not-matched inserts + matched
        updates). Returns rows merged."""
        rows = sorted(scores.items())
        stats = self.table.merge(
            spark, self._batch(spark, rows, "U", op_seq)
        )
        return stats.rows_upserted

    def zrem(self, spark: SparkSession, members: list[str], op_seq: int) -> int:
        rows = [(m, None) for m in sorted(members)]
        stats = self.table.merge(
            spark, self._batch(spark, rows, "D", op_seq)
        )
        return stats.rows_upserted

    def zrange(
        self, spark: SparkSession, start: int, stop: int, desc: bool = False
    ) -> DataFrame:
        df = self.table.scan(spark).select("member", "score")
        return zset_range(
            df, "score", start, stop, desc=desc, tiebreak=["member"],
            with_rank=True,
        ).select("rank", "member", "score")

    def zscore(self, spark: SparkSession, member: str) -> float | None:
        rows = (
            self.table.scan(spark)
            .where(F.col("member") == member)
            .select("score")
            .take(1)
        )
        return rows[0].score if rows else None

    def zcard(self, spark: SparkSession) -> int:
        return self.table.scan(spark).count()
