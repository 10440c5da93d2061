"""Replica-consistency audit — order-insensitive distributed checksum.

Reference analog: the reference verifies writes by reading rows back
through the same connection (`/root/reference/system/system/database_connections/pg_db.py`
insert-RETURNING + follow-up selects); between two 10^10-row replicas
(source table vs CDC-merged lake table) that is not an option — you
need a constant-size summary both sides can compute independently and
compare. This is the standard content checksum used by replication
audit tools (pt-table-checksum lineage): a per-row fingerprint reduced
by a commutative operation, so the result is independent of row order
and partitioning.

Scale shape: one narrow aggregate — per-row md5 inside the scan stage
(whole-stage codegen), summed map-side-partially into a single row.
Zero wide shuffles, zero data movement; comparing two tables costs two
table scans and exchanges 16 bytes. The fingerprint takes the first 15
hex chars (60 bits) of md5 so each term fits a signed int64, and the
reduction is an exact decimal(38,0) sum — overflow-free under ANSI
mode for ~10^18 rows and bit-for-bit reproducible across engines (the
DuckDB oracle casts the same hex via ``('0x'||…)::BIGINT`` and sums as
HUGEINT).

Canonical row encoding: columns joined with '|' after casting to
string, NULL encoded as a sentinel that cannot collide with real text
(U+2400). Callers must pre-cast floats/timestamps to a renderer-stable
type (decimal / epoch integers) — cross-engine double formatting is
NOT canonical and the query entry points do exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _encode_field(c: Column | str) -> Column:
    """Injective field encoding (netstring-style): NULL → 'N', value v →
    'V<charlen>:<v>'. The length prefix makes the '|' join unambiguous
    — ('a|b','c') and ('a','b|c') encode differently — and 'N' can
    never collide with a real value (values always start with 'V')."""
    s = (F.col(c) if isinstance(c, str) else c).cast("string")
    return F.when(s.isNull(), F.lit("N")).otherwise(
        F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
    )


def row_fingerprint(cols: list[Column | str]) -> Column:
    """60-bit per-row fingerprint: int64 of the first 15 md5 hex chars
    of the canonical '|'-joined length-prefixed encoding."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[_encode_field(c) for c in cols])), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def table_checksum(df: DataFrame, cols: list[Column | str] | None = None) -> DataFrame:
    """One row: (n_rows bigint, checksum decimal(38,0) as string) —
    order- and partitioning-insensitive content summary of ``df``."""
    use = cols if cols is not None else list(df.columns)
    fp = row_fingerprint(use).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(fp).cast("decimal(38,0)").cast("string").alias("checksum"),
    )


def bucket_checksums(
    df: DataFrame,
    key_col: str,
    cols: list[Column | str] | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-bucket checksums — (bucket, n_rows, checksum) keyed by a
    PORTABLE md5-derived bucket of ``key_col`` (not Spark's murmur3, so
    any engine can recompute the same buckets). When two replicas'
    table checksums disagree, comparing these 64 rows localizes the
    divergence to keys ~1/64th of the table, recursively — the
    pt-table-sync drill-down, still one narrow aggregate per level."""
    use = cols if cols is not None else list(df.columns)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(int(n_buckets)),
    ).alias("bucket")
    fp = row_fingerprint(use).cast("decimal(38,0)")
    return (
        df.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(fp).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
        .orderBy("bucket")
    )


def sequence_gaps(
    df: DataFrame,
    key_col: str,
    seq_col: str,
    expected_start: int | None = None,
) -> DataFrame:
    """Binlog/WAL continuity audit: per stream partition, report every
    hole in what should be a dense event-sequence — the standard check
    a CDC tail runs before trusting a replica (a lost WAL segment or a
    dropped producer batch shows up as a seq gap long before the table
    checksums diverge).

    Output: one row per hole — ``(key, gap_start, gap_end, n_missing)``
    where [gap_start, gap_end] are the missing sequence numbers between
    two observed neighbors. ``expected_start`` additionally reports a
    leading hole when a partition's first observed seq is above it.
    Duplicated sequence numbers are NOT gaps (LWW absorbs re-delivery;
    seq - lag(seq) = 0 rows pass the > 1 test) and never produce
    negative holes.

    Scale shape: ONE keyed exchange — the window is partitioned by the
    stream-partition key and ordered by seq, so each partition's audit
    is a single sorted pass; there is no global sort and no driver
    state. At 10^10 events over ~10^3 partitions each task streams its
    own partition. Reference analog: the reference trusts transactional
    inserts (pg_db.py insert-RETURNING) and never audits continuity;
    a log-tailing engine must.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(seq_col)
    prev = F.lag(seq_col).over(w)
    seq = F.col(seq_col).cast("long")
    base = df.select(key_col, F.col(seq_col).cast("long").alias(seq_col))
    gaps = (
        base.select(
            key_col,
            prev.alias("_prev"),
            seq.alias("_cur"),
        )
        .where(F.col("_cur") - F.col("_prev") > 1)
        .select(
            key_col,
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col("_cur") - 1).alias("gap_end"),
            (F.col("_cur") - F.col("_prev") - 1).alias("n_missing"),
        )
    )
    if expected_start is not None:
        lead = (
            base.groupBy(key_col)
            .agg(F.min(seq_col).alias("_first"))
            .where(F.col("_first") > int(expected_start))
            .select(
                key_col,
                F.lit(int(expected_start)).cast("long").alias("gap_start"),
                (F.col("_first") - 1).alias("gap_end"),
                (F.col("_first") - int(expected_start)).alias("n_missing"),
            )
        )
        gaps = gaps.unionByName(lead)
    return gaps
