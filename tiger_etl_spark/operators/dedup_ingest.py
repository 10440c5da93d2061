"""Incremental near-dup deduplication at ingest.

A 100 TB corpus is not deduplicated by re-running MinHash over
everything each time a crawl slice arrives: the per-doc MinHash
signature (plus its LSH band hashes) is computed ONCE, persisted in a
signature index (a `LakeTable` keyed by doc id, maintained through the
same CDC merge path as the corpus itself), and each new batch is probed
against that index — new text is hashed, prior text is never re-read.

Reference analog: the dup-skip path of bulk inserts
(`/root/reference/system/system/database_functions/user_group_management/
user_group_management.py:2366-2400` skips rows whose key already
exists); this operator generalizes "already exists" from exact key
match to near-duplicate content match, which is what a web-crawl ingest
actually needs.

Scale shape:
- The probe scans only (id, sig, bands) from the index — a few hundred
  bytes/doc vs the corpus text; column pruning keeps the scan cheap.
- Candidate generation is an equi-join on (band_id, band_hash): a
  key-partitioned shuffle whose fan-out is band-bucket sizes — linear,
  never n². The batch side is micro-batch sized.
- Jaccard verification needs NO text: it is estimated from the stored
  signatures (fraction of agreeing minhash components, the standard
  MinHash estimator) with a JVM-side `zip_with` — prior documents are
  never re-shingled.
- Decisions and index maintenance are DataFrame ops end-to-end; nothing
  is collected or broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators.dedup import minhash_signatures

# corpus matches outrank within-batch matches; ids stay far below this
_RANK_SCALE = 10**12

SIG_DDL = "sig array<string>, bands array<struct<band_id:int,band_hash:string>>"


def signature_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    minhash: DataFrame | None = None,
) -> DataFrame:
    """(id, sig, bands) per document: the MinHash signature as one array
    column and the LSH band hashes precomputed for the index. Documents
    with < k words cannot form shingles and carry NULL sig/bands — they
    never match anything (trivially unique under this scheme) but stay
    indexable so updates/deletes track them.

    `minhash`: an optional precomputed `minhash_signatures`-shaped table
    (id, mh0..mh{n-1}) covering at least `df`'s ids — pass a persisted
    corpus-wide signature table to avoid re-shingling."""
    rows = n_hashes // bands
    sig = (
        minhash.join(df.select(id_col), id_col, "left_semi")
        if minhash is not None
        else minhash_signatures(df, id_col, text_col, n_hashes, k)
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    with_sig = sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{h}") for h in range(n_hashes)]).alias("sig"),
        band_arr.alias("bands"),
    )
    return df.select(id_col).join(with_sig, id_col, "left")


def _explode_bands(sigs: DataFrame, id_col: str) -> DataFrame:
    return sigs.where(F.col("bands").isNotNull()).select(
        F.col(id_col), "sig", F.explode("bands").alias("_b")
    ).select(
        id_col, "sig", F.col("_b.band_id").alias("band_id"),
        F.col("_b.band_hash").alias("band_hash"),
    )


def incremental_candidates(
    batch_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Candidate near-dup matches for a new batch against the already-
    ingested corpus AND earlier rows of the same batch (keep-earliest
    within batch; a doc updating its own prior version never matches
    itself). Returns (new_id, match_id, match_rank, est_jaccard) where
    match_rank 0 = corpus, 1 = within-batch, and est_jaccard is the
    signature-agreement MinHash estimate in [0, 1]."""
    nb = _explode_bands(batch_sigs, id_col)
    prior = _explode_bands(corpus_sigs, id_col).select(
        F.col(id_col), "sig", "band_id", "band_hash", F.lit(0).alias("_rank")
    ).unionByName(
        nb.select(
            F.col(id_col), "sig", "band_id", "band_hash", F.lit(1).alias("_rank")
        )
    )
    n, p = nb.alias("n"), prior.alias("p")
    idn, idp = F.col(f"n.{id_col}"), F.col(f"p.{id_col}")
    cand = (
        n.join(
            p,
            (F.col("n.band_id") == F.col("p.band_id"))
            & (F.col("n.band_hash") == F.col("p.band_hash"))
            & (
                ((F.col("p._rank") == 0) & (idp != idn))
                | ((F.col("p._rank") == 1) & (idp < idn))
            ),
        )
        .select(
            idn.alias("new_id"),
            idp.alias("match_id"),
            F.col("p._rank").alias("match_rank"),
            F.col("n.sig").alias("_sa"),
            F.col("p.sig").alias("_sb"),
        )
        .dropDuplicates(["new_id", "match_id", "match_rank"])
    )
    agree = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)
    )
    return cand.select(
        "new_id",
        "match_id",
        "match_rank",
        (agree / F.size("_sa")).alias("est_jaccard"),
    )


def dedup_decisions(
    batch_sigs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Per batch doc: (id, is_dup, matched_id). A doc is a duplicate
    when some corpus doc, or an earlier doc of the same batch, matches a
    band AND the signature-estimated Jaccard >= threshold. matched_id is
    deterministic: corpus matches win over within-batch, lowest id wins
    within a rank (NULL when not a duplicate)."""
    cand = incremental_candidates(batch_sigs, corpus_sigs, id_col).where(
        F.col("est_jaccard") >= F.lit(float(threshold))
    )
    best = cand.groupBy("new_id").agg(
        F.min(
            F.col("match_rank") * F.lit(_RANK_SCALE) + F.col("match_id")
        ).alias("_best")
    )
    return batch_sigs.select(id_col).join(
        best, F.col(id_col) == F.col("new_id"), "left"
    ).select(
        id_col,
        F.col("_best").isNotNull().alias("is_dup"),
        (F.col("_best") % F.lit(_RANK_SCALE)).alias("matched_id"),
    )


@dataclass
class IngestDedupStats:
    rows_in: int = 0
    rows_dropped: int = 0
    rows_indexed: int = 0


def create_signature_index(
    path: str,
    id_col: str = "doc_id",
    order_col: str = "ts",
    num_buckets: int = 16,
) -> LakeTable:
    """The persisted signature index: one row per corpus doc, LWW on the
    same (order_col, op_seq) the corpus table merges on, bucketed by doc
    id so index maintenance is a bucket-local merge."""
    return LakeTable.create(
        path,
        f"{id_col} long, {order_col} timestamp, {SIG_DDL}",
        key_col=id_col,
        order_cols=(order_col,),
        num_buckets=num_buckets,
    )


def apply_batch(
    spark: SparkSession,
    index: LakeTable,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    order_col: str,
    threshold: float,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> tuple[DataFrame, IngestDedupStats]:
    """One ingest step: decide near-dups for `batch` (op/op_seq CDC rows)
    against the persisted index, merge the survivors' signatures (and
    tombstones for D rows) into the index, and return the surviving
    batch rows for the caller's own corpus-table merge.

    Policy: an I/U row whose text near-duplicates prior content is
    dropped entirely — it neither lands in the corpus nor the index (an
    update that became a duplicate leaves the existing version in
    place). D rows always pass through (a delete must never be blocked
    by content similarity).

    `batch` must carry one event per id (the CDC pipeline's LWW dedup
    stage guarantees this) — multiple same-key events in one call would
    pool their shingles into a single signature."""
    upserts = batch.where(F.col("op") != "D")
    # persist the expensive subtrees once: without this, the index
    # merge, n_in and n_kept each re-evaluate the full shingle →
    # signature → band-join → decision pipeline (3× the batch cost)
    sigs = signature_rows(upserts, id_col, text_col, n_hashes, bands, k).persist()
    corpus = index.scan(spark).select(id_col, "sig", "bands")
    decisions = dedup_decisions(sigs, corpus, id_col, threshold)
    dropped = decisions.where(F.col("is_dup")).select(id_col)
    survivors = batch.join(dropped, id_col, "left_anti").persist()
    try:
        index_rows = survivors.select(
            "op", "op_seq", id_col, F.col(order_col).alias(order_col)
        ).join(sigs, id_col, "left")
        stats = index.merge(spark, index_rows)
        n_in = batch.count()
        n_kept = survivors.count()
    finally:
        sigs.unpersist()
    # survivors stays persisted: the caller merges it into the corpus
    # table next (and may unpersist afterwards) — dropping the cache
    # here would make that merge re-run the whole decision pipeline
    return survivors, IngestDedupStats(
        rows_in=n_in, rows_dropped=n_in - n_kept, rows_indexed=stats.rows_upserted
    )
