"""Web-scale document deduplication (training-data pipeline operators).

Not present in the reference (its dedup is keyed uniqueness probes,
SURVEY.md §2.3 J3); these are the content-level equivalents a 100 TB
text corpus needs: exact (hash groupBy), MinHash+LSH (shingle → minhash
→ band → bucket join), SimHash, and n-gram Jaccard verification.

Portability: hashes are md5-based (identical in Spark and DuckDB), so
the driver's SQL oracle can reproduce signatures bit-for-bit. Everything
is JVM-side higher-order functions — no Python in the row loop; the
only shuffles are the groupBy(doc) for signatures and the band-bucket
self-join for candidates (both key-partitioned, broadcast-free, and
linear in corpus size — the point of LSH at 100 TB is that it never
compares all pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles (empty when the doc has < k words).
    Guarded: `sequence(1, 0)` steps DOWNWARD in Spark, which would feed
    slice() an invalid 0 index for short docs."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    w = _words(text)
    return F.transform(
        guarded_positions(F.size(w) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5 of normalized text → group; returns one row per
    duplicate-group with the keeper (min id) and group size. Plain
    hash aggregation — partial combine map-side, fully scalable."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.col(id_col), F.md5(norm).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("group_size"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: for each of `n_hashes` seeded hash
    functions, the min md5 over the doc's k-word shingles. One explode +
    one groupBy(doc) with n_hashes min-aggregations (associative → no
    skew). Docs with < k words have no shingles and drop out."""
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("sh")))).alias(f"mh{h}")
        for h in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Band the signature (bands × rows), bucket-join docs sharing any
    band hash → candidate pairs (a < b) with estimated Jaccard = matching
    minhash fraction. The self-join is on (band_id, band_hash) — a
    key-partitioned shuffle whose fan-out is bucket sizes, never n²."""
    rows = n_hashes // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = signatures.select(id_col, *[F.col(f"mh{h}") for h in range(n_hashes)], *band_cols)
    exploded = banded.select(
        id_col,
        *[F.col(f"mh{h}") for h in range(n_hashes)],
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "band_id", "band_hash"
        ),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[
                (F.col(f"a.mh{h}") == F.col(f"b.mh{h}")).cast("int").alias(f"eq{h}")
                for h in range(n_hashes)
            ],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = sum(F.col(f"eq{h}") for h in range(n_hashes)) / F.lit(float(n_hashes))
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


def distinct_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, shingle) distinct pairs — the shared intermediate of the
    Jaccard verify; persist it when several operators run over the same
    corpus (signatures, banding and verification all derive from it)."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh"),
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact k-word-shingle Jaccard for candidate pairs (the verify step
    after LSH): join each side to its distinct shingle set, count
    intersection / union. Shuffles are by doc id and shingle — linear.
    Pass a persisted `shingles` (from `distinct_shingles`) to reuse the
    explode across operators."""
    sh = shingles if shingles is not None else distinct_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    shared = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a"), "id_a")
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("_sh_b")),
            "id_b",
        )
        .where(F.col("sh") == F.col("_sh_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs.join(shared, ["id_a", "id_b"], "left")
        .fillna(0, subset=["n_shared"])
        .join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
            # exact integer counts alongside the double ratio, so callers
            # that need an engine-exact comparable output (the oracle
            # gate) can derive integer ppm instead of rounding a double
            F.col("n_shared").cast("long").alias("n_shared"),
            (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            .cast("long")
            .alias("n_union"),
        )
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: for every corpus doc, the fraction of
    its distinct k-word shingles that appear anywhere in the benchmark
    set. Docs above a threshold are eval-set leaks and get dropped from
    training data.

    Shape: corpus shingles LEFT SEMI JOIN benchmark shingles on the
    shingle key — linear in corpus + benchmark size, shuffles keyed by
    shingle (never doc×doc); a small benchmark side broadcasts
    automatically. Docs with < k words have no shingles → overlap 0.

    Pass `shingles` (a persisted `distinct_shingles` table over the
    UNION of both sets) to reuse the explode: the corpus/benchmark
    split then happens by doc-id semi/anti joins against the benchmark
    id list instead of re-shingling."""
    if shingles is not None:
        b_ids = benchmark.select(id_col).distinct()
        c_sh = shingles.join(b_ids, id_col, "left_anti")
        b_sh = (
            shingles.join(b_ids, id_col, "left_semi").select("sh").distinct()
        )
    else:
        c_sh = distinct_shingles(corpus, id_col, text_col, k)
        b_sh = (
            distinct_shingles(benchmark, id_col, text_col, k)
            .select("sh")
            .distinct()
        )
    sizes = c_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        c_sh.join(b_sh, "sh", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n_hit"))
    )
    base = corpus.select(id_col).distinct()
    return (
        base.join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.coalesce("_n_hit", F.lit(0))
                / F.col("n_shingles").cast("double"),
            )
            .otherwise(0.0)
            .alias("overlap"),
            # exact hit count for integer-ppm comparable outputs
            F.coalesce("_n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over verified duplicate pairs → one row per
    member doc with its cluster id (the min doc id in the component) —
    the grouping step that turns pairwise near-dup matches into
    keep-one-per-cluster decisions.

    Two regimes, chosen by edge count (one cheap scalar job):

    - ≤ `small_graph_threshold` edges: union-find on the driver. The
      VERIFIED near-dup edge list is tiny relative to the corpus (LSH
      banding + Jaccard/cosine verification has already pruned it), so
      collecting bare (long, long) edge pairs is bounded driver work —
      ~16 MB at the default threshold — while skipping the per-round
      fixed job latency that dominates the iterative path on small
      graphs.
    - above it: large-star/small-star edge contraction
      (`graph.components` — Kiveris et al., "Connected Components in
      MapReduce and Beyond"): O(log n) rounds regardless of component
      diameter, so an adversarial chain-shaped duplicate graph (each
      doc near-dup of the next) converges where plain min-label
      propagation would need diameter rounds. Near-dup components are
      overwhelmingly pairs/triples, so 1-2 rounds in practice; driver
      state is one edge fingerprint per round.
    """
    spark = pairs.sparkSession
    edges_slim = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    # regime probe and small-graph fetch in ONE action: collecting
    # threshold+1 rows (CollectLimit stops early on big graphs) both
    # decides the regime and, in the small case, already delivers every
    # edge — the verified-pairs lineage above is the expensive part and
    # must not run twice (count + collect)
    probe = edges_slim.limit(small_graph_threshold + 1).collect()
    if len(probe) <= small_graph_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        nodes: set[int] = set()
        for r in probe:
            a, b = r["src"], r["dst"]
            nodes.add(a)
            nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min so the root IS the min id of the component
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        return spark.createDataFrame(
            sorted((n, find(n)) for n in nodes), "doc_id long, cluster_id long"
        )
    from tiger_etl_spark.operators.graph import components as _components

    # distributed regime: star contraction (log-round convergence; the
    # non-convergence raise lives inside components()). The union-find
    # regime was already rejected above, so skip components()' own probe.
    labels = _components(
        edges_slim, "src", "dst", max_iter=max_iter, small_graph_threshold=0
    )
    return labels.select(
        F.col("node_key").alias("doc_id"),
        F.col("component").alias("cluster_id"),
    )


def line_segments(text: Column, sep: str = "\n") -> Column:
    """Array of struct(pos, seg): the document's lines (split on `sep`,
    trailing empties kept — Spark's split(limit=-1) and DuckDB's
    string_split agree on this)."""
    parts = F.split(text, sep, -1)
    return F.transform(
        parts,
        lambda s, i: F.struct(i.alias("pos"), s.alias("seg")),
    )


def word_chunk_segments(text: Column, width: int = 8) -> Column:
    """Array of struct(pos, seg): non-overlapping `width`-word chunks of
    the whitespace-tokenized text (the MassiveText-style segmentation
    when a corpus carries no newline structure). Guarded against the
    downward-stepping `sequence(0, -1)` for empty texts."""
    w = F.split(F.trim(text), r"\s+")
    n_chunks = F.ceil(F.size(w) / F.lit(width)).cast("int")
    return F.when(
        n_chunks < 1,
        F.array().cast("array<struct<pos:int,seg:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.concat_ws(" ", F.slice(w, i * width + 1, width)).alias("seg"),
            ),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    segments: Column | None = None,
    min_docs: int = 2,
    joiner: str = "\n",
) -> DataFrame:
    """Corpus-level segment deduplication — the CCNet/Dolma "line dedup"
    pass: a segment is *duplicated* when its exact form appears in at
    least `min_docs` distinct documents; every document is rebuilt
    keeping only its non-duplicated segments in original order.

    `segments` is an array<struct<pos,seg>> column expression over
    `text_col` (default `line_segments` = true newline splitting; pass
    `word_chunk_segments(...)` for corpora without line structure).

    Returns (id_col, n_segments, n_dup_segments, clean_text); clean_text
    is NULL when every segment was dropped. NULL texts are excluded.

    Scale shape (all linear, no driver collect, nothing broadcast):
    one explode (narrow), one distinct + count shuffle keyed on the
    segment (boilerplate segments repeated across millions of pages are
    single groups of an associative count — no skew pathology), one
    shuffle join of exploded segments against the over-threshold segment
    set (1 row per key on the build side; AQE splits skewed probe keys),
    and one groupBy(doc) rebuild. The duplicated-segment set is a
    corpus-scale table — it is joined, never collected/broadcast.
    """
    seg_expr = segments if segments is not None else line_segments(F.col(text_col))
    segs = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(seg_expr).alias("s")
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))
    dup = (
        segs.select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("seg", F.lit(True).alias("_dup"))
    )
    flagged = segs.join(dup, "seg", "left").select(
        id_col,
        "pos",
        "seg",
        F.coalesce(F.col("_dup"), F.lit(False)).alias("_dup"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("_dup"), F.struct(F.col("pos"), F.col("seg")))
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.col("_dup").cast("long")).alias("n_dup_segments"),
            kept.alias("_kept"),
        )
        .select(
            id_col,
            "n_segments",
            "n_dup_segments",
            F.when(
                F.size("_kept") > 0,
                F.concat_ws(joiner, F.transform(F.col("_kept"), lambda s: s["seg"])),
            ).alias("clean_text"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash over word tokens: token hash bits vote ±1 per
    position; sign of the sum forms the fingerprint. md5-derived token
    hash (first 60 bits) so the value is engine-portable in principle.
    One explode + one groupBy with `bits` conditional sums."""
    tok = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    ).where(F.length("w") > 0)
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    tok = tok.withColumn("_h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    fingerprint = sum(
        F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0)) for j in range(bits)
    )
    return agg.select(F.col(id_col), fingerprint.cast("long").alias("simhash"))


def simhash_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ `max_hamming`,
    found with a banded self-join instead of all-pairs comparison.

    The fingerprint is cut into `bands` contiguous bit-slices; two
    fingerprints within `max_hamming` < `bands` bit flips must agree on
    at least one slice (pigeonhole), so joining on (band_id, slice
    value) finds EVERY qualifying pair — the band join is a pruning
    step, not an approximation, and the Hamming filter afterwards makes
    the result exact. Shuffle is keyed by slice value: fan-out is
    bucket sizes (corpus-linear for non-degenerate fingerprints),
    never n². This is the Manku/Jain/Sarma web-dedup layout expressed
    as one DataFrame self-join.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"banded pruning is exact only for max_hamming < bands "
            f"({max_hamming} >= {bands})"
        )
    width = bits // bands
    mask = (1 << width) - 1
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("int")
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022
    "Deduplicating Training Data…" primitive, distributed): every
    maximal character span of a document whose k-char windows ALL occur
    more than once in the corpus. Used to excise boilerplate and
    benchmark contamination without dropping whole documents.

    Plan (all linear, all keyed):
      1. k-char rolling windows with positions — per-row higher-order
         functions, no shuffle, no Python;
      2. window occurrence counts on 64-bit xxhash64 window hashes
         (hash agg, map-side combined) → the duplicated-hash set. The
         hash never leaves the plan (output is character spans), so the
         cheapest collision-free-in-practice hash wins: xxhash64 is
         ~10× cheaper than md5 per window and aggregates as a long, and
         at 10^12 windows the 64-bit birthday bound predicts ~10¹
         colliding pairs corpus-wide — a per-window false-duplicate
         rate ~10⁻¹¹, invisible against the ≥k-char span threshold;
      3. semi-join windows against duplicated hashes (AQE handles the
         skew of a globally common window);
      4. gaps-and-islands merge per document: consecutive duplicated
         positions ≤ k apart overlap/abut, so island starts are
         `pos − lag(pos) > k`; islands → (span_start, span_end).
         The only sort is per-document (partitioned window).

    Suffix arrays find variable-length maximal repeats; fixed-k windows
    find the same spans down to resolution k (a span shorter than k is
    invisible, a real one is trimmed by < k chars at each edge) — the
    standard large-scale approximation. Returns
    (id, span_start 1-based, span_end inclusive, span_chars)."""
    # sequence(1, 0) steps DOWNWARD in Spark — texts shorter than k are
    # filtered out instead (they have no k-char window at all)
    win = F.expr(
        f"transform(sequence(1, length({text_col}) - {k} + 1), "
        f"i -> struct(i AS pos, xxhash64(substring({text_col}, i, {k})) AS h))"
    )
    shingled = (
        df.where(F.length(text_col) >= k)
        .select(F.col(id_col), F.explode(win).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )
    dup_hashes = (
        shingled.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("h")
    )
    dup_pos = shingled.join(dup_hashes, "h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup_pos.withColumn(
            "_new",
            F.when(
                F.col("pos") - F.lag("pos").over(w) > F.lit(k), 1
            ).otherwise(F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0)),
        )
        .withColumn("_island", F.sum("_new").over(w))
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_chars"),
        )
    )
