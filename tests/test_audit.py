"""Replica-consistency checksums: order/partitioning invariance,
sensitivity, and source-vs-lake parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiger_etl_spark.operators import audit


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_checksum_invariant_under_order_and_partitioning(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}", i % 7) for i in range(500)], "id long, name string, g int"
    )
    base = _rows(audit.table_checksum(df))[0]
    shuffled = _rows(
        audit.table_checksum(df.orderBy(F.desc("name")).repartition(13))
    )[0]
    assert base == shuffled
    assert base["n_rows"] == 500


def test_checksum_detects_single_cell_change(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "id long, v string")
    ca = _rows(audit.table_checksum(a))[0]
    cb = _rows(audit.table_checksum(b))[0]
    assert ca["n_rows"] == cb["n_rows"]
    assert ca["checksum"] != cb["checksum"]


def test_checksum_null_vs_empty_string_differ(spark):
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    assert (
        _rows(audit.table_checksum(a))[0]["checksum"]
        != _rows(audit.table_checksum(b))[0]["checksum"]
    )


def test_bucket_checksums_localize_divergence(spark):
    a = spark.createDataFrame(
        [(i, f"v{i}") for i in range(300)], "id long, v string"
    )
    b = spark.createDataFrame(
        [(i, "CHANGED" if i == 137 else f"v{i}") for i in range(300)],
        "id long, v string",
    )
    ca = {r["bucket"]: r["checksum"] for r in audit.bucket_checksums(a, "id", n_buckets=16).collect()}
    cb = {r["bucket"]: r["checksum"] for r in audit.bucket_checksums(b, "id", n_buckets=16).collect()}
    diff = [k for k in ca if ca[k] != cb.get(k)]
    assert len(diff) == 1  # exactly the bucket holding id=137


def test_checksum_matches_between_source_and_merged_lake(spark, tmp_path):
    """The actual audit use: source rows vs the CDC-merged lake table
    must checksum identically on the shared columns."""
    import glob
    import os

    from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files
    from tiger_etl_spark.cdc import oracle
    from tiger_etl_spark.cdc.pipeline import apply_changes, create_pages_table
    from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA

    cdir = str(tmp_path / "changes")
    ev = gen_change_events(seed=7, n=1200, n_hosts=30)
    write_change_files(ev, cdir, n_files=3)
    table = create_pages_table(str(tmp_path / "pages"), num_buckets=4)
    for i, p in enumerate(sorted(glob.glob(os.path.join(cdir, "*.parquet")))):
        apply_changes(
            spark, table, spark.read.schema(EVENTS_READ_SCHEMA).parquet(p), batch_id=i
        )
    expected = oracle.replay_dir(cdir)
    ref = spark.createDataFrame(
        [(u, e["text"]) for u, e in expected.items()], "url string, text string"
    )
    got = table.scan(spark).select("url", "text")
    cols = ["url", "text"]
    assert (
        _rows(audit.table_checksum(ref, cols))[0]
        == _rows(audit.table_checksum(got, cols))[0]
    )


def test_sequence_gaps_reports_holes_per_partition(spark):
    from tiger_etl_spark.operators.audit import sequence_gaps

    rows = (
        # partition a: 0,1,2, 5,6, 9  -> gaps [3,4] and [7,8]
        [("a", s) for s in (0, 1, 2, 5, 6, 9)]
        # partition b: dense 0..4 -> no gaps
        + [("b", s) for s in range(5)]
        # partition c: duplicates must NOT be gaps; 0,0,1,3 -> gap [2,2]
        + [("c", s) for s in (0, 0, 1, 3)]
    )
    df = spark.createDataFrame(rows, "pkey string, seq long")
    got = sorted(
        (r["pkey"], r["gap_start"], r["gap_end"], r["n_missing"])
        for r in sequence_gaps(df, "pkey", "seq").collect()
    )
    assert got == [("a", 3, 4, 2), ("a", 7, 8, 2), ("c", 2, 2, 1)]


def test_sequence_gaps_expected_start_leading_hole(spark):
    from tiger_etl_spark.operators.audit import sequence_gaps

    df = spark.createDataFrame(
        [("a", 4), ("a", 5), ("b", 0), ("b", 1)], "pkey string, seq long"
    )
    got = sorted(
        (r["pkey"], r["gap_start"], r["gap_end"], r["n_missing"])
        for r in sequence_gaps(df, "pkey", "seq", expected_start=0).collect()
    )
    # a starts at 4 -> leading hole [0,3]; b starts at 0 -> nothing
    assert got == [("a", 0, 3, 4)]


def test_sequence_gaps_single_keyed_exchange(spark):
    """Scale guard: the audit is one keyed window — no global sort, no
    extra exchange beyond the partition-key shuffle."""
    from tiger_etl_spark.operators.audit import sequence_gaps

    df = spark.createDataFrame(
        [("a", 0), ("a", 2)], "pkey string, seq long"
    )
    plan = sequence_gaps(df, "pkey", "seq")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
