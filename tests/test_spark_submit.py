"""Cluster packaging (north rule: "run via spark-submit --py-files on a
multi-executor cluster"): build the --py-files zip fresh, copy the job
script OUT of the repo so the package can only come from the zip, and
run a real `spark-submit --master local[4]` CDC ingest end-to-end,
checking the emitted lineage JSON and final-state parity vs the
single-threaded replay oracle."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, ROOT)
    from jobs.package import main as build_zip
    from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files

    zip_path = build_zip(str(tmp_path / "tiger_etl_spark.zip"))
    changes = str(tmp_path / "changes")
    ev = gen_change_events(seed=7, n=1500, n_hosts=30)
    n_events = len(ev["url"])
    write_change_files(ev, changes, n_files=3)

    # run from OUTSIDE the repo: the job script's repo-root fallback
    # can't fire, so every tiger_etl_spark import resolves via the zip
    job = str(tmp_path / "cdc_ingest.py")
    shutil.copyfile(os.path.join(ROOT, "jobs", "cdc_ingest.py"), job)
    table = str(tmp_path / "pages")
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job,
            "--changes", changes,
            "--table", table,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--buckets", "4",
            "--max-files-per-trigger", "1",
            "--history-path", str(tmp_path / "hist"),
            "--history-attrs", "lang",
            # WAP gate through the packaged job: clean stream must
            # publish every batch
            "--audit", "null(url)<=0,delta<=50",
            "--audit-policy", "quarantine",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert out, proc.stdout[-2000:]
    result = json.loads(out[-1])
    assert result["batches_applied"] == 3
    assert result["batches_rejected"] == 0
    # write_change_files injects ~1% WAL-replay duplicates into the
    # next file; rows_in counts them (the LWW merge absorbs them)
    assert n_events <= result["rows_in"] <= int(n_events * 1.05)

    # final-state parity vs the single-threaded replay oracle
    from tiger_etl_spark.cdc import oracle
    from tiger_etl_spark.lake import LakeTable

    expected = oracle.replay_dir(changes)
    spark = _get_session()
    rows = {r["url"]: r for r in LakeTable.load(table).scan(spark).collect()}
    assert set(rows) == set(expected)
    n_text = 0
    for url, e in expected.items():
        r = rows[url]
        got_html = bytes(r["html"]) if r["html"] is not None else None
        assert got_html == e["html"], url
        assert r["text"] == e["text"], url
        n_text += r["text"] is not None
    assert n_text > 0

    # the --history-path SCD2 table must equal the full recompute over
    # the deduped change log (an event IS its unique op_seq)
    from tiger_etl_spark.cdc.history import read_history
    from tiger_etl_spark.cdc.sources import read_change_batch
    from tiger_etl_spark.operators.scd import scd2_history

    full_log = (
        read_change_batch(spark, changes)
        .where("warc_ts is not null")
        .dropDuplicates(["op_seq"])
    )
    exp_hist = scd2_history(
        full_log, ["url"], ["lang"], "warc_ts", tiebreak_cols=["op_seq"]
    )
    canon = lambda df: {
        (r.url, r.version_idx): (r.lang, r.valid_from, r.valid_to,
                                 r.is_current, r.n_rows)
        for r in df.collect()
    }
    got_hist = read_history(spark, LakeTable.load(str(tmp_path / "hist")))
    assert canon(got_hist.select(exp_hist.columns)) == canon(exp_hist)


def _get_session():
    from tiger_etl_spark.session import get_spark

    return get_spark("test-submit-check", cores=4, shuffle_partitions=4)
