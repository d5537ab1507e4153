"""SCD2 history sink + quarantine-read contract tests."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.sinks import scd2_upsert_parquet
from etl_data_pipeline_spark.sources import read_with_quarantine, write_quarantine


def _rows(spark, path):
    return {
        (r.k, r.v, str(r["__valid_from"]), str(r["__valid_to"]), r["__is_current"])
        for r in spark.read.parquet(path).collect()
    }


def test_scd2_tracks_history_and_is_replay_idempotent(spark):
    with tempfile.TemporaryDirectory() as tmp:
        opts = {"dir": tmp}
        path = os.path.join(tmp, "dim")

        b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        scd2_upsert_parquet(spark, b1, "dim", opts, ("k",), "2026-01-01 00:00:00")
        out1 = spark.read.parquet(path)
        assert out1.count() == 2 and out1.filter("__is_current").count() == 2

        # batch 2: k=1 changes, k=2 unchanged, k=3 new
        b2 = spark.createDataFrame([(1, "A"), (2, "b"), (3, "c")], "k long, v string")
        scd2_upsert_parquet(spark, b2, "dim", opts, ("k",), "2026-02-01 00:00:00")
        out2 = spark.read.parquet(path)
        cur = {(r.k, r.v) for r in out2.filter("__is_current").collect()}
        assert cur == {(1, "A"), (2, "b"), (3, "c")}
        hist = {(r.k, r.v, str(r["__valid_to"])) for r in out2.filter("NOT __is_current").collect()}
        assert hist == {(1, "a", "2026-02-01 00:00:00")}
        # unchanged row kept its ORIGINAL valid_from (no spurious version)
        k2 = out2.filter("k = 2").collect()
        assert len(k2) == 1 and str(k2[0]["__valid_from"]) == "2026-01-01 00:00:00"

        # replaying batch 2 with the same ts is a no-op
        before = _rows(spark, path)
        scd2_upsert_parquet(spark, b2, "dim", opts, ("k",), "2026-02-01 00:00:00")
        assert _rows(spark, path) == before


def test_scd2_nullsafe_change_detection(spark):
    """NULL -> value and value -> NULL are CHANGES; NULL -> NULL is not."""
    with tempfile.TemporaryDirectory() as tmp:
        opts = {"dir": tmp}
        path = os.path.join(tmp, "dim")
        b1 = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "k long, v string")
        scd2_upsert_parquet(spark, b1, "dim", opts, ("k",), "2026-01-01 00:00:00")
        b2 = spark.createDataFrame([(1, "now"), (2, None), (3, None)], "k long, v string")
        scd2_upsert_parquet(spark, b2, "dim", opts, ("k",), "2026-02-01 00:00:00")
        out = spark.read.parquet(path)
        assert out.filter("NOT __is_current").count() == 2  # k=1, k=2 closed
        k3 = out.filter("k = 3").collect()
        assert len(k3) == 1 and k3[0]["__is_current"]  # NULL->NULL: untouched


def test_quarantine_splits_malformed_csv(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.csv")
        qdir = os.path.join(tmp, "quarantine")
        with open(src, "w") as f:
            f.write("k,v\n1,alpha\nnot_a_number,beta\n3,gamma\n")
        good, bad = read_with_quarantine(spark, "csv", src, "k LONG, v STRING")
        assert bad.count() == 1
        assert {(r.k, r.v) for r in good.collect()} == {(1, "alpha"), (3, "gamma")}
        write_quarantine(bad, qdir)
        quarantined = spark.read.text(qdir).collect()
        assert len(quarantined) == 1 and "not_a_number" in quarantined[0].value


def test_quarantine_splits_malformed_json(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.json")
        with open(src, "w") as f:
            f.write('{"k": 1, "v": "a"}\n{broken json\n{"k": 2, "v": "b"}\n')
        good, bad = read_with_quarantine(spark, "json", src, "k LONG, v STRING")
        assert bad.count() == 1
        assert {(r.k, r.v) for r in good.collect()} == {(1, "a"), (2, "b")}


def test_quarantine_read_is_lazy(spark):
    # the reader must not run ANY Spark job: tag a job group around the
    # call and assert the group stays empty (an eager count/write in
    # the read path would register a job under it)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "in.csv")
        with open(src, "w") as f:
            f.write("k,v\n1,alpha\nbad,beta\n")
        sc = spark.sparkContext
        sc.setJobGroup("quarantine-lazy-probe", "laziness probe")
        try:
            good, bad = read_with_quarantine(spark, "csv", src, "k LONG, v STRING")
            jobs = sc.statusTracker().getJobIdsForGroup("quarantine-lazy-probe")
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert list(jobs) == []
        # frames still compute correctly once the CALLER acts
        assert good.count() == 1 and bad.count() == 1


def test_quarantine_rejects_unsupported_format(spark):
    with pytest.raises(ValueError, match="csv/json"):
        read_with_quarantine(spark, "parquet", "/nope", "k LONG")
