"""Schema validation & conformance (SURVEY.md §1.2 — the checking the
reference never does)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.schema import (
    SchemaMismatchError,
    conform_schema,
    schema_diff,
    validate_schema,
)


def test_validate_pass_and_column_order(spark):
    df = spark.createDataFrame([("x", 1)], "b string, a bigint").select("b", "a")
    out = validate_schema(df, "a BIGINT, b STRING")
    assert out.columns == ["a", "b"]  # normalized to declaration order


def test_validate_missing_and_mistyped(spark):
    df = spark.createDataFrame([(1, 2)], "a bigint, c bigint")
    with pytest.raises(SchemaMismatchError) as e:
        validate_schema(df, "a BIGINT, b STRING")
    msg = str(e.value)
    assert "missing column: b" in msg and "unexpected column: c" in msg
    df2 = spark.createDataFrame([("1",)], "a string")
    diff = schema_diff(df2, "a BIGINT")
    assert diff == ["type mismatch: a is string, expected bigint"]


def test_validate_allow_extra_drops(spark):
    df = spark.createDataFrame([(1, "x", 9.9)], "a bigint, b string, extra double")
    out = validate_schema(df, "a BIGINT, b STRING", allow_extra=True)
    assert out.columns == ["a", "b"]


def test_conform_adds_nulls_and_casts(spark):
    df = spark.createDataFrame([("5", "x")], "a string, extra string")
    out = conform_schema(df, "a BIGINT, b STRING")
    row = out.first()
    assert out.columns == ["a", "b"]
    assert row.a == 5 and row.b is None
    with pytest.raises(SchemaMismatchError):
        conform_schema(df, "a BIGINT, b STRING", strict_extra=True)


def test_pipeline_fails_table_on_schema_drift(spark, tmp_path):
    from etl_data_pipeline_spark.pipeline import IncrementalPipeline
    from etl_data_pipeline_spark.spec import PipelineSpec, TableSpec
    from etl_data_pipeline_spark.watermark import WatermarkStore

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "x")], "id long, v string").write.parquet(
        os.path.join(src, "t.parquet")
    )
    spec = PipelineSpec(
        tables=[
            TableSpec(
                name="t",
                source_options={"dir": src},
                sink_options={"dir": str(tmp_path / "sink")},
                expected_schema="id BIGINT, v STRING, missing_col DOUBLE",
            )
        ]
    )
    pipe = IncrementalPipeline(spark, spec, WatermarkStore(str(tmp_path / "s.json")))
    (res,) = pipe.run()
    assert res.status == "failed"
    assert "missing column: missing_col" in res.error
    assert not os.path.exists(os.path.join(str(tmp_path / "sink"), "t"))
