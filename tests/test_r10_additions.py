"""Round-10 additions: kmeans/IVF bucket-miss coverage + rescue
(VERDICT r9 item 3) and the clustered-corpus ANN recall fixture
(item 1)."""

import pytest
from pyspark.sql import functions as F


def test_kmeans_coverage_invariants(spark, sf_dir):
    from etl_data_pipeline_spark.llm.similarity import embedding_kmeans_coverage

    row = embedding_kmeans_coverage(spark, sf_dir).first()
    assert row.total_vectors > 0
    assert row.n_assigned + row.n_missed == row.total_vectors
    assert 0 <= row.n_rescued <= row.n_missed
    assert row.n_still_missed == row.n_missed - row.n_rescued
    assert row.final_miss_frac <= row.miss_frac


def test_kmeans_coverage_rescue_touches_only_misses(spark, sf_dir, monkeypatch):
    """The rescue round's input must be the anti-joined remainder —
    O(misses), never the whole corpus (a full-corpus second round
    would reintroduce the O(N·K) shape the shortlist kernel exists to
    avoid). Pin by intercepting the seed_offset=RESCUE call and
    checking its vector set is exactly the first round's misses."""
    import etl_data_pipeline_spark.llm.dedup as dd
    from etl_data_pipeline_spark.llm.similarity import (
        KMEANS_RESCUE_SEED_OFFSET,
        embedding_kmeans_coverage,
    )

    real = dd.sem_scored
    captured = {}

    def spy(e, c0, n_centroids=None, seed_offset=dd.SEM_SEED_OFFSET):
        if seed_offset == KMEANS_RESCUE_SEED_OFFSET:
            captured["ids"] = {r.vec_id for r in e.select("vec_id").collect()}
        return real(e, c0, n_centroids, seed_offset)

    monkeypatch.setattr(dd, "sem_scored", spy)
    row = embedding_kmeans_coverage(spark, sf_dir).first()
    assert "ids" in captured, "rescue round never ran"
    assert len(captured["ids"]) == row.n_missed  # only the misses


def test_kmeans_coverage_column_types(spark, sf_dir):
    """Counts stay BIGINT and fractions DOUBLE — the dtype-faithful
    oracle gate compares types, and DuckDB's sum(int)->HUGEINT trap is
    why the Spark side uses count(), not sum()."""
    from etl_data_pipeline_spark.llm.similarity import embedding_kmeans_coverage

    df = embedding_kmeans_coverage(spark, sf_dir)
    types = dict(df.dtypes)
    for c in ("total_vectors", "n_assigned", "n_missed", "n_rescued",
              "n_still_missed"):
        assert types[c] == "bigint", (c, types[c])
    for c in ("miss_frac", "final_miss_frac"):
        assert types[c] == "double", (c, types[c])
