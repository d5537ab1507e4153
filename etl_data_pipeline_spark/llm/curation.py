"""End-to-end corpus curation pipeline: the LLM-training-data shape
that motivates every operator in llm/ (north-star extension set).

``pipeline_corpus_curation`` composes the engine's own registered
operators — language ID, quality scoring, fingerprinting, exact
dedup — into the canonical pretraining-data filter chain:

    lang-id -> quality threshold -> content dedup -> curated doc set

Each stage is the already-oracle-checked operator, so the composition
is itself exactly SQL-expressible and oracle-checked end-to-end.

Scale: the three per-doc stages are shuffle-free columnar transforms
Catalyst collapses into ONE pass over documents (self-joins on doc_id
collapse after projection pruning); the only shuffle is the final
dedup on the content digest — (digest, small cols) pairs, never full
text bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.llm import text_analysis

QUALITY_MIN = 0.5


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated pretraining corpus: docs with identified language and
    quality >= 0.5, exact-deduplicated by content (canonical = min
    doc_id per digest)."""
    lang = text_analysis.text_lang_id(spark, sf_dir).select("doc_id", "lang_guess")
    qual = text_analysis.text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    fp = text_analysis.text_fingerprint(spark, sf_dir).select("doc_id", "content_md5")
    joined = lang.join(qual, "doc_id").join(fp, "doc_id")
    kept = joined.filter(
        (F.col("quality_score") >= QUALITY_MIN) & (F.col("lang_guess") != "unknown")
    )
    w = Window.partitionBy("content_md5").orderBy(F.asc("doc_id"))
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_guess", "n_tokens", "quality_score")
    )


QUERIES = {"pipeline_corpus_curation": pipeline_corpus_curation}

# The oracle is the SAME composition of the per-stage oracles —
# each stage's SQL is reused verbatim as a subquery.
ORACLE = {
    "pipeline_corpus_curation": f"""
        WITH lang AS ({text_analysis.ORACLE["text_lang_id"]}),
        qual AS ({text_analysis.ORACLE["text_quality"]}),
        fp AS ({text_analysis.ORACLE["text_fingerprint"]}),
        joined AS (
            SELECT lang.doc_id, lang.lang_guess, qual.n_tokens,
                   qual.quality_score, fp.content_md5
            FROM lang
            JOIN qual ON lang.doc_id = qual.doc_id
            JOIN fp ON lang.doc_id = fp.doc_id
        ), kept AS (
            SELECT *, row_number() OVER (PARTITION BY content_md5
                          ORDER BY doc_id ASC) AS rn
            FROM joined
            WHERE quality_score >= {QUALITY_MIN} AND lang_guess <> 'unknown'
        )
        SELECT doc_id, lang_guess, n_tokens, quality_score
        FROM kept WHERE rn = 1
    """,
}
