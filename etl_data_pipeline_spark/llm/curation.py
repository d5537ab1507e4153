"""End-to-end corpus curation pipeline: the LLM-training-data shape
that motivates every operator in llm/ (north-star extension set).

``pipeline_corpus_curation`` composes the engine's own registered
operators — language ID, quality scoring, fingerprinting, exact
dedup — into the canonical pretraining-data filter chain:

    lang-id -> quality threshold -> content dedup -> curated doc set

Each stage is the already-oracle-checked operator, so the composition
is itself exactly SQL-expressible and oracle-checked end-to-end.

Scale: the per-doc stage EXPRESSIONS (lang_guess_col / quality_cols /
md5) are evaluated in one projection over ONE scan of documents.
Composing the stage DataFrames with self-joins on doc_id instead would
scan and re-tokenize the corpus once per stage — Catalyst does not do
cross-self-join common-subexpression elimination (verified via
explain: 3 scans + 2 broadcast joins). The only shuffle is the final
dedup on the content digest — (digest, small cols) pairs, never full
text bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround
from etl_data_pipeline_spark.llm import text_analysis
from etl_data_pipeline_spark.session import load_table

QUALITY_MIN = 0.5


def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated pretraining corpus: docs with identified language and
    quality >= 0.5, exact-deduplicated by content (canonical = min
    doc_id per digest). Single-pass: all stage expressions in one
    projection."""
    docs = load_table(spark, sf_dir, "documents")
    q = text_analysis.quality_cols()
    kept = docs.select(
        "doc_id",
        text_analysis.lang_guess_col().alias("lang_guess"),
        q["n_tokens"].alias("n_tokens"),
        hround(q["quality_score"], 6).alias("quality_score"),
        F.md5("text").alias("content_md5"),
    ).filter(
        (F.col("quality_score") >= QUALITY_MIN) & (F.col("lang_guess") != "unknown")
    )
    w = Window.partitionBy("content_md5").orderBy(F.asc("doc_id"))
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_guess", "n_tokens", "quality_score")
    )


MIX_UPSAMPLE_CAP = 5.0  # never upsample a domain more than 5x


def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing resample weights: per (lang, source) domain, the
    token share of the corpus and the per-document sampling weight
    that moves the mix toward a UNIFORM target over domains
    (weight = target_share / actual_share, capped at 5× upsampling —
    the DoReMi/Pile-style reweighting step a pretraining pipeline runs
    before sampling).

    Two tiny aggregations (domain stats, then a 1-row total broadcast
    back) — the corpus is scanned once; everything after is on the
    |domains|-row relation. The weight column is what a sampler joins
    back (broadcast) against the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    stats = (
        docs.select("lang", "source", F.size(F.split("text", " ")).alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("domain_tokens"))
    )
    totals = stats.agg(
        F.sum("domain_tokens").alias("total_tokens"),
        F.count("*").alias("n_domains"),
    )
    return stats.crossJoin(F.broadcast(totals)).select(
        "lang",
        "source",
        "n_docs",
        "domain_tokens",
        hround(F.col("domain_tokens") / F.col("total_tokens"), 6).alias("token_share"),
        hround(
            F.least(
                (F.col("total_tokens") / F.col("n_domains")) / F.col("domain_tokens"),
                F.lit(MIX_UPSAMPLE_CAP),
            ),
            6,
        ).alias("sample_weight"),
    )


QUERIES = {
    "corpus_mix_weights": corpus_mix_weights,
    "pipeline_corpus_curation": pipeline_corpus_curation,
}

# The oracle is the SAME composition of the per-stage oracles —
# each stage's SQL is reused verbatim as a subquery.
ORACLE = {
    "corpus_mix_weights": f"""
        WITH stats AS (
            SELECT lang, source, count(*) AS n_docs,
                   sum(len(string_split(text, ' '))) AS domain_tokens
            FROM documents GROUP BY lang, source
        ), totals AS (
            SELECT sum(domain_tokens) AS total_tokens, count(*) AS n_domains
            FROM stats
        )
        SELECT lang, source, n_docs, domain_tokens,
               floor(CAST(domain_tokens AS DOUBLE) / total_tokens * 1000000 + 0.5)
                   / 1000000 AS token_share,
               floor(least((CAST(total_tokens AS DOUBLE) / n_domains)
                               / domain_tokens,
                           {MIX_UPSAMPLE_CAP}) * 1000000 + 0.5)
                   / 1000000 AS sample_weight
        FROM stats CROSS JOIN totals
    """,
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
