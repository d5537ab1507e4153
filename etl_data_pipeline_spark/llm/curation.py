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

from etl_data_pipeline_spark.functions.caching import tracked_persist
from etl_data_pipeline_spark.functions.rounding import hround
from etl_data_pipeline_spark.llm import text_analysis
from etl_data_pipeline_spark.session import load_table, spread

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


SPLIT_BUCKETS = 100
SPLIT_VAL_BUCKET = 98   # buckets 0-97 train, 98 val, 99 test (98/1/1)
CTX_TOKENS = 512        # packing context length


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (98/1/1) by a salted
    content-independent hash of the document id — the split every
    training pipeline needs to be STABLE across reruns and machines
    (row order, partitioning, and corpus growth must not move a doc
    between splits; a doc keeps its split forever).

    The hash is the engine-portable md5-derived 60-bit integer (same
    arithmetic as the minhash pipeline), salted with a namespace
    string so split buckets are independent of any other id-derived
    bucketing in the pipeline. Map-only — no shuffle, no Python.
    """
    from etl_data_pipeline_spark.functions.hashing import md5_long60

    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long60(F.concat(F.lit("split:"), F.col("doc_id"))) % SPLIT_BUCKETS
    return docs.select(
        "doc_id",
        bucket.alias("split_bucket"),
        F.when(bucket < SPLIT_VAL_BUCKET, "train")
        .when(bucket == SPLIT_VAL_BUCKET, "val")
        .otherwise("test")
        .alias("split"),
    )


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents (in deterministic
    doc_id order, per (lang, source) domain) into fixed CTX_TOKENS
    training windows; each doc gets its sequence id and token offset —
    the document→sample layout step before tokenized shards are
    written.

    Packing is a running token sum per domain: seq_id = floor(
    (cumsum - n_tokens) / CTX) (docs may straddle a boundary — the
    standard concat-then-chunk pretraining layout, not bin packing).
    The DOMAIN is the parallel unit: a cumulative sum is inherently
    sequential, so a single global ordering would serialize the corpus
    through one partition at 100 TB; per-domain windows give
    |domains|-way parallelism and deterministic output. The window
    shuffle on (lang, source) is the only exchange.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.size(F.split("text", " "))
    with_cum = docs.select(
        "doc_id", "lang", "source", toks.alias("n_tokens"),
        F.sum(toks).over(w).alias("cum_tokens"),
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    return with_cum.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        F.floor(start / CTX_TOKENS).cast("long").alias("seq_id"),
        (start % CTX_TOKENS).alias("seq_offset"),
    )


def pipeline_corpus_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL modern pretraining filter chain in one pipeline:

        quality ≥ 0.5 AND lang identified      (heuristic quality)
        AND NOT repetitive (dup-3gram ≤ 0.3)   (Gopher repetition rule)
        AND no PII detected                     (redaction gate)
        AND not benchmark-contaminated          (5-gram eval overlap)
        AND exact-dedup canonical               (content digest)

    Composition stays scale-shaped: every per-doc signal (quality,
    lang, repetition, PII, digest) is ONE projection over ONE corpus
    scan; contamination is an anti-join against the tiny
    (broadcast-built) contaminated-id set; dedup is the digest
    row_number. Each stage is an already-oracle-checked operator, so
    the composed oracle is the same CTE composition.
    """
    from etl_data_pipeline_spark.llm.text_analysis import (
        CONTAM_EVAL_MOD,
        CONTAM_NGRAM,
        REPETITION_DUP3_MAX,
        _ngrams,
        _ngrams_all,
        pii_scrub_cols,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    q = text_analysis.quality_cols()
    pii = pii_scrub_cols()
    g3 = _ngrams_all(3)
    d3 = F.when(
        F.size(g3) > 0,
        (F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3),
    ).otherwise(F.lit(0.0))
    # persist: the signal columns feed a filter, an anti-join AND a
    # window — pushdown would otherwise substitute these non-trivial
    # expressions into each consumer and re-evaluate them per use
    # (measured 16 s vs 3 s at sf0.1). The persisted relation is
    # per-doc scalars only (no text), so it stays narrow at any scale.
    scored = docs.select(
        "doc_id",
        text_analysis.lang_guess_col().alias("lang_guess"),
        q["n_tokens"].alias("n_tokens"),
        hround(q["quality_score"], 6).alias("quality_score"),
        hround(d3, 6).alias("dup_3gram_frac"),
        (pii["n_emails"] + pii["n_phones"] + pii["n_ips"] > 0).alias("has_pii"),
        F.md5("text").alias("content_md5"),
    )
    scored = tracked_persist(scored)
    # contaminated training docs: share any 5-gram with the eval sample
    sh = docs.select("doc_id", F.explode(_ngrams(CONTAM_NGRAM)).alias("ngram"))
    eval_sh = sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select("ngram")
    contaminated = (
        sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
        .join(F.broadcast(eval_sh.distinct()), "ngram")
        .select("doc_id")
        .distinct()
    )
    kept = (
        scored.filter(
            (F.col("quality_score") >= QUALITY_MIN)
            & (F.col("lang_guess") != "unknown")
            & (F.col("dup_3gram_frac") <= REPETITION_DUP3_MAX)
            & (~F.col("has_pii"))
            # the eval sample itself never enters the training corpus
            & (F.col("doc_id") % CONTAM_EVAL_MOD != 0)
        )
        .join(contaminated, "doc_id", "left_anti")
    )
    w = Window.partitionBy("content_md5").orderBy(F.asc("doc_id"))
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_guess", "n_tokens", "quality_score", "dup_3gram_frac")
    )


TOKEN_BUDGET_FRACTION = 0.5  # select best docs until half the corpus tokens


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked selection up to a TOKEN budget — the "take the
    best documents until N tokens" curation step every pretraining mix
    ends with. A naive implementation sorts the corpus by quality and
    takes a running sum: a GLOBAL sort plus a single-partition window
    — the two things that cannot scale. This uses the bucket-CDF
    pattern instead:

    1. One scan scores each doc and coarsens quality to a 2-dp BUCKET.
    2. Buckets aggregate to (bucket, token_sum) — a ≤ ~100-row table,
       so the descending running sum over it runs in one tiny task
       (single-partition window over the BUCKET table is fine; over
       the corpus it would not be).
    3. The bucket CDF broadcasts back; a doc is selected iff its
       bucket's cumulative tokens fit the budget (whole buckets in or
       out — deterministic, no arbitrary tie-breaking inside a
       bucket). The budget is corpus-relative (a fraction of total
       tokens), so the query is scale-invariant.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    q = text_analysis.quality_cols()
    scored = tracked_persist(
        docs.select(
            "doc_id",
            q["n_tokens"].alias("n_tokens"),
            hround(q["quality_score"], 2).alias("q_bucket"),
        )
    )
    buckets = scored.groupBy("q_bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    total = scored.groupBy().agg(F.sum("n_tokens").alias("total_tokens"))
    w = (
        Window.orderBy(F.desc("q_bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = (
        buckets.withColumn("cum_tokens", F.sum("bucket_tokens").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "q_bucket",
            "cum_tokens",
            (
                F.col("cum_tokens")
                <= F.col("total_tokens") * TOKEN_BUDGET_FRACTION
            ).alias("selected"),
        )
    )
    return scored.join(F.broadcast(cdf), "q_bucket").select(
        "doc_id", "n_tokens", "q_bucket", "cum_tokens", "selected"
    )


DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling weights (Xie et al. 2023,
    arXiv:2302.03169): score every document by how much more likely
    its hashed-bigram features are under a TARGET distribution than
    under the raw corpus, then keep the docs the reweighting favors.
    Target here = the corpus' English slice (the in-harness stand-in
    for DSIR's Wikipedia/books target); raw = the whole corpus.

    w(x) = Π_b (p_tgt(b) / p_raw(b))^{cnt_x(b)}   — reported as the
    length-normalized mean log ratio, with Laplace (+1) smoothing
    over the 1024 hash buckets so unseen-in-target features stay
    finite. Keep flag is corpus-relative (≥ mean), the same
    self-calibration contract as the LM-perplexity filters.

    Plan: ONE pass builds the hashed-feature stream (zip_with bigrams
    → md5 bucket, the engine's portable hash); BOTH distributions come
    from a single map-side-combined aggregate over it (target counts
    are a conditional sum, not a second scan); the bucket table is
    B=1024 rows → broadcast back to the stream; per-doc mean is one
    shuffle on doc_id. At 100 TB the feature table stays B rows — the
    method was designed exactly so the 'model' is a broadcastable
    histogram."""
    from etl_data_pipeline_spark.llm.text_analysis import bigram_pairs

    docs = spread(load_table(spark, sf_dir, "documents"))
    stream = docs.select(
        "doc_id", "lang", F.explode(bigram_pairs()).alias("bg")
    ).select(
        "doc_id", "lang", F.col("bg.h").alias("h"), F.col("bg.w").alias("w")
    )
    return _dsir_from(stream)


def _dsir_from(stream: DataFrame) -> DataFrame:
    """corpus_dsir_weights' scoring half over a caller-supplied bigram
    stream (doc_id, lang, h, w) — split out (r13) so
    pipeline_corpus_curation_v3 can feed this gate and the bigram-LM
    gate from ONE tokenize+explode pass. The bucketed projection is
    persisted HERE (feats feeds the histogram aggregate and the
    per-doc scoring join), exactly as the standalone query always did."""
    from etl_data_pipeline_spark.functions.hashing import md5_long60

    feats = tracked_persist(
        stream.select(
            "doc_id",
            "lang",
            (
                md5_long60(F.concat_ws(" ", F.col("h"), F.col("w")))
                % DSIR_BUCKETS
            ).alias("b"),
        )
    )
    counts = feats.groupBy("b").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("tgt_cnt"),
    )
    tots = counts.groupBy().agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    lw = F.log(
        ((F.col("tgt_cnt") + F.lit(1.0)) / (F.col("tgt_tot") + F.lit(float(DSIR_BUCKETS))))
        / ((F.col("raw_cnt") + F.lit(1.0)) / (F.col("raw_tot") + F.lit(float(DSIR_BUCKETS))))
    )
    per_doc = tracked_persist(
        feats.join(F.broadcast(counts), "b")
        .crossJoin(F.broadcast(tots))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            hround(F.avg(lw), 6).alias("log_weight"),
        )
    )
    gm = per_doc.groupBy().agg(
        hround(F.avg("log_weight"), 6).alias("corpus_mean")
    )
    return per_doc.crossJoin(F.broadcast(gm)).select(
        "doc_id",
        "n_feats",
        "log_weight",
        (F.col("log_weight") >= F.col("corpus_mean")).alias("keep"),
    )


def pipeline_corpus_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 curation chain — v2's rule stack upgraded with the
    MODEL-BASED filters a 2023/24-era pretraining pipeline layers on
    top of heuristics. A document survives iff it passes, SIMULTANEOUSLY:

        Gopher rule battery          (text_gopher_rules.keep)
        hashed linear classifier     (text_quality_classifier.keep)
        bigram-LM perplexity filter  (text_bigram_logprob.keep)
        DSIR importance selection    (corpus_dsir_weights.keep)
        SemDeDup semantic dedup      (dedup_semantic.kept, embeddings
                                      keyed by vec_id == doc_id)

    Every gate is the ALREADY-ORACLED registered operator, evaluated
    over the FULL corpus (the corpus-relative thresholds are
    deliberately simultaneous, not sequential — re-fitting each stage
    on the previous stage's survivors would make the result depend on
    gate order and cost a corpus re-aggregate per stage). Documents
    with fewer than two tokens have no bigram row and fail the LM gate
    by absence (inner join) — identical in both engines.

    Scale shape: each stage is its own bounded-shuffle pipeline
    (single scans + vocabulary/bucket/centroid-sized side tables); the
    composition joins NARROW per-doc relations (doc_id + one boolean)
    on doc_id — co-partitioned post-aggregate joins, never a second
    pass over document text.

    Shared sub-relation (r13): the bigram-LM gate and the DSIR gate
    both consume the exploded corpus bigram stream — standalone each
    tokenizes and persists its own copy; composed here they read ONE
    persisted (doc_id, lang, h, w) stream (same bigram_pairs kernel,
    so the per-gate numbers are unchanged by construction), saving a
    full corpus tokenize+explode pass and one corpus-scale cache."""
    from etl_data_pipeline_spark.llm import dedup as _dd
    from etl_data_pipeline_spark.llm import text_analysis as _ta

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    shared_bg = tracked_persist(
        spread(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.explode(_ta.bigram_pairs()).alias("bg"))
        .select(
            "doc_id", "lang",
            F.col("bg.h").alias("h"), F.col("bg.w").alias("w"),
        )
    )
    g = _ta.text_gopher_rules(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("k_gopher")
    )
    c = _ta.text_quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("k_clf")
    )
    b = _ta.bigram_logprob_from(shared_bg).select(
        "doc_id", F.col("keep").alias("k_lm")
    )
    d = _dsir_from(shared_bg).select(
        "doc_id", F.col("keep").alias("k_dsir")
    )
    s = _dd.dedup_semantic(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("kept").alias("k_sem")
    )
    out = docs
    for gate in (g, c, b, d, s):
        out = out.join(gate, "doc_id")
    return out.filter(
        F.col("k_gopher") & F.col("k_clf") & F.col("k_lm")
        & F.col("k_dsir") & F.col("k_sem")
    ).select("doc_id", "lang", "source", "n_chars")


# Per-language stride weights for the training-order interleave: a
# weight of 2.0 feeds that stream twice as often into the merged order
# (epoch-factor upsampling a corpus mix applies at read time).
INTERLEAVE_WEIGHTS = {"en": 1.0, "de": 2.0, "es": 2.0, "fr": 3.0, "zh": 1.5}
INTERLEAVE_SALT = ":ileave"


def corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted interleave of per-language document
    streams into ONE global training order — stride scheduling
    (weighted round-robin, the WFQ/token-bucket merge): each stream
    is hash-shuffled (replayable, no rand()), the i-th doc of a
    weight-w stream lands at virtual time (i - 0.5) / w, and the
    merged order sorts by that. A weight-3 stream appears 3× as often
    per unit of output as a weight-1 stream, evenly spread — unlike
    concatenation (all of stream A first) or per-batch sampling
    (clumpy). This is the read-order twin of corpus_mix_weights:
    weights decide HOW MUCH of each source; interleave decides WHERE
    in the epoch those docs appear.

    Determinism: the within-stream order is the md5 shuffle key with
    doc_id tiebreak; virtual time is exact IEEE division of exact
    inputs (rank, weight literals), rounded at 6 dp only for display;
    the global ORDER BY carries (lang, doc_id) tiebreaks — a total
    order, identical on every engine.

    Scale posture: within-stream ranks are per-language windows
    (well-distributed keys); the final global position is ONE
    distributed range-partitioned sort of scalar rows + per-partition
    cumulative offsets (the export_shuffle recipe, pure-JVM since r12
    — functions/ranking.py::with_global_position), NOT a global
    row_number() window, which Spark would execute through a single
    partition. The sort keys form a total order, so the dense 1-based
    positions are identical to the oracle's row_number semantics.
    """
    from etl_data_pipeline_spark.functions.hashing import md5_long60

    docs = load_table(spark, sf_dir, "documents")
    weight = F.lit(1.0)
    for lang, wgt in INTERLEAVE_WEIGHTS.items():
        weight = F.when(F.col("lang") == lang, float(wgt)).otherwise(weight)
    shuffle_key = md5_long60(
        F.concat(F.col("doc_id").cast("string"), F.lit(INTERLEAVE_SALT))
    )
    per_stream = Window.partitionBy("lang").orderBy(
        F.asc("shuffle_key"), F.asc("doc_id")
    )
    ranked = docs.select(
        "doc_id", "lang", shuffle_key.alias("shuffle_key"), weight.alias("w")
    ).withColumn("within_rank", F.row_number().over(per_stream))
    pos = ranked.select(
        "doc_id",
        "lang",
        "within_rank",
        hround((F.col("within_rank") - 0.5) / F.col("w"), 6).alias("stride_pos"),
    )
    from etl_data_pipeline_spark.functions.ranking import with_global_position

    return with_global_position(
        pos,
        [F.asc("stride_pos"), F.asc("lang"), F.asc("doc_id")],
        pos_col="global_pos",
    )


DOMAIN_CAP_SHARE = 0.05  # no source may exceed this token share
DOMAIN_CAP_SALT = "domcap:"


def _domain_cap_parts(spark: SparkSession, sf_dir: str):
    """The shared domain-cap lineage: (docs, frac, kept) — the narrow
    doc projection, the per-source threshold relation, and the
    hash-gated kept rows. Both registered views (the per-source audit
    and the doc-grain decisions) read the same parts, so their
    numbers cannot drift."""
    from etl_data_pipeline_spark.functions.hashing import md5_long60

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("docs_pre"),
        F.sum("n_tokens").alias("tokens_pre"),
    )
    total = stats.agg(F.sum("tokens_pre").alias("total_tokens"))
    frac = stats.crossJoin(F.broadcast(total)).select(
        "source",
        "docs_pre",
        "tokens_pre",
        "total_tokens",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(DOMAIN_CAP_SHARE)
                * F.col("total_tokens").cast("double")
                / F.col("tokens_pre"),
            )
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("keep_thresh"),
    )
    doc_hash = md5_long60(F.concat(F.lit(DOMAIN_CAP_SALT), F.col("doc_id"))) % 1000000
    kept = docs.join(
        F.broadcast(frac.select("source", "keep_thresh")), "source"
    ).where(doc_hash < F.col("keep_thresh"))
    return docs, frac, kept


def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-share cap (the RefinedWeb/FineWeb-style
    "domain capping" step): no single source may contribute more than
    DOMAIN_CAP_SHARE of total corpus tokens; an over-cap source is
    deterministically downsampled to its cap by a salted,
    content-independent hash THRESHOLD on doc_id, so the kept set is
    stable across reruns, partitionings, and cluster sizes, and a doc
    once kept stays kept as its domain grows only if it still clears
    the (monotonically shrinking) threshold. The share knob is a
    pipeline parameter; the registered query pins 0.05 so both
    branches (capped and whole) are exercised on the test corpus.

    Scale posture: ONE narrow projection of the corpus feeds a
    |sources|-row aggregate, a 1-row total broadcasts back, and the
    per-doc keep/drop is a map-side hash compare against the joined
    per-source threshold — no per-source row_number() window, no
    rank, so one skewed mega-domain costs the same as a uniform one
    (the trap a rank-per-source formulation hits at 100 TB: the
    whole over-cap domain funnels through one window partition).
    The per-source stats join back via broadcast here (|sources| is
    tiny); at web scale with millions of domains the same plan holds
    with an AQE-chosen shuffle join on source.

    Determinism / oracle parity: the keep fraction is quantized to a
    1e-6 integer threshold with the shared floor(x*1e6 + 0.5)
    arithmetic (exact IEEE doubles, same operation order both
    engines) and compared against the engine-portable 60-bit md5 of
    "domcap:" || doc_id mod 1e6 — hash-identical in Spark and DuckDB.

    Output: the per-source audit of the cap — docs/tokens before and
    after, the keep fraction applied, and the realized post-cap token
    share against the ORIGINAL total.
    """
    docs, frac, kept = _domain_cap_parts(spark, sf_dir)
    post = kept.groupBy("source").agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        frac.join(post, "source", "left")
        .select(
            "source",
            "docs_pre",
            "tokens_pre",
            F.coalesce("docs_kept", F.lit(0)).alias("docs_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
            (F.col("keep_thresh") / 1000000.0).alias("keep_frac"),
            hround(
                F.coalesce("tokens_kept", F.lit(0)).cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("token_share_post"),
        )
    )


def corpus_domain_cap_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc-grain half of domain capping: every document's
    keep / skip_over_cap decision plus the threshold it was judged
    under — the relation a downstream training-data writer actually
    consumes (the audit twin ``corpus_domain_cap`` pins the per-source
    SUMS; this pins the exact MEMBERSHIP, so a cross-engine hash
    mismatch in even one doc's salted-hash gate is caught). Same
    shared lineage (_domain_cap_parts), same plan shape: map-side
    hash compare against a broadcast per-source threshold, no window,
    no skew sensitivity. Streaming twin:
    streaming/jobs.py::run_incremental_domain_cap emits exactly this
    row shape per micro-batch."""
    docs, frac, _kept = _domain_cap_parts(spark, sf_dir)
    from etl_data_pipeline_spark.functions.hashing import md5_long60

    doc_hash = md5_long60(F.concat(F.lit(DOMAIN_CAP_SALT), F.col("doc_id"))) % 1000000
    return docs.join(
        F.broadcast(frac.select("source", "keep_thresh")), "source"
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(doc_hash < F.col("keep_thresh"), "keep")
        .otherwise("skip_over_cap")
        .alias("decision"),
        "keep_thresh",
    )


QUERIES = {
    "corpus_domain_cap": corpus_domain_cap,
    "corpus_domain_cap_decisions": corpus_domain_cap_decisions,
    "corpus_interleave": corpus_interleave,
    "pipeline_corpus_curation_v3": pipeline_corpus_curation_v3,
    "corpus_dsir_weights": corpus_dsir_weights,
    "corpus_token_budget": corpus_token_budget,
    "pipeline_corpus_curation_v2": pipeline_corpus_curation_v2,
    "corpus_mix_weights": corpus_mix_weights,
    "corpus_split": corpus_split,
    "corpus_pack_sequences": corpus_pack_sequences,
    "pipeline_corpus_curation": pipeline_corpus_curation,
}

def _oracle_curation_v2() -> str:
    from etl_data_pipeline_spark.llm.text_analysis import (
        CONTAM_EVAL_MOD,
        CONTAM_NGRAM,
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        REPETITION_DUP3_MAX,
        _sql_ngrams,
        _sql_ngrams_all,
    )

    return f"""
        WITH lang AS ({text_analysis.ORACLE["text_lang_id"]}),
        qual AS ({text_analysis.ORACLE["text_quality"]}),
        rep AS (
            SELECT doc_id,
                   CASE WHEN len(g3) > 0 THEN
                       floor((CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                              / len(g3)) * 1000000 + 0.5) / 1000000
                   ELSE 0.0 END AS dup_3gram_frac
            FROM (SELECT doc_id, {_sql_ngrams_all(3)} AS g3 FROM documents)
        ), pii AS (
            SELECT doc_id,
                   (len(regexp_extract_all(text, '{PII_EMAIL}'))
                    + len(regexp_extract_all(text, '{PII_PHONE}'))
                    + len(regexp_extract_all(text, '{PII_IPV4}'))) > 0 AS has_pii
            FROM documents
        ), fp AS (
            SELECT doc_id, md5(text) AS content_md5 FROM documents
        ), sh AS (
            SELECT doc_id, unnest({_sql_ngrams(CONTAM_NGRAM)}) AS ngram
            FROM documents
        ), contaminated AS (
            SELECT DISTINCT t.doc_id
            FROM (SELECT doc_id, ngram FROM sh
                  WHERE doc_id % {CONTAM_EVAL_MOD} <> 0) t
            JOIN (SELECT DISTINCT ngram FROM sh
                  WHERE doc_id % {CONTAM_EVAL_MOD} = 0) e USING (ngram)
        ), kept AS (
            SELECT lang.doc_id, lang.lang_guess, qual.n_tokens,
                   qual.quality_score, rep.dup_3gram_frac, fp.content_md5
            FROM lang
            JOIN qual ON lang.doc_id = qual.doc_id
            JOIN rep ON lang.doc_id = rep.doc_id
            JOIN pii ON lang.doc_id = pii.doc_id
            JOIN fp ON lang.doc_id = fp.doc_id
            WHERE qual.quality_score >= {QUALITY_MIN}
              AND lang.lang_guess <> 'unknown'
              AND rep.dup_3gram_frac <= {REPETITION_DUP3_MAX}
              AND NOT pii.has_pii
              AND lang.doc_id % {CONTAM_EVAL_MOD} <> 0
              AND lang.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY content_md5
                          ORDER BY doc_id ASC) AS rn
            FROM kept
        )
        SELECT doc_id, lang_guess, n_tokens, quality_score, dup_3gram_frac
        FROM ranked WHERE rn = 1
    """


# The oracle is the SAME composition of the per-stage oracles —
# each stage's SQL is reused verbatim as a subquery.
def _oracle_token_budget() -> str:
    from etl_data_pipeline_spark.functions.rounding import sql_round
    from etl_data_pipeline_spark.llm.text_analysis import (
        SQL_QUALITY_SCORE,
        sql_quality_cte,
    )

    return f"""
        WITH {sql_quality_cte()}, s AS (
            SELECT doc_id, n_tokens,
                   {sql_round(SQL_QUALITY_SCORE, 2)} AS q_bucket
            FROM r
        ), b AS (
            SELECT q_bucket, sum(n_tokens) AS bucket_tokens
            FROM s GROUP BY q_bucket
        ), tot AS (SELECT sum(n_tokens) AS total_tokens FROM s),
        cdf AS (
            SELECT q_bucket,
                   CAST(sum(bucket_tokens) OVER (ORDER BY q_bucket DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_tokens
            FROM b
        )
        SELECT s.doc_id, s.n_tokens, s.q_bucket, cdf.cum_tokens,
               cdf.cum_tokens <= tot.total_tokens * {TOKEN_BUDGET_FRACTION}
                   AS selected
        FROM s JOIN cdf USING (q_bucket) CROSS JOIN tot
    """


_DSIR_ORACLE = f"""
        WITH t AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents
        ), feats AS (
            SELECT doc_id, lang,
                   ('0x' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 15))::BIGINT
                       % {DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts))) AS i FROM t)
        ), counts AS (
            SELECT b, count(*) AS raw_cnt,
                   sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                       AS tgt_cnt
            FROM feats GROUP BY b
        ), tots AS (
            SELECT sum(raw_cnt) AS raw_tot, sum(tgt_cnt) AS tgt_tot FROM counts
        ), per_doc AS (
            SELECT doc_id, count(*) AS n_feats,
                   floor(avg(ln(((tgt_cnt + 1.0) / (tgt_tot + {DSIR_BUCKETS}.0))
                               / ((raw_cnt + 1.0) / (raw_tot + {DSIR_BUCKETS}.0))))
                         * 1000000 + 0.5) / 1000000 AS log_weight
            FROM feats JOIN counts USING (b) CROSS JOIN tots
            GROUP BY doc_id
        ), gm AS (
            SELECT floor(avg(log_weight) * 1000000 + 0.5) / 1000000
                       AS corpus_mean
            FROM per_doc
        )
        SELECT doc_id, n_feats, log_weight,
               log_weight >= corpus_mean AS keep
        FROM per_doc CROSS JOIN gm
    """


def _oracle_curation_v3() -> str:
    """Composed from the five stage oracles verbatim (each wrapped as
    a CTE over its own WITH chain — DuckDB supports CTEs in derived
    tables), so v3's oracle is exactly the conjunction of the already-
    verified stage semantics."""
    from etl_data_pipeline_spark.llm import dedup as _dd
    from etl_data_pipeline_spark.llm import text_analysis as _ta

    return f"""
        WITH g AS (SELECT doc_id, keep AS k_gopher
                   FROM ({_ta.ORACLE['text_gopher_rules']})),
        c AS (SELECT doc_id, keep AS k_clf
              FROM ({_ta.ORACLE['text_quality_classifier']})),
        b AS (SELECT doc_id, keep AS k_lm
              FROM ({_ta.ORACLE['text_bigram_logprob']})),
        d AS (SELECT doc_id, keep AS k_dsir FROM ({_DSIR_ORACLE})),
        s AS (SELECT vec_id AS doc_id, kept AS k_sem
              FROM ({_dd.ORACLE['dedup_semantic']}))
        SELECT doc_id, lang, source, n_chars
        FROM documents
        JOIN g USING (doc_id)
        JOIN c USING (doc_id)
        JOIN b USING (doc_id)
        JOIN d USING (doc_id)
        JOIN s USING (doc_id)
        WHERE k_gopher AND k_clf AND k_lm AND k_dsir AND k_sem
    """


_ILEAVE_WCASE = " ".join(
    f"WHEN lang = '{l}' THEN {w}" for l, w in INTERLEAVE_WEIGHTS.items()
)

ORACLE = {
    "corpus_domain_cap": f"""
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), stats AS (
            SELECT source, count(*) AS docs_pre,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens_pre
            FROM d GROUP BY source
        ), tot AS (
            SELECT CAST(sum(tokens_pre) AS BIGINT) AS total_tokens FROM stats
        ), frac AS (
            SELECT source, docs_pre, tokens_pre, total_tokens,
                   CAST(floor(least(1.0,
                            {DOMAIN_CAP_SHARE} * CAST(total_tokens AS DOUBLE)
                                / tokens_pre) * 1000000 + 0.5) AS BIGINT)
                       AS keep_thresh
            FROM stats CROSS JOIN tot
        ), kept AS (
            SELECT d.source, d.n_tokens
            FROM d JOIN frac ON d.source = frac.source
            WHERE ('0x' || substr(md5('{DOMAIN_CAP_SALT}'
                       || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
                  < frac.keep_thresh
        ), post AS (
            SELECT source, count(*) AS docs_kept,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
            FROM kept GROUP BY source
        )
        SELECT f.source, f.docs_pre, f.tokens_pre,
               COALESCE(p.docs_kept, 0) AS docs_kept,
               COALESCE(p.tokens_kept, 0) AS tokens_kept,
               CAST(f.keep_thresh AS DOUBLE) / 1000000 AS keep_frac,
               floor(CAST(COALESCE(p.tokens_kept, 0) AS DOUBLE)
                     / f.total_tokens * 1000000 + 0.5) / 1000000
                   AS token_share_post
        FROM frac f LEFT JOIN post p ON f.source = p.source
    """,
    "corpus_domain_cap_decisions": f"""
        WITH d AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), stats AS (
            SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_pre
            FROM d GROUP BY source
        ), tot AS (
            SELECT CAST(sum(tokens_pre) AS BIGINT) AS total_tokens FROM stats
        ), frac AS (
            SELECT source,
                   CAST(floor(least(1.0,
                            {DOMAIN_CAP_SHARE} * CAST(total_tokens AS DOUBLE)
                                / tokens_pre) * 1000000 + 0.5) AS BIGINT)
                       AS keep_thresh
            FROM stats CROSS JOIN tot
        )
        SELECT d.doc_id, d.source, d.n_tokens,
               CASE WHEN ('0x' || substr(md5('{DOMAIN_CAP_SALT}'
                        || d.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
                         < f.keep_thresh
                    THEN 'keep' ELSE 'skip_over_cap' END AS decision,
               f.keep_thresh
        FROM d JOIN frac f ON d.source = f.source
    """,
    "corpus_interleave": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x' || substr(md5(doc_id::VARCHAR
                                     || '{INTERLEAVE_SALT}'), 1, 15))::BIGINT,
                                doc_id) AS rn,
                   CASE {_ILEAVE_WCASE} ELSE 1.0 END AS w
            FROM documents
        ), pos AS (
            SELECT doc_id, lang,
                   CAST(rn AS INTEGER) AS within_rank,
                   floor((rn - 0.5) / w * 1000000 + 0.5) / 1000000
                       AS stride_pos
            FROM ranked
        )
        SELECT doc_id, lang, within_rank, stride_pos,
               row_number() OVER (
                   ORDER BY stride_pos, lang, doc_id) AS global_pos
        FROM pos
    """,
    "pipeline_corpus_curation_v3": _oracle_curation_v3(),
    "corpus_dsir_weights": _DSIR_ORACLE,
    "corpus_token_budget": _oracle_token_budget(),
    "pipeline_corpus_curation_v2": _oracle_curation_v2(),
    "corpus_split": f"""
        WITH b AS (
            SELECT doc_id,
                   ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                       % {SPLIT_BUCKETS} AS split_bucket
            FROM documents
        )
        SELECT doc_id, split_bucket,
               CASE WHEN split_bucket < {SPLIT_VAL_BUCKET} THEN 'train'
                    WHEN split_bucket = {SPLIT_VAL_BUCKET} THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """,
    "corpus_pack_sequences": f"""
        WITH t AS (
            SELECT doc_id, lang, source,
                   len(string_split(text, ' ')) AS n_tokens,
                   sum(len(string_split(text, ' '))) OVER (
                       PARTITION BY lang, source ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM documents
        )
        SELECT doc_id, lang, source, n_tokens,
               CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE)
                          / {CTX_TOKENS}) AS BIGINT) AS seq_id,
               CAST((cum_tokens - n_tokens) % {CTX_TOKENS} AS BIGINT) AS seq_offset
        FROM t
    """,
    "corpus_mix_weights": f"""
        WITH stats AS (
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS domain_tokens
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
