"""Text-analysis operators over the ``documents`` table (north-star
extension: language-ID, quality scoring, token counting, document
fingerprinting — SURVEY.md §2.B "UDF/extension operators").

Everything here is built-in Catalyst expressions (split / higher-order
array functions / regexp / md5) — JVM-side, codegen-friendly, no
Python in the hot path. At 100 TB these are embarrassingly parallel
per-row transforms: no shuffle except the final small aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.functions.rounding import hround, sql_round
from etl_data_pipeline_spark.session import load_table, spread

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID. Deliberately minimal + deterministic; same lists are
# inlined into the DuckDB oracle.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def bigram_pairs(col: str = "text") -> Column:
    """Adjacent-token (h, w) struct pairs of ``col`` via ONE zip_with
    (no self-join); empty for docs under two tokens. Shared kernel of
    text_bigram_logprob and corpus_dsir_weights — one definition so
    the two operators (and both DuckDB oracles' ``ts[i] || ' ' ||
    ts[i+1]`` renderings) can't drift apart."""
    ts = _tokens(col)
    n = F.size(ts)
    return F.zip_with(
        F.slice(ts, F.lit(1), n - 1),
        F.slice(ts, F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("h"), b.alias("w")),
    )


def _stop_hits(lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(
        F.filter(_tokens(), lambda t: t.isin(*words))
    )


def _sql_stop_hits(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({inlist})))"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per (lang, source): doc count, char/token means."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", F.size(_tokens()))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            hround(F.avg("n_chars"), 4).alias("avg_chars"),
            hround(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, two tokenizers: whitespace split and a
    BPE-ish regex ([a-z]+ word pieces | digits | punctuation)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("re_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def lang_guess_col() -> Column:
    """The language-ID expression (argmax over per-lang stopword hits,
    first-wins tie-break en>de>es>fr, 'unknown' when nothing hits) —
    exposed as a Column so compositions (llm/curation.py) can evaluate
    it in the same projection as other stages: one scan, not a
    self-join per stage."""
    en, de, es, fr = (_stop_hits(l) for l in ("en", "de", "es", "fr"))
    return (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
        .when((de >= es) & (de >= fr) & (de > 0), "de")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )


def quality_cols() -> dict[str, Column]:
    """Quality-scoring expressions (C4/Gopher-style public heuristics),
    keyed by output column name — Column-level for the same single-pass
    composition reason as lang_guess_col()."""
    n_tokens = F.size(_tokens())
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0))
    stop_ratio = _stop_hits("en") / n_tokens
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars sans spaces / tokens
    punct_ratio = n_punct / n_chars
    score = F.when(n_tokens < 5, 0.0).otherwise(
        0.4 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        + 0.3 * F.least(mean_tok_len / 8, F.lit(1.0))
    )
    return {
        "n_tokens": n_tokens,
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "mean_tok_len": mean_tok_len,
        "quality_score": score,
    }


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (n-gram heuristic): argmax over per-lang
    stopword hit counts, first-wins tie-break en>de>es>fr, 'unknown'
    when no list hits."""
    docs = load_table(spark, sf_dir, "documents")
    en, de, es, fr = (_stop_hits(l) for l in ("en", "de", "es", "fr"))
    guess = lang_guess_col()
    return docs.select(
        "doc_id", "lang", guess.alias("lang_guess"),
        en.alias("en_hits"), de.alias("de_hits"),
        es.alias("es_hits"), fr.alias("fr_hits"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean
    token length → composite score in [0,1] (heuristics in the style of
    C4/Gopher corpus filters, public recipes)."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_cols()
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        hround(q["stop_ratio"], 6).alias("stop_ratio"),
        hround(q["punct_ratio"], 6).alias("punct_ratio"),
        hround(q["mean_tok_len"], 6).alias("mean_tok_len"),
        hround(q["quality_score"], 6).alias("quality_score"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content hash (md5), normalized
    bag-of-words hash (md5 of sorted tokens — order-insensitive
    near-dup key), and a 64-char prefix shingle hash."""
    docs = load_table(spark, sf_dir, "documents")
    sorted_tokens = F.array_join(F.array_sort(_tokens()), " ")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.md5(sorted_tokens).alias("bow_md5"),
        F.md5(F.substring("text", 1, 64)).alias("prefix64_md5"),
    )


TOP_TOKENS_K = 20


def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency top-k (explode → count → ordered limit).

    The explode never materializes corpus² anything: partial (map-side)
    counts combine before the shuffle, and the final top-k is a
    TakeOrderedAndProject — only K rows reach the driver side of the
    limit. Tiebreak on token keeps the boundary deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(TOP_TOKENS_K)
    )


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the step before any content
    dedup): lowercase, strip non-alphanumerics to spaces, collapse
    whitespace runs, trim — emitted as the normalized digest plus
    before/after lengths. Map-only regexp work, JVM-side, identical
    regex semantics in both engines for these patterns."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(norm).alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


CHUNK_SIZE = 256     # chars per chunk
CHUNK_STRIDE = 192   # 64-char overlap between consecutive chunks


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-training chunking: split each document into fixed-size
    character chunks with overlap (size 256, stride 192).

    Pure row expansion — sequence() of chunk starts, posexplode,
    substring — all JVM-side, no shuffle at all: chunking 100 TB is a
    map-only stage that parallelizes with the input splits. Chunk text
    is emitted as md5 (the harness result stays compact); a real
    pipeline would keep the substring column instead.
    """
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = docs.select(
        "doc_id", "text", F.posexplode(starts).alias("chunk_idx", "chunk_start")
    )
    chunk = F.substr(F.col("text"), F.col("chunk_start"), F.lit(CHUNK_SIZE))
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


TFIDF_TOP_K = 3


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF feature extraction: per document, the top-3 terms by
    tf·ln(N/df) with deterministic (score desc, token asc) tiebreak.

    Shuffle ledger at corpus scale: explode → (doc, token) partial
    counts combine map-side; document frequency is an aggregate of the
    ALREADY-distinct (doc, token) relation (no second corpus pass);
    N is a 1-row broadcast; the final top-k is a WindowGroupLimit.
    idf is rounded to 6 dp BEFORE the product so the cross-engine
    contract doesn't rest on the engines' ln() agreeing in the last
    ulp (tf is an exact int, so the rounded product is then exact
    arithmetic both sides).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "token", hround(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf")
    )
    scored = tf.join(idf, "token").select(
        "doc_id",
        "token",
        "tf",
        hround(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "token", "tf", "tfidf")
    )


CONTAM_NGRAM = 5          # n-gram order for overlap detection
CONTAM_EVAL_MOD = 97      # eval set = doc_id % 97 == 0 (~1% of corpus)


def _ngrams(n: int) -> Column:
    """Distinct n-token shingles of ``text`` (short-doc guarded)."""
    toks = _tokens()
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sql_ngrams(n: int) -> str:
    parts = ", ".join(f"string_split(text, ' ')[i+{j}]" for j in range(n))
    return f"""CASE WHEN len(string_split(text, ' ')) >= {n} THEN
        list_distinct(list_transform(
            range(1, len(string_split(text, ' ')) - {n - 2}),
            i -> concat_ws(' ', {parts})))
    ELSE [] END"""


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: training docs sharing ≥ 1
    distinct 5-gram with any eval-set doc (the n-gram-overlap decontam
    rule used for LLM pretraining corpora — GPT-3 appendix C / Llama 2
    style, with n scaled to this corpus's short documents; production
    uses n=8-13 on real documents).

    The eval set here is the deterministic id-sample
    ``doc_id % 97 == 0`` standing in for an external benchmark table —
    swap in a real eval corpus by unioning it with a marker column.
    Plan shape at 100 TB: both sides explode to (doc, ngram) pairs;
    the EVAL side is tiny and broadcast, so the corpus streams through
    one scan with a broadcast-hash join on the ngram — no corpus
    shuffle at all; the (train, eval) pair counts combine map-side.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", F.explode(_ngrams(CONTAM_NGRAM)).alias("ngram"))
    eval_sh = sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "ngram"
    )
    train_sh = sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc"), "ngram"
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "ngram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


FUZZY_NGRAM = 3           # shorter shingles than exact contamination:
#                           the fuzzy rule measures PARTIAL overlap
FUZZY_CONTAM_MIN = 0.05   # containment ratio above which a doc is flagged


def text_contamination_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark-contamination scoring: per training doc, the
    CONTAINMENT of its distinct 3-gram set in the eval corpus's union
    ngram set — |ngrams(d) ∩ eval| / |ngrams(d)| — with docs above
    FUZZY_CONTAM_MIN flagged. Containment (not Jaccard) is the right
    asymmetric measure here: a short eval prompt embedded in a long
    training doc scores high even though the symmetric Jaccard is
    tiny (the near-dup detectors use resemblance; decontamination
    needs containment — same distinction as Broder 1997).

    Complements text_contamination (exact ≥1 shared 5-gram, a binary
    flag that misses paraphrase-level leakage): the graded score
    ranks *partially* leaked docs for the removal-threshold sweep a
    curation run does.

    Scale posture: the eval ngram set is distinct-reduced and
    BROADCAST, so the training corpus streams through one scan/one
    explode with a broadcast-hash semi-side join — no corpus shuffle;
    both groupBys combine map-side on the well-distributed doc_id.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = docs.select("doc_id", F.explode(_ngrams(FUZZY_NGRAM)).alias("ngram"))
    eval_ng = (
        sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select("ngram").distinct()
    )
    train = sh.filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
    tsz = train.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        train.join(F.broadcast(eval_ng), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hit"))
    )
    n_shared = F.coalesce(F.col("hit"), F.lit(0)).cast("long")
    ratio = n_shared.cast("double") / F.col("n_ngrams")
    return (
        tsz.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            n_shared.alias("n_shared"),
            hround(ratio, 6).alias("containment"),
            F.when(ratio >= FUZZY_CONTAM_MIN, 1).otherwise(0).alias("contaminated"),
        )
    )


BPE_TOP_K = 25  # merge candidates reported per induction round


def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, the counting stage of one BPE round
    (Sennrich et al. 2016): adjacent character-pair frequencies over
    the corpus, weighted by word frequency — the statistic whose
    argmax becomes the next merge rule. Full BPE training = this
    operator iterated with the chosen merge applied to the vocab
    (driver-side on the SMALL distinct-word relation, as real BPE
    trainers do).

    The global top-K window is over the ≤ |alphabet|² pair-count
    relation, not data-sized rows.

    Scale design — the classic BPE trainer trick, distributed: the
    corpus collapses to the DISTINCT-WORD relation first (one
    map-side-combinable groupBy; natural-language vocab grows ~ Heaps'
    law, orders of magnitude slower than tokens), and the pair
    explosion runs over vocab entries × word length, never over
    corpus tokens. Top-K via TakeOrdered, not a global sort.
    """
    return _bpe_ranked(
        _bpe_pair_counts(_bpe_word_counts(spark, sf_dir))
    ).filter(F.col("merge_rank") <= BPE_TOP_K)


BPE_MARKER = "\x01"  # stand-in symbol for the round-1 merged pair: a
#                      control char, definitionally outside any
#                      printable corpus alphabet


def _bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, n): the distinct-word relation both BPE operators count
    over — ONE definition so the two rounds cannot diverge."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def _bpe_pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts over (w, n)."""
    return (
        vocab.filter(F.length("w") >= 2)
        .select(
            "w",
            "n",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.col("w").substr(F.col("i"), F.lit(1)).alias("left_sym"),
            F.col("w").substr(F.col("i") + 1, F.lit(1)).alias("right_sym"),
            "n",
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("n").alias("pair_count"))
    )


def _bpe_ranked(pairs: DataFrame, top_k: int = BPE_TOP_K) -> DataFrame:
    """Append merge_rank: count desc, (left, right) asc tiebreak —
    the one tiebreak definition shared by argmax and top-K.

    Every consumer keeps at most ``top_k`` rows, so the relation is
    pruned to the global top-k FIRST via ``orderBy().limit()`` — Spark
    plans that as TakeOrderedAndProject (each partition keeps its
    local top-k map-side, the driver merges k-sized heaps; no shuffle,
    no single-partition sort) — and only the surviving <= top_k rows
    feed the ranking window. The final window is therefore bounded by
    CONSTRUCTION, not just by the alphabet^2 bound of the pair
    vocabulary (~1e4 for a printable-ASCII corpus, which already made
    it safe as a property of the data, not the plan). The sort key is
    a total order, so limit(top_k) keeps exactly the rows with
    merge_rank <= top_k — the set every consumer filters to."""
    from pyspark.sql.window import Window

    order = (F.desc("pair_count"), F.asc("left_sym"), F.asc("right_sym"))
    pruned = pairs.orderBy(*order).limit(top_k)
    return pruned.select(
        "left_sym",
        "right_sym",
        "pair_count",
        F.row_number().over(Window.orderBy(*order)).alias("merge_rank"),
    )


def text_bpe_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE induction ITERATED: apply round 1's winning merge to the
    vocabulary (greedy leftmost non-overlapping replace — the actual
    BPE merge semantics, identical in both engines), then recount
    pairs over the updated symbol sequences and report round 2's
    top-K candidates. Proves the induction LOOP distributes, not just
    one counting pass: each round is (tiny argmax broadcast → vocab
    rewrite → recount), with the corpus never re-tokenized after the
    initial word-count collapse.

    Output readability: the merged symbol appears in round-2 pairs as
    ``<lr>`` (e.g. a pair ('<er>', 's') = the merged 'er' followed by
    's'), rendered from the marker via replace on BOTH engines.

    Scale posture: identical to text_bpe_pairs (all per-round work on
    the distinct-word relation) plus one 1-row broadcast for the
    argmax merge rule — k rounds = k such passes over the (shrinking)
    vocab, the standard distributed-BPE-trainer loop.
    """
    from etl_data_pipeline_spark.functions.caching import tracked_persist

    wc = tracked_persist(_bpe_word_counts(spark, sf_dir))
    top1 = (
        _bpe_ranked(_bpe_pair_counts(wc))
        .filter(F.col("merge_rank") == 1)
        .select(
            F.col("left_sym").alias("m_l"), F.col("right_sym").alias("m_r")
        )
    )
    vocab2 = wc.crossJoin(F.broadcast(top1)).select(
        F.replace(
            F.col("w"), F.concat(F.col("m_l"), F.col("m_r")), F.lit(BPE_MARKER)
        ).alias("w"),
        "n",
        "m_l",
        "m_r",
    )
    merged_disp = F.concat(F.lit("<"), F.col("m_l"), F.col("m_r"), F.lit(">"))
    r2 = (
        _bpe_pair_counts(vocab2.select("w", "n"))
        .crossJoin(F.broadcast(top1))
        .select(
            F.replace(F.col("left_sym"), F.lit(BPE_MARKER), merged_disp).alias(
                "left_sym"
            ),
            F.replace(
                F.col("right_sym"), F.lit(BPE_MARKER), merged_disp
            ).alias("right_sym"),
            "pair_count",
        )
    )
    return _bpe_ranked(r2).filter(F.col("merge_rank") <= BPE_TOP_K)


# PII patterns: RE2-compatible (DuckDB) AND Java-regex-compatible
# (Spark) — no lookaround, no backrefs, POSIX-safe classes only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub_cols(col: str = "text") -> dict[str, Column]:
    """Detection counts + the scrubbed text (shared by the query and
    by pipeline composition)."""
    c = F.col(col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ),
        PII_IPV4,
        "[IP]",
    )
    return {
        "n_emails": F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), F.lit(0))),
        "scrubbed": scrubbed,
    }


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + scrubbing: count emails/phones/IPv4s per doc and
    emit the digest of the masked text — the redaction stage of a
    training-data pipeline. Pure JVM regexp (codegen, map-only, no
    shuffle); the digest (not the scrubbed body) is the query output
    so the result stays narrow. The patterns are deliberately in the
    RE2 ∩ Java-regex common subset so the DuckDB oracle runs them
    verbatim.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = pii_scrub_cols()
    return docs.select(
        "doc_id",
        p["n_emails"].alias("n_emails"),
        p["n_phones"].alias("n_phones"),
        p["n_ips"].alias("n_ips"),
        F.md5(p["scrubbed"]).alias("scrubbed_md5"),
        (p["n_emails"] + p["n_phones"] + p["n_ips"] > 0).alias("has_pii"),
    )


REPETITION_DUP3_MAX = 0.3  # Gopher-style repetition filter threshold


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher/MassiveText repetition
    rules, adapted to whitespace tokens): duplicate 2-gram and 3-gram
    fractions and the top-token share per document, plus the filter
    verdict at the documented threshold.

    Map-only per-row array arithmetic — no shuffle, no Python. The
    top-token count is a LINEAR fold: sort the tokens, then one
    aggregate() pass tracking the longest run of equal neighbors
    (state = (prev, run, best)). The naive form — count each distinct
    token with a nested filter — is O(|distinct|·|toks|) per row and
    measured 6× slower at sf0.1 (31 s vs 5 s); at 100 TB a per-row
    quadratic term is the difference between a scan and a stall. The
    oracle keeps the naive formulation (DuckDB list ops at gate scale)
    — different algorithm, identical value.
    """
    # spread(): one small parquet split would otherwise put this
    # CPU-bound string work on a single core (measured 30 s -> ~2 s).
    docs = spread(load_table(spark, sf_dir, "documents"))
    run_state = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _run_merge(acc, x):
        new_run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc.best, new_run).alias("best"),
        )

    top_count = F.aggregate(
        F.array_sort(_tokens()), run_state, _run_merge, lambda acc: acc.best
    )
    # stage 1 materializes each n-gram stat ONCE; computing the final
    # metrics directly would re-evaluate the n-gram construction per
    # reference (3x per fraction — CollapseProject keeps the split
    # because these aliases are non-cheap and multiply-referenced).
    staged = docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_toks"),
        F.size(_ngrams_all(2)).alias("n_g2"),
        F.size(F.array_distinct(_ngrams_all(2))).alias("n_g2_distinct"),
        F.size(_ngrams_all(3)).alias("n_g3"),
        F.size(F.array_distinct(_ngrams_all(3))).alias("n_g3_distinct"),
        top_count.alias("top_count"),
    )
    d2 = F.when(
        F.col("n_g2") > 0,
        (F.col("n_g2") - F.col("n_g2_distinct")) / F.col("n_g2"),
    ).otherwise(F.lit(0.0))
    d3 = F.when(
        F.col("n_g3") > 0,
        (F.col("n_g3") - F.col("n_g3_distinct")) / F.col("n_g3"),
    ).otherwise(F.lit(0.0))
    top_share = F.when(
        F.col("n_toks") > 0, F.col("top_count") / F.col("n_toks")
    ).otherwise(F.lit(0.0))
    return staged.select(
        "doc_id",
        hround(d2, 6).alias("dup_2gram_frac"),
        hround(d3, 6).alias("dup_3gram_frac"),
        hround(top_share, 6).alias("top_token_share"),
        (hround(d3, 6) > REPETITION_DUP3_MAX).alias("is_repetitive"),
    )


def _ngrams_all(n: int) -> Column:
    """ALL n-token shingles (with duplicates — repetition needs the
    multiset, unlike the distinct sets used for overlap/Jaccard)."""
    toks = _tokens()
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sql_ngrams_all(n: int) -> str:
    parts = ", ".join(f"string_split(text, ' ')[i+{j}]" for j in range(n))
    return f"""CASE WHEN len(string_split(text, ' ')) >= {n} THEN
        list_transform(
            range(1, len(string_split(text, ' ')) - {n - 2}),
            i -> concat_ws(' ', {parts}))
    ELSE [] END"""


DUP_SPAN_N = 6  # production substring dedup uses ~50-token windows
DUP_SPAN_TOPK = 100


def text_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated text spans — the exact-substring dedup
    signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better"): every distinct 6-token span occurring in
    two or more documents, ranked by spread. Downstream, these spans
    are what a substring-level dedup pass cuts out of the corpus
    (doc-level dedup keeps both copies when two different pages quote
    the same boilerplate; this finds the boilerplate itself).

    Plan at 100 TB: one corpus scan explodes per-doc DISTINCT spans
    (the within-doc distinct keeps a doc's internal repetition from
    inflating cross-doc counts — that signal is text_repetition's
    job), then ONE shuffle on the span with map-side partial
    aggregation; the top-k is TakeOrdered, never a global sort. Span
    key cardinality is bounded by total corpus tokens, and hot spans
    (the interesting ones) partial-aggregate away before the shuffle.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    spans = docs.select("doc_id", F.explode(_ngrams(DUP_SPAN_N)).alias("span"))
    return (
        spans.groupBy("span")
        .agg(
            # count(*), NOT count_distinct: _ngrams is per-doc DISTINCT,
            # so (doc_id, span) pairs are unique by construction and the
            # plain count equals the doc count — count_distinct would
            # plan a second aggregation exchange (hash(span, doc_id)
            # then hash(span)); this keeps the whole query at ONE
            # aggregation shuffle (plan-test pinned)
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("span"))
        .limit(DUP_SPAN_TOPK)
    )


def dedup_substring_scrub(
    spark: SparkSession, sf_dir: str, min_dup_docs: int = 2
) -> DataFrame:
    """Span-level exact-substring dedup as a corpus REWRITE — the
    actual output of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"), not just the detection signal
    (that is text_duplicate_spans): every token covered by a span
    duplicated across documents is REMOVED from the corpus, keeping
    exactly one copy — the lowest-doc_id document owning the span
    keeps all its occurrences; every other document loses every
    occurrence.

    Plan (3 shuffles, all content-bounded, no UDF anywhere):
    1. Duplicate-span discovery: per-doc DISTINCT spans explode from
       one scan, ONE map-side-combined shuffle on span -> (span,
       keeper=min(doc_id)) for spans in >= 2 docs (identical shape to
       text_duplicate_spans, without the top-k).
    2. Occurrence location: a second column-pruned scan explodes
       positional spans (start index kept); an equi-join on span
       against the duplicate set — the join IS the filter,
       non-duplicated spans never survive it — drops keeper rows and
       explodes each hit into its covered token indices, aggregated
       per doc with collect_set (second + third shuffle). Re-scanning
       beats deriving the distinct doc-span pairs from the positional
       explode: that would trade a sequential column-pruned parquet
       read for an extra all-tokens shuffle, which is the worse deal
       at 100 TB.
    3. Rewrite: documents left-join their covered-index set (sort-merge
       on doc_id) and rebuild text with a codegen array filter on the
       token index. Output is per-doc before/after accounting plus the
       scrubbed text's md5 so the whole rewritten corpus is
       value-hashed against the DuckDB oracle.

    At 100 TB: state is bounded by corpus token count; hot spans
    partial-aggregate map-side; no stage collects, broadcasts the
    corpus, or holds more than one document's tokens in a row. The
    keeper policy is deterministic (min doc_id), so reruns are
    idempotent.

    Boundedness knob (round-7 verdict item 4): wall time is driven by
    the duplicate-span OUTPUT mass, which the corpus's own birthday
    statistics grow superlinearly (measured 47x per data decade on the
    synthetic tiers — exponent 1.16 vs input alone, sublinear vs
    input+output). ``min_dup_docs`` raises the span-frequency floor
    for "duplicated": only spans appearing in >= min_dup_docs
    documents are scrubbed, which caps the join/explode volume to the
    hot tail of the span-frequency distribution (a power law — each
    increment sheds most of the remaining mass). Default 2 is the
    exact Lee-et-al. semantics the oracle pins."""
    return substring_scrub(
        spread(load_table(spark, sf_dir, "documents")), min_dup_docs=min_dup_docs
    )


def substring_scrub(docs: DataFrame, min_dup_docs: int = 2) -> DataFrame:
    """Core of dedup_substring_scrub over any (doc_id, text) frame —
    see that query's docstring for semantics, the plan shape, and the
    ``min_dup_docs`` output-boundedness knob."""
    if min_dup_docs < 2:
        raise ValueError("min_dup_docs must be >= 2 (a span in 1 doc is not a dup)")
    toks = _tokens()
    # 1. spans duplicated across docs, with their keeper
    dup = (
        docs.select("doc_id", F.explode(_ngrams(DUP_SPAN_N)).alias("span"))
        .groupBy("span")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") >= min_dup_docs)
        .select("span", "keeper")
    )
    # 2. positional occurrences (1-based start index per span)
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(toks) >= DUP_SPAN_N,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (DUP_SPAN_N - 1)),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at(toks, i + j) for j in range(DUP_SPAN_N)],
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "span"),
    ).select("doc_id", (F.col("pos0") + 1).alias("start"), "span")
    covered = (
        pos.join(dup, "span")
        .where(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (DUP_SPAN_N - 1))
            ).alias("tok_idx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tok_idx").alias("cov"))
    )
    # 3. rebuild: keep tokens whose 1-based index is not covered
    cov = F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    kept = F.filter(toks, lambda t, i: ~F.array_contains(cov, (i + 1).cast("int")))
    return (
        docs.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(cov).alias("n_removed"),
            F.md5(F.concat_ws(" ", kept)).alias("scrubbed_md5"),
        )
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality signal from a corpus-trained unigram
    LM — the simplest member of the model-based-filter family (CCNet /
    Gopher filter on LM perplexity; a unigram model is the degenerate
    case that needs no external model artifact, so the whole pipeline
    stays closed over the corpus): per document, the mean log-
    probability of its tokens under the corpus unigram distribution,
    plus a SELF-CALIBRATING keep flag (doc at or above the corpus
    mean) — an absolute threshold would be vocabulary- and
    scale-dependent, the corpus-relative one is not.

    Plan: token counts are ONE map-side-combined shuffle; scoring
    joins the token stream against the count table on token (the
    count side is already hash-partitioned by token from its
    aggregation — one new exchange, not two); per-doc mean is a third
    shuffle; the grand total and corpus mean ride 1-row broadcast
    cross joins. At 100 TB the vocabulary table is millions of rows —
    a real shuffle join, never a collect. ln() last-ulp divergence
    across engines is absorbed by 6-dp rounding (the text_tfidf
    contract)."""
    from etl_data_pipeline_spark.functions.caching import tracked_persist

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(_tokens()).alias("token"))
    # persist: the count table feeds the grand total AND the scoring
    # join; it is also the natural reusable artifact of this query (a
    # trained unigram LM). Vocabulary-bounded, so cacheable at any
    # corpus size.
    vocab = tracked_persist(
        toks.groupBy("token").agg(F.count("*").alias("cnt"))
    )
    total = vocab.groupBy().agg(F.sum("cnt").alias("total"))
    # persist: per_doc feeds BOTH the corpus-mean aggregate and the
    # final projection — without it Catalyst re-derives the entire
    # count-join-aggregate lineage under each consumer (no cross-join
    # common-subexpression elimination; measured 15 exchanges vs 6)
    per_doc = tracked_persist(
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            hround(F.avg(F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "mean_logprob"
            ),
        )
    )
    gm = per_doc.groupBy().agg(
        hround(F.avg("mean_logprob"), 6).alias("corpus_mean")
    )
    return per_doc.crossJoin(F.broadcast(gm)).select(
        "doc_id",
        "n_tokens",
        "mean_logprob",
        (F.col("mean_logprob") >= F.col("corpus_mean")).alias("keep"),
    )


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity filter — the CCNet-style upgrade of
    ``text_unigram_logprob``: per document, the mean conditional log-
    probability ln P(w_i | w_{i-1}) under the corpus bigram MLE
    (P = cnt(h,w) / cnt(h,·)), with the same self-calibrating
    corpus-mean keep flag. A bigram model penalizes scrambled or
    boilerplate-stitched text that a unigram model scores as fluent —
    word ORDER starts to matter — while still needing no external
    model artifact.

    Plan: bigrams come from one zip_with over each doc's token array
    (no self-join); bigram counts are ONE map-side-combined shuffle;
    head totals are a second aggregate over the already-collapsed
    count table (vocabulary-sized, NOT corpus-sized); scoring joins
    the bigram stream against both count tables on their natural keys.
    Docs with fewer than two tokens drop out identically in both
    engines (zero bigrams to aggregate). At 100 TB the bigram table is
    the big dim (~billions of rows) — a real shuffle join, never a
    collect; production would persist it as the trained-LM artifact."""
    from etl_data_pipeline_spark.functions.caching import tracked_persist

    docs = spread(load_table(spark, sf_dir, "documents"))
    # persist: the bigram stream feeds the count shuffle AND the
    # scoring join — without the pin both re-tokenize the corpus.
    pairs = tracked_persist(
        docs.select("doc_id", F.explode(bigram_pairs()).alias("bg")).select(
            "doc_id", F.col("bg.h").alias("h"), F.col("bg.w").alias("w")
        )
    )
    return bigram_logprob_from(pairs)


def bigram_logprob_from(pairs: DataFrame) -> DataFrame:
    """text_bigram_logprob's scoring half over a caller-supplied
    bigram stream — (doc_id, h, w[, extra ignored]), PERSISTED by the
    caller (it is consumed by the count shuffle and the scoring join).
    Split out (r13) so pipeline_corpus_curation_v3 can feed this gate
    and the DSIR gate from ONE tokenize+explode pass instead of two."""
    from etl_data_pipeline_spark.functions.caching import tracked_persist

    bcnt = tracked_persist(
        pairs.groupBy("h", "w").agg(F.count("*").alias("bcnt"))
    )
    hcnt = bcnt.groupBy("h").agg(F.sum("bcnt").alias("hcnt"))
    per_doc = tracked_persist(
        pairs.join(bcnt, ["h", "w"])
        .join(hcnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            hround(
                F.avg(F.log(F.col("bcnt") / F.col("hcnt"))), 6
            ).alias("mean_logprob"),
        )
    )
    gm = per_doc.groupBy().agg(
        hround(F.avg("mean_logprob"), 6).alias("corpus_mean")
    )
    return per_doc.crossJoin(F.broadcast(gm)).select(
        "doc_id",
        "n_bigrams",
        "mean_logprob",
        (F.col("mean_logprob") >= F.col("corpus_mean")).alias("keep"),
    )


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the cheap gibberish/binary/boilerplate detector (natural prose
    sits in a narrow entropy band; base64 blobs score high, repeated
    padding scores low). H = −Σ p·ln p over the doc's own characters.

    Plan: explode characters, ONE map-side-combined shuffle on
    (doc_id, char) for counts, a second on doc_id folding the entropy
    sum — character-class cardinality bounds the first shuffle's
    groups at ~100 per doc regardless of document size. 6-dp rounding
    absorbs ln() last-ulp and sum-order noise (the tfidf contract)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    chars = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(F.split("text", "")).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "n_chars", "ch").agg(
        F.count("*").alias("cnt")
    )
    p = F.col("cnt") / F.col("n_chars")
    return (
        counts.groupBy("doc_id", "n_chars")
        .agg(
            F.count("*").alias("n_distinct_chars"),
            hround(-F.sum(p * F.log(p)), 6).alias("char_entropy"),
        )
        .select("doc_id", "n_chars", "n_distinct_chars", "char_entropy")
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021,
    Appendix A): per-document boolean rules over cheap corpus
    statistics, plus the composite keep decision. The rule FAMILY is
    Gopher's; thresholds are adapted to this synthetic corpus so every
    flag actually varies (the published bounds — e.g. 50..100k words —
    would be constant over 10..99-word docs). Rules whose signal is
    degenerate here (symbol-to-word ratio, bullet/ellipsis lines: the
    corpus has no punctuation or newlines) are covered by
    ``text_quality``'s punct_ratio instead and omitted.

    Signals: word count, mean word length ((n_chars − (n_words−1)) /
    n_words — integer ratio, so both engines compute the identical
    double in ONE division, no rounding needed for the threshold
    compare), English stop-hits, and the repetition signal: the count
    of the most-frequent word BIGRAM (Gopher's top-2-gram mass).

    Plan: one projection for the per-row signals carried as grouping
    keys through the bigram explode → two map-side-combined shuffles
    keyed by doc_id (bounded groups: ≤ n_words−1 bigrams/doc), then a
    pure-codegen rule projection. Docs with < 2 words have no bigram
    and drop out in both engines (inner semantics, documented)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "n_chars", _tokens().alias("toks"))
    sig = t.select(
        "doc_id",
        "n_chars",
        F.size("toks").alias("n_words"),
        F.size(
            F.filter("toks", lambda x: x.isin(*STOPWORDS["en"]))
        ).alias("stop_hits"),
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
                F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    top = (
        sig.groupBy("doc_id", "n_chars", "n_words", "stop_hits", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "n_chars", "n_words", "stop_hits")
        .agg(F.max("cnt").alias("top_bigram_cnt"))
    )
    mwl = (F.col("n_chars") - (F.col("n_words") - 1)) / F.col("n_words")
    rules = {
        "rule_word_count": F.col("n_words").between(20, 90),
        "rule_mean_word_len": (mwl >= 4.3) & (mwl <= 4.7),
        "rule_stopwords": F.col("stop_hits") >= 2,
        "rule_repetition": F.col("top_bigram_cnt") <= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return top.select(
        "doc_id",
        "n_words",
        hround(mwl, 6).alias("mean_word_len"),
        "stop_hits",
        "top_bigram_cnt",
        *[c.alias(name) for name, c in rules.items()],
        keep.alias("keep"),
    )


# Hashed linear-model constants shared by the Spark impl and the
# DuckDB oracle of text_quality_classifier. P bounds the fold
# accumulator (acc*31+cp < 31·2^31+255 ≪ 2^63 — no BIGINT overflow);
# D is the feature-hash bucket count; the weight of bucket j is the
# Knuth-multiplicative pseudo-random ((j·2654435761) mod 2^21)/2^21 −
# 0.5 ∈ [−0.5, 0.5) — fixed, not trained, but exercises the exact
# inference plan a trained export would use.
CLS_P = 2_147_483_647
CLS_D = 1024
CLS_BIAS = 0.1


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText/CCNet-style quality-classifier INFERENCE: score each
    document with a hashed bag-of-words linear model — the standard
    model-based quality filter in LLM data pipelines (CCNet's fastText
    LM filter; LLaMA's Wikipedia-reference classifier).

    The whole scorer is one whole-stage-codegen projection: tokens →
    portable polynomial hash (fold of acc·31 + codepoint mod P — the
    SAME integer fold DuckDB's list_reduce replays, so the oracle
    reproduces bucket ids exactly) → feature bucket (mod D) → weight
    lookup as pure arithmetic (no map, no broadcast, no UDF) → summed
    logit → sigmoid. Both engines fold the token array LEFT-TO-RIGHT,
    so even the floating-point sum order is identical. At 100 TB this
    is an embarrassingly parallel per-row transform with zero shuffle;
    swapping in trained weights means substituting a broadcast
    map<int,double> for the weight formula — the plan shape is
    unchanged."""
    docs = spread(load_table(spark, sf_dir, "documents"))

    def bucket(tok):
        h = F.aggregate(
            F.split(tok, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % CLS_P,
        )
        return h % CLS_D

    def weight(tok):
        j = bucket(tok)
        return ((j * F.lit(2_654_435_761)) % F.lit(2_097_152)) / F.lit(
            2_097_152.0
        ) - 0.5

    toks = _tokens()
    logit = F.aggregate(
        toks, F.lit(0.0), lambda acc, tok: acc + weight(tok)
    ) + F.lit(CLS_BIAS)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        hround(logit, 6).alias("logit"),
        hround(prob, 6).alias("prob"),
        (prob >= 0.5).alias("keep"),
    )


QUERIES = {
    "text_gopher_rules": text_gopher_rules,
    "text_quality_classifier": text_quality_classifier,
    "text_char_entropy": text_char_entropy,
    "text_unigram_logprob": text_unigram_logprob,
    "text_bigram_logprob": text_bigram_logprob,
    "dedup_substring_scrub": dedup_substring_scrub,
    "text_duplicate_spans": text_duplicate_spans,
    "text_contamination": text_contamination,
    "text_contamination_fuzzy": text_contamination_fuzzy,
    "text_bpe_pairs": text_bpe_pairs,
    "text_bpe_round2": text_bpe_round2,
    "text_pii_scrub": text_pii_scrub,
    "text_repetition": text_repetition,
    "text_stats": text_stats,
    "text_tfidf": text_tfidf,
    "text_chunks": text_chunks,
    "text_normalize": text_normalize,
    "text_top_tokens": text_top_tokens,
    "text_tokens": text_tokens,
    "text_lang_id": text_lang_id,
    "text_quality": text_quality,
    "text_fingerprint": text_fingerprint,
}

_EN = _sql_stop_hits("en")
_DE = _sql_stop_hits("de")
_ES = _sql_stop_hits("es")
_FR = _sql_stop_hits("fr")

# Shared oracle rendering of quality_cols(): the t/r CTEs compute the
# per-doc signals, SQL_QUALITY_SCORE the composite — the SINGLE SQL
# source of truth for the quality formula, consumed by the
# text_quality oracle below AND by llm/features.py's
# corpus_quality_resample oracle. Keep in lockstep with quality_cols().
SQL_QUALITY_SCORE = """CASE WHEN n_tokens < 5 THEN 0.0 ELSE
                   0.4 * least(stop_ratio * 5, 1.0)
                 + 0.3 * (1 - least(punct_ratio * 10, 1.0))
                 + 0.3 * least(mean_tok_len / 8, 1.0) END"""


def sql_quality_cte() -> str:
    """``t``/``r`` CTE bodies (no WITH keyword) deriving the quality
    signal ratios per document."""
    return f"""t AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct,
                   {_EN} AS en_hits
            FROM documents
        ), r AS (
            SELECT doc_id, n_tokens,
                   CAST(en_hits AS DOUBLE) / n_tokens AS stop_ratio,
                   CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
                   CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_tok_len
            FROM t
        )"""

ORACLE = {
    "text_gopher_rules": f"""
        WITH t AS (
            SELECT doc_id, length(text) AS n_chars,
                   string_split(text, ' ') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, n_chars, len(toks) AS n_words,
                   {_EN.replace("string_split(text, ' ')", 'toks')} AS stop_hits,
                   unnest(list_zip(toks, toks[2:])) AS z
            FROM t
        ), b AS (
            SELECT doc_id, n_chars, n_words, stop_hits,
                   z[1] || ' ' || z[2] AS bigram, count(*) AS cnt
            FROM s WHERE z[2] IS NOT NULL
            GROUP BY doc_id, n_chars, n_words, stop_hits, bigram
        ), top AS (
            SELECT doc_id, n_chars, n_words, stop_hits,
                   max(cnt) AS top_bigram_cnt
            FROM b GROUP BY doc_id, n_chars, n_words, stop_hits
        )
        SELECT doc_id, n_words,
               {sql_round('CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words', 6)}
                   AS mean_word_len,
               stop_hits, top_bigram_cnt,
               n_words BETWEEN 20 AND 90 AS rule_word_count,
               (CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words >= 4.3
                AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words <= 4.7)
                   AS rule_mean_word_len,
               stop_hits >= 2 AS rule_stopwords,
               top_bigram_cnt <= 2 AS rule_repetition,
               (n_words BETWEEN 20 AND 90
                AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words >= 4.3
                AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words <= 4.7
                AND stop_hits >= 2 AND top_bigram_cnt <= 2) AS keep
        FROM top
    """,
    "text_quality_classifier": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), s AS (
            SELECT doc_id, len(toks) AS n_tokens,
                   list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                           list_transform(toks, tok ->
                               CAST((((list_reduce(
                                           list_prepend(CAST(0 AS BIGINT),
                                               list_transform(
                                                   string_split(tok, ''),
                                                   c -> ord(c))),
                                           (a, b) -> (a * 31 + b) % {CLS_P})
                                       % {CLS_D}) * 2654435761) % 2097152)
                                   AS DOUBLE) / 2097152.0 - 0.5)),
                       (a, b) -> a + b) + {CLS_BIAS} AS logit
            FROM t
        )
        SELECT doc_id, n_tokens,
               {sql_round('logit', 6)} AS logit,
               {sql_round('1.0 / (1.0 + exp(-logit))', 6)} AS prob,
               1.0 / (1.0 + exp(-logit)) >= 0.5 AS keep
        FROM s
    """,
    "text_char_entropy": """
        WITH chars AS (
            SELECT doc_id, length(text) AS n_chars, substr(text, i, 1) AS ch
            FROM (SELECT doc_id, text,
                         unnest(range(1, length(text) + 1)) AS i
                  FROM documents)
        ), counts AS (
            SELECT doc_id, n_chars, ch, count(*) AS cnt
            FROM chars GROUP BY doc_id, n_chars, ch
        )
        SELECT doc_id, n_chars, count(*) AS n_distinct_chars,
               floor((-sum((cnt * 1.0 / n_chars)
                           * ln(cnt * 1.0 / n_chars))) * 1000000 + 0.5)
                   / 1000000 AS char_entropy
        FROM counts GROUP BY doc_id, n_chars
    """,
    "text_bigram_logprob": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), bg AS (
            SELECT doc_id, ts[i] AS h, ts[i + 1] AS w
            FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM t)
        ), bcnt AS (
            SELECT h, w, count(*) AS bcnt FROM bg GROUP BY h, w
        ), hcnt AS (
            SELECT h, sum(bcnt) AS hcnt FROM bcnt GROUP BY h
        ), per_doc AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   floor(avg(ln(bcnt * 1.0 / hcnt)) * 1000000 + 0.5)
                       / 1000000 AS mean_logprob
            FROM bg JOIN bcnt USING (h, w) JOIN hcnt USING (h)
            GROUP BY doc_id
        ), gm AS (
            SELECT floor(avg(mean_logprob) * 1000000 + 0.5) / 1000000
                       AS corpus_mean
            FROM per_doc
        )
        SELECT doc_id, n_bigrams, mean_logprob,
               mean_logprob >= corpus_mean AS keep
        FROM per_doc CROSS JOIN gm
    """,
    "text_unigram_logprob": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ), vocab AS (
            SELECT token, count(*) AS cnt FROM toks GROUP BY token
        ), tot AS (SELECT sum(cnt) AS total FROM vocab),
        per_doc AS (
            SELECT doc_id, count(*) AS n_tokens,
                   floor(avg(ln(cnt * 1.0 / total)) * 1000000 + 0.5)
                       / 1000000 AS mean_logprob
            FROM toks JOIN vocab USING (token) CROSS JOIN tot
            GROUP BY doc_id
        ), gm AS (
            SELECT floor(avg(mean_logprob) * 1000000 + 0.5) / 1000000
                       AS corpus_mean
            FROM per_doc
        )
        SELECT doc_id, n_tokens, mean_logprob,
               mean_logprob >= corpus_mean AS keep
        FROM per_doc CROSS JOIN gm
    """,
    # DuckDB replays the full scrub: duplicate-span discovery, keeper
    # election, positional coverage, and the token-level rewrite — the
    # scrubbed corpus md5 must match Spark's byte for byte.
    "dedup_substring_scrub": f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), dup AS (
            SELECT span, min(doc_id) AS keeper
            FROM (SELECT doc_id, unnest({_sql_ngrams(DUP_SPAN_N)}) AS span
                  FROM documents)
            GROUP BY span HAVING count(*) >= 2
        ), pos AS (
            SELECT doc_id,
                   unnest(range(1, greatest(len(toks) - {DUP_SPAN_N - 2}, 1)))
                       AS start,
                   toks
            FROM tok
        ), hits AS (
            SELECT p.doc_id, p.start
            FROM (SELECT doc_id, start,
                         concat_ws(' ', {", ".join(
                             f"toks[start+{j}]" for j in range(DUP_SPAN_N))})
                             AS span
                  FROM pos) p
            JOIN dup d USING (span)
            WHERE p.doc_id <> d.keeper
        ), covidx AS (
            SELECT doc_id, list(DISTINCT tok_idx) AS cov
            FROM (SELECT doc_id,
                         unnest(range(start, start + {DUP_SPAN_N})) AS tok_idx
                  FROM hits)
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               len(t.toks) AS n_tokens,
               coalesce(len(c.cov), 0) AS n_removed,
               md5(coalesce(array_to_string(list_transform(
                   list_filter(range(1, len(t.toks) + 1),
                               i -> NOT list_contains(coalesce(c.cov, []), i)),
                   i -> t.toks[i]), ' '), '')) AS scrubbed_md5
        FROM tok t LEFT JOIN covidx c USING (doc_id)
    """,
    "text_duplicate_spans": f"""
        WITH spans AS (
            SELECT doc_id, unnest({_sql_ngrams(DUP_SPAN_N)}) AS span
            FROM documents
        )
        SELECT span,
               count(*) AS n_docs,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM spans
        GROUP BY span
        HAVING count(*) >= 2
        ORDER BY n_docs DESC, span ASC
        LIMIT {DUP_SPAN_TOPK}
    """,
    "text_bpe_round2": f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ), wc AS (
            SELECT w, count(*) AS n FROM words
            WHERE length(w) >= 2 GROUP BY w
        ), r1 AS (
            SELECT substr(w, i, 1) AS left_sym,
                   substr(w, i + 1, 1) AS right_sym,
                   sum(n) AS pair_count
            FROM wc, LATERAL (SELECT unnest(range(1, length(w))) AS i)
            GROUP BY 1, 2
        ), top1 AS (
            SELECT left_sym AS m_l, right_sym AS m_r FROM (
                SELECT *, row_number() OVER (
                    ORDER BY pair_count DESC, left_sym, right_sym) AS rk
                FROM r1) WHERE rk = 1
        ), v2 AS (
            SELECT replace(w, m_l || m_r, chr(1)) AS w, n, m_l, m_r
            FROM wc CROSS JOIN top1
        ), p2 AS (
            SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r,
                   sum(n) AS pair_count
            FROM (SELECT w, n FROM v2 WHERE length(w) >= 2) vv,
                 LATERAL (SELECT unnest(range(1, length(w))) AS i)
            GROUP BY 1, 2
        ), disp AS (
            SELECT replace(l, chr(1), '<' || m_l || m_r || '>') AS left_sym,
                   replace(r, chr(1), '<' || m_l || m_r || '>') AS right_sym,
                   pair_count
            FROM p2 CROSS JOIN top1
        )
        SELECT left_sym, right_sym,
               CAST(pair_count AS BIGINT) AS pair_count,
               CAST(row_number() OVER (
                   ORDER BY pair_count DESC, left_sym, right_sym)
                   AS INTEGER) AS merge_rank
        FROM disp
        ORDER BY merge_rank
        LIMIT {BPE_TOP_K}
    """,
    "text_bpe_pairs": f"""
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ), wc AS (
            SELECT w, count(*) AS n FROM words
            WHERE length(w) >= 2 GROUP BY w
        ), pairs AS (
            SELECT substr(w, i, 1) AS left_sym,
                   substr(w, i + 1, 1) AS right_sym,
                   sum(n) AS pair_count
            FROM wc, LATERAL (SELECT unnest(range(1, length(w))) AS i)
            GROUP BY 1, 2
        )
        SELECT left_sym, right_sym,
               CAST(pair_count AS BIGINT) AS pair_count,
               CAST(row_number() OVER (
                   ORDER BY pair_count DESC, left_sym, right_sym)
                   AS INTEGER) AS merge_rank
        FROM pairs
        ORDER BY merge_rank
        LIMIT {BPE_TOP_K}
    """,
    "text_contamination_fuzzy": f"""
        WITH sh AS (
            SELECT doc_id, unnest({_sql_ngrams(FUZZY_NGRAM)}) AS ngram
            FROM documents
        ), e AS (
            SELECT DISTINCT ngram FROM sh WHERE doc_id % {CONTAM_EVAL_MOD} = 0
        ), tsz AS (
            SELECT doc_id, count(*) AS n_ngrams FROM sh
            WHERE doc_id % {CONTAM_EVAL_MOD} <> 0 GROUP BY doc_id
        ), hits AS (
            SELECT sh.doc_id, count(*) AS hit
            FROM sh JOIN e USING (ngram)
            WHERE sh.doc_id % {CONTAM_EVAL_MOD} <> 0 GROUP BY sh.doc_id
        )
        SELECT t.doc_id, t.n_ngrams,
               coalesce(h.hit, 0) AS n_shared,
               {sql_round('coalesce(h.hit, 0)::DOUBLE / t.n_ngrams', 6)}
                   AS containment,
               CASE WHEN coalesce(h.hit, 0)::DOUBLE / t.n_ngrams
                         >= {FUZZY_CONTAM_MIN} THEN 1 ELSE 0 END
                   AS contaminated
        FROM tsz t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
    "text_contamination": f"""
        WITH sh AS (
            SELECT doc_id, unnest({_sql_ngrams(CONTAM_NGRAM)}) AS ngram
            FROM documents
        ), e AS (
            SELECT doc_id AS eval_doc, ngram FROM sh
            WHERE doc_id % {CONTAM_EVAL_MOD} = 0
        ), t AS (
            SELECT doc_id AS train_doc, ngram FROM sh
            WHERE doc_id % {CONTAM_EVAL_MOD} <> 0
        )
        SELECT train_doc, eval_doc, count(*) AS n_shared_ngrams
        FROM t JOIN e USING (ngram)
        GROUP BY train_doc, eval_doc
    """,
    "text_pii_scrub": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
               len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones,
               len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ips,
               md5(regexp_replace(regexp_replace(regexp_replace(
                       text, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g'),
                       '{PII_IPV4}', '[IP]', 'g')) AS scrubbed_md5,
               (len(regexp_extract_all(text, '{PII_EMAIL}'))
                + len(regexp_extract_all(text, '{PII_PHONE}'))
                + len(regexp_extract_all(text, '{PII_IPV4}'))) > 0 AS has_pii
        FROM documents
    """,
    "text_repetition": f"""
        WITH g AS (
            SELECT doc_id,
                   string_split(text, ' ') AS toks,
                   {_sql_ngrams_all(2)} AS g2,
                   {_sql_ngrams_all(3)} AS g3
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CASE WHEN len(g2) > 0 THEN
                       CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
                   ELSE 0.0 END AS d2,
                   CASE WHEN len(g3) > 0 THEN
                       CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                   ELSE 0.0 END AS d3,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(list_max(list_transform(list_distinct(toks),
                           t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
                           / len(toks)
                   ELSE 0.0 END AS tt
            FROM g
        )
        SELECT doc_id,
               {sql_round('d2', 6)} AS dup_2gram_frac,
               {sql_round('d3', 6)} AS dup_3gram_frac,
               {sql_round('tt', 6)} AS top_token_share,
               {sql_round('d3', 6)} > {REPETITION_DUP3_MAX} AS is_repetitive
        FROM m
    """,
    "text_tfidf": f"""
        WITH tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY doc_id, token
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        idf AS (
            SELECT token,
                   floor((ln(CAST(n_docs AS DOUBLE) / df)) * 1000000 + 0.5)
                       / 1000000 AS idf
            FROM (SELECT token, count(*) AS df FROM tf GROUP BY token)
                 CROSS JOIN n
        ), scored AS (
            SELECT tf.doc_id, tf.token, tf.tf,
                   floor((tf.tf * idf.idf) * 1000000 + 0.5) / 1000000 AS tfidf
            FROM tf JOIN idf ON tf.token = idf.token
        )
        SELECT doc_id, rank, token, tf, tfidf FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, token ASC) AS rank
            FROM scored)
        WHERE rank <= {TFIDF_TOP_K}
    """,
    "text_normalize": """
        SELECT doc_id,
               length(text) AS raw_len,
               length(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_len,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
        FROM documents
    """,
    "text_chunks": f"""
        WITH x AS (
            SELECT doc_id, text,
                   unnest(range(1, greatest(length(text), 1) + 1,
                                {CHUNK_STRIDE})) AS chunk_start
            FROM documents
        )
        SELECT doc_id,
               (chunk_start - 1) // {CHUNK_STRIDE} AS chunk_idx,
               chunk_start,
               length(substring(text, chunk_start, {CHUNK_SIZE})) AS chunk_len,
               md5(substring(text, chunk_start, {CHUNK_SIZE})) AS chunk_md5
        FROM x
    """,
    "text_top_tokens": f"""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT {TOP_TOKENS_K}
    """,
    "text_stats": f"""
        WITH t AS (SELECT lang, source, n_chars,
                          len(string_split(text, ' ')) AS n_tokens
                   FROM documents)
        SELECT lang, source, count(*) AS n_docs,
               {sql_round('avg(n_chars)', 4)} AS avg_chars,
               {sql_round('avg(n_tokens)', 4)} AS avg_tokens,
               max(n_chars) AS max_chars
        FROM t GROUP BY lang, source
    """,
    "text_tokens": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
               length(text) AS n_chars_computed
        FROM documents
    """,
    "text_lang_id": f"""
        WITH h AS (
            SELECT doc_id, lang,
                   {_EN} AS en_hits, {_DE} AS de_hits,
                   {_ES} AS es_hits, {_FR} AS fr_hits
            FROM documents)
        SELECT doc_id, lang,
               CASE WHEN en_hits >= de_hits AND en_hits >= es_hits
                         AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                    WHEN de_hits >= es_hits AND de_hits >= fr_hits
                         AND de_hits > 0 THEN 'de'
                    WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                    WHEN fr_hits > 0 THEN 'fr'
                    ELSE 'unknown' END AS lang_guess,
               en_hits, de_hits, es_hits, fr_hits
        FROM h
    """,
    "text_quality": f"""
        WITH {sql_quality_cte()}
        SELECT doc_id, n_tokens,
               {sql_round('stop_ratio', 6)} AS stop_ratio,
               {sql_round('punct_ratio', 6)} AS punct_ratio,
               {sql_round('mean_tok_len', 6)} AS mean_tok_len,
               {sql_round(SQL_QUALITY_SCORE, 6)} AS quality_score
        FROM r
    """,
    "text_fingerprint": """
        SELECT doc_id,
               md5(text) AS content_md5,
               md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
                   AS bow_md5,
               md5(substring(text, 1, 64)) AS prefix64_md5
        FROM documents
    """,
}
