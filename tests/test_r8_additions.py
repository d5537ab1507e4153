"""Round-8 additions: minhash-as-estimator error accounting and
metadata-filtered IVF ANN — behavioral invariants beyond the DuckDB
oracle parity both queries already carry."""

import os

import pytest
from pyspark.sql import functions as F

from etl_data_pipeline_spark.llm import dedup, similarity
from etl_data_pipeline_spark.plans import plan_str as _plan
from etl_data_pipeline_spark.session import load_table


# ------------------------------------------------- minhash estimator


def test_minhash_estimate_error_is_sketch_sized(spark, sf_dir):
    """The Broder estimator's per-pair std is sqrt(J(1-J)/K) <= 0.089
    at K=32; the MEAN absolute error across candidate pairs must be
    well inside a few std — a systematic bias (wrong permutation
    arithmetic, mismatched shingle sets) would blow past this."""
    rows = dedup.dedup_minhash_estimate(spark, sf_dir).collect()
    assert rows, "LSH produced no candidate pairs at this SF"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.abs_err == pytest.approx(
            abs(r.est_jaccard - r.exact_jaccard), abs=2e-6
        )
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.2


def test_minhash_estimate_covers_lsh_pairs(spark, sf_dir):
    """Every verified LSH near-dup pair appears among the estimator's
    candidate pairs (same generator), with exact_jaccard agreeing."""
    est = {
        (r.doc_a, r.doc_b): r.exact_jaccard
        for r in dedup.dedup_minhash_estimate(spark, sf_dir).collect()
    }
    for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        assert est.get((r.doc_a, r.doc_b)) == pytest.approx(
            r.shingle_jaccard, abs=1e-6
        )


# ------------------------------------------------- filtered ANN


def test_filtered_ann_respects_predicate(spark, sf_dir):
    """Every returned neighbor carries the query's own label — the
    filter is part of candidate generation, not post-hoc."""
    qlabel = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % similarity.QUERY_MOD == 0)
        .select("vec_id", "label")
        .collect()
    }
    rows = similarity.sim_ann_ivf_filtered(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.label == qlabel[r.query_id]
        assert 1 <= r.rank <= 3
        assert r.vec_id != r.query_id


def test_filtered_ann_ranks_are_dense_and_ordered(spark, sf_dir):
    by_q = {}
    for r in similarity.sim_ann_ivf_filtered(spark, sf_dir).collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine, r.vec_id))
    for q, rs in by_q.items():
        rs.sort()
        assert [r[0] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r[1] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_filtered_ann_plan_posture(spark, sf_dir):
    """Broadcast joins only (centroids + query cells), no cartesian,
    no Python nodes — the ann_ivf plan shape with the label predicate
    riding the same joins."""
    plan = _plan(similarity.sim_ann_ivf_filtered(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


# --------------------------------------- entropy-aware record linkage


def test_levenshtein_entropy_matches_fixed_split(spark, sf_dir):
    """Recall is derivation-independent (any contiguous tau+1 split
    pigeonholes substitutions), so on this corpus the best-match output
    must EQUAL the fixed-segment exhibit's output row for row."""
    fixed = sorted(
        map(tuple, dedup.dedup_levenshtein(spark, sf_dir).collect())
    )
    entropy = sorted(
        map(tuple, dedup.dedup_levenshtein_entropy(spark, sf_dir).collect())
    )
    assert entropy == fixed and len(entropy) > 0


def test_levenshtein_entropy_shrinks_dominant_block(spark, sf_dir):
    """The point of the derivation: on zero-padded sequential ids the
    fixed split's constant-prefix segment is one giant block; the
    entropy boundaries must make the LARGEST block strictly smaller
    (and with it the worst-case quadratic verify volume)."""

    def max_block(keyed):
        return (
            keyed.groupBy("seg", "seg_val")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    digits = F.regexp_replace(F.col("c_name"), "[^0-9]", "")
    fixed_keyed = cust.select(
        F.posexplode(
            F.array(
                *[
                    F.substring(
                        digits,
                        1 + dedup.LEVENSHTEIN_SEG_LEN * i,
                        dedup.LEVENSHTEIN_SEG_LEN,
                    )
                    for i in range(dedup.LEVENSHTEIN_SEGMENTS)
                ]
            )
        ).alias("seg", "seg_val")
    )
    fixed_max = max_block(fixed_keyed)
    entropy_max = max_block(dedup._entropy_keyed(spark, sf_dir))
    assert entropy_max < fixed_max, (entropy_max, fixed_max)


def test_levenshtein_entropy_boundaries_skip_constant_positions(spark):
    """A corpus whose first 6 digits are constant: both boundaries
    must land in the varying tail (positions 7..9), because constant
    positions carry zero discriminative mass."""
    import tempfile

    d = tempfile.mkdtemp()
    rows = [(i, f"Customer#000000{i:03d}") for i in range(1, 301)]
    spark.createDataFrame(rows, "c_custkey long, c_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    keyed = dedup._entropy_keyed(spark, d)
    # max block: with boundaries in the varying tail, segments are
    # ~1 digit wide there, so no block exceeds ~n/10 + ties; with the
    # fixed 3/3/3 split, segment 0 and 1 would each be ONE 300-row
    # block. 100 is the discriminator between the two regimes.
    blocks = keyed.groupBy("seg", "seg_val").count().collect()
    assert max(b["count"] for b in blocks) < 150
    out = sorted(
        map(tuple, dedup.dedup_levenshtein_entropy(spark, d).collect())
    )
    assert out  # neighbors within 2 digit edits exist and are found


# ------------------------------------------------ incremental dedup


def test_minhash_incremental_split_and_best_match(spark, sf_dir):
    """Every output row pairs a batch doc (id % 10 == 0) with an index
    doc (id % 10 != 0), one row per batch doc, and the match dominates
    every cross-split pair the full LSH listing knows about."""
    rows = dedup.dedup_minhash_incremental(spark, sf_dir).collect()
    assert rows
    seen = set()
    best = {}
    for r in rows:
        assert r.batch_doc % dedup.INCR_BATCH_MOD == 0
        assert r.index_doc % dedup.INCR_BATCH_MOD != 0
        assert r.batch_doc not in seen  # rank-1: single decision row
        seen.add(r.batch_doc)
        assert r.shingle_jaccard >= dedup.JACCARD_THRESHOLD
        best[r.batch_doc] = r.shingle_jaccard
    # cross-split pairs from the full self-join listing cannot beat the
    # incremental best match for their batch-side doc
    for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        for b, i in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if b % dedup.INCR_BATCH_MOD == 0 and i % dedup.INCR_BATCH_MOD != 0:
                assert b in best and best[b] >= r.shingle_jaccard - 1e-9


def test_filtered_recall_monotonic_in_nprobe(spark, sf_dir):
    """Deeper probing can only add candidates, so filtered recall@k is
    non-decreasing in nprobe, and the hit count never exceeds the
    approx or exact counts."""
    rows = sorted(
        similarity.sim_ann_ivf_filtered_recall(spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == list(similarity.RECALL_NPROBES)
    recalls = [r.recall_at_k for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        assert r.n_hit <= min(r.n_approx, r.n_exact)
        assert 0.0 <= r.recall_at_k <= 1.0


# ------------------------------------------------ BMP header decode


def test_decode_bmp_parses_real_bytes(spark):
    """decode_bmp_headers must parse REAL BMP bytes built here from
    the spec (not by the operator's own packer): a 2x2 24-bit
    bottom-up bitmap and a 3x5 8-bit TOP-DOWN one (negative height),
    plus a corrupted signature that must yield NULL fields."""
    import struct

    from etl_data_pipeline_spark.llm.multimodal import decode_bmp_headers

    def bmp(width, height, bpp, body=b"x"):
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0, 0, 0, 0, 0
        )
        filehdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        return filehdr + dib + body

    rows = [
        (1, bytearray(bmp(2, 2, 24))),
        (2, bytearray(bmp(3, -5, 8))),       # top-down: height stored negative
        (3, bytearray(b"XM" + bmp(9, 9, 32)[2:])),  # bad signature
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_bmp_headers(df).collect()}
    r1 = out[1]
    assert (r1.format, r1.width, r1.height, r1.top_down, r1.bpp) == (
        "bmp", 2, 2, False, 24,
    )
    assert r1.row_stride == 8  # 2 px * 3 B = 6, aligned up to 8
    r2 = out[2]
    assert (r2.format, r2.width, r2.height, r2.top_down, r2.bpp) == (
        "bmp", 3, 5, True, 8,
    )
    assert r2.row_stride == 4  # 3 px * 1 B = 3, aligned up to 4
    assert out[3].format is None and out[3].width is None


# ------------------------------------------------- dedup report


def test_dedup_report_cross_checks_standalone_queries(spark, sf_dir):
    """Each report row must equal an independent recomputation from
    the standalone queries it summarizes."""
    from etl_data_pipeline_spark.llm.text_analysis import substring_scrub

    rows = {r.signal: r for r in dedup.pipeline_dedup_report(spark, sf_dir).collect()}
    assert set(rows) == {"exact", "near_lsh", "substring"}
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    for r in rows.values():
        assert r.n_docs == n
        assert 0 <= r.affected_docs <= n
        assert r.pct_affected == pytest.approx(r.affected_docs / n, abs=1e-6)
    groups = dedup.dedup_exact_docs(spark, sf_dir).collect()
    assert rows["exact"].affected_docs == sum(
        g.n_copies for g in groups if g.n_copies > 1
    )
    assert rows["exact"].dup_mass == sum(
        g.n_copies - 1 for g in groups if g.n_copies > 1
    )
    near_docs = set()
    for p in dedup.dedup_minhash_lsh(spark, sf_dir).collect():
        near_docs.update((p.doc_a, p.doc_b))
    assert rows["near_lsh"].affected_docs == len(near_docs)
    scrubbed = substring_scrub(docs.select("doc_id", "text")).collect()
    assert rows["substring"].affected_docs == sum(
        1 for s in scrubbed if s.n_removed > 0
    )
    assert rows["substring"].dup_mass == sum(s.n_removed for s in scrubbed)


# -------------------------------------------- IVF index layout + DPP


def test_ivf_index_layout_prunes_and_matches(spark, sf_dir, tmp_path):
    """The (cell, label)-partitioned index: querying it with the full
    workload returns EXACTLY sim_ann_ivf_filtered's rows, and a
    LOOKUP (query_ids=[...], the production point-query shape) reads a
    strict subset of the index files via STATIC partition pruning —
    at most nprobe directories, one file each (the repartitioned
    layout writes one file per inverted list). Dynamic partition
    pruning is deliberately NOT the claim: Spark declines to insert a
    DPP subquery when the filtering side carries the rank-by-distance
    window, and the aggregate workload probes ~every cell anyway (see
    query_ivf_index's docstring)."""
    idx = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(spark, sf_dir, idx)
    got = similarity.query_ivf_index(spark, idx, sf_dir)
    want = sorted(
        map(tuple, similarity.sim_ann_ivf_filtered(spark, sf_dir).collect())
    )
    assert sorted(map(tuple, got.collect())) == want and want
    # layout sanity: hive-style partition dirs for both columns, ONE
    # file per (cell, label) inverted list
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert cells
    labels = [
        d
        for d in os.listdir(os.path.join(idx, cells[0]))
        if d.startswith("label=")
    ]
    assert labels
    first_leaf = os.path.join(idx, cells[0], labels[0])
    assert (
        len([f for f in os.listdir(first_leaf) if f.endswith(".parquet")]) == 1
    )
    # lookup shape: static pruning reads only the probed directories
    qid = want[0][0]
    one = similarity.query_ivf_index(spark, idx, sf_dir, query_ids=[qid])
    got_one = sorted(map(tuple, one.collect()))
    assert got_one == [r for r in want if r[0] == qid] and got_one
    full_files = set(spark.read.parquet(idx).inputFiles())
    one_files = set(one.inputFiles())
    assert one_files < full_files  # strict subset
    assert len(one_files) <= similarity.IVF_FILTERED_NPROBE
