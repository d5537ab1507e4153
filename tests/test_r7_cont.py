"""Behavioral tests for the round-7 continuation operators:
pareto_frontier, asof_interpolate, sketch_cms_topk_bounds,
sim_ann_pq_adc. Each is checked against an independent in-process
recomputation (numpy/pure Python), not just the DuckDB oracle."""

import math

import numpy as np
from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators.aggregates import (
    CMS_DEPTH,
    CMS_WIDTH,
    sketch_cms_topk_bounds,
)
from etl_data_pipeline_spark.operators.analytics import pareto_frontier
from etl_data_pipeline_spark.operators.asof import (
    INTERP_STEP_SECS,
    asof_interpolate,
)
from etl_data_pipeline_spark.llm.similarity import (
    CENTROID_MOD_REMAINDER,
    DIM,
    PQ_CODEBOOK_ID_CAP,
    PQ_M,
    QUERY_MOD,
    sim_ann_pq_adc,
)
from etl_data_pipeline_spark.session import load_table


def _r6(x: float) -> float:
    """Engine-faithful half-up rounding (hround/sql_round's
    floor(x*1e6+0.5)/1e6), NOT Python's banker's round()."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def _sq(a, b) -> float:
    """Engine-faithful squared L2: the same three-dot expansion
    Spark's _sq_dist and the oracles' _SQ_SQL compute — np.dot(a-b,
    a-b) accumulates differently in the last ulps."""
    return (
        float(np.dot(a, a)) - 2.0 * float(np.dot(a, b)) + float(np.dot(b, b))
    )


def test_pareto_frontier_matches_quadratic_definition(spark, sf_dir):
    got = {(r.price, r.size) for r in pareto_frontier(spark, sf_dir).collect()}
    pts = {
        (r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .collect()
    }
    brute = {
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p and
            (q[0] < p[0] or q[1] < p[1])
            for q in pts
        )
    }
    assert got == brute and got


def test_pareto_frontier_is_a_chain(spark, sf_dir):
    # Frontier invariant: sorted by price ascending, sizes strictly fall.
    rows = pareto_frontier(spark, sf_dir).collect()
    sizes = [r.size for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert len(set(sizes)) == len(sizes)


def test_asof_interpolate_brackets_and_formula(spark, sf_dir):
    out = asof_interpolate(spark, sf_dir)
    rows = out.collect()
    assert rows
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("val"))
        .collect()
    )
    from datetime import timezone

    # collect() returns session-TZ (UTC) wall-clock NAIVE datetimes;
    # interpret them explicitly as UTC so the test passes on any host TZ.
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (r.ts.replace(tzinfo=timezone.utc).timestamp(), r.val)
        )
    for series in by_user.values():
        series.sort()
    import bisect

    checked = 0
    for r in rows[:500]:
        series = by_user[r.user_id]
        from datetime import datetime, timezone

        t = (
            datetime.strptime(r.grid_ts, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
        assert t % INTERP_STEP_SECS == 0
        i = bisect.bisect_right([s[0] for s in series], t)
        assert 0 < i < len(series)  # inside the hull, both brackets exist
        (pt, pv), (nt, nv) = series[i - 1], series[i]
        expect = pv + (nv - pv) * ((t - pt) / (nt - pt))
        assert abs(r.value_interp - expect) < 1e-5
        checked += 1
    assert checked


def test_cms_bounds_hold_and_sketch_is_fixed_size(spark, sf_dir):
    out = sketch_cms_topk_bounds(spark, sf_dir).collect()
    assert out and all(r.never_undercounts for r in out)
    assert all(r.within_3eps for r in out)
    # The sketch relation itself never exceeds depth x width cells.
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cells = tokens.select(
        *[
            F.pmod(F.hash("token", F.lit(j)), F.lit(CMS_WIDTH)).alias(f"b{j}")
            for j in range(CMS_DEPTH)
        ]
    )
    n_cells = (
        cells.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), F.col(f"b{j}").alias("b"))
                        for j in range(CMS_DEPTH)
                    ]
                )
            ).alias("c")
        )
        .select("c.j", "c.b")
        .distinct()
        .count()
    )
    assert n_cells <= CMS_DEPTH * CMS_WIDTH


def test_pq_adc_matches_numpy_pipeline(spark, sf_dir):
    out = sim_ann_pq_adc(spark, sf_dir).collect()
    assert out
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    sub = DIM // PQ_M
    cb = {
        cid: v
        for cid, v in vecs.items()
        if cid % QUERY_MOD == CENTROID_MOD_REMAINDER
        and cid < PQ_CODEBOOK_ID_CAP
    }
    cids = sorted(cb)

    def codes(v):
        out = []
        for s in range(PQ_M):
            sv = v[s * sub : (s + 1) * sub]
            best = min(
                (_sq(sv, cb[c][s * sub : (s + 1) * sub]), c) for c in cids
            )
            out.append(best[1])
        return out

    code_map = {vid: codes(v) for vid, v in vecs.items()}
    queries = sorted(
        v for v in vecs if v % QUERY_MOD == 0 and v < PQ_CODEBOOK_ID_CAP
    )
    for q in queries:
        qv = vecs[q]
        dists = []
        for vid, cs in code_map.items():
            if vid == q:
                continue
            d = 0.0
            for s, c in enumerate(cs):
                qs = qv[s * sub : (s + 1) * sub]
                cv = cb[c][s * sub : (s + 1) * sub]
                d += _sq(qs, cv)
            dists.append((_r6(d), vid))
        dists.sort()
        expect = [vid for _, vid in dists[:5]]
        got = [r.vec_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == q]
        assert got == expect, (q, got, expect)


def test_ivfpq_matches_numpy_pipeline(spark, sf_dir):
    from etl_data_pipeline_spark.llm.similarity import sim_ann_ivfpq

    out = sim_ann_ivfpq(spark, sf_dir).collect()
    assert out
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cents = {
        cid: v for cid, v in vecs.items() if cid % QUERY_MOD == CENTROID_MOD_REMAINDER
    }
    # Replay the ANN-assisted assignment: hyperplane-bucket shortlist
    # (count-derived mask), then argmax over the shortlisted centroids
    # only; bucket-miss -> unindexed (None).
    from etl_data_pipeline_spark.llm.dedup import (
        SEM_LSH_MAX_PLANES,
        SEM_LSH_TABLES,
        SEM_SEED_OFFSET,
        _sem_planes_used,
    )
    from etl_data_pipeline_spark.llm.similarity import PLANES_SEED, _planes

    mask = 1 << _sem_planes_used(len(cents))
    table_planes = [
        _planes(SEM_LSH_MAX_PLANES, seed=PLANES_SEED + SEM_SEED_OFFSET + t)
        for t in range(SEM_LSH_TABLES)
    ]

    def buckets(v):
        return {
            (t, sum(1 << i for i, p in enumerate(planes)
                    if float(np.dot(v, np.array(p))) > 0) % mask)
            for t, planes in enumerate(table_planes)
        }

    cent_buckets = {cid: buckets(c) for cid, c in cents.items()}

    def cell(v):
        vb = buckets(v)
        shortlist = [c for c, bs in cent_buckets.items() if bs & vb]
        if not shortlist:
            return None
        scored = sorted(
            (
                -_r6(
                    float(np.dot(cents[c], v))
                    / (math.sqrt(float(np.dot(cents[c], cents[c])))
                       * math.sqrt(float(np.dot(v, v))))
                ),
                c,
            )
            for c in shortlist
        )
        return scored[0][1]

    cells = {vid: cell(v) for vid, v in vecs.items()}
    sub = DIM // PQ_M
    cb = {c: v for c, v in cents.items() if c < PQ_CODEBOOK_ID_CAP}
    cids = sorted(cb)

    def codes(v):
        cs = []
        for s in range(PQ_M):
            sv = v[s * sub : (s + 1) * sub]
            cs.append(
                min(
                    (_sq(sv, cb[c][s * sub : (s + 1) * sub]), c)
                    for c in cids
                )[1]
            )
        return cs

    code_map = {vid: codes(v) for vid, v in vecs.items()}
    queries = sorted(
        v for v in vecs if v % QUERY_MOD == 0 and v < PQ_CODEBOOK_ID_CAP
    )
    for q in queries:
        qv, qcell = vecs[q], cells[q]
        if qcell is None:
            assert not [r for r in out if r.query_id == q]
            continue
        dists = []
        for vid, cs in code_map.items():
            if vid == q or cells[vid] is None or cells[vid] != qcell:
                continue
            d = 0.0
            for s, c in enumerate(cs):
                qs = qv[s * sub : (s + 1) * sub]
                cv = cb[c][s * sub : (s + 1) * sub]
                d += _sq(qs, cv)
            dists.append((_r6(d), vid))
        dists.sort()
        expect = [vid for _, vid in dists[:3]]
        got_rows = sorted(
            (r for r in out if r.query_id == q), key=lambda r: r.rank
        )
        assert [r.vec_id for r in got_rows] == expect, (q, got_rows, expect)
        assert all(r.cell == qcell for r in got_rows)


def test_r7_cont_plan_budgets(spark, sf_dir):
    """Shuffle budgets + no Python/cartesian nodes for the
    continuation operators (the 100 TB posture pin)."""
    from etl_data_pipeline_spark.plans import exchange_count, plan_str

    from etl_data_pipeline_spark.llm.similarity import sim_ann_ivfpq

    budgets = [
        (pareto_frontier, 6),
        (asof_interpolate, 6),
        (sketch_cms_topk_bounds, 6),
        (sim_ann_pq_adc, 7),
        # The ANN-assisted coarse quantizer (bucket join + dedup +
        # per-vec argmax window + reattach) adds keyed, bounded
        # shuffles over the dense form; cache-state-dependent reuse
        # moves the count a little — pin the observed max.
        (sim_ann_ivfpq, 19),
    ]
    for q, budget in budgets:
        plan = plan_str(q(spark, sf_dir))
        assert exchange_count(plan) <= budget, (q.__name__, plan)
        for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
            assert bad not in plan, q.__name__
