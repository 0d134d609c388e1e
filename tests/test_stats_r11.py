"""Round-11 session-3 operators: rank tests, exact tests, GLM, graph
micro-structure, standardization, series memory, FDR control.

Each test pins the operator to a hand-computable (or closed-form)
reference on tiny data — the same strategy the reference repo's test
suite uses for its assay methods (small fixtures, known answers).
"""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinpy_spark.operators.assoc import (
    fisher_exact_2x2,
    kruskal_wallis,
    logistic_newton,
    mann_whitney_u,
    mcnemar_test,
    spearman_rho,
    tdt_test,
)
from clinpy_spark.operators.graph import assortativity, clustering_coefficient
from clinpy_spark.operators.quality import bh_adjust
from clinpy_spark.operators.survival import smr
from clinpy_spark.operators.windows import acf


def test_kruskal_two_groups_equals_mannwhitney_z2(spark):
    # For k = 2 the tie-corrected H statistic equals z^2 exactly.
    rows = [Row(v=float(v), g=g)
            for g, vals in (("a", [1, 3, 3, 5, 9]), ("b", [2, 3, 6, 8]))
            for v in vals]
    df = spark.createDataFrame(rows)
    h = kruskal_wallis(df, "v", "g").collect()[0]
    z = mann_whitney_u(df, "v", "g", "a", "b").collect()[0].z
    assert h.n_groups == 2 and h.df == 1 and h.n == 9
    assert abs(h.h_corrected - z * z) < 1e-5


def test_kruskal_identical_groups_zero(spark):
    df = spark.createDataFrame(
        [Row(v=float(i % 4), g=str(i % 3)) for i in range(12)])
    # groups see the same values -> rank sums proportional to sizes -> H=0
    out = kruskal_wallis(df, "v", "g").collect()[0]
    assert abs(out.h) < 1e-9


def test_spearman_monotone_and_reverse(spark):
    df = spark.createDataFrame(
        [Row(x=float(i), y=float(i * i)) for i in range(10)])
    assert spearman_rho(df, "x", "y").collect()[0].rho == 1.0
    df2 = spark.createDataFrame(
        [Row(x=float(i), y=float(-i)) for i in range(10)])
    assert spearman_rho(df2, "x", "y").collect()[0].rho == -1.0
    const = spark.createDataFrame([Row(x=1.0, y=float(i)) for i in range(5)])
    assert spearman_rho(const, "x", "y").collect()[0].rho is None


def test_mcnemar_known_counts(spark):
    # 10 pairs: 3 (1->0), 1 (0->1), rest concordant.
    rows = ([Row(b=1, a=0)] * 3 + [Row(b=0, a=1)] * 1
            + [Row(b=1, a=1)] * 4 + [Row(b=0, a=0)] * 2)
    out = mcnemar_test(spark.createDataFrame(rows), "b", "a").collect()[0]
    assert (out.b, out.c, out.n_pairs) == (3, 1, 10)
    assert abs(out.chi2_cc - (abs(3 - 1) - 1) ** 2 / 4) < 1e-9
    assert abs(out.or_paired - 3.0) < 1e-9


def test_tdt_counts_and_chi2(spark):
    # Trio (f=1, m=0, c=1): one het parent transmitted the alt -> b=1.
    # Trio (f=1, m=0, c=0): untransmitted -> c=1.
    # Trio (f=2, m=1, c=2): det=1, b = 2-1 = 1 from the het mother.
    # Trio (f=0, m=0, c=0): no het parents -> uninformative.
    # Trio (f=2, m=0, c=2): Mendel-inconsistent (max = 1+0) -> excluded.
    rows = [
        Row(variant=1, gtf=1, gtm=0, gtc=1),
        Row(variant=1, gtf=1, gtm=0, gtc=0),
        Row(variant=1, gtf=2, gtm=1, gtc=2),
        Row(variant=1, gtf=0, gtm=0, gtc=0),
        Row(variant=1, gtf=2, gtm=0, gtc=2),
    ]
    out = tdt_test(
        spark.createDataFrame(rows), "variant", "gtf", "gtm", "gtc"
    ).collect()[0]
    assert out.n_informative_trios == 3
    assert out.b_transmitted == 2 and out.c_untransmitted == 1
    assert abs(out.tdt_chi2 - (2 - 1) ** 2 / 3) < 1e-5


def test_logistic_binary_x_closed_form(spark):
    # With binary x the MLE is the empirical log-odds difference.
    rows = ([Row(x=0.0, y=1)] * 20 + [Row(x=0.0, y=0)] * 80
            + [Row(x=1.0, y=1)] * 40 + [Row(x=1.0, y=0)] * 60)
    out = logistic_newton(
        spark.createDataFrame(rows), "x", "y", iterations=6).collect()[0]
    b0 = math.log(20 / 80)
    b1 = math.log(40 / 60) - b0
    assert abs(out.beta0 - b0) < 1e-5
    assert abs(out.beta1 - b1) < 1e-5
    # Wald se for 2x2 logistic: sqrt(sum of 1/cell)
    se = math.sqrt(1 / 20 + 1 / 80 + 1 / 40 + 1 / 60)
    assert abs(out.se1 - se) < 1e-4
    assert out.n == 200 and out.n_pos == 60


def test_logistic_constant_x_is_null(spark):
    rows = [Row(x=2.0, y=i % 2) for i in range(10)]
    out = logistic_newton(spark.createDataFrame(rows), "x", "y").collect()[0]
    assert out.beta1 is None and out.beta0 is None


def _hypergeom_pmf(n, r1, c1, k):
    def c(a, b):
        return math.comb(a, b)
    return c(r1, k) * c(n - r1, c1 - k) / c(n, c1)


def test_fisher_exact_matches_direct_enumeration(spark):
    # table [[3, 1], [2, 8]]
    rows = ([Row(e=1, y=1)] * 3 + [Row(e=1, y=0)] * 1
            + [Row(e=0, y=1)] * 2 + [Row(e=0, y=0)] * 8)
    out = fisher_exact_2x2(
        spark.createDataFrame(rows), "e", "y").collect()[0]
    n, r1, c1, a = 14, 4, 5, 3
    pmfs = {k: _hypergeom_pmf(n, r1, c1, k)
            for k in range(max(0, c1 - (n - r1)), min(r1, c1) + 1)}
    p_obs = pmfs[a]
    p_two = sum(p for p in pmfs.values() if p <= p_obs * (1 + 1e-7))
    p_left = sum(p for k, p in pmfs.items() if k <= a)
    p_right = sum(p for k, p in pmfs.items() if k >= a)
    assert (out.a, out.b, out.c, out.d, out.n) == (3, 1, 2, 8, 14)
    assert abs(out.p_two_sided - p_two) < 1e-6
    assert abs(out.p_left - p_left) < 1e-6
    assert abs(out.p_right - p_right) < 1e-6


def test_clustering_coefficient_triangle_with_pendant(spark):
    # Triangle 1-2-3 plus pendant 3-4: local cc = (1, 1, 1/3, 0-excl).
    edges = spark.createDataFrame(
        [Row(u=1, v=2), Row(u=2, v=3), Row(u=1, v=3), Row(u=3, v=4)])
    out = clustering_coefficient(edges, "u", "v").collect()[0]
    assert out.n_nodes == 4 and out.n_eligible == 3 and out.n_closed == 3
    assert abs(out.avg_local_cc - (1 + 1 + 1 / 3) / 3) < 1e-6
    # wedges: node1:1, node2:1, node3:3 -> transitivity = 3*1/5
    assert abs(out.transitivity - 0.6) < 1e-6


def test_assortativity_star_is_negative_one(spark):
    edges = spark.createDataFrame([Row(u=0, v=i) for i in range(1, 5)])
    out = assortativity(edges, "u", "v").collect()[0]
    assert out.n_edges == 4 and out.n_nodes == 5
    assert abs(out.r - (-1.0)) < 1e-9


def test_assortativity_regular_graph_null(spark):
    # 4-cycle: every node degree 2 -> zero variance -> NULL r.
    edges = spark.createDataFrame(
        [Row(u=0, v=1), Row(u=1, v=2), Row(u=2, v=3), Row(u=3, v=0)])
    assert assortativity(edges, "u", "v").collect()[0].r is None


def test_acf_alternating_series(spark):
    # x = +1, -1, +1, ... -> r_k = (-1)^k (up to the biased-estimator
    # edge terms; with mean 0 and full pairs it is exact on even n).
    rows = [Row(p=i, x=float(1 if i % 2 == 0 else -1)) for i in range(20)]
    out = {r.lag: r.r for r in acf(
        spark.createDataFrame(rows), "p", "x", max_lag=3).collect()}
    assert out[1] < -0.8 and out[2] > 0.8 and out[3] < -0.8


def test_acf_constant_series_null(spark):
    rows = [Row(p=i, x=5.0) for i in range(10)]
    out = acf(spark.createDataFrame(rows), "p", "x", max_lag=2).collect()
    assert all(r.r is None for r in out)


def test_smr_hand_computed(spark):
    study = spark.createDataFrame(
        [Row(s=1, ev=4, pt=100.0), Row(s=2, ev=6, pt=50.0)])
    ref = spark.createDataFrame([Row(s=1, rate=0.02), Row(s=2, rate=0.05)])
    out = smr(study, ref, "s", "ev", "pt", "rate").collect()[0]
    exp = 100 * 0.02 + 50 * 0.05  # 4.5
    assert out.observed == 10 and abs(out.expected - exp) < 1e-9
    assert abs(out.smr - 10 / exp) < 1e-6
    lo = 10 / exp * math.exp(-1.96 / math.sqrt(10))
    hi = 10 / exp * math.exp(1.96 / math.sqrt(10))
    assert abs(out.smr_lo - lo) < 1e-5 and abs(out.smr_hi - hi) < 1e-5
    assert out.n_strata == 2


def test_bh_adjust_matches_stepup(spark):
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
    df = spark.createDataFrame(
        [Row(test_id=i, p=p) for i, p in enumerate(ps)])
    out = {r.test_id: r for r in
           bh_adjust(df, "p", "test_id", alpha=0.05).collect()}
    n = len(ps)
    # reference step-up: p_adj(i) = min_{j>=i} min(p_(j)*n/j, 1)
    ref = [min(min(ps[j] * n / (j + 1), 1.0) for j in range(i, n))
           for i in range(n)]
    for i in range(n):
        assert abs(out[i].p_adj - ref[i]) < 1e-9, (i, out[i].p_adj, ref[i])
        assert out[i].bh_rank == i + 1
    # step-up at q = 0.05 rejects exactly the first two of this list
    assert [out[i].significant for i in range(n)] == (
        [True] * 2 + [False] * 8)


def test_bh_adjust_ties_share_p_adj(spark):
    df = spark.createDataFrame(
        [Row(test_id=i, p=p) for i, p in
         enumerate([0.01, 0.02, 0.02, 0.02, 0.9])])
    out = bh_adjust(df, "p", "test_id").collect()
    tied = {r.p_adj for r in out if abs(r.p - 0.02) < 1e-12}
    assert len(tied) == 1


def test_friedman_consistent_ranking_maximal(spark):
    # 6 blocks, 3 treatments, treatment c always highest, a always
    # lowest -> perfect consistency: chi2_F = n*(k-1) = 12 (tie-free).
    rows = [Row(b=b, t=t, v=float(10 * b + off))
            for b in range(6) for t, off in (("a", 1), ("b", 2), ("c", 3))]
    from clinpy_spark.operators.assoc import friedman_test
    out = friedman_test(
        spark.createDataFrame(rows), "b", "t", "v").collect()[0]
    assert out.k == 3 and out.n_blocks == 6 and out.df == 2
    assert abs(out.chi2_f - 12.0) < 1e-6


def test_friedman_excludes_incomplete_blocks(spark):
    rows = [Row(b=b, t=t, v=float(b + hash(t) % 7))
            for b in range(4) for t in ("a", "b", "c")]
    rows.append(Row(b=9, t="a", v=1.0))  # incomplete block
    from clinpy_spark.operators.assoc import friedman_test
    out = friedman_test(
        spark.createDataFrame(rows), "b", "t", "v").collect()[0]
    assert out.n_blocks == 4


def test_cochran_q_two_conditions_equals_mcnemar_uncorrected(spark):
    # For k = 2, Q equals the UNcorrected McNemar chi2 (b-c)^2/(b+c).
    from clinpy_spark.operators.assoc import cochran_q
    rows = ([Row(w1=1, w2=0)] * 5 + [Row(w1=0, w2=1)] * 2
            + [Row(w1=1, w2=1)] * 3 + [Row(w1=0, w2=0)] * 2)
    out = cochran_q(spark.createDataFrame(rows), ["w1", "w2"]).collect()[0]
    assert abs(out.q - (5 - 2) ** 2 / (5 + 2)) < 1e-6
    assert out.df == 1 and out.n_informative == 7


def test_poisson_two_level_closed_form(spark):
    # Two x levels: MLE rates are the group means; beta1 = log ratio.
    rows = ([Row(x=0.0, y=float(v)) for v in (2, 4, 3, 3)]
            + [Row(x=1.0, y=float(v)) for v in (6, 8, 10, 8)])
    from clinpy_spark.operators.assoc import poisson_newton
    out = poisson_newton(
        spark.createDataFrame(rows), "x", "y", iterations=8).collect()[0]
    import math as m
    assert abs(out.beta0 - m.log(3.0)) < 1e-6
    assert abs(out.beta1 - (m.log(8.0) - m.log(3.0))) < 1e-6
    assert abs(out.rate_ratio - 8 / 3) < 1e-4
    assert out.n == 8 and abs(out.y_total - 44.0) < 1e-9


def test_haplotype_em_perfect_ld_and_equilibrium(spark):
    from clinpy_spark.operators.assoc import haplotype_em
    # Perfect coupling: every sample's two dosages identical ->
    # EM converges to p11 = pA, p00 = 1-pA, D' = 1, r2 = 1.
    rows = []
    sid = 0
    for ga in (0, 1, 2):
        for _ in range(10 if ga != 1 else 6):
            rows += [Row(s=sid, variant=1, gt=ga),
                     Row(s=sid, variant=2, gt=ga)]
            sid += 1
    out = haplotype_em(
        spark.createDataFrame(rows), "s", "variant", "gt", 1, 2,
        iterations=20).collect()[0]
    assert abs(out.d_prime - 1.0) < 1e-3
    assert abs(out.r2 - 1.0) < 1e-3
    assert abs(out.p10) < 1e-3 and abs(out.p01) < 1e-3
    assert out.n_double_het == 6
    # independent loci (all 9 cells at HWE-product counts) -> D ~ 0
    rows2 = []
    sid = 0
    freq = {0: 4, 1: 4, 2: 2}
    for ga in (0, 1, 2):
        for gb in (0, 1, 2):
            for _ in range(freq[ga] * freq[gb]):
                rows2 += [Row(s=sid, variant=1, gt=ga),
                          Row(s=sid, variant=2, gt=gb)]
                sid += 1
    out2 = haplotype_em(
        spark.createDataFrame(rows2), "s", "variant", "gt", 1, 2,
        iterations=20).collect()[0]
    assert abs(out2.d) < 1e-6


def test_mad_outliers_flags_planted_spikes(spark):
    from clinpy_spark.operators.quality import mad_outliers
    rows = ([Row(g="a", v=float(100 + (i % 7))) for i in range(50)]
            + [Row(g="a", v=1e6), Row(g="a", v=-1e6)]
            + [Row(g="b", v=5.0)] * 10)
    out = {r.g: r for r in mad_outliers(
        spark.createDataFrame(rows), "g", "v").collect()}
    assert out["a"].n_outliers == 2
    assert out["a"].n == 52
    # constant group: mad 0, no row deviates -> 0 outliers
    assert out["b"].n_outliers == 0 and out["b"].mad == 0.0


def test_ols_inference_exact_line_and_noise(spark):
    from clinpy_spark.operators.quality import ols_inference
    # exact line y = 2x + 1: slope 2, r2 = 1, residual variance 0 ->
    # se/t NULL (sigma2 = 0 guard)
    rows = [Row(g="a", x=float(i), y=float(2 * i + 1)) for i in range(10)]
    out = ols_inference(
        spark.createDataFrame(rows), "x", "y", "g").collect()[0]
    assert abs(out.slope - 2.0) < 1e-9 and abs(out.intercept - 1.0) < 1e-9
    assert out.r2 == 1.0 and out.se_slope is None
    # known small regression: hand-computed closed form
    pts = [(0.0, 1.0), (1.0, 2.0), (2.0, 2.0), (3.0, 4.0)]
    rows2 = [Row(g="b", x=x, y=y) for x, y in pts]
    out2 = ols_inference(
        spark.createDataFrame(rows2), "x", "y", "g").collect()[0]
    n = 4
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    cxx = sxx - sx * sx / n; cyy = syy - sy * sy / n
    cxy = sxy - sx * sy / n
    b = cxy / cxx
    s2 = (cyy - b * cxy) / (n - 2)
    se = math.sqrt(s2 / cxx)
    assert abs(out2.slope - b) < 1e-6
    assert abs(out2.se_slope - se) < 1e-6
    assert abs(out2.t_slope - b / se) < 1e-5
    assert abs(out2.r2 - cxy * cxy / (cxx * cyy)) < 1e-6


def test_lsh_plan_scurve_and_recommendation(spark):
    from clinpy_spark.operators.dedup import lsh_plan
    out = {r.bands: r for r in lsh_plan(
        spark, num_hashes=64, threshold=0.8).collect()}
    # every divisor pair present, b*r = 64
    assert set(out) == {1, 2, 4, 8, 16, 32, 64}
    for b, r in out.items():
        assert b * r.rows_per_band == 64
        assert abs(r.s50 - (1 / b) ** (1 / r.rows_per_band)) < 1e-6
    rec = [r for r in out.values() if r.recommended]
    assert len(rec) == 1
    best = min(out.values(), key=lambda r: (abs(r.s50 - 0.8), r.bands))
    assert rec[0].bands == best.bands


def test_anderson_darling_symmetry_and_separation(spark):
    from clinpy_spark.operators.drift import anderson_darling_2sample
    rows = ([Row(v=float(i % 10), g="a") for i in range(50)]
            + [Row(v=float(i % 10), g="b") for i in range(50)])
    same = anderson_darling_2sample(
        spark.createDataFrame(rows), "v", "g", "a", "b").collect()[0]
    # identical distributions: A2 near its null mean (~1), far below
    # the separated case; swap symmetry exact
    swap = anderson_darling_2sample(
        spark.createDataFrame(rows), "v", "g", "b", "a").collect()[0]
    assert same.a2 == swap.a2
    far = ([Row(v=float(i % 10), g="a") for i in range(50)]
           + [Row(v=float(100 + i % 10), g="b") for i in range(50)])
    sep = anderson_darling_2sample(
        spark.createDataFrame(far), "v", "g", "a", "b").collect()[0]
    assert sep.a2 > 10 * max(same.a2, 0.1)
    assert same.n_a == 50 and same.n_b == 50


def test_knearest_features_ranks_and_radius(spark):
    from clinpy_spark.operators.genome import knearest_features
    qs = spark.createDataFrame([Row(id=1, chrom=0, start=1000, end=1100)])
    feats = spark.createDataFrame([
        Row(id=10, chrom=0, start=1050, end=1060),   # overlap, d=0
        Row(id=11, chrom=0, start=1200, end=1300),   # d=100
        Row(id=12, chrom=0, start=700, end=900),     # d=100 (tie -> id)
        Row(id=13, chrom=0, start=5000, end=5100),   # beyond radius
        Row(id=14, chrom=1, start=1000, end=1100),   # other chrom
    ])
    out = knearest_features(
        qs, feats, k=3, max_distance=1000, bin_size=500).collect()
    got = [(r.rank, r.f_id, r.distance) for r in
           sorted(out, key=lambda r: r.rank)]
    assert got == [(1, 10, 0), (2, 11, 100), (3, 12, 100)]


def test_dsir_weights_prefer_target_like_docs(spark):
    from clinpy_spark.operators.curate import dsir_weights
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta") for i in range(5)]
        + [Row(doc_id=10 + i, text="foo bar baz qux") for i in range(5)])
    target = spark.createDataFrame(
        [Row(doc_id=100 + i, text="alpha beta gamma delta") for i in range(4)])
    out = {r.doc_id: r.log_importance for r in
           dsir_weights(docs, target).collect()}
    # target-like docs must outscore the off-target ones
    assert min(out[i] for i in range(5)) > max(out[10 + i] for i in range(5))


def test_streaming_acf_matches_batch(spark, tmp_path):
    """The maintained per-day count table (CUSUM fold) also serves the
    ACF readout: folded-stream ACF == batch acf over the same days."""
    import datetime as dt
    import json

    from clinpy_spark.operators.windows import acf
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.anomaly import (
        finalize_acf, stream_period_counts,
    )
    from clinpy_spark.streaming.events import read_event_stream

    rows = []
    eid = 0
    for d in range(12):
        # alternating volume 2/7 -> strong lag-2 autocorrelation
        for m in range(2 if d % 2 == 0 else 7):
            rows.append((eid, dt.datetime(2024, 3, 1 + d, 9, m))); eid += 1
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid2, ts in chunk:
                fh.write(json.dumps({
                    "event_id": eid2, "ts": ts.isoformat(), "user_id": 1,
                    "event_type": "view", "value": 0.0, "props": "{}",
                }) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = stream_period_counts(stream, cat, "acf_day_counts",
                             checkpoint=str(tmp_path / "ck_acf"))
    q.awaitTermination(120)

    got = {r.lag: r for r in
           finalize_acf(cat.table("acf_day_counts"), max_lag=3).collect()}
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    batch = spark.createDataFrame(
        [(e, ts, 1, "view", 0.0) for e, ts in rows], schema)
    daily = batch.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .alias("__p")).agg(F.count(F.lit(1)).alias("n"))
    want = {r.lag: r for r in acf(daily, "__p", "n", max_lag=3).collect()}
    for lag in (1, 2, 3):
        assert got[lag].r == want[lag].r
        assert got[lag].n_pairs == want[lag].n_pairs
    assert got[2].r > 0.5 and got[1].r < -0.5


def test_cox_stratified_recovers_within_stratum_effect(spark):
    from clinpy_spark.operators.survival import (
        cox_newton, cox_newton_stratified,
    )
    # One stratum only -> identical to the unstratified MLE.
    rows = []
    for i in range(60):
        x = i % 2
        t = 5 + (i * 7) % 30 - 3 * x
        rows.append(Row(st=0, t=float(t), e=1, x=x))
    one = cox_newton_stratified(
        spark.createDataFrame(rows), "t", "e", "x", "st").collect()[0]
    plain = cox_newton(
        spark.createDataFrame(rows), "t", "e", "x").collect()[0]
    assert one.beta == plain.beta and one.se == plain.se
    assert one.n_strata == 1
    # Confounded two-stratum data: within each stratum x has NO
    # effect (identical time sets), but stratum 1 has both later
    # times and more x=1 -> pooled Cox sees an artifact, stratified
    # reports ~0.
    rows2 = []
    for i in range(40):
        rows2.append(Row(st=0, t=float(10 + i % 5), e=1, x=1 if i % 4 == 0 else 0))
        rows2.append(Row(st=1, t=float(50 + i % 5), e=1, x=0 if i % 4 == 0 else 1))
    strat = cox_newton_stratified(
        spark.createDataFrame(rows2), "t", "e", "x", "st").collect()[0]
    pooled = cox_newton(
        spark.createDataFrame(rows2), "t", "e", "x").collect()[0]
    assert abs(strat.beta) < 0.2
    assert abs(pooled.beta) > abs(strat.beta) + 0.3
    assert strat.n_strata == 2


def test_sfs_folded_histogram(spark):
    from clinpy_spark.operators.assoc import site_frequency_spectrum
    # 4 samples (2N = 8): variant 1 AC=1, variant 2 AC=7 (folds to 1),
    # variant 3 AC=4.
    gts = {1: [1, 0, 0, 0], 2: [2, 2, 2, 1], 3: [2, 2, 0, 0]}
    rows = [Row(variant=v, s=i, gt=g)
            for v, arr in gts.items() for i, g in enumerate(arr)]
    out = {r.allele_count: r.n_variants for r in site_frequency_spectrum(
        spark.createDataFrame(rows), "variant", "gt").collect()}
    assert out == {1: 2, 4: 1}
    unfolded = {r.allele_count: r.n_variants for r in
                site_frequency_spectrum(
                    spark.createDataFrame(rows), "variant", "gt",
                    folded=False).collect()}
    assert unfolded == {1: 1, 7: 1, 4: 1}


def test_jaccard_links_square_diagonals(spark):
    from clinpy_spark.operators.graph import jaccard_links
    # 4-cycle 1-2-3-4-1: non-adjacent diagonals (1,3) and (2,4) share
    # both neighbors -> jaccard = 2/(2+2-2) = 1.
    edges = spark.createDataFrame(
        [Row(u=1, v=2), Row(u=2, v=3), Row(u=3, v=4), Row(u=1, v=4)])
    out = {(r.x, r.y): r for r in
           jaccard_links(edges, "u", "v", min_common=2).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    assert all(abs(r.jaccard - 1.0) < 1e-9 for r in out.values())


def test_jaccard_links_capped_neighborhood_consistent(spark):
    """r11 advice: the union denominator uses CAPPED neighborhood
    sizes, so the score is the exact Jaccard of the capped graph — a
    celebrity center (degree > cap) drops out of BOTH terms instead of
    deflating the score of pairs that share it."""
    from clinpy_spark.operators.graph import jaccard_links

    # nodes 1,2 share eligible centers 3,4 (deg 2) and celebrity 5
    # (deg 5 > cap=2); capped N(1)=N(2)={3,4} -> jaccard = 2/(2+2-2)=1
    edges = spark.createDataFrame(
        [Row(u=1, v=3), Row(u=1, v=4), Row(u=1, v=5),
         Row(u=2, v=3), Row(u=2, v=4), Row(u=2, v=5),
         Row(u=5, v=6), Row(u=5, v=7), Row(u=5, v=8)])
    out = {(r.x, r.y): r for r in
           jaccard_links(edges, "u", "v", max_center_degree=2,
                         min_common=2).collect()}
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)].jaccard - 1.0) < 1e-9
    assert out[(1, 2)].common_neighbors == 2


def test_streaming_ad_matches_batch(spark, tmp_path):
    """The maintained per-value count tables (KS fold state) serve the
    AD readout: folded-stream AD == batch anderson_darling_2sample."""
    from clinpy_spark.operators.drift import anderson_darling_2sample
    from clinpy_spark.streaming.drift import finalize_ad

    rows = ([Row(v=float(i % 12), g="ref") for i in range(80)]
            + [Row(v=float((i % 12) + (2 if i % 3 == 0 else 0)), g="cur")
               for i in range(70)])
    df = spark.createDataFrame(rows)
    ref_counts = (df.filter(F.col("g") == "ref").groupBy(F.col("v").alias("__v"))
                  .agg(F.count(F.lit(1)).alias("n")))
    # split "cur" into two micro-batch halves and fold additively,
    # mimicking the stream state after two triggers
    cur1 = (df.filter((F.col("g") == "cur") & (F.col("v") < 6))
            .groupBy(F.col("v").alias("__v"))
            .agg(F.count(F.lit(1)).alias("n")))
    cur2 = (df.filter((F.col("g") == "cur") & (F.col("v") >= 6))
            .groupBy(F.col("v").alias("__v"))
            .agg(F.count(F.lit(1)).alias("n")))
    folded = cur1.unionByName(cur2).groupBy("__v").agg(
        F.sum("n").alias("n"))
    got = finalize_ad(ref_counts, folded).collect()[0]
    want = anderson_darling_2sample(df, "v", "g", "ref", "cur").collect()[0]
    assert got.a2 == want.a2
    assert (got.n_a, got.n_b) == (want.n_a, want.n_b)


def test_streaming_glm_matches_batch(spark, tmp_path):
    """The folded per-x (n, sum_y) grid refits BOTH GLMs on read,
    exactly matching the batch fitters over the same rows (the grid
    counters are integer-additive)."""
    from clinpy_spark.operators.assoc import logistic_newton, poisson_newton
    from clinpy_spark.streaming.glm import (
        finalize_logistic, finalize_poisson, glm_grid_partial,
    )

    rows = [Row(x=float(i % 5), y=(1 if (i * 7) % 10 < 3 + (i % 5) else 0))
            for i in range(200)]
    df = spark.createDataFrame(rows)
    # two "micro-batches" folded additively, mimicking the stream state
    g1 = glm_grid_partial(df.filter(F.col("x") < 2.5), "x", "y")
    g2 = glm_grid_partial(df.filter(F.col("x") >= 2.5), "x", "y")
    folded = g1.unionByName(g2).groupBy("__x").agg(
        F.sum("n").alias("n"), F.sum("sy").alias("sy"))
    got = finalize_logistic(folded).collect()[0]
    want = logistic_newton(df, "x", "y").collect()[0]
    assert tuple(got) == tuple(want)
    # Poisson on counts derived from the same covariate
    prows = [Row(x=float(i % 4), y=float((i * 3) % 7)) for i in range(160)]
    pdf_ = spark.createDataFrame(prows)
    p1 = glm_grid_partial(pdf_.filter(F.col("x") < 2), "x", "y")
    p2 = glm_grid_partial(pdf_.filter(F.col("x") >= 2), "x", "y")
    pfolded = p1.unionByName(p2).groupBy("__x").agg(
        F.sum("n").alias("n"), F.sum("sy").alias("sy"))
    pg = finalize_poisson(pfolded).collect()[0]
    pw = poisson_newton(pdf_, "x", "y").collect()[0]
    assert tuple(pg) == tuple(pw)


def test_pacf_ar1_cuts_off_after_lag1(spark):
    from clinpy_spark.operators.windows import pacf
    # Deterministic AR(1)-like decay: x_t = 64 * 0.5^(t mod cycle) has
    # geometric segments; simpler: exact AR(1) impulse response series
    # x_t = 0.6^t scaled — PACF lag-1 ~ r1, lag 2/3 ~ 0 for a pure
    # AR(1) autocorrelation structure. Use a long geometric series.
    rows = [Row(p=i, x=float(0.8 ** i)) for i in range(40)]
    out = {r.lag: r.pacf for r in pacf(
        spark.createDataFrame(rows), "p", "x").collect()}
    assert out[1] > 0.5
    # Durbin-Levinson consistency against hand-computed values from
    # the same rounded ACF
    from clinpy_spark.operators.windows import acf
    rr = {r.lag: r.r for r in acf(
        spark.createDataFrame(rows), "p", "x", max_lag=3).collect()}
    r1, r2 = rr[1], rr[2]
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert abs(out[2] - round(phi22, 6)) < 1e-9


def test_neyman_allocation_properties(spark):
    from clinpy_spark.operators.sample import neyman_allocation
    rows = ([Row(g="big_volatile", v=float((i * 37) % 100)) for i in range(400)]
            + [Row(g="small_flat", v=5.0) for _ in range(100)]
            + [Row(g="mid", v=float(i % 10)) for i in range(200)])
    out = {r.g: r for r in neyman_allocation(
        spark.createDataFrame(rows), "g", "v", 100).collect()}
    # allocations sum exactly to the budget
    assert sum(r.alloc_n for r in out.values()) == 100
    # constant stratum gets zero weight
    assert out["small_flat"].alloc_n == 0 and out["small_flat"].share == 0.0
    # the big volatile stratum dominates
    assert out["big_volatile"].alloc_n > out["mid"].alloc_n


def test_rake_scores_multiword_phrases(spark):
    from clinpy_spark.operators.retrieval import rake_keywords
    docs = spark.createDataFrame([
        Row(doc_id=1, text="deep learning of deep learning and the model"),
        Row(doc_id=2, text="deep learning in model training"),
        Row(doc_id=3, text="the model"),
    ])
    out = {r.phrase: r for r in rake_keywords(
        docs, ["the", "and", "of", "in"], top_k=10).collect()}
    # "deep learning" appears 3x as a 2-word phrase and must outrank
    # the 1-word "model"
    assert "deep learning" in out
    assert out["deep learning"].n_occurrences == 3
    assert out["deep learning"].score > out["model"].score
    # hand check: freq(deep)=3, deg(deep)=6 -> 2.0; same for learning
    # -> phrase score 4.0
    assert abs(out["deep learning"].score - 4.0) < 1e-9


def test_hwe_exact_hand_computed(spark):
    from clinpy_spark.operators.assoc import hwe_exact
    # N=5, rare allele count 3 -> support nh in {1, 3}.
    # P(3)/P(1) = 4*nAA(1)*nBB(1)/(3*2) with nAA(1)=1, nBB(1)=3 -> 2.
    # pmf: {1: 1/3, 3: 2/3}; observing nh=1 (the rarer outcome):
    # p = P(1) = 1/3; observing nh=3: p = 1 (all outcomes <= pmf_obs).
    pv1 = spark.createDataFrame(
        [Row(variant=1, n_hom_ref=3, n_het=1, n_hom_alt=1)])
    out1 = hwe_exact(pv1).collect()[0]
    assert out1.n_support == 2
    assert abs(out1.p_exact - 1 / 3) < 1e-9
    pv3 = spark.createDataFrame(
        [Row(variant=1, n_hom_ref=2, n_het=3, n_hom_alt=0)])
    out3 = hwe_exact(pv3).collect()[0]
    assert abs(out3.p_exact - 1.0) < 1e-9
    # monomorphic: single-point support, p = 1
    mono = spark.createDataFrame(
        [Row(variant=2, n_hom_ref=10, n_het=0, n_hom_alt=0)])
    assert hwe_exact(mono).collect()[0].p_exact == 1.0


def test_theil_sen_resists_outlier(spark):
    from clinpy_spark.operators.windows import theil_sen
    # perfect line with one wild outlier: TS slope stays 2
    rows = [Row(p=float(i), x=float(2 * i + 1)) for i in range(20)]
    rows[10] = Row(p=10.0, x=1e6)
    out = theil_sen(spark.createDataFrame(rows), "p", "x").collect()[0]
    assert abs(out.slope - 2.0) < 1e-6
    assert abs(out.intercept - 1.0) < 1e-6
    assert out.n_periods == 20 and out.n_pairs == 190


def test_heavy_hitters_exact_vs_full_groupcount(spark):
    from clinpy_spark.operators.sketch import heavy_hitters
    # skewed domain across multiple partitions: MG candidates + exact
    # recount must equal the naive full group-count above phi
    rows = ([Row(v="hot") for _ in range(400)]
            + [Row(v="warm") for _ in range(120)]
            + [Row(v=f"cold{i}") for i in range(480)])
    df = spark.createDataFrame(rows).repartition(8)
    out = {r.item: r.n for r in heavy_hitters(df, "v", phi=0.05).collect()}
    n = 1000
    want = {"hot": 400, "warm": 120}  # cold* are singletons << 5%
    assert out == want
    # threshold is strict: an item at exactly phi*N is excluded
    rows2 = [Row(v="edge")] * 50 + [Row(v=f"x{i}") for i in range(950)]
    out2 = heavy_hitters(
        spark.createDataFrame(rows2).repartition(4), "v", phi=0.05
    ).collect()
    assert out2 == []


def test_roc_auc_known_values(spark):
    from clinpy_spark.operators.classify import roc_auc
    # perfect separation -> 1.0; reversed -> 0.0; ties -> 0.5 credit
    rows = ([Row(s=float(i), y=1) for i in range(5, 10)]
            + [Row(s=float(i), y=0) for i in range(5)])
    assert roc_auc(spark.createDataFrame(rows), "s", "y").collect()[0].auc == 1.0
    rev = [Row(s=-r.s, y=r.y) for r in rows]
    assert roc_auc(spark.createDataFrame(rev), "s", "y").collect()[0].auc == 0.0
    tied = [Row(s=1.0, y=1)] * 3 + [Row(s=1.0, y=0)] * 3
    out = roc_auc(spark.createDataFrame(tied), "s", "y").collect()[0]
    assert out.auc == 0.5 and out.n_ties == 1
    # within-class duplicate scores never touch the midrank credit ->
    # NOT counted as ties (r11 advice: cross-class ties only)
    wdup = ([Row(s=2.0, y=1)] * 4 + [Row(s=1.0, y=0)] * 4
            + [Row(s=3.0, y=1), Row(s=3.0, y=0)])
    out = roc_auc(spark.createDataFrame(wdup), "s", "y").collect()[0]
    assert out.n_ties == 1  # only s=3.0 carries both classes
    # hand-computed mixed case: pos {3,1}, neg {2,0} -> pairs won 3/4
    mixed = [Row(s=3.0, y=1), Row(s=1.0, y=1), Row(s=2.0, y=0), Row(s=0.0, y=0)]
    assert abs(roc_auc(
        spark.createDataFrame(mixed), "s", "y").collect()[0].auc - 0.75) < 1e-9


def test_reliability_table_bins_and_rates(spark):
    from clinpy_spark.operators.classify import reliability_table
    # scores 0..99 scaled to [0,1); label = score >= 0.5 -> perfect
    # calibration: low bins frac 0, high bins frac 1
    rows = [Row(s=i / 100.0, y=int(i >= 50)) for i in range(100)]
    out = {r.bin: r for r in reliability_table(
        spark.createDataFrame(rows), "s", "y", n_bins=10).collect()}
    assert set(out) == set(range(10))
    assert all(out[b].frac_pos == 0.0 for b in range(5))
    assert all(out[b].frac_pos == 1.0 for b in range(5, 10))
    assert all(out[b].n == 10 for b in range(10))
    # constant score: one bin
    const = [Row(s=2.0, y=i % 2) for i in range(10)]
    cout = reliability_table(
        spark.createDataFrame(const), "s", "y").collect()
    assert len(cout) == 1 and cout[0].bin == 0 and cout[0].n == 10


def test_fisher_scan_matches_single_table(spark):
    from clinpy_spark.operators.assoc import (
        fisher_exact_2x2, fisher_exact_scan,
    )
    tables = {1: (3, 1, 2, 8), 2: (0, 5, 5, 0), 3: (2, 2, 2, 2)}
    counts = spark.createDataFrame(
        [Row(v=v, a=a, b=b, c=c, d=d) for v, (a, b, c, d) in tables.items()])
    scan = {r.v: r.p_two_sided for r in
            fisher_exact_scan(counts, "v").collect()}
    for v, (a, b, c, d) in tables.items():
        rows = ([Row(e=1, y=1)] * a + [Row(e=1, y=0)] * b
                + [Row(e=0, y=1)] * c + [Row(e=0, y=0)] * d)
        single = fisher_exact_2x2(
            spark.createDataFrame(rows), "e", "y").collect()[0]
        assert abs(scan[v] - single.p_two_sided) < 1e-9, v


def test_runs_test_alternating_vs_clumped(spark):
    from clinpy_spark.operators.assoc import runs_test
    # perfectly alternating -> max runs -> large positive z
    alt = [Row(p=i, x=float(10 if i % 2 == 0 else 1)) for i in range(30)]
    za = runs_test(spark.createDataFrame(alt), "p", "x").collect()[0]
    assert za.n_runs == 30 and za.z > 3
    # perfectly clumped -> 2 runs -> large negative z
    cl = [Row(p=i, x=float(10 if i < 15 else 1)) for i in range(30)]
    zc = runs_test(spark.createDataFrame(cl), "p", "x").collect()[0]
    assert zc.n_runs == 2 and zc.z < -3
    assert za.n_above == 15 and za.n_below == 15


def test_sign_test_exact_binomial(spark):
    import math as m

    from clinpy_spark.operators.assoc import sign_test
    # 8 up, 2 down, 3 ties -> two-sided p = sum over k with
    # pmf <= pmf(8) of C(10,k)/2^10
    rows = ([Row(b=0, a=1)] * 8 + [Row(b=1, a=0)] * 2
            + [Row(b=1, a=1)] * 3)
    out = sign_test(spark.createDataFrame(rows), "b", "a").collect()[0]
    assert (out.n_pos, out.n_neg, out.n_ties) == (8, 2, 3)
    pmf = [m.comb(10, k) / 2 ** 10 for k in range(11)]
    want = sum(p for p in pmf if p <= pmf[8] * (1 + 1e-7))
    assert abs(out.p_exact - want) < 1e-9
    # balanced -> p = 1
    bal = [Row(b=0, a=1)] * 5 + [Row(b=1, a=0)] * 5
    assert sign_test(
        spark.createDataFrame(bal), "b", "a").collect()[0].p_exact == 1.0


def test_streaming_auc_matches_batch(spark):
    from clinpy_spark.operators.classify import roc_auc
    from clinpy_spark.streaming.quality import (
        finalize_auc, score_label_counts_partial,
    )
    rows = [Row(s=float((i * 13) % 20), y=int((i * 7) % 10 < 4 + (i % 3)))
            for i in range(300)]
    df = spark.createDataFrame(rows)
    p1 = score_label_counts_partial(df.filter(F.col("s") < 10), "s", "y")
    p2 = score_label_counts_partial(df.filter(F.col("s") >= 10), "s", "y")
    folded = p1.unionByName(p2).groupBy("__s").agg(
        F.sum("np").alias("np"), F.sum("nn").alias("nn"))
    got = finalize_auc(folded).collect()[0]
    want = roc_auc(df, "s", "y").collect()[0]
    assert tuple(got) == tuple(want)


def test_ld_decay_perfect_linkage_flat(spark):
    # identical dosage columns at all variants -> r2 = 1 at every
    # distance -> decay curve flat at 1
    from clinpy_spark.operators.assoc import ld_r2
    rows = []
    for s in range(12):
        g = (s * 7) % 3
        for var in range(5):
            rows.append(Row(variant=var, s=s, gt=g, chrom=0, pos=var))
    pairs = ld_r2(
        spark.createDataFrame(rows), "variant", "s", "gt", "chrom", "pos",
        max_dist=4)
    decay = pairs.groupBy((F.col("vy") - F.col("vx")).alias("dist")).agg(
        F.avg("r2").alias("m")).collect()
    assert all(abs(r.m - 1.0) < 1e-6 for r in decay)
