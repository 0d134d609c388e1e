"""Round-12 additions: multi-covariate GLM/Cox (r11 verdict #4) and
the containment keep-best composition."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_logistic_multi_d1_reduces_to_single(spark):
    """With one covariate the d-dimensional IRLS solves the same 2x2
    normal equations as logistic_newton — identical fit at round-6."""
    from clinpy_spark.operators.assoc import (
        logistic_newton, logistic_newton_multi,
    )

    rows = ([Row(x=0.0, y=1)] * 20 + [Row(x=0.0, y=0)] * 80
            + [Row(x=1.0, y=1)] * 40 + [Row(x=1.0, y=0)] * 60)
    df = spark.createDataFrame(rows)
    single = logistic_newton(df, "x", "y", iterations=6).collect()[0]
    multi = logistic_newton_multi(df, ["x"], "y", iterations=6).collect()[0]
    assert abs(single.beta0 - multi.beta0) < 1.1e-5
    assert abs(single.beta1 - multi.beta1) < 1.1e-5
    assert abs(single.se1 - multi.se1) < 2e-5
    assert abs(single.wald_chi2 - multi.wald_chi2_1) < 1e-3
    assert (single.n, single.n_pos) == (multi.n, multi.n_pos)


def test_logistic_multi_orthogonal_null_covariate(spark):
    """r11 verdict #4 property test: a perfectly balanced null second
    covariate gets beta2 = 0 and leaves (beta0, beta1) at the
    single-covariate closed-form MLE."""
    from clinpy_spark.operators.assoc import logistic_newton_multi

    rows = []
    for x2 in (0.0, 1.0):
        rows += [Row(x1=0.0, x2=x2, y=1)] * 10 + [Row(x1=0.0, x2=x2, y=0)] * 40
        rows += [Row(x1=1.0, x2=x2, y=1)] * 20 + [Row(x1=1.0, x2=x2, y=0)] * 30
    out = logistic_newton_multi(
        spark.createDataFrame(rows), ["x1", "x2"], "y",
        iterations=6).collect()[0]
    b0 = math.log(20 / 80)
    b1 = math.log(40 / 60) - b0
    assert abs(out.beta0 - b0) < 2e-5
    assert abs(out.beta1 - b1) < 2e-5
    assert abs(out.beta2) < 1e-5
    assert out.score_norm is not None and out.score_norm < 1e-4
    # Wald se for the 2x2 sub-model: sqrt(sum of 1/cell)
    se = math.sqrt(1 / 20 + 1 / 80 + 1 / 40 + 1 / 60)
    assert abs(out.se1 - se) < 1e-4


def test_logistic_multi_singular_is_null(spark):
    from clinpy_spark.operators.assoc import logistic_newton_multi

    rows = [Row(x1=float(i % 3), x2=2.0, y=i % 2) for i in range(30)]
    out = logistic_newton_multi(
        spark.createDataFrame(rows), ["x1", "x2"], "y").collect()[0]
    assert out.beta0 is None and out.beta1 is None and out.beta2 is None
    assert out.n == 30  # margins still reported


def test_average_precision_known_values(spark):
    """Hand-checked AP: perfect ranking -> 1.0; worst ranking -> the
    tail-heavy step value; sklearn-convention step interpolation on a
    known mixed case."""
    from clinpy_spark.operators.classify import average_precision

    perfect = ([Row(s=2.0, y=1)] * 3 + [Row(s=1.0, y=0)] * 7)
    out = average_precision(
        spark.createDataFrame(perfect), "s", "y").collect()[0]
    assert out.ap == 1.0 and out.baseline == 0.3

    # ranking: scores desc 4,3,2,1 with labels 1,0,1,0
    # thresholds: tp/pred = 1/1, 1/2, 2/3, 2/4 -> AP = (1*1 + 1*(2/3))/2
    mixed = [Row(s=4.0, y=1), Row(s=3.0, y=0), Row(s=2.0, y=1),
             Row(s=1.0, y=0)]
    out = average_precision(
        spark.createDataFrame(mixed), "s", "y").collect()[0]
    assert abs(out.ap - (1 + 2 / 3) / 2) < 1e-6

    # all positives below all negatives: P at the k-th positive block
    # (single block of 2 positives after 3 negatives) = 2/5
    worst = [Row(s=1.0, y=1)] * 2 + [Row(s=2.0, y=0)] * 3
    out = average_precision(
        spark.createDataFrame(worst), "s", "y").collect()[0]
    assert abs(out.ap - 2 / 5) < 1e-6


def test_brier_calibration_known_values(spark):
    """A perfectly calibrated two-value forecast: brier = mean of
    p(1-p) within each block, ECE = 0 up to in-bin score/accuracy
    equality; a constant wrong forecast scores its squared error."""
    from clinpy_spark.operators.classify import brier_calibration

    # block A: s=0.2, 20% positive; block B: s=0.8, 80% positive
    rows = ([Row(s=0.2, y=1)] * 2 + [Row(s=0.2, y=0)] * 8
            + [Row(s=0.8, y=1)] * 8 + [Row(s=0.8, y=0)] * 2)
    out = brier_calibration(
        spark.createDataFrame(rows), "s", "y", n_bins=2).collect()[0]
    want_brier = (2 * 0.8 ** 2 + 8 * 0.2 ** 2 + 8 * 0.2 ** 2
                  + 2 * 0.8 ** 2) / 20
    assert abs(out.brier - want_brier) < 1e-6
    assert out.ece == 0.0 and out.mce == 0.0  # calibrated by design
    assert abs(out.baseline_brier - 0.25) < 1e-6

    # constant 0.9 forecast on all-negative labels: brier = 0.81,
    # single bin, gap = |0 - 0.9| = 0.9
    bad = [Row(s=0.9, y=0)] * 10
    outb = brier_calibration(
        spark.createDataFrame(bad), "s", "y").collect()[0]
    assert abs(outb.brier - 0.81) < 1e-6
    assert abs(outb.mce - 0.9) < 1e-6


def test_kfold_assign_and_grouped_auc(spark):
    """Folds are deterministic, complete (0..k-1), and stable across
    calls; per-group AUC matches the global roc_auc computed on each
    group separately."""
    from clinpy_spark.operators.classify import roc_auc, roc_auc_by
    from clinpy_spark.operators.sample import kfold_assign

    rows = [Row(doc_id=i, s=float((i * 7) % 13),
                y=(1 if (i * 7) % 13 > 6 - (i % 3) else 0))
            for i in range(300)]
    df = spark.createDataFrame(rows)
    f1 = kfold_assign(df, "doc_id", k=4)
    f2 = kfold_assign(df, "doc_id", k=4)
    a = {r.doc_id: r.fold for r in f1.collect()}
    b = {r.doc_id: r.fold for r in f2.collect()}
    assert a == b
    assert set(a.values()) == {0, 1, 2, 3}

    got = {r.grp: r for r in roc_auc_by(f1, "s", "y", "fold").collect()}
    for fold in range(4):
        want = roc_auc(f1.filter(F.col("fold") == fold), "s", "y").collect()[0]
        g = got[fold]
        assert (g.auc, g.n_pos, g.n_neg, g.n_ties) == (
            want.auc, want.n_pos, want.n_neg, want.n_ties)


def test_cohen_kappa_known_values(spark):
    """Hand-computed 2x2 agreement table (the classic textbook case):
    po = 0.7, pe = 0.545, kappa = (0.7-0.545)/0.455; perfect agreement
    -> po = 1 with kappa = 1; both-constant-equal raters -> NULL
    (vacuous agreement)."""
    from clinpy_spark.operators.assoc import cohen_kappa

    rows = ([Row(a="y", b="y")] * 45 + [Row(a="y", b="n")] * 15
            + [Row(a="n", b="y")] * 15 + [Row(a="n", b="n")] * 25)
    out = cohen_kappa(spark.createDataFrame(rows), "a", "b").collect()[0]
    po = 0.7
    pe = 0.6 * 0.6 + 0.4 * 0.4
    assert out.n == 100 and out.n_categories == 2
    assert abs(out.po - po) < 1e-9
    assert abs(out.pe - pe) < 1e-9
    assert abs(out.kappa - (po - pe) / (1 - pe)) < 1e-6
    assert abs(out.z - out.kappa / out.se0) < 1e-3

    perfect = [Row(a=str(i % 3), b=str(i % 3)) for i in range(30)]
    outp = cohen_kappa(spark.createDataFrame(perfect), "a", "b").collect()[0]
    assert outp.kappa == 1.0 and outp.po == 1.0

    const = [Row(a="x", b="x")] * 10
    outc = cohen_kappa(spark.createDataFrame(const), "a", "b").collect()[0]
    assert outc.kappa is None  # pe = 1: chance correction undefined


def test_wilson_ci_coverage_shape(spark):
    """Wilson interval contains phat, stays inside [0, 1] at the
    extremes (k = 0 and k = n, where Wald collapses to zero width),
    and matches the closed form."""
    import math

    from clinpy_spark.operators.assoc import wilson_ci

    rows = ([Row(g="mid", s=1)] * 30 + [Row(g="mid", s=0)] * 70
            + [Row(g="none", s=0)] * 20 + [Row(g="all", s=1)] * 15)
    out = {r.grp: r for r in
           wilson_ci(spark.createDataFrame(rows), "g", "s").collect()}
    for r in out.values():
        assert 0.0 <= r.ci_lo <= r.phat <= r.ci_hi <= 1.0
    assert out["none"].phat == 0.0 and out["none"].ci_hi > 0.0
    assert out["all"].phat == 1.0 and out["all"].ci_lo < 1.0
    # closed form for the mid group
    z, n, p = 1.959964, 100.0, 0.3
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert abs(out["mid"].ci_lo - (center - half)) < 1e-6
    assert abs(out["mid"].ci_hi - (center + half)) < 1e-6


def test_dummy_encode_reference_coding(spark):
    """k-1 indicators, first level as reference, NULL rows get NULL
    indicators, and the encoded columns feed the multi fitter: the
    categorical adjustment recovers the per-level log-odds."""
    import pytest

    from clinpy_spark.operators.assoc import (
        dummy_encode, logistic_newton_multi,
    )

    rows = ([Row(g="a", y=1)] * 10 + [Row(g="a", y=0)] * 40
            + [Row(g="b", y=1)] * 20 + [Row(g="b", y=0)] * 30
            + [Row(g="c", y=1)] * 30 + [Row(g="c", y=0)] * 20
            + [Row(g=None, y=1)] * 3)
    df = spark.createDataFrame(rows)
    out, names = dummy_encode(df, "g")
    assert names == ["g_b", "g_c"]
    got = {(r.g, r.g_b, r.g_c) for r in
           out.select("g", "g_b", "g_c").distinct().collect()}
    assert got == {("a", 0.0, 0.0), ("b", 1.0, 0.0), ("c", 0.0, 1.0),
                   (None, None, None)}
    fit = logistic_newton_multi(out, names, "y", iterations=8).collect()[0]
    b0 = math.log(10 / 40)
    assert abs(fit.beta0 - b0) < 2e-5
    assert abs(fit.beta1 - (math.log(20 / 30) - b0)) < 2e-5
    assert abs(fit.beta2 - (math.log(30 / 20) - b0)) < 2e-5
    assert fit.n == 150  # NULL-category rows dropped by the fitter
    with pytest.raises(ValueError, match="levels"):
        dummy_encode(
            spark.range(100).select(F.col("id").cast("string").alias("g")),
            "g", max_levels=32)


def test_poisson_multi_d1_reduces_to_single(spark):
    """With one covariate the d-dimensional Newton solves the same 2x2
    normal equations (and saturated-intercept start) as
    poisson_newton."""
    from clinpy_spark.operators.assoc import (
        poisson_newton, poisson_newton_multi,
    )

    rows = [Row(x=float(i % 4), y=float((i * 3) % 7)) for i in range(160)]
    df = spark.createDataFrame(rows)
    single = poisson_newton(df, "x", "y", iterations=5).collect()[0]
    multi = poisson_newton_multi(df, ["x"], "y", iterations=5).collect()[0]
    assert abs(single.beta0 - multi.beta0) < 1.1e-5
    assert abs(single.beta1 - multi.beta1) < 1.1e-5
    assert abs(single.se1 - multi.se1) < 2e-5


def test_poisson_multi_orthogonal_null_covariate(spark):
    """A balanced null second covariate fits beta2 = 0 and leaves
    (beta0, beta1) at the single-covariate MLE."""
    from clinpy_spark.operators.assoc import (
        poisson_newton, poisson_newton_multi,
    )

    rows = []
    for x2 in (0.0, 1.0):
        rows += [Row(x1=float(i % 3), x2=x2, y=float((i * 5) % 6))
                 for i in range(90)]
    df = spark.createDataFrame(rows)
    single = poisson_newton(df, "x1", "y", iterations=5).collect()[0]
    multi = poisson_newton_multi(
        df, ["x1", "x2"], "y", iterations=5).collect()[0]
    assert abs(multi.beta2) < 1e-5
    assert abs(single.beta0 - multi.beta0) < 1.1e-5
    assert abs(single.beta1 - multi.beta1) < 1.1e-5
    assert multi.score_norm < 1e-4


def test_cox_multi_d1_reduces_to_single(spark):
    """With one binary covariate the cell-grid Newton solves the same
    Breslow partial likelihood as cox_newton."""
    from clinpy_spark.operators.survival import cox_newton, cox_newton_multi

    rows = [Row(t=(i * 37) % 50 + 1 + (i % 2) * 3,
                e=1 if (i * 13) % 10 < 7 else 0,
                x=float(i % 2)) for i in range(300)]
    df = spark.createDataFrame(rows)
    single = cox_newton(df, "t", "e", "x", iterations=4).collect()[0]
    multi = cox_newton_multi(df, "t", "e", ["x"], iterations=4).collect()[0]
    assert abs(single.beta - multi.beta1) < 2e-5
    assert abs(single.hr - multi.hr1) < 2e-5
    assert abs(single.se - multi.se1) < 2e-5
    assert (single.n_events, single.n_subjects) == (
        multi.n_events, multi.n_subjects)


def test_cox_multi_orthogonal_null_covariate(spark):
    """A balanced covariate independent of both hazard and the arm
    fits beta2 ~ 0 while beta1 stays at the single-covariate MLE."""
    from pyspark.sql import Row as R

    from clinpy_spark.operators.survival import cox_newton, cox_newton_multi

    rows = []
    for i in range(200):
        x1 = float(i % 2)
        t = (i * 37) % 40 + 1 + int(x1) * 4
        e = 1 if (i * 13) % 10 < 7 else 0
        # x2 alternates within every (t, e, x1) stratum pair -> null
        rows.append(R(t=t, e=e, x1=x1, x2=float((i // 2) % 2)))
        rows.append(R(t=t, e=e, x1=x1, x2=float(1 - (i // 2) % 2)))
    df = spark.createDataFrame(rows)
    single = cox_newton(df, "t", "e", "x1", iterations=4).collect()[0]
    multi = cox_newton_multi(
        df, "t", "e", ["x1", "x2"], iterations=4).collect()[0]
    assert abs(multi.beta2) < 1e-5
    assert abs(single.beta - multi.beta1) < 1.1e-5
    assert multi.score_norm < 1e-4


def test_streaming_logistic_multi_matches_batch(spark):
    """The folded joint-covariate grid refits the d-covariate MLE on
    read, exactly matching the batch fitter over the same rows (grid
    counters are integer-additive — twin contract)."""
    from clinpy_spark.operators.assoc import logistic_newton_multi
    from clinpy_spark.streaming.glm import (
        finalize_logistic_multi, glm_grid_partial_multi,
    )

    rows = [Row(x1=float(i % 4), x2=float((i // 4) % 3),
                y=(1 if (i * 7) % 10 < 2 + (i % 4) else 0))
            for i in range(240)]
    df = spark.createDataFrame(rows)
    g1 = glm_grid_partial_multi(df.filter(F.col("x1") < 2), ["x1", "x2"], "y")
    g2 = glm_grid_partial_multi(df.filter(F.col("x1") >= 2), ["x1", "x2"], "y")
    folded = g1.unionByName(g2).groupBy("__x1", "__x2").agg(
        F.sum("n").alias("n"), F.sum("sy").alias("sy"))
    got = finalize_logistic_multi(folded, 2, iterations=5).collect()[0]
    want = logistic_newton_multi(
        df, ["x1", "x2"], "y", iterations=5).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.beta1 is not None


def test_apply_containment_dedup_keeps_maximal(spark):
    """Directional keep-LONGEST: on a quote chain a ⊂ b ⊂ c only the
    maximal c survives; unrelated docs are untouched; mutual
    containment at equal size keeps exactly the smaller id."""
    from clinpy_spark.operators.dedup import (
        apply_containment_dedup, containment_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=base),                               # a
        Row(doc_id=2, text=base + " iota kappa lambda mu"),     # b ⊃ a
        Row(doc_id=3, text=base + " iota kappa lambda mu nu xi omicron pi"),
        Row(doc_id=4, text="totally different words here indeed folks"),
        Row(doc_id=5, text="twin one same words equal size here"),
        Row(doc_id=6, text="twin one same words equal size here"),
    ])
    prs = containment_pairs(docs, "doc_id", "text",
                            shingle_n=3, threshold=0.8, max_shingle_df=200)
    kept = sorted(r.doc_id for r in
                  apply_containment_dedup(docs, prs, "doc_id").collect())
    assert kept == [3, 4, 5]


def test_streaming_cox_multi_matches_batch(spark):
    """The folded per-(cell, time) leaver grid refits the d-covariate
    Cox MLE on read, exactly matching the batch fitter over the same
    subjects (leaver counters are integer-additive; at-risk counts
    rebuild from totals — twin contract)."""
    from clinpy_spark.operators.survival import cox_newton_multi
    from clinpy_spark.streaming.survival import (
        cox_leaver_partials, finalize_cox_multi,
    )

    rows = [Row(t=(i * 37) % 50 + 1 + (i % 2) * 3,
                e=1 if (i * 13) % 10 < 7 else 0,
                x1=float(i % 2), x2=float((i // 2) % 2))
            for i in range(300)]
    df = spark.createDataFrame(rows)
    p1 = cox_leaver_partials(df.filter(F.col("t") < 25), "t", "e",
                             ["x1", "x2"])
    p2 = cox_leaver_partials(df.filter(F.col("t") >= 25), "t", "e",
                             ["x1", "x2"])
    folded = p1.unionByName(p2).groupBy("__x1", "__x2", "__t").agg(
        F.sum("__r").alias("__r"), F.sum("__d").alias("__d"))
    got = finalize_cox_multi(folded, 2, iterations=4).collect()[0]
    want = cox_newton_multi(df, "t", "e", ["x1", "x2"],
                            iterations=4).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.beta1 is not None and got.n_subjects == 300


def test_cox_multi_singular_is_null(spark):
    from clinpy_spark.operators.survival import cox_newton_multi

    rows = [Row(t=(i * 7) % 20 + 1, e=1, x1=float(i % 2), x2=0.0)
            for i in range(60)]
    out = cox_newton_multi(
        spark.createDataFrame(rows), "t", "e", ["x1", "x2"]).collect()[0]
    assert out.beta1 is None and out.hr2 is None
    assert out.n_subjects == 60


def test_breslow_day_homogeneity(spark):
    """Identical per-stratum ORs -> bd_chi2 ~ 0; opposite ORs -> a
    large chi2 with Tarone <= BD; zero-margin strata excluded from
    the df but counted in n_strata."""
    from clinpy_spark.operators.assoc import breslow_day

    def table(s, a, b, c, d):
        return ([Row(s=s, e=1, y=1)] * a + [Row(s=s, e=0, y=1)] * b
                + [Row(s=s, e=1, y=0)] * c + [Row(s=s, e=0, y=0)] * d)

    # OR = 4 in both strata (second is the first scaled by 2)
    homo = table(0, 10, 20, 5, 40) + table(1, 20, 40, 10, 80)
    out = breslow_day(spark.createDataFrame(homo), "s", "e", "y").collect()[0]
    assert out.bd_chi2 is not None and out.bd_chi2 < 1e-6
    assert out.df == 1 and abs(out.or_mh - 4.0) < 0.01

    # OR = 9 vs OR = 1/9: strong heterogeneity
    het = table(0, 30, 10, 10, 30) + table(1, 10, 30, 30, 10)
    out2 = breslow_day(spark.createDataFrame(het), "s", "e", "y").collect()[0]
    assert out2.bd_chi2 > 10
    assert out2.tarone_chi2 <= out2.bd_chi2 + 1e-9

    # a third stratum with a zero margin (no exposed at all) is
    # uninformative: excluded from df, still counted in n_strata
    mixed = het + table(2, 0, 20, 0, 20)
    out3 = breslow_day(spark.createDataFrame(mixed), "s", "e", "y").collect()[0]
    assert out3.n_strata == 3 and out3.n_informative == 2
    assert out3.df == 1


def test_negbin_overdispersion_widens_se(spark):
    """Equidispersed data -> alpha ~ 0 and NB ~ Poisson; planted
    overdispersion -> alpha > 0, similar point estimate, WIDER se
    (the Poisson-SE-deflation failure mode NB2 exists to fix)."""
    from clinpy_spark.operators.assoc import negbin_newton, poisson_newton

    rows = [Row(x=float(i % 4), y=float((i * 3) % 7)) for i in range(160)]
    df = spark.createDataFrame(rows)
    nb = negbin_newton(df, "x", "y", iterations=5).collect()[0]
    po = poisson_newton(df, "x", "y", iterations=5).collect()[0]
    assert abs(nb.beta1 - po.beta1) < 0.01
    assert nb.alpha < 0.2

    over = []
    for i in range(200):
        x = float(i % 3)
        over.append(Row(x=x, y=0.0 if i % 2 == 0 else 10.0 + 4 * x))
    nb2 = negbin_newton(spark.createDataFrame(over), "x", "y").collect()[0]
    po2 = poisson_newton(spark.createDataFrame(over), "x", "y").collect()[0]
    assert nb2.alpha > 0.3
    assert nb2.se1 > po2.se1
    assert abs(nb2.beta1 - po2.beta1) < 0.2
    assert nb2.score_norm is not None and nb2.score_norm < 1e-3


def test_streaming_negbin_matches_batch(spark):
    """The folded (n, sy, syy) grid refits the whole NB2 chain on
    read, exactly matching the batch fitter (all three counters are
    integer/decimal-additive — twin contract)."""
    from clinpy_spark.operators.assoc import negbin_newton
    from clinpy_spark.streaming.glm import (
        finalize_negbin, negbin_grid_partial,
    )

    rows = []
    for i in range(200):
        x = float(i % 3)
        rows.append(Row(x=x, y=0.0 if i % 2 == 0 else 10.0 + 4 * x))
    df = spark.createDataFrame(rows)
    g1 = negbin_grid_partial(df.filter(F.col("x") < 1.5), "x", "y")
    g2 = negbin_grid_partial(df.filter(F.col("x") >= 1.5), "x", "y")
    folded = g1.unionByName(g2).groupBy("__x").agg(
        F.sum("n").alias("n"), F.sum("sy").alias("sy"),
        F.sum("syy").alias("syy"))
    got = finalize_negbin(folded).collect()[0]
    want = negbin_newton(df, "x", "y").collect()[0]
    assert tuple(got) == tuple(want)
    assert got.alpha > 0.3
