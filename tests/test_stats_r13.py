"""Round-13 additions: hash-determinism of the multi-covariate family
(Cramer driver solves + round-5 emission, r12 verdict #1), the d=3 Cox
oracle rung, Fine-Gray competing-risks score test, and the multinomial
(softmax) logistic MLE."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.01"


def _boundary_margin(v: float, digits: int = 5) -> float:
    """Distance from v to the nearest round-half boundary of the
    10^-digits rounding grid, in value space."""
    scaled = abs(v) * (10 ** digits)
    frac = scaled - math.floor(scaled)
    return abs(frac - 0.5) / (10 ** digits)


def _stat_values(row, skip=("n", "n_pos", "n_events", "n_subjects",
                            "y_total")):
    out = {}
    for k in row.asDict():
        if k in skip:
            continue
        v = row[k]
        if v is not None:
            out[k] = float(v)
    return out


def test_multi_family_round5_boundary_margin(spark):
    """r12 verdict #1 'done' condition: on the sf0.01 fixture, no
    UNROUNDED emitted statistic of the three driver-facing multi
    fitters sits within 1e-9 of a round-5 boundary — so the ~1e-13
    distributed-sum-order drift between the Spark moments and the
    oracle's DuckDB moments cannot flip an emitted digit."""
    from clinpy_spark.operators.assoc import (
        logistic_newton_multi, poisson_newton_multi,
    )
    from clinpy_spark.operators.survival import cox_newton_multi
    from clinpy_spark.queries import _t

    margins = {}

    # --- surv_cox_multi's obs (queries.py surv_cox_multi_q) ---
    o = _t(spark, SF001, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    followup = h % 1500 + 1
    dd = F.datediff(
        F.lit("1998-08-02").cast("date"), F.col("o_orderdate")).cast("long")
    obs = o.select(
        F.least(followup, dd).alias("duration"),
        F.when(followup <= dd, 1).otherwise(0).alias("evt"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1.0).otherwise(0.0)
        .alias("x1"),
        (F.col("o_custkey") % 2).cast("double").alias("x2"),
    )
    raw = cox_newton_multi(obs, "duration", "evt", ["x1", "x2"],
                           iterations=4, digits=None).collect()[0]
    for k, v in _stat_values(raw).items():
        margins[f"cox.{k}"] = _boundary_margin(v)

    # --- dx_logistic_multi's obs ---
    li = _t(spark, SF001, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_linenumber").cast("double").alias("x2"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    raw = logistic_newton_multi(li, ["x1", "x2"], "y",
                                iterations=4, digits=None).collect()[0]
    for k, v in _stat_values(raw).items():
        margins[f"logit.{k}"] = _boundary_margin(v)

    # --- dx_poisson_multi's obs ---
    cust = _t(spark, SF001, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 5).cast("double").alias("x1"),
        (F.col("c_custkey") % 3).cast("double").alias("x2"),
    )
    cnt = (_t(spark, SF001, "orders")
           .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders")))
    per_c = (cust.join(cnt, cust["c_custkey"] == cnt["o_custkey"], "left")
             .select("x1", "x2",
                     F.coalesce("n_orders", F.lit(0)).cast("double")
                     .alias("y")))
    raw = poisson_newton_multi(per_c, ["x1", "x2"], "y",
                               iterations=4, digits=None).collect()[0]
    for k, v in _stat_values(raw).items():
        margins[f"pois.{k}"] = _boundary_margin(v)

    bad = {k: m for k, m in margins.items() if m < 1e-9}
    assert not bad, f"statistics within 1e-9 of a round-5 boundary: {bad}"


def test_cohen_kappa_counts_union_of_levels(spark):
    """r13 ADVICE fix: a category used exclusively by rater b still
    counts toward n_categories (union of both raters' levels)."""
    from clinpy_spark.operators.assoc import cohen_kappa

    rows = ([Row(a="x", b="x")] * 10 + [Row(a="y", b="y")] * 10
            + [Row(a="x", b="z")] * 5)  # 'z' appears only for rater b
    out = cohen_kappa(spark.createDataFrame(rows), "a", "b").collect()[0]
    assert out.n_categories == 3
    assert out.n == 25


def test_breslow_day_degenerate_or_is_null(spark):
    """r13 ADVICE fix: when or_mh = 0 (no exposed cases in any
    stratum) every fitted root is non-interior — the strata are
    uninformative and the test emits NULL, never NaN/negative."""
    from clinpy_spark.operators.assoc import breslow_day

    def table(s, a, b, c, d):
        return ([Row(s=s, e=1, y=1)] * a + [Row(s=s, e=0, y=1)] * b
                + [Row(s=s, e=1, y=0)] * c + [Row(s=s, e=0, y=0)] * d)

    # a = 0 in both strata but all margins positive -> informative by
    # the margin test, yet psi = 0 puts both roots on/outside the
    # boundary: n_informative must drop to 0 and outputs go NULL
    rows = table(0, 0, 10, 5, 20) + table(1, 0, 8, 4, 16)
    out = breslow_day(spark.createDataFrame(rows), "s", "e", "y").collect()[0]
    assert out.bd_chi2 is None and out.tarone_chi2 is None
    assert out.n_informative == 0 and out.n_strata == 2
    import math as _m
    for v in (out.bd_chi2, out.tarone_chi2):
        assert v is None or not _m.isnan(v)


def test_multi_fitters_round5_contract(spark):
    """The default emission IS round-5 (+0.0-folded): every float
    statistic equals round(value, 5) of itself."""
    from clinpy_spark.operators.assoc import logistic_newton_multi

    rows = ([Row(x1=0.0, x2=0.0, y=1)] * 7 + [Row(x1=0.0, x2=0.0, y=0)] * 13
            + [Row(x1=1.0, x2=0.0, y=1)] * 11 + [Row(x1=1.0, x2=1.0, y=0)] * 9
            + [Row(x1=0.0, x2=1.0, y=1)] * 5 + [Row(x1=1.0, x2=1.0, y=1)] * 6)
    out = logistic_newton_multi(
        spark.createDataFrame(rows), ["x1", "x2"], "y").collect()[0]
    for k, v in _stat_values(out).items():
        assert v == round(v, 5) + 0.0, (k, v)


def test_cox_multi3_orthogonal_third_recovers_d2(spark):
    """r12 verdict #5 property: with a MIRRORED third covariate (every
    (t, e, x1, x2) subject duplicated at x3 = +1 and x3 = -1) all odd
    x3 moments vanish, the 3x3 system is block-diagonal, and the d=3
    fit's (beta1, beta2) equal the d=2 fit on the base cohort exactly
    (doubling every count rescales U and I together, leaving every
    Newton update unchanged); beta3 stays 0."""
    from clinpy_spark.operators.survival import cox_newton_multi

    base = [Row(t=(i * 37) % 50 + 1 + (i % 2) * 3,
                e=1 if (i * 13) % 10 < 7 else 0,
                x1=float(i % 2), x2=float((i // 2) % 2))
            for i in range(240)]
    d2 = spark.createDataFrame(base)
    mirrored = [Row(t=r.t, e=r.e, x1=r.x1, x2=r.x2, x3=s)
                for r in base for s in (1.0, -1.0)]
    d3 = spark.createDataFrame(mirrored)

    f2 = cox_newton_multi(d2, "t", "e", ["x1", "x2"],
                          iterations=4).collect()[0]
    f3 = cox_newton_multi(d3, "t", "e", ["x1", "x2", "x3"],
                          iterations=4).collect()[0]
    assert abs(f3.beta1 - f2.beta1) < 1.1e-5
    assert abs(f3.beta2 - f2.beta2) < 1.1e-5
    assert abs(f3.beta3) <= 1e-5
    assert f3.n_subjects == 2 * f2.n_subjects
    # doubled counts double the information: se shrinks by sqrt(2)
    assert abs(f3.se1 - f2.se1 / math.sqrt(2)) < 1e-4


def test_finegray_no_competing_equals_cox_score(spark):
    """r12 verdict #6 property: with zero competing events every IPCW
    weight is 1 and the Fine-Gray score test IS the Cox score test —
    bit-exact (chi2, u, n_events), censoring included."""
    from clinpy_spark.operators.survival import cox_score, finegray_score

    rows = [Row(t=(i * 37) % 40 + 1,
                st=1 if (i * 13) % 10 < 6 else 0,   # event-1 or censored
                x=i % 2)
            for i in range(300)]
    df = spark.createDataFrame(rows)
    fg = finegray_score(df, "t", "st", "x").collect()[0]
    cs = cox_score(df.withColumn("e", (F.col("st") == 1).cast("int")),
                   "t", "e", "x").collect()[0]
    assert fg.chi2 == cs.chi2
    assert fg.u == cs.u
    assert fg.n_events == cs.n_events
    assert fg.n_competing == 0
    assert fg.n_subjects == cs.n_subjects == 300


def test_finegray_competing_keeps_subjects_at_risk(spark):
    """Competing events must PULL the statistic toward the
    subdistribution contrast: relabelling some of arm 1's censorings
    as competing events keeps those subjects in the risk set (weighted)
    and changes u relative to treating them as censored; outputs stay
    finite and counts are bookkept."""
    from clinpy_spark.operators.survival import finegray_score

    base = [Row(t=(i * 29) % 30 + 1,
                st=1 if (i * 7) % 10 < 4 else 0,
                x=i % 2)
            for i in range(400)]
    censored_as_is = spark.createDataFrame(base)
    relabeled = censored_as_is.withColumn(
        "st",
        F.when((F.col("st") == 0) & (F.col("x") == 1)
               & (F.col("t") % 3 == 0), 2).otherwise(F.col("st")))
    a = finegray_score(censored_as_is, "t", "st", "x").collect()[0]
    b = finegray_score(relabeled, "t", "st", "x").collect()[0]
    assert a.n_competing == 0 and b.n_competing > 0
    assert b.chi2 is not None and not math.isnan(b.chi2)
    assert a.u != b.u  # the weighted risk sets genuinely moved
    assert a.n_events == b.n_events  # event-1 count unchanged


def test_multinomial_k2_recovers_logistic(spark):
    """r12 verdict #7 property: with two classes the softmax MLE IS
    the binary logistic MLE (p = e/(1+e) vs 1/(1+e^-eta) differ only
    in float path, ~1e-12) — same start, same step count."""
    from clinpy_spark.operators.assoc import (
        logistic_newton_multi, multinomial_newton,
    )

    rows = ([Row(x=0.0, y=1)] * 20 + [Row(x=0.0, y=0)] * 80
            + [Row(x=1.0, y=1)] * 40 + [Row(x=1.0, y=0)] * 60
            + [Row(x=2.0, y=1)] * 55 + [Row(x=2.0, y=0)] * 45)
    df = spark.createDataFrame(rows)
    logit = logistic_newton_multi(df, ["x"], "y", iterations=5).collect()[0]
    mn = multinomial_newton(
        df.withColumn("lab", F.col("y").cast("string")),
        "x", "lab", iterations=5).collect()[0]
    assert mn.class_ref == "0" and mn.class_1 == "1"
    assert abs(mn.beta0_1 - logit.beta0) < 1.1e-5
    assert abs(mn.beta1_1 - logit.beta1) < 1.1e-5
    assert abs(mn.se_1 - logit.se1) < 1.1e-5
    assert abs(mn.wald_chi2_1 - logit.wald_chi2_1) < 1e-3
    assert mn.n == logit.n == 300


def test_multinomial_k3_known_saturated(spark):
    """A single covariate value saturates to the empirical log odds:
    beta0_c = ln(n_c / n_ref), slopes undefined (constant covariate ->
    singular information -> NULL stats)."""
    from clinpy_spark.operators.assoc import multinomial_newton

    rows = ([Row(x=1.0, lab="a")] * 50 + [Row(x=1.0, lab="b")] * 25
            + [Row(x=1.0, lab="c")] * 10)
    out = multinomial_newton(
        spark.createDataFrame(rows), "x", "lab").collect()[0]
    # constant covariate: intercept and slope collinear -> singular
    assert out.beta0_1 is None and out.beta1_2 is None
    assert out.n == 85

    # two covariate levels, three classes: fit matches the per-level
    # empirical log odds chained through the model (checked loosely
    # via the fitted class shares at each level)
    rows2 = ([Row(x=0.0, lab="a")] * 40 + [Row(x=0.0, lab="b")] * 40
             + [Row(x=0.0, lab="c")] * 20
             + [Row(x=1.0, lab="a")] * 20 + [Row(x=1.0, lab="b")] * 30
             + [Row(x=1.0, lab="c")] * 50)
    out2 = multinomial_newton(
        spark.createDataFrame(rows2), "x", "lab",
        iterations=8).collect()[0]
    # saturated 2-level model: beta0 = ln(p_b(0)/p_a(0)) etc.
    assert out2.beta0_1 == pytest.approx(math.log(40 / 40), abs=1e-4)
    assert out2.beta0_2 == pytest.approx(math.log(20 / 40), abs=1e-4)
    assert out2.beta1_1 == pytest.approx(
        math.log(30 / 20) - math.log(40 / 40), abs=1e-4)
    assert out2.beta1_2 == pytest.approx(
        math.log(50 / 20) - math.log(20 / 40), abs=1e-4)
    assert out2.score_norm < 1e-3


def test_finegray_newton_no_competing_equals_cox_newton(spark):
    """The Fine-Gray MLE with zero competing events IS cox_newton —
    same grid recurrence over integer risk sets, bit-exact outputs."""
    from clinpy_spark.operators.survival import cox_newton, finegray_newton

    rows = [Row(t=(i * 37) % 40 + 1,
                st=1 if (i * 13) % 10 < 6 else 0,
                x=i % 2)
            for i in range(300)]
    df = spark.createDataFrame(rows)
    fg = finegray_newton(df, "t", "st", "x", iterations=3).collect()[0]
    cx = cox_newton(df.withColumn("e", (F.col("st") == 1).cast("int")),
                    "t", "e", "x", iterations=3).collect()[0]
    assert (fg.beta, fg.hr, fg.se, fg.wald_chi2) == (
        cx.beta, cx.hr, cx.se, cx.wald_chi2)
    assert fg.n_events == cx.n_events and fg.n_competing == 0


def test_finegray_newton_competing_shrinks_beta_toward_cif(spark):
    """Sanity: when arm 1's 'censorings' are really competing events,
    the subdistribution hazard ratio must move DOWN relative to
    naively censoring them (those subjects can never have the event of
    interest, diluting arm 1's cumulative incidence)."""
    from clinpy_spark.operators.survival import cox_newton, finegray_newton

    rows = []
    for i in range(400):
        x = i % 2
        t = (i * 29) % 30 + 1
        if (i * 7) % 10 < 4:
            st = 1
        elif x == 1 and (i * 11) % 3 == 0:
            st = 2           # competing, only in arm 1
        else:
            st = 0
        rows.append(Row(t=t, st=st, x=x))
    df = spark.createDataFrame(rows)
    fg = finegray_newton(df, "t", "st", "x").collect()[0]
    naive = cox_newton(
        df.withColumn("e", (F.col("st") == 1).cast("int")),
        "t", "e", "x").collect()[0]
    assert fg.n_competing > 0
    assert fg.beta is not None and naive.beta is not None
    assert fg.beta < naive.beta  # competing events dilute arm 1's CIF


def test_rmst_no_censoring_is_truncated_mean(spark):
    """With zero censoring the KM is the empirical survival function,
    so RMST equals the arithmetic mean of min(T, tau) exactly."""
    from clinpy_spark.operators.survival import rmst_diff

    ta = [3, 7, 7, 12, 20, 25, 40, 55]
    tb = [2, 5, 9, 9, 14, 60, 80]
    rows = ([Row(t=t, e=1, g="x") for t in ta]
            + [Row(t=t, e=1, g="y") for t in tb])
    tau = 30.0
    out = rmst_diff(spark.createDataFrame(rows), "t", "e", "g",
               "x", "y", tau).collect()[0]
    want_a = sum(min(t, tau) for t in ta) / len(ta)
    want_b = sum(min(t, tau) for t in tb) / len(tb)
    assert out.rmst_a == pytest.approx(want_a, abs=1e-6)
    assert out.rmst_b == pytest.approx(want_b, abs=1e-6)
    assert out.diff == pytest.approx(want_a - want_b, abs=1e-6)
    assert out.n_a == 8 and out.n_b == 7
    assert out.se_a > 0 and out.z is not None


def test_rmst_no_events_is_tau(spark):
    """An arm fully event-free (or censored-only) through tau reports
    rmst = tau with zero variance; z is NULL when both arms are flat."""
    from clinpy_spark.operators.survival import rmst_diff

    rows = ([Row(t=50, e=0, g="x")] * 5 + [Row(t=40, e=0, g="y")] * 4)
    out = rmst_diff(spark.createDataFrame(rows), "t", "e", "g",
               "x", "y", 30.0).collect()[0]
    assert out.rmst_a == 30.0 and out.rmst_b == 30.0
    assert out.se_a == 0.0 and out.se_diff == 0.0
    assert out.diff == 0.0 and out.z is None


def test_rmst_censoring_lifts_curve_vs_naive_death(spark):
    """Censored subjects must NOT count as events: treating the same
    rows' censorings as deaths strictly lowers both arms' RMST."""
    from clinpy_spark.operators.survival import rmst_diff

    rows = []
    for i in range(120):
        g = "x" if i % 2 == 0 else "y"
        t = (i * 17) % 28 + 1
        e = 1 if (i * 7) % 3 else 0
        rows.append(Row(t=t, e=e, g=g))
    df = spark.createDataFrame(rows)
    km = rmst_diff(df, "t", "e", "g", "x", "y", 25.0).collect()[0]
    naive = rmst_diff(df.withColumn("e", F.lit(1)), "t", "e", "g",
                 "x", "y", 25.0).collect()[0]
    assert km.rmst_a > naive.rmst_a and km.rmst_b > naive.rmst_b


def test_ordinal_k2_recovers_logistic(spark):
    """With two levels the proportional-odds model IS binary logistic
    with flipped signs: P(Y = hi) = sigmoid(-(theta_1 + beta x)), so at
    convergence beta0 = -theta_1 and beta1 = -beta."""
    from clinpy_spark.operators.assoc import (
        logistic_newton_multi, ordinal_newton,
    )

    rows = ([Row(x=0.0, g="lo")] * 70 + [Row(x=0.0, g="hi")] * 30
            + [Row(x=1.0, g="lo")] * 45 + [Row(x=1.0, g="hi")] * 55
            + [Row(x=2.0, g="lo")] * 25 + [Row(x=2.0, g="hi")] * 75)
    df = spark.createDataFrame(rows)
    o = ordinal_newton(df, "x", "g", ["lo", "hi"], iterations=8).collect()[0]
    logit = logistic_newton_multi(
        df.withColumn("y", (F.col("g") == "hi").cast("int")),
        ["x"], "y", iterations=8).collect()[0]
    assert abs(-o.theta_1 - logit.beta0) < 1e-4
    assert abs(-o.beta - logit.beta1) < 1e-4
    assert abs(o.se_beta - logit.se1) < 1e-4
    assert o.n == logit.n == 300


def test_ordinal_k3_saturated_and_null_cases(spark):
    """A two-value covariate saturates: the fitted cumulative logits
    reproduce the empirical ones when proportional odds holds exactly;
    a level missing everywhere -> NULL (unidentifiable threshold);
    beta sign follows the direction of the shift."""
    import math as _m

    from clinpy_spark.operators.assoc import ordinal_newton

    # proportional-odds-exact construction: cumulative logits at x=1
    # are the x=0 logits shifted by +1
    def counts(th1, th2, n=200):
        g1 = 1 / (1 + _m.exp(-th1))
        g2 = 1 / (1 + _m.exp(-th2))
        n1 = round(n * g1)
        n2 = round(n * (g2 - g1))
        return n1, n2, n - n1 - n2
    rows = []
    for x, (t1, t2) in ((0.0, (-1.0, 0.5)), (1.0, (0.0, 1.5))):
        n1, n2, n3 = counts(t1, t2)
        rows += ([Row(x=x, g="mild")] * n1 + [Row(x=x, g="mod")] * n2
                 + [Row(x=x, g="severe")] * n3)
    out = ordinal_newton(
        spark.createDataFrame(rows), "x", "g",
        ["mild", "mod", "severe"], iterations=8).collect()[0]
    # rounding of counts perturbs slightly; the shift is ~ +1
    assert out.beta == pytest.approx(1.0, abs=0.15)
    assert out.theta_1 == pytest.approx(-1.0, abs=0.15)
    assert out.theta_2 == pytest.approx(0.5, abs=0.15)
    assert out.or_beta == pytest.approx(_m.exp(out.beta), abs=1e-4)
    assert out.score_norm < 1e-3

    # a level absent everywhere: cumulative count hits 0 -> NULL
    rows2 = [Row(x=float(i % 3), g="mod" if i % 2 else "severe")
             for i in range(60)]
    out2 = ordinal_newton(
        spark.createDataFrame(rows2), "x", "g",
        ["mild", "mod", "severe"]).collect()[0]
    assert out2.beta is None and out2.theta_1 is None
    assert out2.n == 60


def test_pii_scan_known_counts(spark):
    """Hand-built documents with known PII: per-pattern counts are
    exact, non-overlapping, and a phone never double-counts as an
    SSN-shaped token (3-3-4 vs 3-2-4 grouping)."""
    from clinpy_spark.operators.curate import pii_scan, pii_summary

    docs = spark.createDataFrame([
        Row(doc_id=1, text="reach me at jo.smith+x@corp.io or "
                           "bob@sub.example.org today"),
        Row(doc_id=2, text="call 25-989-741-2988 and 88-123-456-7890 now"),
        Row(doc_id=3, text="ssn 123-45-6789 ip 10.0.255.1 mixed"),
        Row(doc_id=4, text="nothing sensitive here at all"),
    ])
    got = {r.doc_id: r for r in pii_scan(docs, "text").collect()}
    assert got[1].pii_email == 2 and got[1].pii_any == 2
    assert got[2].pii_phone == 2 and got[2].pii_ssn == 0
    assert got[3].pii_ssn == 1 and got[3].pii_ipv4 == 1
    assert got[4].pii_any == 0

    s = pii_summary(docs, "text").collect()[0]
    assert s.n_docs == 4 and s.docs_any == 3
    assert s.matches_email == 2 and s.matches_phone == 2
    assert s.docs_ssn == 1 and s.docs_ipv4 == 1


def test_fleiss_kappa_known_and_perfect(spark):
    """Perfect 3-rater agreement -> kappa = 1; a crafted mixed panel
    matches a local replay of the Fleiss 1971 formulas; unbalanced
    items (missing ratings) are dropped from the panel."""
    from clinpy_spark.operators.assoc import fleiss_kappa

    perfect = [Row(i=i, c="a" if i % 2 else "b")
               for i in range(20) for _ in range(3)]
    out = fleiss_kappa(spark.createDataFrame(perfect), "i", "c").collect()[0]
    assert out.kappa == 1.0 and out.n_raters == 3 and out.n_items == 20

    # mixed panel: item i gets ratings by three rules; one item only 2
    panel = []
    for i in range(30):
        rs = ["a" if i % 2 else "b", "a" if i % 3 else "b",
              "a" if i % 5 else "b"]
        if i == 7:
            rs = rs[:2]  # unbalanced item: dropped
        panel += [Row(i=i, c=c) for c in rs]
    out = fleiss_kappa(spark.createDataFrame(panel), "i", "c").collect()[0]
    assert out.n_items == 29 and out.n_raters == 3

    # local replay
    from collections import Counter
    items = {}
    for r in panel:
        items.setdefault(r.i, []).append(r.c)
    items = {k: v for k, v in items.items() if len(v) == 3}
    N, n = len(items), 3
    cat = Counter(c for v in items.values() for c in v)
    tot = sum(cat.values())
    p = {c: m / tot for c, m in cat.items()}
    p_bar = sum(
        (sum(m * m for m in Counter(v).values()) - n) / (n * (n - 1))
        for v in items.values()) / N
    p_e = sum(x * x for x in p.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out.p_bar == pytest.approx(p_bar, abs=1e-6)
    assert out.p_e == pytest.approx(p_e, abs=1e-6)
    assert out.kappa == pytest.approx(kappa, abs=1e-6)
    assert out.se0 > 0 and out.z == pytest.approx(kappa / out.se0, rel=1e-3)


def test_kendall_tau_b_matches_bruteforce(spark):
    """tau-b and the ties-adjusted z match an O(n^2) brute-force pair
    count on a heavily-tied sample; a perfect monotone (tie-free)
    relation gives tau_b = 1."""
    import itertools
    import math as _m

    from clinpy_spark.operators.assoc import kendall_tau_b

    mono = [Row(x=float(i), y=float(2 * i + 1)) for i in range(40)]
    out = kendall_tau_b(spark.createDataFrame(mono), "x", "y").collect()[0]
    assert out.tau_b == 1.0 and out.discordant == 0

    pts = [((i * 7) % 5, (i * 7) % 5 + (i * 3) % 4) for i in range(60)]
    df = spark.createDataFrame([Row(x=float(a), y=float(b)) for a, b in pts])
    got = kendall_tau_b(df, "x", "y").collect()[0]
    C = D = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pts, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            C += 1
        elif s < 0:
            D += 1
    n = len(pts)
    from collections import Counter
    tx = Counter(a for a, _ in pts)
    ty = Counter(b for _, b in pts)
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in tx.values())
    n2 = sum(t * (t - 1) / 2 for t in ty.values())
    tau = (C - D) / _m.sqrt((n0 - n1) * (n0 - n2))
    v0 = n * (n - 1) * (2 * n + 5)
    vt = sum(t * (t - 1) * (2 * t + 5) for t in tx.values())
    vu = sum(t * (t - 1) * (2 * t + 5) for t in ty.values())
    v1 = (sum(t * (t - 1) for t in tx.values())
          * sum(t * (t - 1) for t in ty.values())) / (2 * n * (n - 1))
    v2 = (sum(t * (t - 1) * (t - 2) for t in tx.values())
          * sum(t * (t - 1) * (t - 2) for t in ty.values())) \
        / (9 * n * (n - 1) * (n - 2))
    var_s = (v0 - vt - vu) / 18 + v1 + v2
    assert (got.concordant, got.discordant) == (C, D)
    assert got.pairs_tied_x == n1 and got.pairs_tied_y == n2
    assert got.tau_b == pytest.approx(tau, abs=1e-6)
    assert got.z == pytest.approx((C - D) / _m.sqrt(var_s), abs=1e-6)


# ---------------------------------------------------------------------------
# Concordance family (late r13): Harrell's C, Jonckheere-Terpstra,
# Somers' D — each pinned against a naive O(n^2) local pair replay and
# the cross-operator identities (k=2 JT == Mann-Whitney U; binary-y
# Somers d_xy == Gini == 2*AUC - 1).
# ---------------------------------------------------------------------------


def _lcg(seed):
    s = seed
    while True:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield s >> 33


def test_cindex_matches_naive_pair_replay(spark):
    from clinpy_spark.operators.survival import cindex

    g = _lcg(11)
    rows = [(next(g) % 30 + 1, next(g) % 2, next(g) % 10)
            for _ in range(300)]
    df = spark.createDataFrame(rows, "t long, e int, s long")
    r = cindex(df, "t", "e", "s").collect()[0]
    conc = disc = tied = comp = 0
    for i, (ti, ei, si) in enumerate(rows):
        if not ei:
            continue
        for j, (tj, ej, sj) in enumerate(rows):
            if i == j:
                continue
            if tj > ti or (tj == ti and ej == 0):
                comp += 1
                if si > sj:
                    conc += 1
                elif si < sj:
                    disc += 1
                else:
                    tied += 1
    assert (r["comparable"], r["concordant"], r["discordant"],
            r["tied_score"]) == (comp, conc, disc, tied)
    assert r["c_index"] == round((conc + tied / 2) / comp, 6)
    assert r["somers_d"] == round(2 * (conc + tied / 2) / comp - 1, 6)


def test_cindex_perfect_and_reversed_score(spark):
    from clinpy_spark.operators.survival import cindex

    rows = [(t, 1, 100 - t) for t in range(1, 50)]
    df = spark.createDataFrame(rows, "t long, e int, s long")
    assert cindex(df, "t", "e", "s").collect()[0]["c_index"] == 1.0
    rev = spark.createDataFrame(
        [(t, 1, t) for t in range(1, 50)], "t long, e int, s long")
    assert cindex(rev, "t", "e", "s").collect()[0]["c_index"] == 0.0


def test_cindex_same_time_semantics(spark):
    """Events at the same time are incomparable; an event vs a
    censoring at the same time IS comparable (event precedes)."""
    from clinpy_spark.operators.survival import cindex

    df = spark.createDataFrame(
        [(5, 1, 3), (5, 1, 1), (5, 0, 1)], "t long, e int, s long")
    r = cindex(df, "t", "e", "s").collect()[0]
    # pairs: (e@s3, e@s1) incomparable; (e@s3, c@s1) concordant;
    # (e@s1, c@s1) tied-score comparable.
    assert r["comparable"] == 2
    assert r["concordant"] == 1
    assert r["tied_score"] == 1
    assert r["c_index"] == round(1.5 / 2, 6)


def test_jonckheere_matches_naive_and_mannwhitney(spark):
    from clinpy_spark.operators.assoc import (
        jonckheere_terpstra, mann_whitney_u)

    g = _lcg(23)
    rows = [(next(g) % 4 + 1, float(next(g) % 13)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g long, v double")
    r = jonckheere_terpstra(df, "g", "v").collect()[0]
    j2 = 0
    for (ga, va) in rows:
        for (gb, vb) in rows:
            if ga < gb:
                j2 += 2 if va < vb else (1 if va == vb else 0)
    assert r["j_stat"] == j2 / 2
    from collections import Counter
    n = len(rows)
    ni = Counter(gg for gg, _ in rows)
    tv = Counter(v for _, v in rows)
    e_j = (n * n - sum(m * m for m in ni.values())) / 4
    f = lambda m: m * (m - 1) * (2 * m + 5)  # noqa: E731
    g3 = lambda m: m * (m - 1) * (m - 2)  # noqa: E731
    a = f(n) - sum(f(m) for m in ni.values()) - sum(
        f(t) for t in tv.values())
    b = sum(g3(m) for m in ni.values()) * sum(g3(t) for t in tv.values())
    c = sum(m * (m - 1) for m in ni.values()) * sum(
        t * (t - 1) for t in tv.values())
    var = a / 72 + b / (36 * n * (n - 1) * (n - 2)) + c / (8 * n * (n - 1))
    assert r["e_j"] == round(e_j, 6)
    assert abs(r["var_j"] - var) < 1e-6
    assert abs(r["z"] - (j2 / 2 - e_j) / math.sqrt(var)) < 1e-5

    # k = 2: J IS the Mann-Whitney U of the higher-labelled group
    two = [(gg, v) for gg, v in rows if gg in (1, 2)]
    df2 = spark.createDataFrame(two, "g long, v double")
    rj = jonckheere_terpstra(df2, "g", "v").collect()[0]
    u = sum((1 if va < vb else 0.5 if va == vb else 0)
            for (ga, va) in two for (gb, vb) in two
            if ga == 1 and gb == 2)
    assert rj["j_stat"] == u
    mw = mann_whitney_u(df2, "v", "g", 2, 1).collect()[0]
    assert float(mw["u_a"]) == u


def test_somers_d_naive_and_binary_auc_identity(spark):
    from clinpy_spark.operators.assoc import somers_d
    from clinpy_spark.operators.classify import roc_auc

    g = _lcg(37)
    rows = [(next(g) % 20 + 1, next(g) % 2) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = somers_d(df, "x", "y").collect()[0]
    cc = dd = tx = ty = 0
    for i, (xa, ya) in enumerate(rows):
        for (xb, yb) in rows[i + 1:]:
            if xa != xb and ya != yb:
                if (xa - xb) * (ya - yb) > 0:
                    cc += 1
                else:
                    dd += 1
            if xa == xb:
                tx += 1
            if ya == yb:
                ty += 1
    n0 = len(rows) * (len(rows) - 1) // 2
    s = cc - dd
    assert (r["concordant"], r["discordant"]) == (cc, dd)
    assert r["d_yx"] == round(s / (n0 - tx), 6)
    assert r["d_xy"] == round(s / (n0 - ty), 6)
    auc = roc_auc(df.withColumn("y", F.col("y").cast("int")),
                  "x", "y").collect()[0]
    assert abs(float(auc["auc"]) - (s / (n0 - ty) + 1) / 2) < 2e-6


def test_somers_z_matches_kendall_z(spark):
    """tau-b, d_yx, d_xy share S and its null variance — one z."""
    from clinpy_spark.operators.assoc import kendall_tau_b, somers_d

    g = _lcg(41)
    rows = [(next(g) % 8 + 1, next(g) % 5) for _ in range(300)]
    df = spark.createDataFrame(rows, "x long, y long")
    zk = kendall_tau_b(df, "x", "y").collect()[0]["z"]
    zs = somers_d(df, "x", "y").collect()[0]["z"]
    assert zk == zs


def test_gains_table_naive_replay(spark):
    from clinpy_spark.operators.classify import gains_table

    g = _lcg(53)
    rows = [(next(g) % 8, 1 if next(g) % 100 < 30 else 0)
            for _ in range(400)]
    df = spark.createDataFrame(rows, "s long, y int")
    out = {r["score"]: r for r in gains_table(df, "s", "y").collect()}
    from collections import Counter
    per_n = Counter(s for s, _ in rows)
    per_p = Counter(s for s, y in rows if y)
    nn, pp = len(rows), sum(y for _, y in rows)
    cum_n = cum_p = 0
    for s in sorted(per_n, reverse=True):
        cum_n += per_n[s]
        cum_p += per_p.get(s, 0)
        r = out[float(s)]
        assert (r["n"], r["positives"], r["cum_n"], r["cum_pos"]) == (
            per_n[s], per_p.get(s, 0), cum_n, cum_p)
        assert r["depth"] == round(cum_n / nn, 6)
        assert r["gain"] == round(cum_p / pp, 6)
        assert r["lift"] == round((cum_p / pp) / (cum_n / nn), 6)
        assert r["ks"] == round(cum_p / pp - (cum_n - cum_p) / (nn - pp), 6)
    # full depth: gain = lift = 1, ks = 0
    last = out[float(min(per_n))]
    assert last["gain"] == 1.0 and last["lift"] == 1.0 and last["ks"] == 0.0


def test_direct_standardization_removes_confounding(spark):
    """Classic Simpson setup: both groups have IDENTICAL stratum-
    specific rates (0.01 in young, 0.10 in old) but opposite stratum
    mixes — crude rates differ, adjusted rates are equal."""
    from clinpy_spark.operators.survival import direct_standardization

    rows = []
    # group A: 900 young + 100 old person-units; group B reversed.
    # encode as (group, stratum, events, time) pseudo-rows.
    rows += [("A", "young", 9, 900.0), ("A", "old", 10, 100.0),
             ("B", "young", 1, 100.0), ("B", "old", 90, 900.0)]
    df = spark.createDataFrame(
        rows, "g string, s string, e long, t double")
    out = {r["group"]: r
           for r in direct_standardization(df, "g", "s", "e", "t").collect()}
    a, b = out["A"], out["B"]
    assert a["crude_rate"] != b["crude_rate"]
    assert a["adj_rate"] == b["adj_rate"]
    # adjusted = pooled-weighted 0.01/0.10 mix: w_young = w_old = 1000
    assert a["adj_rate"] == round((1000 * 0.01 + 1000 * 0.1) / 2000, 6)
    # variance formula replay for A
    wsum = 2000.0
    wv = 1000.0 ** 2 * 9 / 900.0 ** 2 + 1000.0 ** 2 * 10 / 100.0 ** 2
    assert a["se_adj"] == round(wv ** 0.5 / wsum, 6)
    assert a["strata_used"] == 2


def test_direct_standardization_skips_empty_stratum(spark):
    from clinpy_spark.operators.survival import direct_standardization

    rows = [("A", "s1", 2, 100.0), ("A", "s2", 0, 0.0),
            ("B", "s1", 1, 50.0), ("B", "s2", 3, 60.0)]
    df = spark.createDataFrame(rows, "g string, s string, e long, t double")
    out = {r["group"]: r
           for r in direct_standardization(df, "g", "s", "e", "t").collect()}
    assert out["A"]["strata_used"] == 1
    assert out["B"]["strata_used"] == 2
    # A's adjusted uses only s1: rate = 2/100 regardless of weights
    assert out["A"]["adj_rate"] == round(2 / 100.0, 6)


def test_cox_tv_single_episode_reduces_to_cox_newton(spark):
    """One episode (0, t] per subject IS the time-invariant model —
    the counting-process risk sets reproduce total-minus-prefix
    bit-exactly, so every emitted statistic matches cox_newton."""
    from clinpy_spark.operators.survival import cox_newton, cox_newton_tv

    g = _lcg(61)
    subj = [(next(g) % 60 + 1, next(g) % 2, next(g) % 2)
            for _ in range(400)]
    plain = cox_newton(
        spark.createDataFrame(subj, "t long, e int, x int"),
        "t", "e", "x").collect()[0]
    tv = cox_newton_tv(
        spark.createDataFrame([(0, t, e, x) for (t, e, x) in subj],
                              "a long, b long, e int, x int"),
        "a", "b", "e", "x").collect()[0]
    for k in ("beta", "hr", "se", "wald_chi2", "n_events"):
        assert plain[k] == tv[k], k
    assert tv["n_episodes"] == plain["n_subjects"]


def test_cox_tv_matches_naive_partial_likelihood(spark):
    """Treatment-switch episodes against a local Newton replay on the
    brute-force risk sets (start < t <= stop)."""
    from clinpy_spark.operators.survival import cox_newton_tv

    g = _lcg(67)
    eps = []
    for _ in range(120):
        dur = next(g) % 40 + 2
        evt = 1 if next(g) % 3 < 2 else 0
        sw = next(g) % 60
        if sw >= dur:
            eps.append((0, dur, evt, 0))
        else:
            if sw > 0:
                eps.append((0, sw, 0, 0))
            eps.append((sw, dur, evt, 1))
    r = cox_newton_tv(
        spark.createDataFrame(eps, "a long, b long, e int, x int"),
        "a", "b", "e", "x", iterations=6).collect()[0]

    from collections import Counter
    evt_at, evx_at = Counter(), Counter()
    for (a, b, e, x) in eps:
        if e:
            evt_at[b] += 1
            evx_at[b] += x
    beta = 0.0
    for _ in range(6):
        u = i = 0.0
        for t in sorted(evt_at):
            r1 = sum(1 for (a, b, e, x) in eps if a < t <= b and x == 1)
            r0 = sum(1 for (a, b, e, x) in eps if a < t <= b and x == 0)
            s1 = r1 * math.exp(beta)
            frac = s1 / (r0 + s1)
            u += evx_at[t] - evt_at[t] * frac
            i += evt_at[t] * frac * (1 - frac)
        beta += u / i
    assert r["beta"] == round(beta, 6)
    assert r["se"] == round(1 / math.sqrt(i), 6)
    assert r["n_episodes"] == len(eps)


def test_cox_tv_risk_set_boundaries(spark):
    """An arrival AT an event time is not yet at risk; a departure AT
    the event time still is; zero-length episodes are dropped."""
    from clinpy_spark.operators.survival import cox_newton_tv
    from clinpy_spark.operators.survival import _binary_event_grid_tv

    eps = [
        (0, 10, 1, 0),   # event at 10
        (10, 20, 0, 1),  # arrives AT 10 -> NOT at risk at t=10
        (5, 10, 0, 1),   # departs AT 10 -> at risk at t=10
        (3, 3, 1, 1),    # zero-length -> dropped entirely
    ]
    df = spark.createDataFrame(eps, "a long, b long, e int, x int")
    grid = {r["__t"]: r for r in
            _binary_event_grid_tv(df, "a", "b", "e", "x").collect()}
    assert set(grid) == {10.0}
    r10 = grid[10.0]
    assert r10["n"] == 2 and r10["n1"] == 1
    assert r10["d"] == 1 and r10["d1"] == 0
    out = cox_newton_tv(df, "a", "b", "e", "x").collect()[0]
    assert out["n_episodes"] == 3


def test_conditional_logit_11_discordant_replay(spark):
    """Closed-form conditional MLE on a hand-built matched set:
    beta = ln(n10/n01), se from the discordant counts, concordant
    pairs carry no information, contract-violating strata excluded."""
    from clinpy_spark.operators.assoc import conditional_logit_11

    rows = []
    # 12 pairs case-exposed only (n10), 4 control-exposed only (n01),
    # 9 concordant-exposed, 5 concordant-unexposed
    sid = 0
    for n, (xc, xk) in ((12, (1, 0)), (4, (0, 1)), (9, (1, 1)),
                        (5, (0, 0))):
        for _ in range(n):
            rows += [(sid, 1, xc), (sid, 0, xk)]
            sid += 1
    # violations: a 1:2 stratum and a two-case stratum
    rows += [(sid, 1, 1), (sid, 0, 0), (sid, 0, 1)]
    rows += [(sid + 1, 1, 1), (sid + 1, 1, 0)]
    df = spark.createDataFrame(rows, "s long, cs int, x int")
    r = conditional_logit_11(df, "s", "cs", "x").collect()[0]
    assert (r["n_strata"], r["n_used"]) == (32, 30)
    assert (r["n10"], r["n01"]) == (12, 4)
    assert r["beta"] == round(math.log(3), 6)
    assert r["or_hat"] == 3.0
    assert r["se"] == round(math.sqrt(1 / 12 + 1 / 4), 6)
    assert r["z"] == round(math.log(3) / math.sqrt(1 / 12 + 1 / 4), 6)
    assert r["mcnemar_chi2"] == round(64 / 16, 6)


def test_conditional_logit_11_zero_discordant_null(spark):
    from clinpy_spark.operators.assoc import conditional_logit_11

    rows = []
    for i in range(6):
        rows += [(i, 1, 1), (i, 0, 0)]  # all n10, no n01
    df = spark.createDataFrame(rows, "s long, cs int, x int")
    r = conditional_logit_11(df, "s", "cs", "x").collect()[0]
    assert r["n10"] == 6 and r["n01"] == 0
    assert r["beta"] is None and r["se"] is None and r["or_hat"] is None
    assert r["mcnemar_chi2"] == 6.0


def test_km_weighted_unit_weights_reduce_to_km_curve(spark):
    from clinpy_spark.operators.survival import km_curve, km_weighted

    g = _lcg(71)
    rows = [("a" if next(g) % 2 else "b", next(g) % 30 + 1, next(g) % 2)
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    plain = {(r["g"], r["t"]): r
             for r in km_curve(df, "t", "e", "g").collect()}
    wtd = {(r["g"], r["t"]): r
           for r in km_weighted(df.withColumn("w", F.lit(1.0)),
                                "t", "e", "g", "w").collect()}
    assert set(plain) == set(wtd)
    for k, p in plain.items():
        r = wtd[k]
        assert r["survival"] == p["survival"], k
        assert r["n_risk_w"] == float(p["n_risk"])
        assert r["events_w"] == float(p["n_events"])


def test_km_weighted_hand_example(spark):
    """3 subjects, weights 2/1/1: event at t=1 with w=2 drops the
    curve to 1 - 2/4 = 0.5; the censoring at 2 leaves it; the final
    event at 3 exhausts the weighted risk set -> 0."""
    from clinpy_spark.operators.survival import km_weighted

    df = spark.createDataFrame(
        [("g", 1, 1, 2.0), ("g", 2, 0, 1.0), ("g", 3, 1, 1.0)],
        "g string, t long, e int, w double")
    out = {r["t"]: r for r in
           km_weighted(df, "t", "e", "g", "w").collect()}
    assert out[1]["survival"] == 0.5
    assert out[2]["survival"] == 0.5
    assert out[3]["survival"] == 0.0
    assert out[1]["n_risk_w"] == 4.0 and out[3]["n_risk_w"] == 1.0
    # zero/negative/null weights drop the row entirely
    df2 = spark.createDataFrame(
        [("g", 1, 1, 2.0), ("g", 1, 1, 0.0), ("g", 2, 0, -1.0),
         ("g", 3, 1, None)],
        "g string, t long, e int, w double")
    out2 = km_weighted(df2, "t", "e", "g", "w").collect()
    assert len(out2) == 1 and out2[0]["n_risk_w"] == 2.0


def test_l_diversity_flags_homogeneous_class(spark):
    from clinpy_spark.operators.quality import l_diversity_report

    rows = (
        [("n1", "s1", "flu")] * 5          # k-anonymous but homogeneous
        + [("n1", "s2", "flu"), ("n1", "s2", "cold"),
           ("n1", "s2", "cough")]          # diverse
        + [("n2", "s1", "flu"), ("n2", "s1", "cold")]  # 2 distinct < 3
    )
    df = spark.createDataFrame(rows, "qa string, qb string, dx string")
    r = l_diversity_report(df, ["qa", "qb"], "dx", l=3).collect()[0]
    assert r["n_groups"] == 3
    assert r["n_violating_groups"] == 2
    assert r["n_rows_at_risk"] == 7
    assert r["min_distinct_sensitive"] == 1
    assert r["passed"] is False


def test_mcf_curve_naive_replay(spark):
    """Recurrent-event MCF against a brute-force replay: risk set =
    episodes with start < t <= stop, mcf = cumulative d/n, Poisson
    variance; per-episode event COUNTS (e > 1) are honored."""
    from clinpy_spark.operators.survival import mcf_curve

    g = _lcg(83)
    eps = []
    for _ in range(150):
        a = next(g) % 30
        b = a + next(g) % 20 + 1
        e = next(g) % 3  # 0, 1 or 2 events closing the episode
        eps.append((a, b, e))
    df = spark.createDataFrame(eps, "a long, b long, e int")
    got = {r["t"]: r for r in mcf_curve(df, "a", "b", "e").collect()}

    from collections import Counter
    d_at = Counter()
    for a, b, e in eps:
        if e:
            d_at[b] += e
    mcf = var = 0.0
    for t in sorted(d_at):
        n = sum(1 for a, b, e in eps if a < t <= b)
        d = d_at[t]
        assert n >= 1
        mcf += d / n
        var += d / n ** 2
        r = got[float(t)]
        assert (r["n_risk"], r["n_events"]) == (n, d)
        assert r["mcf"] == round(mcf, 6)
        assert r["se"] == round(var ** 0.5, 6)
    assert set(got) == {float(t) for t in d_at}


def test_mcf_curve_constant_rate_sanity(spark):
    """One subject observed (0, 10] with events at 2, 4, 6, 8, 10:
    n = 1 throughout, MCF steps by 1 per event."""
    from clinpy_spark.operators.survival import mcf_curve

    eps = [(0, 2, 1), (2, 4, 1), (4, 6, 1), (6, 8, 1), (8, 10, 1)]
    df = spark.createDataFrame(eps, "a long, b long, e int")
    rows = sorted(mcf_curve(df, "a", "b", "e").collect(),
                  key=lambda r: r["t"])
    assert [r["mcf"] for r in rows] == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert all(r["n_risk"] == 1 for r in rows)


def test_logrank_gehan_weight_replay(spark):
    """Gehan-Breslow = n(t)-weighted log-rank: replay the statistic
    from the per-time table; rho/gamma emit NULL under the gehan
    weighting; FH(0,0) still equals plain Mantel-Cox."""
    from clinpy_spark.operators.survival import (
        logrank_test, logrank_weighted)

    g = _lcg(89)
    rows = [("a" if next(g) % 2 else "b", next(g) % 25 + 1, next(g) % 2)
            for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    got = logrank_weighted(df, "t", "e", "g", "a", "b",
                           weight="gehan").collect()[0]
    assert got["rho"] is None and got["gamma"] is None

    from collections import Counter, defaultdict
    d_at = defaultdict(lambda: [0, 0])   # t -> [da, d]
    r_at = defaultdict(lambda: [0, 0])   # t -> [ra, r]
    for grp, t, e in rows:
        if e:
            d_at[t][1] += 1
            if grp == "a":
                d_at[t][0] += 1
        r_at[t][1] += 1
        if grp == "a":
            r_at[t][0] += 1
    na = sum(v[0] for v in r_at.values())
    n = sum(v[1] for v in r_at.values())
    u = v = 0.0
    for t in sorted(d_at):
        da, d = d_at[t]
        if d == 0:
            continue
        pa = na / n
        w = float(n)
        u += w * (da - d * pa)
        if n > 1:
            v += w * w * d * pa * (1 - pa) * (n - d) / (n - 1)
        na -= r_at[t][0]
        n -= r_at[t][1]
    # careful: risk sets must be BEFORE removal at t — recompute
    na_run, n_run = (sum(vv[0] for vv in r_at.values()),
                     sum(vv[1] for vv in r_at.values()))
    u = v = 0.0
    for t in sorted(r_at):
        da, d = d_at.get(t, [0, 0])
        if d > 0:
            pa = na_run / n_run
            w = float(n_run)
            u += w * (da - d * pa)
            if n_run > 1:
                v += w * w * d * pa * (1 - pa) * (n_run - d) / (n_run - 1)
        na_run -= r_at[t][0]
        n_run -= r_at[t][1]
    assert got["chi2"] == round(u * u / v, 6)
    # FH(0,0) is still plain Mantel-Cox after the weight param change
    plain = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    fh00 = logrank_weighted(df, "t", "e", "g", "a", "b",
                            rho=0.0, gamma=0.0).collect()[0]
    assert abs(fh00["chi2"] - plain["chi2"]) < 2e-6


def test_effect_measures_hand_2x2(spark):
    """Textbook 2x2 (a=30 b=70, c=15 d=85): every emitted measure
    matches the closed forms, including both E-values."""
    from clinpy_spark.operators.assoc import effect_measures

    rows = ([(1, 1)] * 30 + [(1, 0)] * 70 + [(0, 1)] * 15
            + [(0, 0)] * 85)
    df = spark.createDataFrame(rows, "ex int, ev int")
    r = effect_measures(df, "ex", "ev").collect()[0]
    p1, p0 = 0.3, 0.15
    rd = p1 - p0
    se_rd = math.sqrt(p1 * 0.7 / 100 + p0 * 0.85 / 100)
    rr = 2.0
    se_lrr = math.sqrt(1 / 30 - 1 / 100 + 1 / 15 - 1 / 100)
    assert (r["a"], r["b"], r["c"], r["d"]) == (30, 70, 15, 85)
    assert r["rd"] == round(rd, 6)
    assert r["rd_lo"] == round(rd - 1.96 * se_rd, 6)
    assert r["nnt"] == round(1 / rd, 6)
    assert r["rr"] == 2.0
    assert r["rr_lo"] == round(rr * math.exp(-1.96 * se_lrr), 6)
    assert r["or_hat"] == round(30 * 85 / (70 * 15), 6)
    assert r["e_value"] == round(2 + math.sqrt(2), 6)
    lo = rr * math.exp(-1.96 * se_lrr)
    want_ci = 1.0 if lo <= 1 else round(lo + math.sqrt(lo * (lo - 1)), 6)
    assert r["e_value_ci"] == want_ci


def test_effect_measures_protective_evalue(spark):
    """RR < 1 maps through 1/RR for the E-value; CI crossing 1 pins
    e_value_ci at exactly 1."""
    from clinpy_spark.operators.assoc import effect_measures

    rows = ([(1, 1)] * 10 + [(1, 0)] * 90 + [(0, 1)] * 20
            + [(0, 0)] * 80)
    df = spark.createDataFrame(rows, "ex int, ev int")
    r = effect_measures(df, "ex", "ev").collect()[0]
    rr = 0.5
    rstar = 2.0
    assert r["rr"] == 0.5
    assert r["e_value"] == round(rstar + math.sqrt(rstar), 6)
    # tiny cohort with wide CI crossing 1
    rows2 = ([(1, 1)] * 3 + [(1, 0)] * 7 + [(0, 1)] * 2 + [(0, 0)] * 8)
    r2 = effect_measures(
        spark.createDataFrame(rows2, "ex int, ev int"), "ex", "ev"
    ).collect()[0]
    assert r2["e_value_ci"] == 1.0


def test_aalen_excess_is_na_difference(spark):
    """The binary-covariate Aalen increment reduces to the difference
    of the two arms' Nelson-Aalen curves; variance is the sum of the
    two martingale variances."""
    from clinpy_spark.operators.survival import (
        aalen_excess_hazard, nelson_aalen)

    g = _lcg(97)
    rows = [("a" if next(g) % 2 else "b", next(g) % 20 + 1, next(g) % 2)
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    na = {(r["g"], r["t"]): r["cumhaz"]
          for r in nelson_aalen(df, "t", "e", "g").collect()}
    out = sorted(aalen_excess_hazard(df, "t", "e", "g", "a", "b")
                 .collect(), key=lambda r: r["t"])

    def last_na(arm, t):
        vals = [v for (gg, tt), v in na.items() if gg == arm and tt <= t]
        keys = [tt for (gg, tt) in na if gg == arm and tt <= t]
        return na[(arm, max(keys))] if keys else 0.0

    for r in out:
        want = last_na("a", r["t"]) - last_na("b", r["t"])
        assert abs(r["excess_cumhaz"] - want) < 2e-6, r["t"]
    # local variance replay
    from collections import defaultdict
    d_at = defaultdict(lambda: defaultdict(int))
    r_at = defaultdict(lambda: defaultdict(int))
    for gg, t, e in rows:
        if e:
            d_at[t][gg] += 1
        r_at[t][gg] += 1
    n = {"a": sum(1 for gg, _, _ in rows if gg == "a"),
         "b": sum(1 for gg, _, _ in rows if gg == "b")}
    v = 0.0
    got = {r["t"]: r for r in out}
    for t in sorted(r_at):
        for arm in ("a", "b"):
            d = d_at[t].get(arm, 0)
            if d:
                v += d / n[arm] ** 2
        if t in got:
            assert got[t]["se"] == round(v ** 0.5, 6)
        for arm in ("a", "b"):
            n[arm] -= r_at[t].get(arm, 0)


def test_poisson_rate_binary_x_equals_irr(spark):
    """With a binary covariate the offset-Poisson MLE is closed form:
    rate_ratio == incidence_rate's IRR and beta0 == ln(rate_0)."""
    from clinpy_spark.operators.assoc import poisson_rate_newton
    from clinpy_spark.operators.survival import incidence_rate

    g = _lcg(101)
    rows = [("a" if next(g) % 2 else "b", next(g) % 2,
             float(next(g) % 50 + 1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "g string, e int, pt double")
    fit = poisson_rate_newton(
        df.select((F.col("g") == "a").cast("double").alias("x"),
                  F.col("e").alias("y"), "pt"),
        "x", "y", "pt").collect()[0]
    irr = incidence_rate(
        df.withColumn("t", F.col("pt")), "t", "e", "g", "a", "b"
    ).collect()[0]
    assert fit["rate_ratio"] == irr["irr"]
    ev0 = sum(e for gg, e, _ in rows if gg == "b")
    pt0 = sum(p for gg, _, p in rows if gg == "b")
    assert fit["beta0"] == round(math.log(ev0 / pt0), 6)
    # Wald se1 for the binary design is sqrt(1/e1 + 1/e0)
    ev1 = sum(e for gg, e, _ in rows if gg == "a")
    assert fit["se1"] == round(math.sqrt(1 / ev1 + 1 / ev0), 6)


def test_poisson_rate_drops_nonpositive_followup(spark):
    from clinpy_spark.operators.assoc import poisson_rate_newton

    rows = [(1.0, 1, 10.0), (1.0, 0, 5.0), (0.0, 1, 8.0),
            (0.0, 0, 0.0), (1.0, 1, -2.0), (0.0, 1, None)]
    df = spark.createDataFrame(rows, "x double, y int, pt double")
    r = poisson_rate_newton(df, "x", "y", "pt").collect()[0]
    assert r["n"] == 3 and r["ptime_total"] == 23.0
