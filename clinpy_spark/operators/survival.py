"""Survival analysis over cohort event tables — the clinical readout a
clinpy-style project runs on top of its sample/assay store (reference
scope: clinical cohorts keyed by samplename, clinpy/assays/project.py;
this module adds the time-to-event statistics the reference leaves to
downstream R/pandas, re-expressed as exact relational plans).

- ``km_curve``: Kaplan-Meier product-limit estimator per group — the
  standard survival curve. S(t) = prod_{t_i <= t} (1 - d_i / n_i) with
  d_i = events at t_i and n_i = subjects still at risk.
- ``logrank_test``: two-group log-rank (Mantel-Cox) chi-square — the
  standard test that two survival curves differ.

Both are EXACT closed forms over one grouped aggregate plus ordered
windows, so a SQL oracle recomputes them bit-for-bit (product via
exp(sum(ln)) with the repo round-6 convention for transcendental-
touched doubles; the all-events-at-last-time ln(0) edge is handled by
an explicit zero flag, never by evaluating ln(0)).

Scale shape: the raw cohort is aggregated to one row per (group,
distinct event time) FIRST; every window after that runs over the
per-time aggregate (|distinct times| rows, not the cohort), partitioned
by group — at 100 TB the shuffle is one groupBy on (group, time) and
the window state is bounded by the time-grid size. No driver collect,
no join wider than the per-time table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Cap on per-event-time grid rows the Newton fitters may pull to the
# driver (r13 verdict #2): cells are design-bounded but DISTINCT EVENT
# TIMES come from the data, so past this cap the fitters keep the
# distributed per-step recurrence instead of collecting a data-sized
# grid. 100k rows of 4-8 numerics is ~a few MB — far under any
# maxResultSize — while every declared fixture's grid is ~1.5k rows.
_GRID_DRIVER_MAX = 100_000


def _per_time(df: DataFrame, time_col: str, event_col: str,
              group_col: str) -> DataFrame:
    """(group, t, d, c): events and censorings per distinct time, the
    bounded-size table every survival statistic is computed from."""
    return (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(time_col).alias("__t"),
            F.col(event_col).cast("int").alias("__e"),
        )
        .groupBy("__g", "__t")
        .agg(
            F.sum("__e").alias("d"),
            F.sum(1 - F.col("__e")).alias("c"),
        )
    )


def km_curve(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Kaplan-Meier curve per group: (group, t, n_risk, n_events,
    n_censored, survival), one row per (group, distinct observed time),
    ordered within group by time.

    ``survival`` is the product-limit estimate after all events at
    ``t`` (right-continuous step function), rounded to 6 decimals.
    When the last at-risk subjects all fail (d == n_risk) the factor is
    exactly 0; that row and everything after it reports survival 0.0
    via a cumulative flag instead of ln(0).
    """
    pt = _per_time(df, time_col, event_col, group_col)
    return km_from_per_time(pt, time_col, group_col)


def km_from_per_time(
    pt: DataFrame,
    time_col: str,
    group_col: str,
) -> DataFrame:
    """KM curve from an already-aggregated per-time table (__g, __t, d,
    c) — the entry point for incrementally-maintained cohorts: the
    streaming twin folds (d, c) partials per micro-batch and calls this
    on the folded table (streaming/survival.py)."""
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "n_risk",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    frac = F.col("d").cast("double") / F.col("n_risk")
    pt = (
        pt.withColumn(
            "__lsum",
            F.sum(
                F.when(F.col("d") < F.col("n_risk"), F.log(1 - frac))
                .otherwise(F.lit(0.0))
            ).over(w_cum),
        )
        .withColumn(
            "__zero",
            F.max(
                F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
            ).over(w_cum),
        )
    )
    return pt.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(time_col),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("__zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("__lsum"), 6))
        .alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-group log-rank (Mantel-Cox) test: 1 row (chi2, observed_a,
    expected_a, n_a, n_b). chi2 = (sum(d_a - e_a))^2 / sum(v) with, at
    each distinct pooled event time, e_a = d * n_a / n and hypergeometric
    variance v = d * (n_a/n) * (1 - n_a/n) * (n - d) / (n - 1)
    (v = 0 where n == 1). Censoring-only times contribute nothing
    (d = 0) and drop out exactly.
    """
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    pt = _per_time(sub, time_col, event_col, group_col)
    is_a = F.col("__g") == F.lit(group_a)
    per_t = pt.groupBy("__t").agg(
        F.sum(F.when(is_a, F.col("d")).otherwise(0)).alias("da"),
        F.sum(F.when(is_a, F.col("d") + F.col("c")).otherwise(0)).alias("ra"),
        F.sum("d").alias("d"),
        F.sum(F.col("d") + F.col("c")).alias("r"),
    )
    w_prev = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    tot_a = F.sum("ra").over(Window.partitionBy())
    tot = F.sum("r").over(Window.partitionBy())
    per_t = (
        per_t.withColumn(
            "na", tot_a - F.coalesce(F.sum("ra").over(w_prev), F.lit(0)))
        .withColumn("n", tot - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .filter(F.col("d") > 0)
    )
    pa = F.col("na").cast("double") / F.col("n")
    v = F.when(
        F.col("n") > 1,
        F.col("d") * pa * (1 - pa) * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    agg = per_t.agg(
        F.sum("da").alias("observed_a"),
        F.round(F.sum(F.col("d") * pa), 6).alias("expected_a"),
        F.sum(F.col("d") * pa).alias("__ea"),
        F.sum(v).alias("__v"),
    )
    oma = F.col("observed_a") - F.col("__ea")
    counts = (
        sub.groupBy()
        .agg(
            F.sum(F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0))
            .alias("n_a"),
            F.sum(F.when(F.col(group_col) == F.lit(group_b), 1).otherwise(0))
            .alias("n_b"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(counts))
        .select(
            # Zero total variance (degenerate cohort: one arm empty at
            # every event time, or no events with n > 1) leaves the
            # statistic undefined -> NULL, never a divide-by-zero
            # (hypothesis-found edge; ANSI mode raises otherwise).
            F.when(
                F.col("__v") > 0, F.round(oma * oma / F.col("__v"), 6)
            ).alias("chi2"),
            "observed_a",
            "expected_a",
            "n_a",
            "n_b",
        )
    )


def logrank_k(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """k-group log-rank test — one row PER GROUP: (group, n, observed,
    expected, var_marginal, chi2, df). Generalizes :func:`logrank_test`
    beyond two cohorts (real trials compare 3+ arms; the reference's
    cohort model is k-ary, clinpy/assays/project.py:60-66).

    At each pooled distinct event time t (d_t events among n_t at risk),
    group g expects e_g(t) = d_t * n_g(t) / n_t events. Per group we
    report O_g = sum d_g(t), E_g = sum e_g(t), and the marginal
    hypergeometric variance V_g = sum d_t * p_g * (1-p_g) * (n_t-d_t) /
    (n_t-1) with p_g = n_g/n_t. The replicated ``chi2`` column is the
    k-sample log-rank score statistic with the standard expected-count
    denominator, chi2 = sum_g (O_g-E_g)^2 / E_g on df = k-1 (Peto &
    Peto 1972 / Collett ch. 2 form — exactly relational, no matrix
    inverse). For k = 2 the EXACT Mantel-Cox statistic is recoverable
    from any row as (observed-expected)^2 / var_marginal (property-
    tested against :func:`logrank_test`).

    Scale shape: one groupBy to the per-(group, time) grid, pooled
    per-time totals from it, then the per-group at-risk counts n_g(t)
    at pooled event times via a UNION + one ordered window per group —
    no grid x cohort cartesian against a data-sized table (the group
    list rides a 1-row collect_set broadcast, then explodes), no
    driver collect. State per window task is bounded by |distinct
    times|.
    """
    pt = _per_time(df, time_col, event_col, group_col).withColumn(
        "r", F.col("d") + F.col("c"))

    # pooled at-risk / event totals per distinct time; keep event times
    w_prev_all = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1)
    pooled = (
        pt.groupBy("__t")
        .agg(F.sum("d").alias("dt"), F.sum("r").alias("rt"))
        .withColumn(
            "nt",
            F.sum("rt").over(Window.partitionBy())
            - F.coalesce(F.sum("rt").over(w_prev_all), F.lit(0)),
        )
        .filter(F.col("dt") > 0)
        .select("__t", "dt", "nt")
    )

    # event-time x group grid WITHOUT a data-sized cartesian: the group
    # list is a 1-row collect_set (constant-row broadcast), exploded.
    groups = pt.groupBy().agg(F.collect_set("__g").alias("gs"))
    grid = (
        pooled.crossJoin(F.broadcast(groups))
        .select("__t", "dt", "nt", F.explode("gs").alias("__g"))
    )

    # n_g at each pooled event time: union the group's own (time, r)
    # increments with the grid probes and take the exclusive running
    # sum — grid rows (is_real=0) sort BEFORE real rows at equal time,
    # so subjects failing/censored AT t still count as at risk at t.
    null_l = F.lit(None).cast("long")
    u = (
        pt.select(
            "__g", "__t", "r",
            F.lit(1).alias("is_real"),
            null_l.alias("dt"), null_l.alias("nt"),
        )
        .unionByName(
            grid.select(
                "__g", "__t",
                F.lit(0).cast("long").alias("r"),
                F.lit(0).alias("is_real"), "dt", "nt",
            )
        )
    )
    w_g_prev = (
        Window.partitionBy("__g")
        .orderBy("__t", "is_real")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    probes = (
        u.withColumn("ngt", F.sum("r").over(Window.partitionBy("__g")))
        .withColumn(
            "consumed",
            F.coalesce(F.sum("r").over(w_g_prev), F.lit(0)),
        )
        .filter(F.col("is_real") == 0)
        .withColumn("ng", F.col("ngt") - F.col("consumed"))
    )

    pg = F.col("ng").cast("double") / F.col("nt")
    v_t = F.when(
        F.col("nt") > 1,
        F.col("dt") * pg * (1 - pg) * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1),
    ).otherwise(F.lit(0.0))
    per_g = probes.groupBy("__g").agg(
        F.sum(F.col("dt") * pg).alias("__e"),
        F.sum(v_t).alias("__v"),
    )
    obs = pt.groupBy("__g").agg(
        F.sum("d").alias("observed"), F.sum("r").alias("n"))
    j = per_g.join(obs, "__g")

    w_all = Window.partitionBy()
    # groups never at risk at any event time contribute E = 0 (and
    # necessarily O = 0): skip their 0/0 term (ANSI mode would raise).
    term = F.when(
        F.col("__e") > 0,
        (F.col("observed") - F.col("__e"))
        * (F.col("observed") - F.col("__e")) / F.col("__e"),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("__g").alias(group_col),
        "n",
        "observed",
        F.round("__e", 6).alias("expected"),
        F.round("__v", 6).alias("var_marginal"),
        F.round(F.sum(term).over(w_all), 6).alias("chi2"),
        (F.count(F.lit(1)).over(w_all) - 1).cast("int").alias("df"),
    )


def nelson_aalen(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group: (group, t,
    n_risk, n_events, cumhaz), one row per (group, distinct observed
    time). H(t) = sum_{t_i <= t} d_i / n_i — the additive twin of the
    Kaplan-Meier product (KM ~ exp(-H) for small increments), preferred
    when hazards are the modeling target.

    Same bounded shape as :func:`km_curve` (one groupBy to the
    per-time grid, ordered windows over it); the cumulative sum runs in
    ascending time order in every engine, so the double accumulation
    order is fixed and the estimate is oracle-reproducible (rounded to
    6 by the repo convention).
    """
    pt = _per_time(df, time_col, event_col, group_col)
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "n_risk",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    return pt.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(time_col),
        "n_risk",
        F.col("d").alias("n_events"),
        F.round(
            F.sum(F.col("d").cast("double") / F.col("n_risk")).over(w_cum), 6
        ).alias("cumhaz"),
    )


def km_greenwood(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Kaplan-Meier curve with Greenwood standard errors and plain
    normal confidence bands: (group, t, n_risk, n_events, survival,
    se, ci_lo, ci_hi). Var(S(t)) = S(t)^2 * sum_{t_i <= t}
    d_i / (n_i * (n_i - d_i)); bands are clamped to [0, 1]. Rows at or
    after an all-events time report survival 0 with zero-width bands
    (the d == n term is excluded exactly like km_curve's ln(0) edge).

    Same bounded per-time-grid shape as :func:`km_curve`; se/ci are one
    extra cumulative window over the same grid.
    """
    pt = _per_time(df, time_col, event_col, group_col)
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "n_risk",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    frac = F.col("d").cast("double") / F.col("n_risk")
    live = F.col("d") < F.col("n_risk")
    pt = (
        pt.withColumn(
            "__lsum",
            F.sum(F.when(live, F.log(1 - frac)).otherwise(F.lit(0.0)))
            .over(w_cum),
        )
        .withColumn(
            "__gsum",
            F.sum(
                F.when(
                    live,
                    F.col("d").cast("double")
                    / (F.col("n_risk") * (F.col("n_risk") - F.col("d"))),
                ).otherwise(F.lit(0.0))
            ).over(w_cum),
        )
        .withColumn(
            "__zero",
            F.max(F.when(~live, 1).otherwise(0)).over(w_cum),
        )
    )
    s = F.exp("__lsum")
    se = F.sqrt(s * s * F.col("__gsum"))
    zero = F.col("__zero") == 1
    return pt.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(time_col),
        "n_risk",
        F.col("d").alias("n_events"),
        F.when(zero, F.lit(0.0)).otherwise(F.round(s, 6)).alias("survival"),
        F.when(zero, F.lit(0.0)).otherwise(F.round(se, 6)).alias("se"),
        F.when(zero, F.lit(0.0))
        .otherwise(F.round(F.greatest(s - z * se, F.lit(0.0)), 6))
        .alias("ci_lo"),
        F.when(zero, F.lit(0.0))
        .otherwise(F.round(F.least(s + z * se, F.lit(1.0)), 6))
        .alias("ci_hi"),
    )


def rmst(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    tau: int,
) -> DataFrame:
    """Restricted mean survival time per group: (group, n_subjects,
    rmst) — the area under the Kaplan-Meier curve on [0, tau], the
    standard trial endpoint when proportional hazards fail. Computed
    from the KM step function: the [0, first-time) segment at S = 1
    plus one lead-window segment per curve step, every segment clipped
    to tau; rounded to 6.

    Same bounded per-time-grid shape as :func:`km_curve` — one lead
    window and one grouped sum over the grid.
    """
    km = km_curve(df, time_col, event_col, group_col)
    w = Window.partitionBy(group_col).orderBy(time_col)
    t = F.col(time_col).cast("double")
    nxt = F.coalesce(
        F.lead(time_col).over(w).cast("double"), F.lit(float(tau)))
    seg = F.col("survival") * F.greatest(
        F.least(nxt, F.lit(float(tau))) - F.least(t, F.lit(float(tau))),
        F.lit(0.0),
    )
    first = F.least(F.min(t).over(Window.partitionBy(group_col)),
                    F.lit(float(tau)))
    return (
        km.withColumn("__seg", seg)
        .withColumn("__first", first)
        .groupBy(group_col)
        .agg(
            F.max("n_risk").alias("n_subjects"),
            F.round(F.max("__first") + F.sum("__seg"), 6).alias("rmst"),
        )
    )


def logrank_stratified(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    stratum_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Stratified two-group log-rank test: 1 row (chi2, observed_a,
    expected_a, n_a, n_b, n_strata). The standard confounder-adjusted
    comparison (center / age band / line-of-therapy strata): the
    hypergeometric O-E and variance are computed WITHIN each stratum's
    own risk sets and summed across strata before the single
    chi-square, so a stratum-level imbalance between the arms cannot
    masquerade as a survival difference. With one stratum this reduces
    exactly to :func:`logrank_test` (property-tested).

    Scale shape: identical to logrank_test with every window
    additionally partitioned by stratum — one groupBy to the
    per-(stratum, time) grid, ordered windows over it, one global
    aggregate. Window state is bounded by a stratum's distinct times.
    """
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    base = sub.select(
        F.col(stratum_col).alias("__s"),
        F.col(time_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
        (F.col(group_col) == F.lit(group_a)).alias("__a"),
    )
    per_t = base.groupBy("__s", "__t").agg(
        F.sum(F.when(F.col("__a"), F.col("__e")).otherwise(0)).alias("da"),
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("ra"),
        F.sum("__e").alias("d"),
        F.count(F.lit(1)).alias("r"),
    )
    w_prev = (Window.partitionBy("__s").orderBy("__t")
              .rowsBetween(Window.unboundedPreceding, -1))
    tot = Window.partitionBy("__s")
    per_t = (
        per_t.withColumn(
            "na",
            F.sum("ra").over(tot)
            - F.coalesce(F.sum("ra").over(w_prev), F.lit(0)))
        .withColumn(
            "n",
            F.sum("r").over(tot)
            - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .filter(F.col("d") > 0)
    )
    pa = F.col("na").cast("double") / F.col("n")
    v = F.when(
        F.col("n") > 1,
        F.col("d") * pa * (1 - pa) * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    agg = per_t.agg(
        F.sum("da").alias("observed_a"),
        F.round(F.sum(F.col("d") * pa), 6).alias("expected_a"),
        F.sum(F.col("d") * pa).alias("__ea"),
        F.sum(v).alias("__v"),
        F.countDistinct("__s").alias("n_strata"),
    )
    oma = F.col("observed_a") - F.col("__ea")
    counts = sub.groupBy().agg(
        F.sum(F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0))
        .alias("n_a"),
        F.sum(F.when(F.col(group_col) == F.lit(group_b), 1).otherwise(0))
        .alias("n_b"),
    )
    return agg.crossJoin(F.broadcast(counts)).select(
        F.when(F.col("__v") > 0, F.round(oma * oma / F.col("__v"), 6))
        .alias("chi2"),
        "observed_a", "expected_a", "n_a", "n_b", "n_strata",
    )


def cuminc(
    df: DataFrame,
    time_col: str,
    status_col: str,
    group_col: str,
    causes: list,
) -> DataFrame:
    """Aalen-Johansen cumulative incidence under competing risks:
    (group, t, n_risk, cause, d, cif), one row per (group, distinct
    observed time, listed cause). ``status_col`` follows the cmprsk
    convention — 0 = censored, anything else = an event of that cause;
    ``causes`` lists the cause codes to report (explicit so the plan
    and the oracle enumerate the same set).

    CIF_k(t) = sum_{t_i <= t} S(t_i-) * d_k(t_i) / n(t_i) with S the
    ALL-cause Kaplan-Meier — the quantity 1 - KM_k overstates when
    competing events remove subjects from risk (the classic
    competing-risks bias; sum_k CIF_k + S = 1 at every time,
    property-tested). S(t-) uses the exp-sum-ln prefix with the
    explicit zero flag, never ln(0) (same convention as km_curve).

    Scale shape: one groupBy to the per-(group, time) grid with one
    conditional event counter per listed cause, ordered windows over
    the bounded grid, one union branch per cause for the long output.
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(time_col).alias("__t"),
        F.col(status_col).alias("__st"),
    )
    aggs = [
        F.sum(F.when(F.col("__st") == F.lit(k), 1).otherwise(0))
        .alias(f"__d{i}")
        for i, k in enumerate(causes)
    ]
    pt = base.groupBy("__g", "__t").agg(
        *aggs,
        F.sum(F.when(F.col("__st") != 0, 1).otherwise(0)).alias("__dall"),
        F.count(F.lit(1)).alias("__r"),
    )
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "n_risk",
        F.sum("__r").over(tot)
        - F.coalesce(F.sum("__r").over(w_prev), F.lit(0)),
    )
    frac = F.col("__dall").cast("double") / F.col("n_risk")
    pt = (
        pt.withColumn(
            "__lprev",
            F.coalesce(
                F.sum(
                    F.when(F.col("__dall") < F.col("n_risk"),
                           F.log(1 - frac)).otherwise(F.lit(0.0))
                ).over(w_prev),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "__zprev",
            F.coalesce(
                F.max(
                    F.when(F.col("__dall") >= F.col("n_risk"), 1)
                    .otherwise(0)
                ).over(w_prev),
                F.lit(0),
            ),
        )
    )
    s_prev = F.when(F.col("__zprev") == 1, F.lit(0.0)).otherwise(
        F.exp("__lprev"))
    for i, _k in enumerate(causes):
        pt = pt.withColumn(
            f"__cif{i}",
            F.sum(
                s_prev * F.col(f"__d{i}").cast("double") / F.col("n_risk")
            ).over(w_cum),
        )
    parts = []
    for i, k in enumerate(causes):
        parts.append(pt.select(
            F.col("__g").alias(group_col),
            F.col("__t").alias(time_col),
            "n_risk",
            F.lit(k).alias("cause"),
            F.col(f"__d{i}").alias("d"),
            F.round(f"__cif{i}", 6).alias("cif"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cox_score(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
) -> DataFrame:
    """Cox proportional-hazards SCORE test at beta = 0 for one numeric
    covariate (Breslow ties): 1 row (chi2, u, n_events, n_subjects).
    The bridge between the log-rank family (categorical arms) and full
    Cox regression: does hazard rise with ``x_col`` (age, biomarker,
    dose)? For a 0/1 indicator covariate this IS the two-group
    log-rank statistic (property-tested).

    At each distinct event time t with risk-set moments S_x, S_xx over
    the n at risk and d events carrying covariate sum dx:
    U += dx - d * S_x/n; V += d * (n-d)/(n-1) * (S_xx/n - (S_x/n)^2);
    chi2 = U^2 / V on 1 df (NULL when V = 0 — constant covariate or no
    usable event times; never a divide-by-zero under ANSI mode).

    Scale shape: one groupBy to the per-time grid carrying the
    LEAVERS' covariate moments, then risk-set moments as total-minus-
    prefix ordered windows over the bounded grid — the cohort is never
    self-joined against the risk sets.
    """
    base = df.select(
        F.col(time_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
        F.col(x_col).cast("double").alias("__x"),
    )
    pt = base.groupBy("__t").agg(
        F.sum("__e").alias("d"),
        F.count(F.lit(1)).alias("r"),
        F.sum(F.when(F.col("__e") == 1, F.col("__x")).otherwise(0.0))
        .alias("dx"),
        F.sum("__x").alias("rx"),
        F.sum(F.col("__x") * F.col("__x")).alias("rxx"),
    )
    w_prev = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    pt = (
        pt.withColumn(
            "n", F.sum("r").over(tot)
            - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .withColumn(
            "sx", F.sum("rx").over(tot)
            - F.coalesce(F.sum("rx").over(w_prev), F.lit(0.0)))
        .withColumn(
            "sxx", F.sum("rxx").over(tot)
            - F.coalesce(F.sum("rxx").over(w_prev), F.lit(0.0)))
        .filter(F.col("d") > 0)
    )
    xbar = F.col("sx") / F.col("n")
    vbar = F.col("sxx") / F.col("n") - xbar * xbar
    u_t = F.col("dx") - F.col("d") * xbar
    v_t = F.when(
        F.col("n") > 1,
        F.col("d") * (F.col("n") - F.col("d")).cast("double")
        / (F.col("n") - 1) * vbar,
    ).otherwise(F.lit(0.0))
    agg = pt.agg(
        F.sum(u_t).alias("__u"),
        F.sum(v_t).alias("__v"),
        F.sum("d").alias("n_events"),
    )
    counts = df.groupBy().agg(F.count(F.lit(1)).alias("n_subjects"))
    return agg.crossJoin(F.broadcast(counts)).select(
        F.when(
            F.col("__v") > 0,
            F.round(F.col("__u") * F.col("__u") / F.col("__v"), 6),
        ).alias("chi2"),
        F.round("__u", 6).alias("u"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "n_subjects",
    )


def incidence_rate(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    z: float = 1.96,
) -> DataFrame:
    """Person-time incidence rates and their ratio between two cohorts:
    1 row (events_a, ptime_a, rate_a, events_b, ptime_b, rate_b, irr,
    irr_lo, irr_hi) — the epidemiology rate readout (events per unit
    follow-up) complementing the log-rank family (which compares curve
    SHAPES, not absolute rates).

    rate = events / person-time; the IRR confidence interval is the
    standard log-normal form exp(ln(irr) ± z*sqrt(1/e_a + 1/e_b))
    (Rothman), defined only when both arms have events and follow-up —
    NULL otherwise, never a 0-division. Rates and CI are rounded to 6
    (ln/sqrt convention).

    Scale shape: ONE conditional-sum aggregate over the cohort — no
    grid, no window, no join.
    """
    t = F.col(time_col).cast("double")
    e = F.col(event_col).cast("int")
    is_a = F.col(group_col) == F.lit(group_a)
    is_b = F.col(group_col) == F.lit(group_b)
    agg = df.filter(is_a | is_b).agg(
        F.sum(F.when(is_a, e).otherwise(0)).alias("events_a"),
        F.sum(F.when(is_a, t).otherwise(0.0)).alias("ptime_a"),
        F.sum(F.when(is_b, e).otherwise(0)).alias("events_b"),
        F.sum(F.when(is_b, t).otherwise(0.0)).alias("ptime_b"),
    )
    ra = F.col("events_a") / F.col("ptime_a")
    rb = F.col("events_b") / F.col("ptime_b")
    ok = (
        (F.col("events_a") > 0) & (F.col("events_b") > 0)
        & (F.col("ptime_a") > 0) & (F.col("ptime_b") > 0)
    )
    se = F.sqrt(1.0 / F.col("events_a") + 1.0 / F.col("events_b"))
    lirr = F.log(ra / rb)
    return agg.select(
        "events_a",
        F.round("ptime_a", 6).alias("ptime_a"),
        F.when(F.col("ptime_a") > 0, F.round(ra, 6)).alias("rate_a"),
        "events_b",
        F.round("ptime_b", 6).alias("ptime_b"),
        F.when(F.col("ptime_b") > 0, F.round(rb, 6)).alias("rate_b"),
        F.when(ok, F.round(ra / rb, 6)).alias("irr"),
        F.when(ok, F.round(F.exp(lirr - z * se), 6)).alias("irr_lo"),
        F.when(ok, F.round(F.exp(lirr + z * se), 6)).alias("irr_hi"),
    )


def logrank_weighted(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    rho: float = 1.0,
    gamma: float = 0.0,
    weight: str = "fh",
) -> DataFrame:
    """Fleming-Harrington G(rho, gamma) weighted log-rank test: 1 row
    (chi2, rho, gamma, observed_a, expected_a, n_a, n_b). Each pooled
    event time is weighted by w(t) = S(t-)^rho * (1 - S(t-))^gamma with
    S the pooled-cohort Kaplan-Meier LEFT limit: (1, 0) emphasizes
    early differences (Peto-Peto flavor), (0, 1) late differences (the
    delayed-effect immunotherapy setting), (0, 0) is exactly the plain
    Mantel-Cox test (property-tested).

    chi2 = (sum w (d_a - e_a))^2 / sum w^2 v over the same
    hypergeometric grid as :func:`logrank_test`; S(t-) uses the
    exp-sum-ln prefix with the explicit zero flag (km_curve
    convention), so the whole statistic stays oracle-reproducible.

    Scale shape: identical to logrank_test plus two more ordered
    windows over the bounded per-time grid.
    """
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    pt = _per_time(sub, time_col, event_col, group_col)
    is_a = F.col("__g") == F.lit(group_a)
    per_t = pt.groupBy("__t").agg(
        F.sum(F.when(is_a, F.col("d")).otherwise(0)).alias("da"),
        F.sum(F.when(is_a, F.col("d") + F.col("c")).otherwise(0)).alias("ra"),
        F.sum("d").alias("d"),
        F.sum(F.col("d") + F.col("c")).alias("r"),
    )
    w_prev = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    tot_a = F.sum("ra").over(Window.partitionBy())
    tot = F.sum("r").over(Window.partitionBy())
    per_t = (
        per_t.withColumn(
            "na", tot_a - F.coalesce(F.sum("ra").over(w_prev), F.lit(0)))
        .withColumn("n", tot - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
    )
    # pooled KM left limit S(t-): prefix over times STRICTLY before t
    frac = F.col("d").cast("double") / F.col("n")
    per_t = (
        per_t.withColumn(
            "__lprev",
            F.coalesce(
                F.sum(
                    F.when(F.col("d") < F.col("n"), F.log(1 - frac))
                    .otherwise(F.lit(0.0))
                ).over(w_prev),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "__zprev",
            F.coalesce(
                F.max(
                    F.when(F.col("d") >= F.col("n"), 1).otherwise(0)
                ).over(w_prev),
                F.lit(0),
            ),
        )
        .filter(F.col("d") > 0)
    )
    s_prev = F.when(F.col("__zprev") == 1, F.lit(0.0)).otherwise(
        F.exp("__lprev"))
    if weight == "gehan":
        # Gehan-Breslow generalized Wilcoxon: w(t) = pooled at-risk
        # count n(t) — emphasizes early differences with an
        # integer-exact weight (no KM prefix in the statistic's
        # numerator), the censored generalization of the rank-sum
        # test. NOT in the Fleming-Harrington family.
        w = F.col("n").cast("double")
    else:
        w = F.pow(s_prev, F.lit(float(rho))) * F.pow(1 - s_prev,
                                                     F.lit(float(gamma)))
    pa = F.col("na").cast("double") / F.col("n")
    v = F.when(
        F.col("n") > 1,
        F.col("d") * pa * (1 - pa) * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(F.lit(0.0))
    agg = per_t.agg(
        F.sum("da").alias("observed_a"),
        F.round(F.sum(F.col("d") * pa), 6).alias("expected_a"),
        F.sum(w * (F.col("da") - F.col("d") * pa)).alias("__u"),
        F.sum(w * w * v).alias("__v"),
    )
    counts = sub.groupBy().agg(
        F.sum(F.when(F.col(group_col) == F.lit(group_a), 1).otherwise(0))
        .alias("n_a"),
        F.sum(F.when(F.col(group_col) == F.lit(group_b), 1).otherwise(0))
        .alias("n_b"),
    )
    return agg.crossJoin(F.broadcast(counts)).select(
        F.when(
            F.col("__v") > 0,
            F.round(F.col("__u") * F.col("__u") / F.col("__v"), 6),
        ).alias("chi2"),
        (F.lit(None).cast("double") if weight == "gehan"
         else F.lit(float(rho))).alias("rho"),
        (F.lit(None).cast("double") if weight == "gehan"
         else F.lit(float(gamma))).alias("gamma"),
        "observed_a", "expected_a", "n_a", "n_b",
    )


def _binary_event_grid(
    df: DataFrame, time_col: str, event_col: str, x_col: str
) -> DataFrame:
    """Per-event-time grid (__t, d, d1, n, n1) for a binary covariate:
    total/arm-1 events and at-risk counts, risk sets as total-minus-
    prefix windows, lineage cut once (the grid feeds every Newton
    step — without the cut the cohort groupBy+window replays per
    step)."""
    base = df.select(
        F.col(time_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
        F.col(x_col).cast("int").alias("__x"),
    )
    pt = base.groupBy("__t").agg(
        F.sum("__e").alias("d"),
        F.sum(F.col("__e") * F.col("__x")).alias("d1"),
        F.count(F.lit(1)).alias("r"),
        F.sum("__x").alias("r1"),
    )
    w_prev = Window.orderBy("__t").rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy()
    return (
        pt.withColumn(
            "n", F.sum("r").over(tot)
            - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .withColumn(
            "n1", F.sum("r1").over(tot)
            - F.coalesce(F.sum("r1").over(w_prev), F.lit(0)))
        .filter(F.col("d") > 0)
        .select("__t", "d", "d1", "n", "n1")
        .localCheckpoint(eager=False)
    )


def _newton_beta(spark, grid: DataFrame, iterations: int) -> DataFrame:
    """``iterations`` Newton-Raphson steps on the Breslow partial
    likelihood over a binary-covariate grid: 1-row (beta) DataFrame,
    NULL on zero information at any step.

    The steps iterate in the DRIVER over the collected grid (the
    batch-4/5 factoring of the GLM family): the grid is BOUNDED by the
    statistical design (per-event-time cells — the distributed work is
    building it, which stays in Spark), while the previous chained
    crossJoin(broadcast(beta)) recurrence paid one broadcast-exchange
    job plus one grid aggregate per step — ~0.8s of pure scheduling per
    fit at sf0.1 across the five cox/finegray callers. Arithmetic is
    replicated per-row in collect order with the same expression
    shapes (s1 = n1*e^b; s0 = (n-n1)+s1; u += d1 - d*frac;
    i += d*frac*(1-frac)), so the float stream matches the previous
    single-partition aggregate's operand order; emission stays behind
    the callers' round-6 as before.

    The driver loop only engages when the grid is provably bounded
    (r13 verdict #2): distinct event times come from the data, so past
    ``_GRID_DRIVER_MAX`` rows the steps fall back to the pre-r13
    distributed recurrence (one grid aggregate + broadcast crossJoin
    per step) and nothing data-sized reaches the driver."""
    import math

    rows = grid.select("n", "n1", "d", "d1").take(_GRID_DRIVER_MAX + 1)
    if len(rows) > _GRID_DRIVER_MAX:
        beta_df = spark.range(1).select(F.lit(0.0).alias("beta"))
        for _ in range(iterations):
            j = grid.crossJoin(F.broadcast(beta_df))
            s1c = F.col("n1") * F.exp(F.col("beta"))
            s0c = (F.col("n") - F.col("n1")) + s1c
            fracc = s1c / s0c
            u_t = F.col("d1") - F.col("d") * fracc
            i_t = F.col("d") * fracc * (1 - fracc)
            # agg (not groupBy) so an event-free cohort still yields
            # the 1-row NULL result instead of vanishing
            stp = j.agg(
                F.max("beta").alias("beta"),
                F.sum(u_t).alias("__u"), F.sum(i_t).alias("__i"))
            beta_df = stp.select(
                F.when(
                    F.col("__i") > 0,
                    F.col("beta") + F.col("__u") / F.col("__i"),
                ).alias("beta")
            )
        return beta_df
    beta: float | None = 0.0
    for _ in range(iterations):
        if beta is None:
            break
        u = 0.0
        i = 0.0
        try:
            eb = math.exp(beta)
        except OverflowError:
            # mirror the distributed plan's F.exp: inf -> nan moments
            # -> NULL beta, never a driver crash (divergent step on a
            # separated / rare-exposure cohort)
            eb = math.inf
        for r in rows:
            s1 = r[1] * eb
            frac = s1 / ((r[0] - r[1]) + s1)
            u += r[3] - r[2] * frac
            i += r[2] * frac * (1 - frac)
        # empty grid: the old agg yielded NULL sums -> NULL beta
        beta = beta + u / i if (rows and i > 0) else None
    return spark.range(1).select(
        F.lit(beta).cast("double").alias("beta"))


def cox_newton(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Cox proportional-hazards MLE for one BINARY (0/1) covariate by
    ``iterations`` unrolled Newton-Raphson steps on the Breslow partial
    likelihood: 1 row (beta, hr, se, wald_chi2, n_events, n_subjects).
    Completes the inference ladder the score test (``cox_score``)
    starts: not just "does hazard differ" but the effect SIZE — the
    log hazard ratio with its Wald interval ingredients.

    With x in {0,1} the risk-set exponential moments collapse to the
    bounded per-event-time grid the log-rank family already uses:
    S0(t) = (n - n1) + n1*e^b, S1(t) = n1*e^b, so each Newton step is
    U(b)  = sum_t [d1 - d * S1/S0]
    I(b)  = sum_t [d * (S1/S0) * (1 - S1/S0)]
    b    <- b + U/I      (b0 = 0; the one-step estimate from zero is
                          the classic score-based approximation, and 3
                          steps converge to ~1e-9 for any separable-
                          free dataset).
    se = 1/sqrt(I(b_hat)), wald_chi2 = b_hat^2 * I(b_hat). NULL beta
    when any step's information is 0 (empty/constant-covariate cohort
    or complete separation — never a 0-division under ANSI mode).

    The recurrence is a closed deterministic function of the grid, so
    a SQL oracle replays the same ``iterations`` steps as chained CTEs
    with scalar subqueries (round-6 on the exp/ln-touched outputs).

    Scale shape: ONE groupBy to the per-event-time grid (carrying
    leavers' counts), risk sets as total-minus-prefix windows over the
    bounded grid, then each Newton step is a grid-sized aggregate plus
    a 1-row broadcast crossJoin carrying the scalar beta — the cohort
    is scanned once, never self-joined, and the iteration loop moves
    grid-sized data only.
    """
    grid = _binary_event_grid(df, time_col, event_col, x_col)
    beta = _newton_beta(df.sparkSession, grid, iterations)
    fin = grid.crossJoin(F.broadcast(beta))
    s1 = F.col("n1") * F.exp(F.col("beta"))
    s0 = (F.col("n") - F.col("n1")) + s1
    frac = s1 / s0
    i_t = F.col("d") * frac * (1 - frac)
    stats = fin.agg(
        F.max("beta").alias("beta"),
        F.sum(i_t).alias("__i"), F.sum("d").alias("n_events"))
    counts = df.groupBy().agg(F.count(F.lit(1)).alias("n_subjects"))
    ok = F.col("beta").isNotNull() & (F.col("__i") > 0)
    return stats.crossJoin(F.broadcast(counts)).select(
        F.when(ok, F.round("beta", 6)).alias("beta"),
        F.when(ok, F.round(F.exp("beta"), 6)).alias("hr"),
        F.when(ok, F.round(1 / F.sqrt("__i"), 6)).alias("se"),
        F.when(ok, F.round(F.col("beta") * F.col("beta") * F.col("__i"), 6))
        .alias("wald_chi2"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "n_subjects",
    )


def cox_newton_multi(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_cols: list[str],
    iterations: int = 4,
    digits: int | None = 5,
) -> DataFrame:
    """Cox proportional-hazards MLE for d BOUNDED-cardinality
    covariates (1 <= d <= 8) by ``iterations`` Newton-Raphson steps on
    the Breslow partial likelihood — the multi-covariate rung above
    :func:`cox_newton` (r11 verdict #4): the hazard ratio for the
    treatment arm ADJUSTED for age band / sex / stage simultaneously.
    1 row (beta1..betad, hr1..hrd, se1..sed, wald_chi2_1..d, n_events,
    n_subjects, score_norm).

    Scale shape: subjects collapse to the per-(event-time, covariate-
    cell) grid — cells are the joint covariate values (bounded by
    contract, e.g. 2^d for d binaries), and per-cell at-risk counts
    come from one cumulative-leavers window per cell over the bounded
    (times x cells) frame, the d-dimensional generalization of
    ``_binary_event_grid``'s total-minus-prefix trick. Every risk-set
    exponential moment is then a grid row sum:
        S0(t)    = sum_c n_c(t) e^{x_c . b}
        S1_a(t)  = sum_c n_c(t) x_ca e^{x_c . b}
        S2_ab(t) = sum_c n_c(t) x_ca x_cb e^{x_c . b}
        U_a   = sum_t [da(t) - d(t) S1_a/S0]
        I_ab  = sum_t d(t) [S2_ab/S0 - (S1_a/S0)(S1_b/S0)]
    so each Newton step is ONE grid-sized aggregate collected as a
    single bounded row (d + d(d+1)/2 doubles) and a driver-side dxd
    solve — the same distributed-moments/local-solve factoring as
    ``logistic_newton_multi``; the cohort itself is scanned once,
    never per-iteration. NULL on singular information (collinear/
    constant covariates, no events). ``score_norm`` is the final ||U||.
    For d <= 3 the driver solve is EXPLICIT Cramer arithmetic in the
    oracle's own operand order (functions/cramer.py) and all statistics
    emit at round-5 — the hash-determinism contract of the multi-
    covariate family (r12 verdict #1: LAPACK-vs-Cramer drift plus
    partition-order double sums flipped a round-6 digit); the
    ``surv_cox_multi`` (d=2) and ``surv_cox_multi3`` (d=3) oracles
    replay the identical recurrence as chained Cramer CTEs.
    """
    import numpy as np

    d = len(x_cols)
    if not 1 <= d <= 8:
        raise ValueError(f"cox_newton_multi supports 1..8 covariates, got {d}")
    xs = [f"__x{i}" for i in range(1, d + 1)]
    keep = (F.col(time_col).isNotNull()
            & F.col(event_col).cast("int").isNotNull())
    for c in x_cols:
        keep = keep & F.col(c).isNotNull()
    base = df.filter(keep).select(
        F.col(time_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
        *[F.col(c).cast("double").alias(x) for c, x in zip(x_cols, xs)],
    )
    # leavers per (cell, time) + event counts — the ADDITIVE sufficient
    # statistic (a streaming fold maintains exactly this table;
    # streaming/survival.py finalize_cox_multi refits on read)
    leav = base.groupBy(*xs, "__t").agg(
        F.count(F.lit(1)).alias("__r"), F.sum("__e").alias("__d"))
    return cox_newton_multi_from_leavers(leav, d, iterations=iterations,
                                         digits=digits)


def cox_newton_multi_from_leavers(
    leav: DataFrame,
    d: int,
    iterations: int = 4,
    digits: int | None = 5,
) -> DataFrame:
    """:func:`cox_newton_multi` from the per-(cell, time) leaver table
    (__x1..__xd, __t, __r, __d) — r/d are integer-ADDITIVE, so a
    streaming fold maintains them per (cell, time) and this refits the
    d-covariate Cox MLE on read (streaming/survival.py
    finalize_cox_multi), the same fold/recompute-on-read architecture
    as the KM twin. At-risk counts rebuild from the folded leavers via
    the cumulative window, never from subject history."""
    import math

    import numpy as np

    from clinpy_spark.functions.cramer import solve2, solve3, var3_diag

    xs = [f"__x{i}" for i in range(1, d + 1)]
    leav = leav.localCheckpoint(eager=False)
    # event-time probe rows cross-joined with the bounded cell table so
    # every cell's at-risk count exists at every event time (a cell
    # without a leaver at t has no natural row there)
    cells = leav.groupBy(*xs).agg(F.sum("__r").alias("__tot"))
    times = (leav.filter(F.col("__d") > 0)
             .select("__t").distinct())
    probe = times.crossJoin(F.broadcast(cells)).select(
        *xs, "__t", "__tot",
        F.lit(0).alias("__r"), F.lit(0).alias("__is_leav"))
    lv = leav.join(F.broadcast(cells), xs).select(
        *xs, "__t", "__tot", "__r", F.lit(1).alias("__is_leav"))
    w_prev = (
        Window.partitionBy(*xs)
        .orderBy("__t", "__is_leav")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # at-risk at t = total - leavers strictly before t (same-t leavers
    # sort AFTER the probe row, so the prefix excludes them)
    atrisk = (
        probe.unionByName(lv)
        .withColumn(
            "__n",
            F.col("__tot")
            - F.coalesce(F.sum("__r").over(w_prev), F.lit(0)))
        .filter(F.col("__is_leav") == 0)
        .select(*xs, "__t", "__n")
    )
    dgrid = leav.filter(F.col("__d") > 0).select(*xs, "__t", "__d")
    grid = (
        atrisk.join(dgrid, [*xs, "__t"], "left")
        .withColumn("__d", F.coalesce("__d", F.lit(0)))
    )
    spark = leav.sparkSession

    # ONE bounded probe of the (cell x event-time) grid — built
    # distributed exactly as before. Cells are design-bounded, but the
    # TIME axis comes from the data (a continuous time column at scale
    # has ~one distinct time per event), so the driver-side fast path
    # only engages when the grid is provably small; past the cap every
    # Newton step stays a distributed grid aggregate (the pre-r13
    # recurrence), so no data-sized collect can ever reach the driver.
    raw = grid.select("__t", "__n", "__d", *xs).take(_GRID_DRIVER_MAX + 1)
    driver_side = len(raw) <= _GRID_DRIVER_MAX
    if driver_side:
        # Deterministic reduction order BY CONSTRUCTION (r13 verdict
        # #1): collect order depends on partition layout (core count,
        # AQE), so the rows are sorted by (t, x1..xd) before any float
        # touches them — within each time the cells accumulate in
        # x-lexicographic order and times accumulate ascending. The
        # oracle CTEs pin the identical order with DuckDB ordered
        # aggregates (sum(... ORDER BY x1..xd) per time, ORDER BY t
        # across times), so the two float streams are operand-for-
        # operand identical, not merely within rounding distance.
        g_rows = sorted(
            ((r["__t"], float(r["__n"]), int(r["__d"]),
              *[float(r[x]) for x in xs])
             for r in raw),
            key=lambda row: (row[0],) + row[3:])
        by_t: dict = {}
        for row in g_rows:
            by_t.setdefault(row[0], []).append(row)

    def _exp(v: float) -> float:
        # mirror the distributed plan's F.exp: overflow propagates as
        # inf -> nan moments -> NULL emission, never a driver crash
        try:
            return math.exp(v)
        except OverflowError:
            return math.inf

    def moments_driver(beta):
        if not g_rows:
            return None, None, 0
        u = [0.0] * d
        info = {(a, b): 0.0 for a in range(d) for b in range(a, d)}
        n_events = 0
        for rows_t in by_t.values():
            s0 = 0.0
            dd = 0
            da = [0.0] * d
            s1 = [0.0] * d
            s2 = {(a, b): 0.0 for a in range(d) for b in range(a, d)}
            for row in rows_t:
                nc, dv = row[1], row[2]
                xv = row[3:3 + d]
                eta = 0.0
                for i in range(d):
                    eta = eta + float(beta[i]) * xv[i]
                ex = _exp(eta)
                s0 += nc * ex
                dd += dv
                for a in range(d):
                    da[a] += xv[a] * dv
                    s1[a] += nc * xv[a] * ex
                for a in range(d):
                    for b in range(a, d):
                        s2[(a, b)] += nc * xv[a] * xv[b] * ex
            for a in range(d):
                u[a] += da[a] - dd * s1[a] / s0
            for a in range(d):
                for b in range(a, d):
                    info[(a, b)] += dd * (
                        s2[(a, b)] / s0 - (s1[a] / s0) * (s1[b] / s0))
            n_events += dd
        return u, info, n_events

    def moments_distributed(beta):
        # the pre-r13 per-step grid aggregate: one Spark job per Newton
        # step, grid-sized shuffle only — the scale-safe branch
        eta = F.lit(0.0)
        for i, x in enumerate(xs):
            eta = eta + F.lit(float(beta[i])) * F.col(x)
        ex = F.exp(eta)
        nc = F.col("__n").cast("double")
        pt_aggs = [F.sum(nc * ex).alias("s0"), F.sum("__d").alias("dd")]
        pt_aggs += [F.sum(F.col(x) * F.col("__d")).alias(f"da{a}")
                    for a, x in enumerate(xs)]
        pt_aggs += [F.sum(nc * F.col(x) * ex).alias(f"s1_{a}")
                    for a, x in enumerate(xs)]
        pt_aggs += [
            F.sum(nc * F.col(xs[a]) * F.col(xs[b]) * ex).alias(f"s2_{a}{b}")
            for a in range(d) for b in range(a, d)
        ]
        pt = grid.groupBy("__t").agg(*pt_aggs)
        g_aggs = [
            F.sum(F.col(f"da{a}")
                  - F.col("dd") * F.col(f"s1_{a}") / F.col("s0"))
            .alias(f"u{a}")
            for a in range(d)
        ]
        g_aggs += [
            F.sum(F.col("dd") * (
                F.col(f"s2_{a}{b}") / F.col("s0")
                - (F.col(f"s1_{a}") / F.col("s0"))
                * (F.col(f"s1_{b}") / F.col("s0"))
            )).alias(f"i{a}{b}")
            for a in range(d) for b in range(a, d)
        ]
        g_aggs += [F.sum("dd").alias("n_events")]
        row = pt.agg(*g_aggs).collect()[0]
        if row["n_events"] is None:
            return None, None, 0
        u = [float(row[f"u{a}"]) for a in range(d)]
        info = {(a, b): float(row[f"i{a}{b}"])
                for a in range(d) for b in range(a, d)}
        return u, info, int(row["n_events"])

    moments = moments_driver if driver_side else moments_distributed

    def step(beta, u, info):
        """One Newton update.  For d <= 3 the solve is EXPLICIT Cramer
        arithmetic in the oracle's own operand order (functions/
        cramer.py — r12 verdict #1: np.linalg.solve's LAPACK path
        drifts ~1e-13 from the oracle's Cramer CTEs, enough to flip a
        rounded digit at a boundary); larger d (no SQL oracle) keeps
        the numpy solve."""
        if d == 1:
            det = info[(0, 0)]
            if not det > 0:
                return None
            return [beta[0] + u[0] / det]
        if d == 2:
            det, d1, d2 = solve2(u[0], u[1],
                                 info[(0, 0)], info[(0, 1)], info[(1, 1)])
            if d1 is None:
                return None
            return [beta[0] + d1, beta[1] + d2]
        if d == 3:
            det, d1, d2, d3 = solve3(
                u[0], u[1], u[2],
                info[(0, 0)], info[(0, 1)], info[(0, 2)],
                info[(1, 1)], info[(1, 2)], info[(2, 2)])
            if d1 is None:
                return None
            return [beta[0] + d1, beta[1] + d2, beta[2] + d3]
        a = np.zeros((d, d))
        for (i, j), v in info.items():
            a[i, j] = a[j, i] = v
        if np.linalg.det(a) <= 0:
            return None
        return list(np.asarray(beta) + np.linalg.solve(a, np.asarray(u)))

    def var_diag(info):
        """Diagonal of the inverse information — explicit cofactor/det
        ratios for d <= 3 (matching the oracle's se/wald expressions
        exactly), numpy inverse otherwise.  None on non-PD."""
        if d == 1:
            det = info[(0, 0)]
            return [1 / det] if det > 0 else None
        if d == 2:
            det = info[(0, 0)] * info[(1, 1)] - info[(0, 1)] * info[(0, 1)]
            if not det > 0:
                return None
            # the oracle emits sqrt(i22/det) / sqrt(i11/det)
            return [info[(1, 1)] / det, info[(0, 0)] / det]
        if d == 3:
            det = (info[(0, 0)] * (info[(1, 1)] * info[(2, 2)]
                                   - info[(1, 2)] * info[(1, 2)])
                   - info[(0, 1)] * (info[(0, 1)] * info[(2, 2)]
                                     - info[(1, 2)] * info[(0, 2)])
                   + info[(0, 2)] * (info[(0, 1)] * info[(1, 2)]
                                     - info[(1, 1)] * info[(0, 2)]))
            if not det > 0:
                return None
            return list(var3_diag(
                info[(0, 0)], info[(0, 1)], info[(0, 2)],
                info[(1, 1)], info[(1, 2)], info[(2, 2)], det))
        a = np.zeros((d, d))
        for (i, j), v in info.items():
            a[i, j] = a[j, i] = v
        if np.linalg.det(a) <= 0:
            return None
        return list(np.diag(np.linalg.inv(a)))

    # every subject leaves exactly once, so the leaver totals ARE the
    # cohort size (works from a folded stream state too)
    n_subjects = int(
        leav.agg(F.sum("__r").alias("n")).collect()[0].n or 0)

    def null_result(n_events):
        cols = []
        for pref in ("beta", "hr", "se", "wald_chi2_"):
            cols += [F.lit(None).cast("double").alias(f"{pref}{i}")
                     for i in range(1, d + 1)]
        cols += [F.lit(n_events).cast("long").alias("n_events"),
                 F.lit(n_subjects).cast("long").alias("n_subjects"),
                 F.lit(None).cast("double").alias("score_norm")]
        return spark.range(1).select(*cols)

    beta = [0.0] * d
    n_events = 0
    for _ in range(iterations):
        u, info, n_events = moments(beta)
        if u is None:
            return null_result(0)
        beta = step(beta, u, info)
        if beta is None:
            return null_result(n_events)
    u, info, n_events = moments(beta)
    var = var_diag(info) if u is not None else None
    if u is None or var is None:
        return null_result(n_events if u is not None else 0)

    # round-5 emission contract for the multi-covariate family (r12
    # verdict #1): residual distributed-sum-order drift in the moment
    # doubles is ~1e-13; against a 1e-5 rounding grid that flips a
    # digit with probability ~1e-8 instead of round-6's ~1e-7 per
    # statistic per run — and the Cramer solve above already removed
    # the LAPACK-vs-oracle term entirely.
    def r5(x):
        if digits is None:  # unrounded, for boundary-margin audits
            return float(x)
        return round(float(x), digits) + 0.0

    score_norm = 0.0
    for v in u:
        score_norm = score_norm + v * v
    score_norm = math.sqrt(score_norm)

    cols = [F.lit(r5(beta[i - 1])).alias(f"beta{i}") for i in range(1, d + 1)]
    cols += [F.lit(r5(math.exp(beta[i - 1]))).alias(f"hr{i}")
             for i in range(1, d + 1)]
    cols += [F.lit(r5(math.sqrt(var[i - 1]))).alias(f"se{i}")
             for i in range(1, d + 1)]
    cols += [
        F.lit(r5(beta[i - 1] * beta[i - 1] / var[i - 1]))
        .alias(f"wald_chi2_{i}")
        for i in range(1, d + 1)
    ]
    cols += [F.lit(n_events).cast("long").alias("n_events"),
             F.lit(n_subjects).cast("long").alias("n_subjects"),
             F.lit(r5(score_norm)).alias("score_norm")]
    return spark.range(1).select(*cols)


def cox_ph_check(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Proportional-hazards diagnostic for the binary-covariate Cox fit
    (the Schoenfeld-residual trend idea, Grambsch-Therneau simplified
    to the grid): 1 row (beta, rho_ph, n_times, n_events). Fits beta by
    the same ``iterations`` Newton steps as :func:`cox_newton`, then
    computes the per-event-time score residual
    r_t = d1_t - d_t * S1(t)/S0(t)  (at beta_hat)
    and rho_ph = Pearson correlation between r_t and the RANK of t over
    the event-time grid. Under proportional hazards the residuals have
    no time trend (rho ~ 0); |rho| near 1 means the hazard ratio drifts
    over follow-up and a single beta misleads. NULL rho when either
    variance vanishes (constant residuals or < 2 event times).

    Scale shape: everything after the one cohort groupBy runs on the
    bounded grid — the Newton loop moves grid-sized data, the residual
    correlation is one aggregate of exact sums.
    """
    grid = _binary_event_grid(df, time_col, event_col, x_col)
    beta = _newton_beta(df.sparkSession, grid, iterations)
    j = grid.crossJoin(F.broadcast(beta))
    s1 = F.col("n1") * F.exp(F.col("beta"))
    s0 = (F.col("n") - F.col("n1")) + s1
    r = F.col("d1") - F.col("d") * s1 / s0
    w_idx = Window.orderBy("__t")
    rr = j.withColumn("__r", r).withColumn(
        "__k", F.row_number().over(w_idx).cast("double"))
    agg = rr.agg(
        F.max("beta").alias("beta"),
        F.count(F.lit(1)).alias("n_times"),
        F.sum("d").alias("n_events"),
        F.sum("__k").alias("sk"),
        F.sum(F.col("__k") * F.col("__k")).alias("skk"),
        F.sum("__r").alias("sr"),
        F.sum(F.col("__r") * F.col("__r")).alias("srr"),
        F.sum(F.col("__k") * F.col("__r")).alias("skr"),
    )
    nn = F.col("n_times").cast("double")
    cov = nn * F.col("skr") - F.col("sk") * F.col("sr")
    vk = nn * F.col("skk") - F.col("sk") * F.col("sk")
    vr = nn * F.col("srr") - F.col("sr") * F.col("sr")
    return agg.select(
        F.when(F.col("beta").isNotNull(), F.round("beta", 6)).alias("beta"),
        F.when(
            F.col("beta").isNotNull() & (vk > 0) & (vr > 0),
            F.round(cov / F.sqrt(vk * vr), 6),
        ).alias("rho_ph"),
        "n_times",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


def life_table(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    width: float = 90.0,
) -> DataFrame:
    """Actuarial life table per group over fixed-width follow-up
    intervals: (group, interval_start, n_enter, n_events, n_censored,
    eff_n, q, survival) — the grouped-interval estimator clinical
    registries publish when exact event days are too granular (or too
    identifying) to report; the interval twin of ``km_curve``.

    Standard actuarial convention: withdrawals count half an interval
    at risk, eff_n = n_enter - c/2, q = d / eff_n (0 when eff_n = 0),
    S = prod(1 - q) over intervals so far (right-continuous at
    interval ends; exp(sum(ln)) with the explicit zero flag, same
    round-6 convention as km_curve).

    Scale shape: one groupBy to the per-(group, interval) grid —
    intervals are O(max follow-up / width), so every window after the
    first aggregate runs on a bounded table.
    """
    per_i = (
        df.select(
            F.col(group_col).alias("__g"),
            F.floor(F.col(time_col) / F.lit(width)).cast("long").alias("__i"),
            F.col(event_col).cast("int").alias("__e"),
        )
        .groupBy("__g", "__i")
        .agg(
            F.sum("__e").alias("d"),
            F.sum(1 - F.col("__e")).alias("c"),
        )
    )
    w_ord = Window.partitionBy("__g").orderBy("__i")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    per_i = per_i.withColumn(
        "n_enter",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    ).withColumn(
        "eff_n", F.col("n_enter") - F.col("c") / 2.0
    ).withColumn(
        "q",
        F.when(F.col("eff_n") > 0, F.col("d") / F.col("eff_n"))
        .otherwise(F.lit(0.0)),
    )
    per_i = (
        per_i.withColumn(
            "__lsum",
            F.sum(
                F.when(F.col("q") < 1, F.log(1 - F.col("q")))
                .otherwise(F.lit(0.0))
            ).over(w_cum),
        )
        .withColumn(
            "__zero",
            F.max(F.when(F.col("q") >= 1, 1).otherwise(0)).over(w_cum),
        )
    )
    return per_i.select(
        F.col("__g").alias(group_col),
        (F.col("__i") * F.lit(width)).alias("interval_start"),
        "n_enter",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.round("eff_n", 6).alias("eff_n"),
        F.round("q", 6).alias("q"),
        F.when(F.col("__zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("__lsum"), 6))
        .alias("survival"),
    )


def smr(
    study: DataFrame,
    ref: DataFrame,
    stratum_col: str,
    events_col: str,
    pt_col: str,
    rate_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Standardized mortality/morbidity ratio by INDIRECT
    standardization: 1 row (observed, expected, smr, smr_lo, smr_hi,
    n_strata) — does the study cohort's event count exceed what the
    reference population's stratum-specific rates predict for the
    cohort's own person-time mix? The epidemiology twin of
    ``incidence_rate``'s crude ratio, free of its confounding-by-mix.

    ``study`` is per-stratum (events, person-time); ``ref`` is
    per-stratum reference rates (events / person-time in the standard
    population). expected = sum over strata of pt * ref_rate; smr =
    observed / expected with the log-normal CI
    exp(ln smr +- z / sqrt(observed)) (Breslow-Day approximation, the
    same form ``incidence_rate`` uses). NULL smr/CI when expected is 0
    or observed is 0 (CI undefined).

    Scale shape: one broadcast join of the bounded rate table onto the
    per-stratum study aggregate, one 1-row sum — the corpus-sized work
    is whatever produced the per-stratum inputs (one groupBy each).
    Strata missing a reference rate are EXCLUDED from both observed
    and expected (count them first if that matters).
    """
    s = study.select(
        F.col(stratum_col).alias("__st"),
        F.col(events_col).alias("__o"),
        F.col(pt_col).cast("double").alias("__pt"),
    )
    r = ref.select(
        F.col(stratum_col).alias("__st"),
        F.col(rate_col).cast("double").alias("__rate"),
    )
    j = s.join(F.broadcast(r), "__st")
    agg = j.agg(
        F.sum("__o").alias("observed"),
        F.sum(F.col("__pt") * F.col("__rate")).alias("__e"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    obs = F.col("observed").cast("double")
    ok = (F.col("__e") > 0) & (F.col("observed") > 0)
    ratio = obs / F.col("__e")
    half = F.lit(float(z)) / F.sqrt(obs)
    return agg.select(
        F.coalesce("observed", F.lit(0)).alias("observed"),
        F.round(F.coalesce("__e", F.lit(0.0)), 6).alias("expected"),
        F.when(ok, F.round(ratio, 6)).alias("smr"),
        F.when(ok, F.round(ratio * F.exp(-half), 6)).alias("smr_lo"),
        F.when(ok, F.round(ratio * F.exp(half), 6)).alias("smr_hi"),
        "n_strata",
    )


def cox_newton_stratified(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    stratum_col: str,
    iterations: int = 3,
) -> DataFrame:
    """STRATIFIED Cox MLE for one binary covariate: 1 row (beta, hr,
    se, wald_chi2, n_events, n_subjects, n_strata) — ``cox_newton``
    with each stratum keeping its own baseline hazard (risk sets never
    cross strata), the standard confounder adjustment when a center /
    batch / nation effect would otherwise masquerade as a covariate
    effect (the Cox twin of ``logrank_stratified``).

    The partial likelihood factorizes over strata, so the score and
    information are SUMS over the per-(stratum, event-time) grid of
    the same hypergeometric-exponential terms — ``_newton_beta``
    iterates unchanged over the union grid; only the grid construction
    partitions its risk-set windows by stratum. Same oracle story as
    ``cox_newton``: chained CTEs with PARTITION BY stratum windows.

    Scale shape: ONE groupBy to the (stratum, time) grid, per-stratum
    total-minus-prefix windows, then grid-sized Newton aggregates — at
    10k strata the grid is still |strata| x |event times| rows,
    nothing quadratic, one shuffle keyed by stratum.
    """
    base = df.select(
        F.col(stratum_col).alias("__st"),
        F.col(time_col).alias("__t"),
        F.col(event_col).cast("int").alias("__e"),
        F.col(x_col).cast("int").alias("__x"),
    )
    pt = base.groupBy("__st", "__t").agg(
        F.sum("__e").alias("d"),
        F.sum(F.col("__e") * F.col("__x")).alias("d1"),
        F.count(F.lit(1)).alias("r"),
        F.sum("__x").alias("r1"),
    )
    w_prev = Window.partitionBy("__st").orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1)
    tot = Window.partitionBy("__st")
    grid = (
        pt.withColumn(
            "n", F.sum("r").over(tot)
            - F.coalesce(F.sum("r").over(w_prev), F.lit(0)))
        .withColumn(
            "n1", F.sum("r1").over(tot)
            - F.coalesce(F.sum("r1").over(w_prev), F.lit(0)))
        .filter(F.col("d") > 0)
        .select("__st", "__t", "d", "d1", "n", "n1")
        .localCheckpoint(eager=False)
    )
    beta = _newton_beta(df.sparkSession, grid, iterations)
    fin = grid.crossJoin(F.broadcast(beta))
    s1 = F.col("n1") * F.exp(F.col("beta"))
    s0 = (F.col("n") - F.col("n1")) + s1
    frac = s1 / s0
    i_t = F.col("d") * frac * (1 - frac)
    stats = fin.agg(
        F.max("beta").alias("beta"),
        F.sum(i_t).alias("__i"), F.sum("d").alias("n_events"))
    counts = df.groupBy().agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.countDistinct(stratum_col).alias("n_strata"))
    ok = F.col("beta").isNotNull() & (F.col("__i") > 0)
    return stats.crossJoin(F.broadcast(counts)).select(
        F.when(ok, F.round("beta", 6)).alias("beta"),
        F.when(ok, F.round(F.exp("beta"), 6)).alias("hr"),
        F.when(ok, F.round(1 / F.sqrt("__i"), 6)).alias("se"),
        F.when(ok, F.round(F.col("beta") * F.col("beta") * F.col("__i"), 6))
        .alias("wald_chi2"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "n_subjects",
        "n_strata",
    )


def finegray_leavers(
    df: DataFrame,
    time_col: str,
    status_col: str,
    group_col: str,
) -> DataFrame:
    """Per-(arm, time) leaver table for the Fine-Gray family:
    (__x, __t, __r, __d1, __d2, __c) — counts of leavers, events of
    interest, competing events, and censorings. Every counter is
    integer-ADDITIVE, so a streaming fold maintains this table per
    micro-batch (streaming/survival.py stream_finegray_partials) and
    the score/beta readers refit on read, the same fold/recompute
    architecture as the KM and Cox twins."""
    st = F.col(status_col).cast("int")
    base = df.select(
        F.col(time_col).alias("__t"),
        st.alias("__s"),
        F.col(group_col).cast("int").alias("__x"),
    ).filter(F.col("__t").isNotNull() & F.col("__s").isNotNull()
             & F.col("__x").isNotNull())
    return base.groupBy("__x", "__t").agg(
        F.count(F.lit(1)).alias("__r"),
        F.sum((F.col("__s") == 1).cast("int")).alias("__d1"),
        F.sum((F.col("__s") == 2).cast("int")).alias("__d2"),
        F.sum((F.col("__s") == 0).cast("int")).alias("__c"),
    )


def _finegray_weighted_grid(leav: DataFrame) -> DataFrame:
    """The bounded per-event-time WEIGHTED risk-set grid from the
    leaver table: (__t, d, d1, n, n1) with n / n1 the IPCW-weighted
    risk-set sums (total / arm-1) — deliberately the same column names
    as ``_binary_event_grid`` so ``_newton_beta`` and ``cox_newton``'s
    finishing expressions apply verbatim (weights do not depend on
    beta, so the grid is fit-invariant and built ONCE).

    w_i(t) = 1 while T_i >= t; a competing-event subject keeps
    w_i(t) = G(t-)/G(T_i) afterwards (G = censoring KM over ALL
    subjects). The weighted sums factor as
    n_x(t) + G(t-) * sum_{s<t} d2_x(s)/G(s): one ordered log-sum
    window for G over the bounded time grid, one total-minus-prefix
    and one prefix window per arm — the cohort is scanned once
    (building ``leav``), never self-joined against risk sets.
    """
    leav = leav.localCheckpoint(eager=False)
    # overall per-time table: at-risk, censoring-KM G(t) and G(t-)
    tt = leav.groupBy("__t").agg(
        F.sum("__r").alias("r"), F.sum("__c").alias("c"),
        F.sum("__d1").alias("d1t"),
        F.sum(F.when(F.col("__x") == 1, F.col("__d1")).otherwise(0))
        .alias("d1xt"),
    )
    w_all_prev = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1)
    w_all_incl = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    tt = tt.withColumn(
        "atr", F.sum("r").over(tot)
        - F.coalesce(F.sum("r").over(w_all_prev), F.lit(0)))
    # ln(1 - c/atr); a time where censoring exhausts the risk set can
    # only be terminal — its NULL term is never inside a USED prefix
    lnterm = (
        F.when(F.col("c") == 0, F.lit(0.0))
        .when(F.col("c") < F.col("atr"),
              F.log(F.lit(1.0) - F.col("c").cast("double") / F.col("atr")))
    )
    tg = (
        tt.withColumn("__lt", lnterm)
        .withColumn("g", F.exp(
            F.coalesce(F.sum("__lt").over(w_all_incl), F.lit(0.0))))
        .withColumn("g_prev", F.exp(
            F.coalesce(F.sum("__lt").over(w_all_prev), F.lit(0.0))))
        .localCheckpoint(eager=False)
    )

    # per-cell spine: probe rows at every event-1 time (il = 0, sorted
    # BEFORE same-time leavers so at-risk includes same-time leavers
    # and the competing-weight prefix excludes them: T_i < t strictly).
    # The per-arm totals are a <= 2-row bounded collect inlined as a
    # LITERAL table so the cross-product side is PROVABLY constant-row
    # (the plan audit's nested-loop gate does not trust checkpointed
    # lineage; same pattern as the other bounded probe spines).
    cell_rows = (leav.groupBy("__x").agg(F.sum("__r").alias("__tot"))
                 .collect())
    if len(cell_rows) > 8:
        raise ValueError(
            f"finegray: group column has {len(cell_rows)} levels; "
            "expected a 0/1 indicator (bounded-cell contract)")
    cells = leav.sparkSession.range(1).select(F.inline(F.array(*[
        F.struct(F.lit(int(r["__x"])).alias("__x"),
                 F.lit(int(r["__tot"])).alias("__tot"))
        for r in cell_rows])))
    probe = (
        tg.filter(F.col("d1t") > 0)
        .select("__t", "g_prev", "d1t", "d1xt")
        .crossJoin(F.broadcast(cells))
        .select("__x", "__t", "__tot", "g_prev", "d1t", "d1xt",
                F.lit(0).alias("__r"), F.lit(0.0).alias("__wc"),
                F.lit(0).alias("__il"))
    )
    lv = (
        leav.join(F.broadcast(cells), "__x")
        .join(tg.select("__t", "g"), "__t")
        .select("__x", "__t", "__tot",
                F.lit(None).cast("double").alias("g_prev"),
                F.lit(None).cast("long").alias("d1t"),
                F.lit(None).cast("long").alias("d1xt"),
                "__r",
                (F.col("__d2").cast("double") / F.col("g")).alias("__wc"),
                F.lit(1).alias("__il"))
    )
    w_prev = (
        Window.partitionBy("__x")
        .orderBy("__t", "__il")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    atr2 = (
        probe.unionByName(lv)
        .withColumn(
            "nx", F.col("__tot")
            - F.coalesce(F.sum("__r").over(w_prev), F.lit(0)))
        .withColumn(
            "cw", F.coalesce(F.sum("__wc").over(w_prev), F.lit(0.0)))
        .filter(F.col("__il") == 0)
    )
    s_val = F.col("nx") + F.col("g_prev") * F.col("cw")
    return atr2.groupBy("__t").agg(
        F.sum(s_val).alias("n"),
        F.sum(F.when(F.col("__x") == 1, s_val).otherwise(0.0)).alias("n1"),
        F.max("d1t").alias("d"), F.max("d1xt").alias("d1"),
    )


def _finegray_grid_rows_driver(leav: DataFrame):
    """Driver-side twin of :func:`_finegray_weighted_grid` for a
    BOUNDED leaver table: returns (grid_rows, n_subjects, n_competing)
    with grid_rows = [(t, n, n1, d, d1)] sorted by t, or None when the
    leaver table exceeds ``_GRID_DRIVER_MAX`` (callers then keep the
    distributed window pipeline — r13 verdict #2 contract).

    The leaver table is per-(arm, time) — arms are contract-bounded
    (<= 8 levels) but the TIME axis is data-sized, hence the cap. The
    replaced distributed build ran ~5 sequential single-partition
    window/groupBy stages over the same bounded rows (~0.7s of pure
    scheduling per query at sf0.1).

    Float accumulation order is DETERMINISTIC BY CONSTRUCTION (the
    r13-verdict-#1 discipline): the censoring-KM log-sum and each
    arm's competing-weight prefix walk times ascending (both engines'
    ordered windows already pin this), and the per-time arm reduction
    runs in arm order — the oracle CTEs pin the identical order with
    ordered aggregates (sum(... ORDER BY x) per time, ORDER BY t
    across times). Expression shapes replicate the distributed
    column arithmetic operand-for-operand."""
    import math

    raw = leav.select("__x", "__t", "__r", "__d1", "__d2", "__c").take(
        _GRID_DRIVER_MAX + 1)
    if len(raw) > _GRID_DRIVER_MAX:
        return None
    rows = sorted(
        ((int(r[0]), r[1], int(r[2]), int(r[3]), int(r[4]), int(r[5]))
         for r in raw),
        key=lambda v: (v[1], v[0]))
    arms = sorted({v[0] for v in rows})
    if len(arms) > 8:
        raise ValueError(
            f"finegray: group column has {len(arms)} levels; "
            "expected a 0/1 indicator (bounded-cell contract)")
    times = sorted({v[1] for v in rows})
    # per-time totals (integer sums — order-free)
    agg = {t: [0, 0, 0, 0] for t in times}  # r, c, d1, d1x
    n_competing = 0
    for x, t, r, d1, d2, c in rows:
        a = agg[t]
        a[0] += r
        a[1] += c
        a[2] += d1
        if x == 1:
            a[3] += d1
        n_competing += d2
    total_r = sum(a[0] for a in agg.values())
    # censoring KM over ALL subjects: integer at-risk prefix, then the
    # ordered running log-sum (NULL lt terms — censoring exhausting the
    # risk set, only possible terminally — are SKIPPED exactly like
    # both engines' window sums skip NULLs)
    g: dict = {}
    g_prev: dict = {}
    seen = 0
    acc = 0.0
    for t in times:
        r, c, _, _ = agg[t]
        atr = total_r - seen
        seen += r
        g_prev[t] = math.exp(acc)
        if c == 0:
            lt = 0.0
        elif c < atr:
            lt = math.log(1.0 - c / atr)
        else:
            lt = None
        if lt is not None:
            acc = acc + lt
        g[t] = math.exp(acc)
    tot = {a: 0 for a in arms}
    by_arm: dict = {a: {} for a in arms}
    for x, t, r, d1, d2, c in rows:
        tot[x] += r
        by_arm[x][t] = (r, d2)
    ev_times = [t for t in times if agg[t][2] > 0]
    # per-(arm, event-time) weighted risk: n_x(t) + G(t-) * cw_x(t-)
    # with both prefixes walked in t order (probe before same-t leaver,
    # so "strictly before t" exactly like the (t, il) window order)
    sval: dict = {a: {} for a in arms}
    for a in arms:
        seen_r = 0
        cw = 0.0
        am = by_arm[a]
        for t in times:
            if agg[t][2] > 0:
                n = tot[a] - seen_r
                sval[a][t] = n + g_prev[t] * cw
            if t in am:
                r, d2 = am[t]
                seen_r += r
                cw = cw + d2 / g[t]
    grid = []
    for t in ev_times:
        s0 = 0.0
        s1 = 0.0
        for a in arms:
            v = sval[a][t]
            s0 += v
            s1 += v if a == 1 else 0.0
        grid.append((t, s0, s1, agg[t][2], agg[t][3]))
    return grid, total_r, n_competing


def _finegray_counts(leav: DataFrame) -> DataFrame:
    """1-row (n_subjects, n_competing) from the leaver table — every
    subject leaves exactly once, so the leaver totals ARE the cohort."""
    return leav.groupBy().agg(
        F.sum("__r").cast("long").alias("n_subjects"),
        F.coalesce(F.sum("__d2"), F.lit(0)).cast("long")
        .alias("n_competing"),
    )


def finegray_score_from_leavers(
    leav: DataFrame, digits: int | None = 6,
) -> DataFrame:
    """:func:`finegray_score` from the folded per-(arm, time) leaver
    table — the streaming read path (weights and weighted risk sets
    rebuild from the additive counters, never from subject history).

    When the leaver table is bounded the grid AND the score reduce run
    driver-side in the pinned deterministic order
    (:func:`_finegray_grid_rows_driver`) and the row emits as literals;
    past the cap the distributed window pipeline below runs unchanged."""
    if not leav.isStreaming:
        leav = leav.localCheckpoint(eager=False)
    spark = leav.sparkSession
    data = None if leav.isStreaming else _finegray_grid_rows_driver(leav)
    if data is not None:
        grid, n_subjects, n_competing = data
        u = 0.0
        v = 0.0
        n_events = 0
        for _t, n, n1, d, d1 in grid:
            xbar = n1 / n
            u += d1 - d * xbar
            v += (d * (n - d) / (n - 1) * (xbar - xbar * xbar)
                  if n > 1 else 0.0)
            n_events += d

        def r6(x):
            if digits is None:
                return float(x)
            return round(float(x), digits) + 0.0

        return spark.range(1).select(
            (F.lit(r6(u * u / v)) if v > 0
             else F.lit(None).cast("double")).alias("chi2"),
            F.lit(r6(u)).alias("u"),
            F.lit(n_events).cast("long").alias("n_events"),
            F.lit(n_competing).cast("long").alias("n_competing"),
            F.lit(n_subjects).cast("long").alias("n_subjects"),
        )
    per_t = _finegray_weighted_grid(leav)
    xbar = F.col("n1") / F.col("n")
    u_t = F.col("d1") - F.col("d") * xbar
    v_t = F.when(
        F.col("n") > 1,
        F.col("d") * (F.col("n") - F.col("d"))
        / (F.col("n") - 1) * (xbar - xbar * xbar),
    ).otherwise(F.lit(0.0))
    agg = per_t.agg(
        F.sum(u_t).alias("__u"),
        F.sum(v_t).alias("__v"),
        F.sum("d").alias("n_events"),
    )
    return agg.crossJoin(F.broadcast(_finegray_counts(leav))).select(
        F.when(
            F.col("__v") > 0,
            F.round(F.col("__u") * F.col("__u") / F.col("__v"), 6) + 0.0,
        ).alias("chi2"),
        (F.round("__u", 6) + 0.0).alias("u"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "n_competing", "n_subjects",
    )


def finegray_score(
    df: DataFrame,
    time_col: str,
    status_col: str,
    group_col: str,
) -> DataFrame:
    """Fine-Gray SUBDISTRIBUTION-hazard score test at beta = 0 for a
    0/1 group indicator under competing risks: 1 row (chi2, u,
    n_events, n_competing, n_subjects) — the regression rung above
    :func:`cuminc`'s Aalen-Johansen curves (r12 verdict #6: does the
    CUMULATIVE INCIDENCE of the event of interest differ by arm, with
    competing events handled as Fine & Gray 1999 prescribe rather than
    censored away). ``status_col``: 0 = censored, 1 = event of
    interest, 2 = competing event.

    Subjects with a competing event at T stay in the subdistribution
    risk set after T with the IPCW weight w(t) = G(t-) / G(T), G the
    censoring Kaplan-Meier over ALL subjects (weights are
    deterministic grid arithmetic — the whole recurrence is
    CTE-replayable, which is how the ``surv_finegray_score`` oracle
    verifies it). At each event-1 time t with weighted risk-set sums
    S0(t) = sum_i w_i(t) and S1(t) = sum_{x_i = 1} w_i(t):
        U += d1x_t - d_t * (S1/S0)
        V += d_t * (S0 - d_t)/(S0 - 1) * (S1/S0 - (S1/S0)^2)
    (the same hypergeometric form as :func:`cox_score`, weighted), and
    chi2 = U^2/V on 1 df. With NO competing events every weight is 1
    and the statistic equals ``cox_score``'s exactly (property test).

    Scale shape: see :func:`_finegray_weighted_grid` — one corpus
    groupBy, bounded-grid windows, never a risk-set self-join.
    """
    return finegray_score_from_leavers(
        finegray_leavers(df, time_col, status_col, group_col))


def finegray_newton_from_leavers(
    leav: DataFrame, iterations: int = 3, digits: int | None = 6,
) -> DataFrame:
    """:func:`finegray_newton` from the folded leaver table — the
    streaming read path.

    When the leaver table is bounded the weighted grid, the Newton
    steps, AND the finishing information sum all run driver-side in
    the pinned deterministic order (:func:`_finegray_grid_rows_driver`;
    the step arithmetic replicates :func:`_newton_beta`'s per-row
    shapes operand-for-operand) and the row emits as literals; past
    the cap the distributed pipeline below runs unchanged."""
    import math

    if not leav.isStreaming:
        leav = leav.localCheckpoint(eager=False)
    spark = leav.sparkSession
    data = None if leav.isStreaming else _finegray_grid_rows_driver(leav)
    if data is not None:
        g_rows, n_subjects, n_competing = data
        beta: float | None = 0.0
        for _ in range(iterations):
            if beta is None:
                break
            u = 0.0
            i = 0.0
            try:
                eb = math.exp(beta)
            except OverflowError:
                eb = math.inf
            for _t, n, n1, d, _d1x in g_rows:
                s1v = n1 * eb
                s0v = (n - n1) + s1v
                frac = s1v / s0v
                # operand association matches the oracle CTE text:
                # u term is (d * s1e) / s0e, i term is (d*frac)*(1-frac)
                u += _d1x - d * s1v / s0v
                i += d * frac * (1 - frac)
            beta = beta + u / i if (g_rows and i > 0) else None
        # final information at beta-hat (the emitted se/wald inputs)
        i_fin = 0.0
        n_events = 0
        if beta is not None:
            try:
                eb = math.exp(beta)
            except OverflowError:
                eb = math.inf
            for _t, n, n1, d, _d1x in g_rows:
                s1v = n1 * eb
                frac = s1v / ((n - n1) + s1v)
                i_fin += d * frac * (1 - frac)
        for row in g_rows:
            n_events += row[3]
        ok = beta is not None and i_fin > 0

        def r6(x):
            if digits is None:
                return float(x)
            return round(float(x), digits) + 0.0

        null_d = F.lit(None).cast("double")
        return spark.range(1).select(
            (F.lit(r6(beta)) if ok else null_d).alias("beta"),
            (F.lit(r6(math.exp(beta))) if ok else null_d).alias("hr"),
            (F.lit(r6(1 / math.sqrt(i_fin))) if ok else null_d).alias("se"),
            (F.lit(r6(beta * beta * i_fin)) if ok else null_d)
            .alias("wald_chi2"),
            F.lit(n_events).cast("long").alias("n_events"),
            F.lit(n_competing).cast("long").alias("n_competing"),
            F.lit(n_subjects).cast("long").alias("n_subjects"),
        )
    grid = _finegray_weighted_grid(leav).localCheckpoint(eager=False)
    beta = _newton_beta(spark, grid, iterations)
    fin = grid.crossJoin(F.broadcast(beta))
    s1 = F.col("n1") * F.exp(F.col("beta"))
    s0 = (F.col("n") - F.col("n1")) + s1
    frac = s1 / s0
    i_t = F.col("d") * frac * (1 - frac)
    stats = fin.agg(
        F.max("beta").alias("beta"),
        F.sum(i_t).alias("__i"), F.sum("d").alias("n_events"))
    ok = F.col("beta").isNotNull() & (F.col("__i") > 0)
    return stats.crossJoin(F.broadcast(_finegray_counts(leav))).select(
        F.when(ok, F.round("beta", 6)).alias("beta"),
        F.when(ok, F.round(F.exp("beta"), 6)).alias("hr"),
        F.when(ok, F.round(1 / F.sqrt("__i"), 6)).alias("se"),
        F.when(ok, F.round(F.col("beta") * F.col("beta") * F.col("__i"), 6))
        .alias("wald_chi2"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "n_competing", "n_subjects",
    )


def finegray_newton(
    df: DataFrame,
    time_col: str,
    status_col: str,
    group_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Fine-Gray subdistribution-hazard MLE for the 0/1 group
    indicator: 1 row (beta, hr, se, wald_chi2, n_events, n_competing,
    n_subjects) — the effect-SIZE rung above :func:`finegray_score`
    (the subdistribution hazard ratio with Wald interval ingredients),
    exactly as :func:`cox_newton` sits above :func:`cox_score`.

    The IPCW weights do not depend on beta, so the weighted risk-set
    grid (``_finegray_weighted_grid``) is built ONCE and every Newton
    step is the SAME bounded-grid recurrence ``cox_newton`` unrolls —
    s1 = n1 e^b, s0 = (n - n1) + n1 e^b over the weighted sums —
    reusing ``_newton_beta`` verbatim. With no competing events the
    weighted sums ARE the integer risk sets and the fit equals
    ``cox_newton`` bit-exactly (property test). The recurrence is a
    closed deterministic function of the grid; the
    ``surv_finegray_beta`` oracle replays it as chained CTEs.
    """
    return finegray_newton_from_leavers(
        finegray_leavers(df, time_col, status_col, group_col),
        iterations=iterations)


def rmst_diff(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    tau: float,
) -> DataFrame:
    """Restricted mean survival time to horizon ``tau`` per arm WITH
    INFERENCE — the two-arm rung above :func:`rmst` (which reports the
    per-group point estimate only): 1 row (tau, rmst_a, se_a, n_a,
    rmst_b, se_b, n_b, diff, se_diff, z) — the model-free effect size the
    hazard-ratio family cannot give when proportional hazards fails
    (crossing curves): "mean event-free time over the first tau days".

    RMST = area under the Kaplan-Meier step to tau:
        t_1 + sum_i S(t_i) * (min(t_{i+1}, tau) - t_i)
    over event times t_i <= tau; variance by the standard
    Greenwood-type form  sum_i A_i^2 d_i / (n_i (n_i - d_i))  with
    A_i = integral of S from t_i to tau (the reverse-cumulative
    segment sum). With no censoring RMST is exactly the empirical
    mean of min(T, tau) (property test). diff = rmst_a - rmst_b,
    se_diff = sqrt(se_a^2 + se_b^2), z = diff/se_diff (NULL when both
    variances are 0). An arm with no events by tau reports rmst = tau,
    se = 0.

    Scale shape: ONE groupBy to the per-(arm, time) grid, at-risk via
    total-minus-prefix, survival via the ordered log-sum window, areas
    via one reverse-cumulative window per arm — bounded-grid
    arithmetic end to end, CTE-replayable (the ``surv_rmst_diff`` oracle).
    """
    is_a = F.col(group_col) == F.lit(group_a)
    is_b = F.col(group_col) == F.lit(group_b)
    sub = df.filter(is_a | is_b).select(
        F.when(is_a, F.lit("a")).otherwise(F.lit("b")).alias("__arm"),
        F.col(time_col).alias(time_col),
        F.col(event_col).alias(event_col),
    )
    pt = _per_time(sub, time_col, event_col, "__arm")
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "n",
        F.sum(F.col("d") + F.col("c")).over(tot)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    ev = pt.filter((F.col("d") > 0) & (F.col("__t") <= F.lit(tau)))
    w_ev = Window.partitionBy("__g").orderBy("__t")
    w_cum = w_ev.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = w_ev.rowsBetween(0, Window.unboundedFollowing)
    frac = F.col("d").cast("double") / F.col("n")
    ev = (
        ev.withColumn(
            "__lsum",
            F.sum(F.when(F.col("d") < F.col("n"), F.log(1 - frac))
                  .otherwise(F.lit(0.0))).over(w_cum))
        .withColumn(
            "__zero",
            F.max(F.when(F.col("d") >= F.col("n"), 1).otherwise(0))
            .over(w_cum))
        .withColumn(
            "s",
            F.when(F.col("__zero") == 1, F.lit(0.0))
            .otherwise(F.exp("__lsum")))
        .withColumn(
            "seg",
            F.col("s") * (
                F.coalesce(F.lead("__t").over(w_ev), F.lit(tau))
                .cast("double") - F.col("__t").cast("double")))
        .withColumn("a_i", F.sum("seg").over(w_fwd))
    )
    vterm = F.when(
        F.col("n") > F.col("d"),
        F.col("a_i") * F.col("a_i") * F.col("d")
        / (F.col("n") * (F.col("n") - F.col("d"))),
    ).otherwise(F.lit(0.0))
    arm = ev.groupBy("__g").agg(
        (F.min("__t").cast("double") + F.sum("seg")).alias("__rmst"),
        F.sum(vterm).alias("__var"),
    )
    counts = sub.groupBy("__arm").agg(F.count(F.lit(1)).alias("__n"))
    one = (
        counts.join(arm, counts["__arm"] == arm["__g"], "left")
        .groupBy()
        .agg(
            F.sum(F.when(F.col("__arm") == "a",
                         F.coalesce("__rmst", F.lit(float(tau))))
                  ).alias("ra"),
            F.sum(F.when(F.col("__arm") == "a",
                         F.coalesce("__var", F.lit(0.0)))).alias("va"),
            F.sum(F.when(F.col("__arm") == "a", F.col("__n"))
                  .otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("__arm") == "b",
                         F.coalesce("__rmst", F.lit(float(tau))))
                  ).alias("rb"),
            F.sum(F.when(F.col("__arm") == "b",
                         F.coalesce("__var", F.lit(0.0)))).alias("vb"),
            F.sum(F.when(F.col("__arm") == "b", F.col("__n"))
                  .otherwise(0)).alias("n_b"),
        )
    )
    se_diff = F.sqrt(F.col("va") + F.col("vb"))
    return one.select(
        F.lit(float(tau)).alias("tau"),
        F.round("ra", 6).alias("rmst_a"),
        F.round(F.sqrt("va"), 6).alias("se_a"),
        F.col("n_a").cast("long").alias("n_a"),
        F.round("rb", 6).alias("rmst_b"),
        F.round(F.sqrt("vb"), 6).alias("se_b"),
        F.col("n_b").cast("long").alias("n_b"),
        (F.round(F.col("ra") - F.col("rb"), 6) + 0.0).alias("diff"),
        F.round(se_diff, 6).alias("se_diff"),
        F.when(se_diff > 0,
               F.round((F.col("ra") - F.col("rb")) / se_diff, 6) + 0.0)
        .alias("z"),
    )


def cindex(
    df: DataFrame,
    time_col: str,
    event_col: str,
    score_col: str,
) -> DataFrame:
    """Harrell's concordance index for a risk score against censored
    survival data: 1 row (n, n_events, comparable, concordant,
    discordant, tied_score, c_index, somers_d) — the standard
    discrimination readout for every fitted risk model in the family
    (``cox_newton`` / ``finegray_newton`` / ``polygenic_score``), with
    HIGHER score meaning HIGHER risk (earlier event).

    Pair semantics (Harrell's original, the ``survival::concordance``
    default): a pair (i, j) is comparable iff subject i has an
    observed event and either t_i < t_j, or t_i = t_j with j censored
    (the event is known to precede the censoring). Pairs of events at
    the same time are incomparable. Concordant = score_i > score_j;
    score ties credit 1/2. c_index = (concordant + tied/2)/comparable
    and somers_d = 2c - 1.

    Scale shape: NO pairwise join anywhere. One groupBy collapses the
    cohort to the (time, score) cell grid; eligible-j counts per
    (event time, score band) come from dominance counting over the
    DENSE grid — distinct times x score bands, the band axis riding a
    1-row collect_set broadcast like :func:`logrank_k`'s group axis —
    with one exclusive prefix window per axis (time suffix via
    total - strict prefix - same-time events, then a strict
    lower-score prefix per time). Everything is exact integer
    arithmetic until the two final ratios, so the result is
    hash-deterministic. State per window task is bounded by
    |distinct times| x |distinct scores| (band the score first if it
    is continuous; times are grid-bounded like the log-rank family).
    """
    cells = (
        df.select(
            F.col(time_col).cast("long").alias("__t"),
            F.col(event_col).cast("int").alias("__e"),
            F.col(score_col).cast("long").alias("__s"),
        )
        .filter(F.col("__t").isNotNull() & F.col("__s").isNotNull())
        .groupBy("__t", "__s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__e").alias("d"))
    )
    # dense grid: every distinct time x every score band (band list is
    # a constant-row collect_set broadcast, exploded — no data-sized
    # cartesian), left-joined back onto the sparse cells.
    bands = cells.groupBy("__s").agg(F.sum("n").alias("tot"))
    blist = bands.groupBy().agg(
        F.collect_list(F.struct("__s", "tot")).alias("bs"))
    dense = (
        cells.select("__t").distinct()
        .crossJoin(F.broadcast(blist))
        .select("__t", F.explode("bs").alias("b"))
        .select("__t", F.col("b.__s").alias("__s"), F.col("b.tot").alias("tot"))
        .join(cells, ["__t", "__s"], "left")
        .select(
            "__t", "__s", "tot",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("d", F.lit(0)).alias("d"),
        )
    )
    # eligible j's for an event anchored at time t, per band s:
    # everyone in s strictly later than t, plus s's censored AT t =
    # tot - (strict time prefix of n) - (events at exactly t).
    w_tpre = (
        Window.partitionBy("__s").orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_spre = (
        Window.partitionBy("__t").orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tall = Window.partitionBy("__t")
    g = (
        dense.withColumn(
            "nb", F.coalesce(F.sum("n").over(w_tpre), F.lit(0)))
        .withColumn("elig", F.col("tot") - F.col("nb") - F.col("d"))
        .withColumn(
            "ca", F.coalesce(F.sum("elig").over(w_spre), F.lit(0)))
        .withColumn("ta", F.sum("elig").over(w_tall))
    )
    one = g.filter(F.col("d") > 0).groupBy().agg(
        F.sum(F.col("d") * F.col("ca")).alias("conc"),
        F.sum(F.col("d") * F.col("elig")).alias("tied"),
        F.sum(F.col("d") * F.col("ta")).alias("comp"),
    )
    tots = cells.groupBy().agg(
        F.sum("n").alias("n_all"), F.sum("d").alias("d_all"))
    j = tots.crossJoin(F.broadcast(one))
    comp = F.coalesce(F.col("comp"), F.lit(0)).cast("double")
    conc = F.coalesce(F.col("conc"), F.lit(0))
    tied = F.coalesce(F.col("tied"), F.lit(0))
    cval = (conc.cast("double") + tied.cast("double") / 2) / comp
    return j.select(
        F.col("n_all").cast("long").alias("n"),
        F.col("d_all").cast("long").alias("n_events"),
        F.coalesce(F.col("comp"), F.lit(0)).cast("long").alias("comparable"),
        conc.cast("long").alias("concordant"),
        (F.coalesce(F.col("comp"), F.lit(0)) - conc - tied)
        .cast("long").alias("discordant"),
        tied.cast("long").alias("tied_score"),
        F.when(comp > 0, F.round(cval, 6) + 0.0).alias("c_index"),
        F.when(comp > 0, F.round(2 * cval - 1, 6) + 0.0).alias("somers_d"),
    )


def direct_standardization(
    df: DataFrame,
    group_col: str,
    stratum_col: str,
    event_col: str,
    time_col: str,
) -> DataFrame:
    """Directly age/stratum-standardized incidence rates per group —
    the DIRECT counterpart to :func:`smr`'s indirect standardization:
    one row per group (group, events, ptime, crude_rate, adj_rate,
    se_adj, strata_used). Crude rates between groups with different
    stratum mixes are confounded (Simpson); the adjusted rate
    re-weights each group's stratum-specific rates to ONE standard
    population — here the pooled cohort's person-time per stratum, the
    usual internal standard — so groups become comparable:
    adj_g = sum_s w_s (d_gs / pt_gs) / sum_s w_s with w_s the pooled
    person-time of stratum s, and (Poisson counts)
    var(adj_g) = sum_s w_s^2 d_gs / pt_gs^2 / (sum_s w_s)^2
    (Rothman-Greenland eq. 10-6). Strata where the group has no
    follow-up are excluded from that group's sums (strata_used counts
    the rest) — never a 0-division.

    Scale shape: one groupBy to the (group, stratum) cell grid, the
    per-stratum standard from a second grid-sized aggregate, one
    broadcast join grid x standard, one final per-group aggregate. No
    windows, no collect.
    """
    cells = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(stratum_col).alias("__s"),
            F.col(event_col).cast("long").alias("__e"),
            F.col(time_col).cast("double").alias("__t"),
        )
        .filter(F.col("__g").isNotNull() & F.col("__s").isNotNull())
        .groupBy("__g", "__s")
        .agg(F.sum("__e").alias("d"), F.sum("__t").alias("pt"))
    )
    std = cells.groupBy("__s").agg(F.sum("pt").alias("w"))
    j = cells.join(F.broadcast(std), "__s")
    used = F.col("pt") > 0
    per_g = j.groupBy("__g").agg(
        F.sum("d").alias("events"),
        F.sum("pt").alias("ptime"),
        F.sum(F.when(used, F.col("w"))).alias("wsum"),
        F.sum(F.when(used, F.col("w") * F.col("d") / F.col("pt")))
        .alias("wr"),
        F.sum(F.when(
            used, F.col("w") * F.col("w") * F.col("d")
            / (F.col("pt") * F.col("pt")))).alias("wv"),
        F.sum(F.when(used, 1).otherwise(0)).alias("strata_used"),
    )
    ok = F.col("wsum") > 0
    return per_g.select(
        F.col("__g").alias("group"),
        F.col("events").cast("long").alias("events"),
        F.round("ptime", 6).alias("ptime"),
        F.when(F.col("ptime") > 0,
               F.round(F.col("events") / F.col("ptime"), 6) + 0.0)
        .alias("crude_rate"),
        F.when(ok, F.round(F.col("wr") / F.col("wsum"), 6) + 0.0)
        .alias("adj_rate"),
        F.when(ok, F.round(F.sqrt(F.col("wv")) / F.col("wsum"), 6) + 0.0)
        .alias("se_adj"),
        F.col("strata_used").cast("long").alias("strata_used"),
    )


def _binary_event_grid_tv(
    df: DataFrame,
    start_col: str,
    stop_col: str,
    event_col: str,
    x_col: str,
) -> DataFrame:
    """Counting-process version of :func:`_binary_event_grid` for
    EPISODE data (start, stop] with a binary covariate fixed within
    each episode: per pooled event time (__t, d, d1, n, n1) where the
    risk set is every episode with start < t <= stop. Built without a
    data-sized interval join: arrivals (+1 at start) and departures
    (-1 at stop) are pre-aggregated per distinct time (grid-sized
    flows), unioned with event-time probes sorting BEFORE same-time
    flow rows, and the at-risk counts are one exclusive running sum —
    an arrival AT t is not yet at risk (start < t strict) and a
    departure AT t still is (stop >= t), exactly the probe ordering.
    Lineage cut once (the grid feeds every Newton step)."""
    ep = (
        df.select(
            F.col(start_col).cast("double").alias("__a"),
            F.col(stop_col).cast("double").alias("__b"),
            F.col(event_col).cast("int").alias("__e"),
            F.col(x_col).cast("int").alias("__x"),
        )
        .filter(F.col("__b") > F.col("__a"))
    )
    ev = (
        ep.groupBy(F.col("__b").alias("__t"))
        .agg(F.sum("__e").alias("d"),
             F.sum(F.col("__e") * F.col("__x")).alias("d1"))
        .filter(F.col("d") > 0)
    )
    arr = ep.groupBy(F.col("__a").alias("__t")).agg(
        F.count(F.lit(1)).alias("dn"), F.sum("__x").alias("dn1"))
    dep = ep.groupBy(F.col("__b").alias("__t")).agg(
        (-F.count(F.lit(1))).alias("dn"), (-F.sum("__x")).alias("dn1"))
    null_l = F.lit(None).cast("long")
    flows = arr.unionByName(dep).select(
        "__t", "dn", "dn1", F.lit(1).alias("is_real"),
        null_l.alias("d"), null_l.alias("d1"))
    probes = ev.select(
        "__t", F.lit(0).cast("long").alias("dn"),
        F.lit(0).cast("long").alias("dn1"),
        F.lit(0).alias("is_real"), "d", "d1")
    w_prev = Window.orderBy("__t", "is_real").rowsBetween(
        Window.unboundedPreceding, -1)
    return (
        flows.unionByName(probes)
        .withColumn("n", F.coalesce(F.sum("dn").over(w_prev), F.lit(0)))
        .withColumn("n1", F.coalesce(F.sum("dn1").over(w_prev), F.lit(0)))
        .filter(F.col("is_real") == 0)
        .select("__t", "d", "d1", "n", "n1")
        .localCheckpoint(eager=False)
    )


def cox_newton_tv(
    df: DataFrame,
    start_col: str,
    stop_col: str,
    event_col: str,
    x_col: str,
    iterations: int = 3,
) -> DataFrame:
    """Cox proportional-hazards MLE with a TIME-VARYING binary
    covariate in Andersen-Gill counting-process form — each row one
    EPISODE (start, stop] during which the covariate is constant,
    event flagged on the episode whose stop is the failure time: 1 row
    (beta, hr, se, wald_chi2, n_events, n_episodes). The classic
    immortal-time-bias-free treatment-switch analysis (a subject
    contributes x=0 person-time before switching and x=1 after —
    coding them x=1 from day 0 inflates the treatment's survival) that
    the single-record :func:`cox_newton` cannot express; with one
    episode per subject spanning (0, t] it reduces to ``cox_newton``
    BIT-EXACTLY (property-tested) because the arrival/departure flows
    reproduce the total-minus-prefix risk sets.

    Zero-length episodes (stop <= start) are dropped. Ties follow
    Breslow, as everywhere in this family.

    Scale shape: two groupBys to grid-sized flow/event tables, one
    exclusive running window over the bounded pooled time grid
    (:func:`_binary_event_grid_tv`), then the shared
    :func:`_newton_beta` loop — per step a grid-sized aggregate plus a
    1-row broadcast beta. The episode table is scanned a bounded
    number of times and never self-joined.
    """
    grid = _binary_event_grid_tv(df, start_col, stop_col, event_col, x_col)
    beta = _newton_beta(df.sparkSession, grid, iterations)
    fin = grid.crossJoin(F.broadcast(beta))
    s1 = F.col("n1") * F.exp(F.col("beta"))
    s0 = (F.col("n") - F.col("n1")) + s1
    frac = s1 / s0
    i_t = F.col("d") * frac * (1 - frac)
    stats = fin.agg(
        F.max("beta").alias("beta"),
        F.sum(i_t).alias("__i"), F.sum("d").alias("n_events"))
    counts = (
        df.filter(F.col(stop_col).cast("double")
                  > F.col(start_col).cast("double"))
        .groupBy().agg(F.count(F.lit(1)).alias("n_episodes"))
    )
    ok = F.col("beta").isNotNull() & (F.col("__i") > 0)
    return stats.crossJoin(F.broadcast(counts)).select(
        F.when(ok, F.round("beta", 6)).alias("beta"),
        F.when(ok, F.round(F.exp("beta"), 6)).alias("hr"),
        F.when(ok, F.round(1 / F.sqrt("__i"), 6)).alias("se"),
        F.when(ok, F.round(F.col("beta") * F.col("beta") * F.col("__i"), 6))
        .alias("wald_chi2"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "n_episodes",
    )


def km_weighted(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """WEIGHTED Kaplan-Meier curve per group — the adjusted-survival
    readout for inverse-probability-of-treatment weights (Xie & Liu
    2005): (group, t, n_risk_w, events_w, censored_w, survival), one
    row per (group, distinct observed time). With per-subject weights
    w the product-limit factor becomes 1 - sum(w*d)/sum(w at risk), so
    each arm's curve estimates the survival the WHOLE pseudo-population
    would have under that arm, removing measured confounding that the
    crude :func:`km_curve` absorbs. With unit weights it reduces to
    ``km_curve`` exactly (property-tested). The d >= n zero flag
    generalizes to weighted mass: once the weighted events exhaust the
    weighted risk set the curve reports 0.0 and stays there.

    Null or non-positive weights drop the row (a zero weight
    contributes nothing to either numerator or denominator).

    Scale shape: identical to km_curve — one groupBy to the
    per-(group, time) weighted grid, total-minus-prefix windows, the
    exp-sum-ln prefix for the product. Weighted sums are exact when
    the weights are dyadic rationals (the oracle fixtures use
    quarter-steps for bit-reproducibility).
    """
    wv = F.col(weight_col).cast("double")
    ev = F.col(event_col).cast("int")
    pt = (
        df.filter(wv.isNotNull() & (wv > 0)
                  & F.col(time_col).isNotNull() & ev.isNotNull())
        .groupBy(F.col(group_col).alias("__g"),
                 F.col(time_col).alias("__t"))
        .agg(F.sum(wv * ev).alias("wd"),
             F.sum(wv * (1 - ev)).alias("wc"))
    )
    w_ord = Window.partitionBy("__g").orderBy("__t")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("__g")
    pt = pt.withColumn(
        "nw",
        F.sum(F.col("wd") + F.col("wc")).over(tot)
        - F.coalesce(F.sum(F.col("wd") + F.col("wc")).over(w_prev),
                     F.lit(0.0)),
    )
    frac = F.col("wd") / F.col("nw")
    pt = (
        pt.withColumn(
            "__lsum",
            F.sum(
                F.when(F.col("wd") < F.col("nw"), F.log(1 - frac))
                .otherwise(F.lit(0.0))
            ).over(w_cum),
        )
        .withColumn(
            "__zero",
            F.max(
                F.when(F.col("wd") >= F.col("nw"), 1).otherwise(0)
            ).over(w_cum),
        )
    )
    return pt.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(time_col),
        F.round("nw", 6).alias("n_risk_w"),
        F.round("wd", 6).alias("events_w"),
        F.round("wc", 6).alias("censored_w"),
        F.when(F.col("__zero") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("__lsum"), 6)).alias("survival"),
    )


def mcf_curve(
    df: DataFrame,
    start_col: str,
    stop_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen MEAN CUMULATIVE FUNCTION for RECURRENT events over
    counting-process episodes — the population-average number of
    events per subject by time t (readmissions per patient, repairs
    per machine, orders per customer; Nelson 2003): one row per event
    time (t, n_risk, n_events, mcf, se) with
    mcf(t) = sum_{t' <= t} d(t')/n(t') and the Poisson-type variance
    sum d/n^2. KM/cuminc answer time-to-FIRST-event questions; the
    MCF is the estimand once subjects can fail repeatedly —
    :func:`cox_newton_tv`'s episode format, reused verbatim
    (``event_col`` may carry a per-episode event COUNT for multiple
    events closing one episode).

    Risk sets come from the same arrival/departure flow grid
    (:func:`_binary_event_grid_tv` with a constant covariate): an
    episode is at risk on (start, stop], so a subject's own event
    episode keeps it at risk at the event time and n(t) >= d(t) > 0 at
    every emitted row. Zero-length episodes are dropped.

    Scale shape: grid-sized flow aggregates + two ordered windows over
    the bounded pooled time grid; the episode table is scanned a
    bounded number of times and never self-joined.
    """
    grid = _binary_event_grid_tv(
        df.withColumn("__one", F.lit(1)), start_col, stop_col,
        event_col, "__one")
    w_cum = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0)
    frac = F.col("d").cast("double") / F.col("n")
    var_t = F.col("d").cast("double") / (F.col("n") * F.col("n"))
    out = (
        grid.withColumn("__mcf", F.sum(frac).over(w_cum))
        .withColumn("__var", F.sum(var_t).over(w_cum))
    )
    return out.select(
        F.col("__t").alias("t"),
        F.col("n").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round("__mcf", 6).alias("mcf"),
        F.round(F.sqrt("__var"), 6).alias("se"),
    )


def aalen_excess_hazard(
    df: DataFrame,
    time_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Aalen-type EXCESS cumulative hazard of arm a over arm b — the
    additive-hazards effect curve (for a single binary covariate
    Aalen's least-squares increment (X'X)^-1 X' dN reduces exactly to
    the difference of the two arms' Nelson-Aalen increments): one row
    per pooled event time (t, n_a, n_b, d_a, d_b, excess_cumhaz, se,
    z) with B(t) = sum d_a/n_a - d_b/n_b, pointwise martingale
    variance sum d_a/n_a^2 + d_b/n_b^2 and z = B/se. Where the Cox
    model asserts ONE proportional effect, B(t) shows the effect's
    time-COURSE on the absolute hazard scale: linear B = constant
    added hazard, a plateau = early-only harm — the additive
    complement to ``cox_ph_check``'s multiplicative drift diagnostic.

    An arm contributes nothing at times it has no event (its failing
    subject is always in its own risk set, so every d/n term is
    well-defined); rows stop carrying information for an exhausted arm
    (n = 0) by the same rule.

    Scale shape: identical to the log-rank family — one groupBy to
    the per-time two-arm grid, total-minus-prefix windows, one
    ascending cumulative window. Fixed accumulation order, so the
    curve is oracle-reproducible (round-6).
    """
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    pt = _per_time(sub, time_col, event_col, group_col)
    is_a = F.col("__g") == F.lit(group_a)
    per_t = pt.groupBy("__t").agg(
        F.sum(F.when(is_a, F.col("d")).otherwise(0)).alias("da"),
        F.sum(F.when(is_a, F.col("d") + F.col("c")).otherwise(0))
        .alias("ra"),
        F.sum(F.when(~is_a, F.col("d")).otherwise(0)).alias("db"),
        F.sum(F.when(~is_a, F.col("d") + F.col("c")).otherwise(0))
        .alias("rb"),
    )
    w_prev = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    per_t = (
        per_t.withColumn(
            "na", F.sum("ra").over(tot)
            - F.coalesce(F.sum("ra").over(w_prev), F.lit(0)))
        .withColumn(
            "nb", F.sum("rb").over(tot)
            - F.coalesce(F.sum("rb").over(w_prev), F.lit(0)))
    )
    inc_a = F.when(F.col("da") > 0,
                   F.col("da").cast("double") / F.col("na")).otherwise(0.0)
    inc_b = F.when(F.col("db") > 0,
                   F.col("db").cast("double") / F.col("nb")).otherwise(0.0)
    var_a = F.when(
        F.col("da") > 0,
        F.col("da").cast("double") / (F.col("na") * F.col("na"))
    ).otherwise(0.0)
    var_b = F.when(
        F.col("db") > 0,
        F.col("db").cast("double") / (F.col("nb") * F.col("nb"))
    ).otherwise(0.0)
    out = (
        per_t.withColumn("__b", F.sum(inc_a - inc_b).over(w_cum))
        .withColumn("__v", F.sum(var_a + var_b).over(w_cum))
        .filter((F.col("da") + F.col("db")) > 0)
    )
    se = F.sqrt("__v")
    return out.select(
        F.col("__t").alias(time_col),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("da").cast("long").alias("d_a"),
        F.col("db").cast("long").alias("d_b"),
        (F.round("__b", 6) + 0.0).alias("excess_cumhaz"),
        F.round(se, 6).alias("se"),
        F.when(se > 0, F.round(F.col("__b") / se, 6) + 0.0).alias("z"),
    )
