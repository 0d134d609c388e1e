"""Declarative data-quality constraint suite (Deequ-style, miniature):
a list of named checks compiled into ONE aggregation pass over the
table, plus anti-join passes for referential checks — the validation
stage a 100 TB ingest pipeline runs before promoting a batch.

The reference's analogue is its config-driven type/QC gating
(clinpy/etl's coercion + QC row filters, star_sj.py); this generalizes
"the config IS the check" into a spec vocabulary:

    {"name": ..., "check": "completeness", "col": c, "min_frac": f}
    {"name": ..., "check": "uniqueness",   "col": c, "min_frac": f}
    {"name": ..., "check": "range",  "col": c, "lo": x, "hi": y}
    {"name": ..., "check": "pattern","col": c, "regex": r, "min_frac": f}
    {"name": ..., "check": "fk", "col": c, "ref": DataFrame, "ref_col": c2}

Scale shape: all row-local checks share a single groupBy-less agg (one
pass, map-side partials, one 1-row result per table); each fk check is
one left-anti join against the (usually broadcastable) reference keys.
Output: (check_name, metric, passed) — metric is the measured fraction
(or violation count for range/fk), so dashboards can trend it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_local_exprs(spec: dict) -> tuple[object, object]:
    """-> (metric expression, passed expression) for one check."""
    kind, col = spec["check"], spec.get("col")
    n = F.count(F.lit(1))
    if kind == "completeness":
        metric = F.count(col).cast("double") / n
        return metric, metric >= F.lit(float(spec.get("min_frac", 1.0)))
    if kind == "uniqueness":
        metric = F.countDistinct(col).cast("double") / n
        return metric, metric >= F.lit(float(spec.get("min_frac", 1.0)))
    if kind == "range":
        lo, hi = spec["lo"], spec["hi"]
        bad = F.sum(
            F.when(F.col(col).isNotNull()
                   & ((F.col(col) < lo) | (F.col(col) > hi)), 1).otherwise(0))
        return bad.cast("double"), bad == 0
    if kind == "pattern":
        ok = F.sum(F.when(F.col(col).rlike(spec["regex"]), 1).otherwise(0))
        metric = ok.cast("double") / n
        return metric, metric >= F.lit(float(spec.get("min_frac", 1.0)))
    raise ValueError(f"unknown check kind {kind!r}")


def check_suite(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every check -> (check_name, metric, passed). Row-local
    checks fuse into one aggregation; fk checks add one anti-join
    each."""
    local = [c for c in checks if c["check"] != "fk"]
    fks = [c for c in checks if c["check"] == "fk"]
    parts: list[DataFrame] = []
    if local:
        aggs = []
        for spec in local:
            metric, passed = _row_local_exprs(spec)
            aggs.append(F.round(metric, 6).alias(f"__m_{spec['name']}"))
            aggs.append(passed.alias(f"__p_{spec['name']}"))
        one = df.agg(*aggs)
        rows = F.array(*[
            F.struct(
                F.lit(spec["name"]).alias("check_name"),
                F.col(f"__m_{spec['name']}").alias("metric"),
                F.col(f"__p_{spec['name']}").alias("passed"),
            )
            for spec in local
        ])
        parts.append(one.select(F.explode(rows).alias("__c")).select("__c.*"))
    for spec in fks:
        ref = spec["ref"].select(F.col(spec["ref_col"]).alias(spec["col"])).distinct()
        orphans = (
            df.select(spec["col"]).filter(F.col(spec["col"]).isNotNull())
            .join(ref, spec["col"], "left_anti")
            .agg(F.count(F.lit(1)).alias("__bad"))
        )
        parts.append(orphans.select(
            F.lit(spec["name"]).alias("check_name"),
            F.col("__bad").cast("double").alias("metric"),
            (F.col("__bad") == 0).alias("passed"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def group_trends(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group least-squares trend: (group, n, slope, intercept,
    corr) from closed-form sufficient statistics — one aggregation
    pass, no ML library, exactly recomputable by any SQL engine.
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); groups with degenerate
    variance emit NULL slope/corr."""
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(F.col(x_col).cast("double"))
    sy = F.sum(F.col(y_col).cast("double"))
    sxx = F.sum(F.col(x_col).cast("double") * F.col(x_col))
    syy = F.sum(F.col(y_col).cast("double") * F.col(y_col))
    sxy = F.sum(F.col(x_col).cast("double") * F.col(y_col))
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    slope = F.when(den_x > 0, (n * sxy - sx * sy) / den_x)
    corr = F.when((den_x > 0) & (den_y > 0),
                  (n * sxy - sx * sy) / F.sqrt(den_x * den_y))
    return df.groupBy(group_col).agg(
        n.cast("long").alias("n"),
        slope.alias("slope"),
        F.when(den_x > 0, (sy - slope * sx) / n).alias("intercept"),
        corr.alias("corr"),
    )


def impute_median(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Null repair: replace NULL ``value_col`` with the per-group exact
    interpolated median of the non-null values (the robust default for
    skewed pipeline features). One aggregation on the small group key,
    medians broadcast back over the stream; adds ``__was_null`` so
    audits can count repairs. Groups that are entirely NULL stay NULL."""
    out_col = out_col or value_col
    med = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.expr(f"percentile({value_col}, 0.5)").alias("__gmed"))
    )
    return (
        df.join(F.broadcast(med), group_col, "left")
        .withColumn("__was_null", F.col(value_col).isNull())
        .withColumn(out_col, F.coalesce(F.col(value_col), F.col("__gmed")))
        .drop("__gmed")
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row
    (k, n_groups, n_violating_groups, n_rows_at_risk, min_group_size,
    passed) — a release is k-anonymous iff every quasi-identifier
    equivalence class has >= k rows. One groupBy on the quasi columns,
    one tiny rollup; the standard pre-release governance gate."""
    g = df.groupBy(*quasi_cols).agg(F.count("*").alias("__n"))
    return g.agg(
        F.lit(k).alias("k"),
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0)).cast("long").alias("n_violating_groups"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0)).cast("long").alias("n_rows_at_risk"),
        F.min("__n").alias("min_group_size"),
        (F.min("__n") >= k).alias("passed"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity report over a quasi-identifier — the
    governance rung above :func:`k_anonymity_report` (k-anonymity
    alone is defeated by a homogeneous equivalence class: 5
    indistinguishable rows that all share the same diagnosis still
    leak it; Machanavajjhala et al. 2007): every equivalence class
    must carry >= l DISTINCT sensitive values. 1 row (l, n_groups,
    n_violating_groups, n_rows_at_risk, min_distinct_sensitive,
    passed).

    Scale shape: one two-level aggregate (exact countDistinct per
    class via the (class, sensitive) pre-group, then one rollup) — no
    windows, no joins.
    """
    per = (
        df.groupBy(*quasi_cols, F.col(sensitive_col).alias("__sv"))
        .agg(F.count("*").alias("__n"))
        .groupBy(*quasi_cols)
        .agg(F.count("*").alias("__d"), F.sum("__n").alias("__rows"))
    )
    return per.agg(
        F.lit(l).alias("l"),
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("__d") < l, 1).otherwise(0)).cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("__d") < l, F.col("__rows")).otherwise(0))
        .cast("long").alias("n_rows_at_risk"),
        F.min("__d").cast("long").alias("min_distinct_sensitive"),
        (F.min("__d") >= l).alias("passed"),
    )


def laplace_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Laplace-mechanism count release shape: per-group count plus
    Laplace(1/epsilon) noise drawn by inverse CDF from the group's
    portable md5 coordinate: u in (-1/2, 1/2), noise =
    -sign(u) * ln(1 - 2|u|) / epsilon.

    DETERMINISTIC BY DESIGN here (hash-seeded, so the whole release is
    engine-auditable and testable); production DP swaps the coordinate
    for a real RNG — the mechanism, sensitivity (1 per count), and
    noise shape are exactly what it would run. One groupBy; noise is a
    column expression on the group key, no RNG state."""
    from clinpy_spark.operators.sample import sample_hash

    u = (
        F.conv(sample_hash(F.col(group_col).cast("string"), seed), 16, 10)
        .cast("double") / F.lit(float(1 << 32))
    ) - 0.5
    noise = -F.signum(u) * F.log(1.0 - 2.0 * F.abs(u)) / F.lit(float(epsilon))
    return (
        df.groupBy(group_col)
        .agg(F.count("*").alias("true_count"))
        .select(
            group_col,
            "true_count",
            F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
        )
    )


def fd_audit(df: DataFrame, candidates: list[tuple[str, str]]) -> DataFrame:
    """Approximate-functional-dependency audit: for each candidate
    ``lhs -> rhs``, how many lhs groups exist, how many carry more than
    one distinct rhs (violations), and whether the FD holds exactly —
    the schema-discovery/profiling primitive that tells a pipeline
    which columns are safe join/normalization keys.

    One groupBy per candidate (each an independent map-side-combined
    aggregate over two columns; column pruning keeps the scans narrow),
    unioned into (lhs, rhs, n_groups, n_violating, holds). g3-style
    error = n_violating / n_groups is derivable from the output."""
    if not candidates:
        raise ValueError(
            "fd_audit needs at least one (lhs, rhs) candidate pair")
    parts = []
    for lhs, rhs in candidates:
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("__nd"))
        parts.append(
            per.agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.count(F.when(F.col("__nd") > 1, 1)).alias("n_violating"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_groups",
                "n_violating",
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    *,
    count_percentiles: tuple[float, ...] = (0.5, 0.99),
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: one row — (n_rows, n_keys,
    max_n, top1_frac, p50_n, p99_n, gini) — the numbers that decide
    whether a key needs salting BEFORE the join is written (the
    pre-flight twin of skew.py's runtime hot-key probe).

    First pass: per-key counts (map-side combined). Second pass:
    aggregates over the KEY-CARDINALITY-sized count table, including
    the Gini concentration index via one ordered window over that
    table (n_keys rows, not corpus rows; at extreme key cardinality
    pre-bucket counts the same way the KS quantize knob does). Gini 0 =
    uniform keys, -> 1 = one whale key owns the table."""
    from pyspark.sql.window import Window as W

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    ranked = counts.withColumn(
        "__i", F.row_number().over(W.orderBy(F.asc("__n"), *[F.asc(k) for k in key_cols])))
    pcts = [
        F.round(F.percentile(F.col("__n"), F.lit(p)), 6).alias(
            f"p{int(p * 100)}_n")
        for p in count_percentiles
    ]
    return ranked.agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_n"),
        F.round(F.max("__n") / F.sum("__n"), 6).alias("top1_frac"),
        *pcts,
        F.round(
            (2 * F.sum(F.col("__i") * F.col("__n"))
             - (F.count(F.lit(1)) + 1) * F.sum("__n"))
            / (F.count(F.lit(1)) * F.sum("__n")),
            6,
        ).alias("gini"),
    )


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law: 9 rows
    (digit, n, frac, benford_frac, abs_dev) — the classic fabricated /
    truncated-numeric-data audit. The digit is the first [1-9] char of
    the value's string form: any faithful decimal representation —
    plain or scientific, either engine — starts its significant digits
    with the value's true leading digit, so the extraction is portable
    across the FULL double range (r10 advice: the previous
    decimal(18,2) cast rounded 0.095 -> '0.10' -> digit 1, dropped
    |x| < 0.005 entirely, and overflowed past 1e16). Zero/null values
    drop out (Benford is undefined there). One narrow scan + one
    9-group aggregate."""
    digit = F.regexp_extract(F.col(col).cast("string"), "[1-9]", 0)
    per = (
        df.select(digit.alias("__d"))
        .filter(F.col("__d") != "")
        .groupBy("__d").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per.agg(F.sum("n").alias("__t"))
    digit = F.col("__d").cast("int")
    expected = F.log10(1.0 + 1.0 / digit)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            digit.alias("digit"),
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("frac"),
            F.round(expected, 6).alias("benford_frac"),
            F.round(F.abs(F.col("n").cast("double") / F.col("__t")
                          - expected), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    key_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment over a table of per-test
    p-values: input rows + (bh_rank, p_adj, significant) — the
    multiple-testing control layer every screen in this library feeds
    (per-variant chi-squares, per-gene differential expression,
    per-segment drift): without it, 10^6 tests at p < 0.05 hand back
    50k false positives by construction.

    p_adj(i) = min over j >= i of (p_(j) * n / j), clipped to 1, with
    tests ranked by ascending (p, key) — ``key_col`` breaks p ties
    DETERMINISTICALLY so both the rank and the mirrored suffix window
    replay identically in any engine; tied p's still share one p_adj
    (the suffix min of every tie member includes the largest-rank tie
    row, whose raw value is the block minimum). ``significant`` =
    p_adj <= alpha, the step-up rule's rejection set.

    Scale shape: one global rank window + one running-min window over
    the suffix (ordered DESC, unbounded preceding) — both over the
    TEST table (n tests, not the corpus). p_adj is p * n / rank then a
    running MIN of doubles: deterministic in any replay (round-9).
    NULL p rows are dropped (untested hypotheses are not hypotheses).
    """
    base = df.filter(F.col(p_col).isNotNull())
    w_rank = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    w_suffix = Window.orderBy(
        F.col(p_col).desc(), F.col(key_col).desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n = Window.partitionBy()
    ranked = base.withColumn("bh_rank", F.row_number().over(w_rank)) \
        .withColumn("__n", F.count(F.lit(1)).over(n))
    raw = F.col(p_col) * F.col("__n").cast("double") / F.col("bh_rank")
    out = ranked.withColumn(
        "p_adj",
        F.round(F.least(F.min(raw).over(w_suffix), F.lit(1.0)), 9),
    )
    return out.withColumn(
        "significant", F.col("p_adj") <= F.lit(float(alpha))
    ).drop("__n")


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_mads: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier gate by median absolute deviation:
    (group, n, med, mad, n_outliers, outlier_frac) — the
    monitoring-grade anomaly count that survives the heavy tails that
    wreck mean/stddev z-scores (``skew_report``'s companion: it tells
    you WHICH partition's values went wrong, not just that the key
    distribution did).

    med = interpolated within-group median, mad = median(|x - med|),
    outlier: |x - med| > n_mads * 1.4826 * mad (the Gaussian-
    consistent scale factor). Groups with mad = 0 report outliers
    against the degenerate band (any x != med counts when mad is 0 and
    n_mads * 0 = 0 — i.e. strict inequality keeps exact-median rows
    in-band).

    Scale shape: two grouped percentile aggregates (Spark's exact
    interpolated ``percentile``, the same convention DuckDB's
    quantile_cont replays) with one broadcast-or-hash join of the
    bounded per-group median table between them — the corpus streams
    twice, no window, no sort of the full data.
    """
    g = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    med = g.groupBy("__g").agg(
        F.expr("percentile(__v, 0.5)").alias("med"))
    dev = g.join(med, "__g").withColumn(
        "__ad", F.abs(F.col("__v") - F.col("med")))
    out = dev.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("med").alias("med"),
        F.expr("percentile(__ad, 0.5)").alias("mad"),
    )
    flagged = (
        dev.join(
            out.select("__g", F.col("mad").alias("__mad")), "__g")
        .groupBy("__g")
        .agg(
            F.sum(
                F.when(
                    F.col("__ad") > F.lit(float(n_mads)) * 1.4826
                    * F.col("__mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers")
        )
    )
    return (
        out.join(flagged, "__g")
        .select(
            F.col("__g").alias(group_col),
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6)
            .alias("outlier_frac"),
        )
    )


def ols_inference(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    decimal_scale: int | None = None,
) -> DataFrame:
    """Per-group simple-regression INFERENCE: (group, n, slope,
    intercept, se_slope, t_slope, r2) — ``group_trends`` plus the
    standard error, t statistic, and fit quality a monitoring decision
    actually needs (is this drift SLOPE distinguishable from noise?).

    Closed form from sufficient statistics: with centered moments
    Sxx = sxx - sx^2/n (etc.), slope = Sxy/Sxx, residual variance
    sigma2 = (Syy - slope*Sxy)/(n-2), se = sqrt(sigma2/Sxx),
    t = slope/se, r2 = Sxy^2/(Sxx*Syy). NULL inference for n < 3 or
    degenerate variance.

    ``decimal_scale``: when the inputs carry at most ``decimal_scale/2``
    fractional digits (money, integer counts), pass the scale to route
    every moment through DECIMAL(28, scale) sums — EXACT regardless of
    summation order, so a SQL oracle matches bit-for-bit (the ``dsum``
    rationale). Default double sums are fine for round-6 ratios.

    Scale shape: one groupBy over six conditional moments — single
    shuffle on the group key, no window, no join.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")

    def msum(expr):
        if decimal_scale is None:
            return F.sum(expr)
        return F.sum(expr.cast(f"decimal(28,{decimal_scale})")).cast("double")

    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        msum(x).alias("sx"),
        msum(y).alias("sy"),
        msum(x * x).alias("sxx"),
        msum(y * y).alias("syy"),
        msum(x * y).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / nn
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / nn
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / nn
    slope = cxy / cxx
    sigma2 = (cyy - slope * cxy) / (nn - 2)
    ok = (F.col("n") >= 3) & (cxx > 0)
    se = F.sqrt(sigma2 / cxx)
    return g.select(
        group_col,
        "n",
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round((F.col("sy") - slope * F.col("sx")) / nn, 6))
        .alias("intercept"),
        F.when(ok & (sigma2 > 0), F.round(se, 6)).alias("se_slope"),
        F.when(ok & (sigma2 > 0), F.round(slope / se, 6)).alias("t_slope"),
        F.when(ok & (cyy > 0), F.round(cxy * cxy / (cxx * cyy), 6))
        .alias("r2"),
    )
