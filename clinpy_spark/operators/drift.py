"""Distribution-drift detection between two corpus snapshots — the
monitoring stage a 100 TB training-data pipeline runs before accepting
a new crawl/batch into the mixture: has the numeric metric distribution
moved (PSI, KS), has the categorical mix moved (chi-square)?

All three statistics are computed EXACTLY and deterministically so an
external SQL oracle can recompute them bit-for-bit (after the repo-wide
round-6 convention for transcendental-touched doubles):

- ``psi_table``: Population Stability Index over quantile bins of the
  REFERENCE side (the standard credit-scoring monitoring statistic).
  Bin edges are exact interpolated percentiles; fractions are
  Laplace-smoothed by +0.5 per bin so empty bins stay finite and the
  formula stays engine-portable (no epsilon clamps).
- ``ks_two_sample``: exact two-sample Kolmogorov-Smirnov D —
  max |ECDF_a - ECDF_b| over the pooled distinct values.
- ``chi2_drift``: Pearson chi-square over a (side x category)
  contingency table.

Scale shape: PSI is two aggregation passes (one percentile agg on the
reference — a single ~10-double row broadcast back — and one per-bin
count per side); nothing is collected to the driver. KS aggregates to
per-distinct-value counts FIRST, so the ordered cumulative window runs
over |distinct values| rows, not the corpus; for an unbounded-domain
metric at 100 TB pass ``quantize`` to round values first (the standard
KS-on-binned-data compromise, stated in the output). Chi-square is one
groupBy over (side, category) plus broadcast joins of the two marginal
totals. Every join here is a broadcast of a tiny aggregate row —
no large-large shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quantile_edges(ref: DataFrame, col: str, n_bins: int) -> DataFrame:
    """1-row DataFrame with ``__edges``: the exact interpolated
    (i/n_bins)-percentiles of ``ref.col`` for i in 1..n_bins-1."""
    return ref.agg(
        F.percentile(
            F.col(col), F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
        ).alias("__edges")
    )


def bin_by_edges(df: DataFrame, col: str, edges: DataFrame) -> DataFrame:
    """Add ``__bin`` — the number of edges strictly below ``col``
    (ties land in the lower bin), via a broadcast of the 1-row edge
    array; no per-row join key, no shuffle."""
    return df.crossJoin(F.broadcast(edges)).withColumn(
        "__bin",
        F.aggregate(
            "__edges",
            F.lit(0),
            lambda acc, e: acc + F.when(F.col(col) > e, 1).otherwise(0),
        ),
    )


def psi_table(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI detail: (bin, ref_n, cur_n, ref_frac, cur_frac,
    psi_contrib), one row per reference-decile bin, ordered by bin.
    Total PSI = sum(psi_contrib); > 0.25 is the conventional
    "significant shift" flag. Fractions and contributions are rounded
    to 6 decimals (repo convention for ln-touched doubles)."""
    edges = quantile_edges(ref, col, n_bins)
    sides = []
    for tag, df in (("ref", ref), ("cur", cur)):
        sides.append(
            bin_by_edges(df.select(F.col(col)), col, edges)
            .groupBy("__bin")
            .agg(F.count(F.lit(1)).alias(f"{tag}_n"))
        )
    spine = ref.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("__bin"))
    joined = (
        spine.join(F.broadcast(sides[0]), "__bin", "left")
        .join(F.broadcast(sides[1]), "__bin", "left")
        .na.fill({"ref_n": 0, "cur_n": 0})
    )
    tot = joined.agg(
        F.sum("ref_n").alias("__tr"), F.sum("cur_n").alias("__tc"))
    out = joined.crossJoin(F.broadcast(tot))
    rf = (F.col("ref_n") + 0.5) / (F.col("__tr") + 0.5 * n_bins)
    cf = (F.col("cur_n") + 0.5) / (F.col("__tc") + 0.5 * n_bins)
    return (
        out.select(
            F.col("__bin").alias("bin"),
            "ref_n",
            "cur_n",
            F.round(rf, 6).alias("ref_frac"),
            F.round(cf, 6).alias("cur_frac"),
            F.round((cf - rf) * F.log(cf / rf), 6).alias("psi_contrib"),
        )
        .orderBy("bin")
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    col: str,
    quantize: int | None = None,
) -> DataFrame:
    """Exact two-sample KS statistic: 1 row (ks_d, n_a, n_b).

    ``quantize`` rounds values to that many decimals first — the scale
    path when the metric's distinct-value count is unbounded (KS over
    the quantized values is the exact KS of the rounded distribution).
    The cumulative window runs over the per-distinct-value aggregate,
    not the raw rows."""
    val = F.round(F.col(col), quantize) if quantize is not None else F.col(col)
    tagged = a.select(val.alias("__v"), F.lit(1).alias("__ca"), F.lit(0).alias("__cb")).unionAll(
        b.select(val.alias("__v"), F.lit(0).alias("__ca"), F.lit(1).alias("__cb"))
    )
    per_val = tagged.groupBy("__v").agg(
        F.sum("__ca").alias("na"), F.sum("__cb").alias("nb"))
    return ks_from_value_counts(per_val)


def ks_from_value_counts(per_val: DataFrame) -> DataFrame:
    """KS statistic from an already-aggregated per-distinct-value count
    table (__v, na, nb) — the entry point for incrementally-maintained
    samples: per-value counts are ADDITIVE, so a streaming fold keeps
    (__v, n) per side and this computes the exact current D
    (streaming/drift.py stream_ks_counts)."""
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_val.agg(F.sum("na").alias("__ta"), F.sum("nb").alias("__tb"))
    cum = (
        per_val.withColumn("__cuma", F.sum("na").over(w))
        .withColumn("__cumb", F.sum("nb").over(w))
        .crossJoin(F.broadcast(tot))
    )
    d = F.abs(
        F.col("__cuma").cast("double") / F.col("__ta")
        - F.col("__cumb").cast("double") / F.col("__tb")
    )
    return cum.agg(
        F.round(F.max(d), 6).alias("ks_d"),
        F.max("__ta").alias("n_a"),
        F.max("__tb").alias("n_b"),
    )


def chi2_drift(
    df: DataFrame,
    side_col: str,
    cat_col: str,
) -> DataFrame:
    """Pearson chi-square of the (side x category) contingency table:
    1 row (chi2, dof, n). Null sides/categories are their own level
    (coalesced to '␀')."""
    base = df.select(
        F.coalesce(F.col(side_col).cast("string"), F.lit("␀")).alias("__s"),
        F.coalesce(F.col(cat_col).cast("string"), F.lit("␀")).alias("__c"),
    )
    cells = base.groupBy("__s", "__c").agg(F.count(F.lit(1)).alias("o"))
    row_tot = cells.groupBy("__s").agg(F.sum("o").alias("rt"))
    col_tot = cells.groupBy("__c").agg(F.sum("o").alias("ct"))
    n = cells.agg(F.sum("o").alias("nn"))
    # The |sides| x |categories| spine rides two 1-row collect_list
    # aggregates that explode AFTER the cross join, so both join inputs
    # are provably constant-row in the physical plan (shape-level
    # audit) — same result as crossJoining the keyed margin tables, but
    # the pair blowup is structurally impossible. Margins are small by
    # the contingency-table contract (categorical drift).
    row_1 = row_tot.agg(
        F.collect_list(F.struct("__s", "rt")).alias("__rows"))
    col_1 = col_tot.agg(
        F.collect_list(F.struct("__c", "ct")).alias("__cols"))
    spine = (
        row_1.crossJoin(col_1)
        .select(F.explode("__rows").alias("__r"), "__cols")
        .select("__r", F.explode("__cols").alias("__k"))
        .select(
            F.col("__r.__s").alias("__s"), F.col("__r.rt").alias("rt"),
            F.col("__k.__c").alias("__c"), F.col("__k.ct").alias("ct"),
        )
    )
    full = (
        spine.join(cells, ["__s", "__c"], "left")
        .na.fill({"o": 0})
        .crossJoin(F.broadcast(n))
    )
    e = F.col("rt") * F.col("ct") / F.col("nn")
    chi = F.sum((F.col("o") - e) * (F.col("o") - e) / e)
    return full.agg(
        F.round(chi, 6).alias("chi2"),
        ((F.countDistinct("__s") - 1) * (F.countDistinct("__c") - 1))
        .cast("int").alias("dof"),
        F.max("nn").alias("n"),
    )


def psi_by_group(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    group_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group PSI in ONE pass over each cohort: (group, psi, ref_n,
    cur_n), one row per group present in the reference — drift of every
    segment (language, source, event type) monitored together instead
    of one query per segment.

    Relational throughout: per-group decile edges come from a grouped
    percentile aggregate (one row of ~10 doubles per group), rejoined
    by group key — no driver collect, no cross join, so 10k segments
    cost the same plan as one. Groups absent from a cohort contribute
    smoothed-zero bins exactly like the ungrouped ``psi_table``."""
    edges = ref.groupBy(F.col(group_col).alias("__g")).agg(
        F.percentile(
            F.col(col), F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
        ).alias("__edges")
    )

    def binned(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(F.col(group_col).alias("__g"), F.col(col).alias("__v"))
            .join(edges, "__g")
            .withColumn(
                "__bin",
                F.aggregate(
                    "__edges",
                    F.lit(0),
                    lambda acc, e: acc + F.when(F.col("__v") > e, 1).otherwise(0),
                ),
            )
            .groupBy("__g", "__bin")
            .agg(F.count(F.lit(1)).alias(f"{tag}_n"))
        )

    rb, cb = binned(ref, "ref"), binned(cur, "cur")
    spine = edges.select(
        "__g", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("__bin"))
    per_bin = (
        spine.join(rb, ["__g", "__bin"], "left")
        .join(cb, ["__g", "__bin"], "left")
        .na.fill({"ref_n": 0, "cur_n": 0})
    )
    w = Window.partitionBy("__g")
    per_bin = per_bin.withColumn("__tr", F.sum("ref_n").over(w)) \
                     .withColumn("__tc", F.sum("cur_n").over(w))
    rf = (F.col("ref_n") + 0.5) / (F.col("__tr") + 0.5 * n_bins)
    cf = (F.col("cur_n") + 0.5) / (F.col("__tc") + 0.5 * n_bins)
    return (
        per_bin.withColumn("__contrib", (cf - rf) * F.log(cf / rf))
        .groupBy(F.col("__g").alias(group_col))
        .agg(
            F.round(F.sum("__contrib"), 6).alias("psi"),
            F.max("__tr").alias("ref_n"),
            F.max("__tc").alias("cur_n"),
        )
    )


def js_divergence(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Jensen-Shannon divergence between the reference and current
    distributions of ``col`` over the reference's quantile bins: 1 row
    (jsd, ref_n, cur_n, n_bins). JSD = 0.5*KL(p||m) + 0.5*KL(q||m)
    with m = (p+q)/2, natural log, so 0 <= jsd <= ln(2); symmetric and
    bounded where PSI is neither — the drift score you can threshold
    without caring which snapshot is "reference". Fractions are
    Laplace-smoothed +0.5 per bin (same convention as ``psi_table``)
    so empty bins stay finite; jsd is rounded to 6 (ln convention).

    Scale shape: identical to PSI — one percentile aggregate on the
    reference broadcast back as a ~10-double row, one per-bin count
    per side, and the divergence folds over the n_bins-row spine.
    No large-large join, nothing collected.
    """
    edges = quantile_edges(ref, col, n_bins)
    sides = []
    for tag, df in (("ref", ref), ("cur", cur)):
        sides.append(
            bin_by_edges(df.select(F.col(col)), col, edges)
            .groupBy("__bin")
            .agg(F.count(F.lit(1)).alias(f"{tag}_n"))
        )
    spine = ref.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("__bin"))
    joined = (
        spine.join(F.broadcast(sides[0]), "__bin", "left")
        .join(F.broadcast(sides[1]), "__bin", "left")
        .na.fill({"ref_n": 0, "cur_n": 0})
    )
    tot = joined.agg(
        F.sum("ref_n").alias("__tr"), F.sum("cur_n").alias("__tc"))
    out = joined.crossJoin(F.broadcast(tot))
    p = (F.col("ref_n") + 0.5) / (F.col("__tr") + 0.5 * n_bins)
    q_ = (F.col("cur_n") + 0.5) / (F.col("__tc") + 0.5 * n_bins)
    m = (p + q_) / 2
    contrib = 0.5 * p * F.log(p / m) + 0.5 * q_ * F.log(q_ / m)
    return out.agg(
        F.round(F.sum(contrib), 6).alias("jsd"),
        F.max("__tr").alias("ref_n"),
        F.max("__tc").alias("cur_n"),
        F.lit(n_bins).alias("n_bins"),
    )


def wasserstein_binned(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between the two empirical
    distributions of ``col``, computed exactly on the pooled
    quantile-binned representatives: 1 row (w1, ks_d, ref_n, cur_n).

    Bins come from the POOLED distribution's quantile edges (so both
    sides are represented); each occupied bin's representative value
    is its pooled MINIMUM — an exact order statistic, so no float
    summation whose rounding could differ across engines enters the
    positions. W1 = sum over the ordered occupied bins of
    |CDF_ref - CDF_cur| * (x_{i+1} - x_i) — the standard
    quantile-binned estimator, exact for the binned distributions.
    ks_d (max CDF gap over the same grid) rides along for free because
    the same cumulative window produces it. Values rounded to 6.

    Scale shape: one percentile agg on the pooled side (broadcast
    1-row edge array), one per-bin count+min pass over the tagged
    union, then the cumulative window runs over the <= n_bins-row
    grid — never the corpus.
    """
    tagged = ref.select(
        F.col(col).alias("__v"), F.lit(1).alias("__ir")
    ).unionAll(
        cur.select(F.col(col).alias("__v"), F.lit(0).alias("__ir")))
    edges = quantile_edges(tagged, "__v", n_bins)
    per_bin = (
        bin_by_edges(tagged, "__v", edges)
        .groupBy("__bin")
        .agg(
            F.sum("__ir").alias("ref_n"),
            F.sum(1 - F.col("__ir")).alias("cur_n"),
            F.min("__v").alias("__x"),
        )
    )
    tot = per_bin.agg(
        F.sum("ref_n").alias("__tr"), F.sum("cur_n").alias("__tc"))
    # Empty bins never appear in the groupBy output, so the lead()
    # width below is always the step to the next OCCUPIED bin.
    out = per_bin.crossJoin(F.broadcast(tot))
    w_cum = Window.orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_next = Window.orderBy("__bin")
    out = (
        out.withColumn("__cr", F.sum("ref_n").over(w_cum) / F.col("__tr"))
        .withColumn("__cc", F.sum("cur_n").over(w_cum) / F.col("__tc"))
        .withColumn("__xn", F.lead(F.col("__x"), 1).over(w_next))
    )
    gap = F.abs(F.col("__cr") - F.col("__cc"))
    # Step width to the next occupied bin's representative; the last
    # bin (where both CDFs have reached 1 so the gap is 0 anyway)
    # contributes nothing.
    width = F.coalesce(F.col("__xn") - F.col("__x"), F.lit(0.0))
    return out.agg(
        F.round(F.sum(gap * width), 6).alias("w1"),
        F.round(F.max(gap), 6).alias("ks_d"),
        F.max("__tr").alias("ref_n"),
        F.max("__tc").alias("cur_n"),
    )


def anderson_darling_2sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample Anderson-Darling test (Scholz-Stephens 1987,
    tie-adjusted A2akN form): 1 row (a2, n_a, n_b, n_values) — the
    drift monitor that weights the distribution TAILS the KS statistic
    underweights (KS sees only the single largest ECDF gap; AD
    integrates the squared gap with 1/(F(1-F)) tail emphasis — the
    right sensitivity for latency/price corruption that shows up as
    tail mass).

    Midpoint-corrected pooled ranks handle ties exactly:
    B_j = cumpooled_j - l_j/2, M_ij = cumsample_ij - l_ij/2,
    A2 = (N-1)/N * sum_i (1/n_i) sum_j (l_j/N) (N M_ij - n_i B_j)^2
         / (B_j (N - B_j) - N l_j / 4).
    NULL when every value is tied (denominator vanishes everywhere).

    Scale shape: the same per-distinct-value aggregate + ordered
    cumulative window as ``ks_from_value_counts`` / ``mann_whitney_u``
    — one narrow shuffle over |distinct values| rows, one 1-row
    reduce; every B/M is a half-integer (exact), only the final
    normalized sum rounds (6 dp).
    """
    is_a = F.col(group_col) == F.lit(group_a)
    is_b = F.col(group_col) == F.lit(group_b)
    per_val = (
        df.filter(is_a | is_b)
        .select(
            F.col(value_col).alias("__v"),
            F.when(is_a, 1).otherwise(0).alias("__ia"),
        )
        .groupBy("__v")
        .agg(
            F.sum("__ia").alias("la"),
            F.sum(1 - F.col("__ia")).alias("lb"),
        )
    )
    return ad_from_value_counts(per_val)


def ad_from_value_counts(per_val: DataFrame) -> DataFrame:
    """Anderson-Darling A2akN from an already-aggregated per-distinct-
    value count table (__v, la, lb) — the entry point for
    incrementally-maintained samples, mirroring
    :func:`ks_from_value_counts`: per-value counts are ADDITIVE, so
    the streaming KS fold's state serves the AD readout too
    (streaming/drift.py finalize_ad)."""
    w_cum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    l = (F.col("la") + F.col("lb")).cast("double")
    g = (
        per_val
        .withColumn("__cl", F.sum(F.col("la") + F.col("lb")).over(w_cum)
                    .cast("double"))
        .withColumn("__ca", F.sum("la").over(w_cum).cast("double"))
        .withColumn("__cb", F.sum("lb").over(w_cum).cast("double"))
        .withColumn("__na", F.sum("la").over(w_all).cast("double"))
        .withColumn("__nb", F.sum("lb").over(w_all).cast("double"))
    )
    nn = F.col("__na") + F.col("__nb")
    bj = F.col("__cl") - l / 2
    ma = F.col("__ca") - F.col("la").cast("double") / 2
    mb = F.col("__cb") - F.col("lb").cast("double") / 2
    den = bj * (nn - bj) - nn * l / 4
    ta = (l / nn) * (nn * ma - F.col("__na") * bj)\
        * (nn * ma - F.col("__na") * bj) / den
    tb = (l / nn) * (nn * mb - F.col("__nb") * bj)\
        * (nn * mb - F.col("__nb") * bj) / den
    agg = g.agg(
        F.sum(F.when(den > 0, ta).otherwise(0.0)).alias("__sa"),
        F.sum(F.when(den > 0, tb).otherwise(0.0)).alias("__sb"),
        F.sum(F.when(den > 0, 1).otherwise(0)).alias("__nv_ok"),
        F.max("__na").alias("__na"),
        F.max("__nb").alias("__nb"),
        F.count(F.lit(1)).alias("n_values"),
    )
    nn2 = F.col("__na") + F.col("__nb")
    a2 = (nn2 - 1) / nn2 * (
        F.col("__sa") / F.col("__na") + F.col("__sb") / F.col("__nb"))
    return agg.select(
        F.when(
            (F.col("__nv_ok") > 0) & (F.col("__na") > 0)
            & (F.col("__nb") > 0),
            F.round(a2, 6),
        ).alias("a2"),
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        "n_values",
    )
