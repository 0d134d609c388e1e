"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Runs the representative query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is timed
end-to-end (plan build + execution to a driver-side count) after a
shared session warm-up, so the number reflects engine throughput, not
JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clinpy_spark import queries as Q  # noqa: E402
from clinpy_spark.session import get_spark  # noqa: E402

#: Queries that define the headline number: the TPC-H classics, every
#: join/window family with a scale story, and the training-data ops.
HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "flagship_cohort_revenue",
    "j6_anti_new_parts",
    "j10_interval_binned",
    "j12_band_pairs",
    "a6_pivot_wide",
    "o1_topk_per_group",
    "o2_running_total",
    "e_sessionize",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_langid",
]

#: Second tier: queries NOT in the headline set whose regressions
#: should be caught numerically, not only by plan audit. Timed with one
#: cold + one warm run (cheaper than the headline's best-of-3) and
#: reported in a separate "tier2" dict — they do NOT move the headline
#: metric, so round-over-round comparability of `value` is preserved.
TIER2 = [
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q21_exclusive",
    "j17_fuzzy_pairs",
    "j18_fuzzy_join",
    "e_sessionize_bucketed",
    "sim_topk_ivfpq",
    "text_bm25",
    "mm_extract_features",
    # round-9 flagships: exact similarity join, cross-corpus fuzzy
    # decontamination, and the end-to-end curation funnel
    "dedup_ppjoin_pairs",
    "text_fuzzy_decontaminate",
    "pipeline_curation_stats",
    # round-10 flagships: segmented drift monitoring, entity
    # resolution, and the mutual-kNN graph
    "drift_psi_by_type",
    "er_resolve_parts",
    "sim_knn_graph",
    # round-10 clinical/graph flagships: the banded LD pair join and
    # the 5-step unrolled PageRank (heaviest of the new family)
    "gx_ld_r2",
    "graph_pagerank",
    # round-11 flagships: the variant-keyed kinship pair join (heaviest
    # of the new genetics family) and the thermometer-Hamming code scan
    "gx_king_kinship",
    "sim_topk_hamming",
    # round-11 session-3 flagships: the 4-step IRLS logistic fit (grid
    # construction dominates), the DSIR importance-selection head (two
    # corpus token passes), and the stratum-partitioned Cox MLE
    "dx_logistic",
    "curate_dsir_head",
    "surv_cox_strat",
    # round-12 flagships: the multi-covariate Cox (cell-grid windows +
    # per-step driver solves), the two-stage NB2 chain (heaviest of the
    # new GLM family), and the containment keep-longest dedup action
    # (pair generation + anti-join)
    "surv_cox_multi",
    "dx_negbin",
    "dedup_containment_apply",
    # round-13 flagships: Harrell's C over the dense (time x band)
    # dominance grid and the Fine-Gray subdistribution MLE (IPCW
    # weight recurrence + per-step driver solves)
    "surv_cindex",
    "surv_finegray_beta",
]


def _warm(spark) -> None:
    """Untimed post-(re)start warmup: one trivial action for JVM/codegen
    paths plus one trivial mapInPandas so every core's Python worker is
    up with numpy/pandas imported. Without this, the first Arrow-batched
    query after a JVM restart absorbs ~32 worker cold-starts into its
    single timed run (dedup_simhash_pairs read 7.7s in-tier vs 1.9s
    standalone-warm) — worker startup is session plumbing, not query
    cost, exactly like the JVM warmup action next to it."""
    spark.range(1).count()

    def _imp(batches):
        import numpy  # noqa: F401
        import pandas as pd
        for b in batches:
            yield pd.DataFrame({"v": [1]})

    spark.range(64, numPartitions=64).mapInPandas(_imp, "v long").count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("clinpy-spark-bench")
    qs = Q.queries()

    # Warm up the JVM / parquet footer caches with a trivial action.
    _warm(spark)

    # Four runs per query: run 1 pays Catalyst analysis + whole-stage
    # codegen JIT (a fixed per-plan cost, noise at real data scale);
    # headline = min of the three steady-state runs. Best-of-3 rather
    # than best-of-2 because the host is a shared VM: single warm runs
    # have been observed 2-4x slower under neighbor noise, and the min
    # of three is a much better estimator of true engine throughput.
    # Cold timings are reported for transparency.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        runs = []
        for run in range(4):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()  # full execution; result stays distributed
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        timings[name] = min(runs[1:])
        print(f"# {name}: {timings[name]}s warm / {cold[name]}s cold ({n} rows)", file=sys.stderr)

    # Fresh JVM per tier (r11 verdict #2): the r11 sidecar still showed
    # 3-10x in-session inflation on late ANN/dedup queries even after
    # the r10 GC hygiene (text_fuzzy_decontaminate 23.8s in-session vs
    # 6.1s standalone) — accumulated driver-pinned checkpoint blocks
    # and codegen-cache pressure from the 15 headline queries x 4 runs
    # leak into tier2's single warm run. A ~5s restart buys numbers
    # comparable to standalone steady state.
    spark.catalog.clearCache()
    spark.stop()
    spark = get_spark("clinpy-spark-bench-tier2")
    _warm(spark)

    tier2: dict[str, float] = {}
    for idx, name in enumerate(TIER2):
        # Mid-tier restart (measurement hygiene, same rationale as the
        # tier3 policy below): tier2 is the heaviest query list and a
        # single session across all ~31 of them showed 5-20x in-session
        # inflation on late members (er_resolve_parts 36.4s in-tier vs
        # 1.5s standalone-warm in this round's baseline sidecar —
        # accumulated driver-pinned localCheckpoint blocks + codegen
        # cache). A fresh JVM every 10 queries keeps every tier2 number
        # within ~1.5x of standalone steady state; restart time is
        # never attributed to any query's timing.
        if idx and idx % 10 == 0:
            spark.catalog.clearCache()
            spark.stop()
            spark = get_spark(f"clinpy-spark-bench-tier2-{idx // 10}")
            _warm(spark)
        runs = []
        for run in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
        tier2[name] = runs[1]  # warm run
        print(f"# tier2 {name}: {tier2[name]}s warm / {runs[0]}s cold ({n} rows)",
              file=sys.stderr)

    # Tier 3: EVERY remaining registry query, one timed run each — the
    # whole-surface regression net (r6 verdict #8). One run, not
    # best-of-N: the goal is "did anything go pathological anywhere",
    # and a single run per query keeps the sweep to ~2 min; headline and
    # tier2 carry the noise-controlled numbers.
    #
    # Fresh session for the sweep (r10 verdict #7): ~170 queries of
    # accumulated JVM state in one session (codegen cache, broadcast
    # cleanup backlog, checkpointed RDDs the driver still pins) showed
    # 5-25x in-session outliers vs idle standalone runs of the same
    # query. Restarting costs ~5s once and makes tier3 numbers
    # comparable to standalone steady state.
    spark.catalog.clearCache()
    spark.stop()
    spark = get_spark("clinpy-spark-bench-tier3")
    _warm(spark)
    tier3: dict[str, float] = {}
    covered = set(HEADLINE) | set(TIER2)
    done = 0
    prev_name = ""
    since_restart = 0
    n_restarts = 0
    for name in qs:
        if name in covered:
            continue
        # r12 verdict #4: the dedup_*/sim_* family (ANN/near-dup — the
        # queries most sensitive to accumulated codegen-cache and
        # pinned-block state; dedup_containment recorded 47.3s in the
        # r12 sidecar vs 2.24s standalone-warm) is SCATTERED through
        # the registry, so a fixed block boundary can leave a member
        # ~59 queries deep into a session. Restart the JVM when
        # ENTERING the family with meaningful session state built up,
        # so every family block starts near standalone steady state.
        # Restart time is never attributed to a query's timing.
        fam = name.startswith(("dedup_", "sim_"))
        if fam and since_restart >= 15 and not prev_name.startswith(
                ("dedup_", "sim_")):
            since_restart = 0
            n_restarts += 1
            spark.catalog.clearCache()
            spark.stop()
            spark = get_spark(f"clinpy-spark-bench-tier3-fam{n_restarts}")
            _warm(spark)
        # Periodic cleanup inside the sweep: accumulated state from the
        # preceding queries (driver-pinned localCheckpoint blocks,
        # broadcast/shuffle cleanup backlog — the ContextCleaner only
        # acts on driver GC) measurably degrades the late GEMM-heavy
        # queries (sim_topk_pq observed 29s at position ~150 vs 1.7s
        # steady-state standalone). A driver GC every 25 queries lets
        # the cleaner release executor-side blocks between timings, and
        # a FULL JVM restart every 30 (r11 verdict #2 found 60-blocks
        # insufficient for mid-block members — r12 verdict #4 cut the
        # block in half) resets codegen caches and pinned blocks
        # outright; the ~5s restart is not attributed to any query's
        # timing.
        if since_restart >= 30:
            since_restart = 0
            n_restarts += 1
            spark.catalog.clearCache()
            spark.stop()
            spark = get_spark(f"clinpy-spark-bench-tier3-{n_restarts}")
            _warm(spark)
        elif done and done % 25 == 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        tier3[name] = round(time.time() - t0, 3)
        done += 1
        since_restart += 1
        prev_name = name
        print(f"# tier3 {name}: {tier3[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Full per-query detail goes to a sidecar file: the r7 bench artifact
    # came back unparseable because the single stdout line grew past the
    # driver's tail capture once tier3 swept the whole 111-query registry.
    # The final stdout line stays compact (headline + totals) so the
    # driver can always parse it; BENCH_DETAIL.json carries the rest.
    detail = {
        "queries_cold": cold,
        "tier2": tier2,
        "tier3": tier3,
        "runs_per_query": 4,
        "timing": "best of 3 steady-state runs; cold (1st) run in queries_cold",
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
    except OSError as exc:  # read-only checkout: detail is best-effort
        print(f"# could not write {detail_path}: {exc}", file=sys.stderr)
    print(json.dumps({
        "metric": "headline_query_set_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "tier2_total": round(sum(tier2.values()), 3),
        "tier3_total": round(sum(tier3.values()), 3),
        "tier3_count": len(tier3),
        "detail": "BENCH_DETAIL.json",
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
