#!/usr/bin/env python
"""Benchmark harness: run every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query executes end-to-end into the ``noop`` sink — the full plan
(scans, shuffles, joins, aggregates) runs; only the terminal
collect/write is elided, so timings reflect engine work, not driver
materialization.

Isolation: every query runs in its OWN subprocess (fresh JVM), after a
warm-up pass at ``$SPARK_GRAFT_WARM_DIR`` (default sf0.001) that JIT-
compiles the generated whole-stage-codegen classes on cheap data.
Sharing one JVM across many distinct queries backlogs the C2 compile
queue so badly that later stages run interpreted for their entire
duration — measured 3.6s → 119s on an identical window query depending
solely on its position in the sequence. Per-query JVMs give stable,
position-independent timings (the driver compares totals round-over-
round, so run-to-run stability matters more than shared-JVM wall-clock).

Parallelism: ``$SPARK_GRAFT_BENCH_WORKERS`` (default 4) children run
at once, each on ``local[total_cpus / workers]`` — the pool always
sums to the machine, so per-query numbers stay comparable run-to-run
while wall-clock amortizes the ~15s JVM+warm-up cost per child
(serial, 100+ queries × ~20s overhead alone would blow the driver's
bench budget).

Serial section: after the pool drains, the 12 ``SERIAL_SET`` headline
queries plus the 6 ``SERIAL_SET_EXT`` expensive iterative queries
re-run one-at-a-time on all CPUs, median-of-3 — the low-variance
protocol for round-over-round attribution (the parallel cohort's
noise band has exceeded its deltas two rounds running).
``serial_total`` sums only the original 12 (comparable to r6–r8);
``serial_ext_total`` sums the extension.
``SPARK_GRAFT_BENCH_SERIAL=0`` skips it; ``_SERIAL_ONLY=1`` runs just
that section (the quick A/B tool).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor


# Frozen comparison cohort: the 114 queries registered as of mid-round-2
# (commit 06af0af). `cohort_total` sums ONLY these, so round-over-round
# bench comparisons aren't distorted by registry growth (the full total
# keeps rising as queries are added; the cohort is apples-to-apples).
FROZEN_COHORT = frozenset([
    "above_avg_balance_customers", "ann_ivf_kmeans_topk", "ann_ivf_topk",
    "ann_lsh_topk", "ann_recall_at_k", "anti_customers_without_orders",
    "approx_distinct_parts", "array_hof_gallery", "asof_latest_order",
    "asof_latest_order_fresh", "binary_featurize", "canonical_doc_per_cluster",
    "common_shingle_fraction", "contamination_overlap", "cooccurrence_triangles",
    "cosine_topk_bruteforce", "cube_flag_status", "dedup_cluster_assign",
    "dedup_exact", "dirty_numeric_clean", "discount_quantity_corr_by_flag",
    "distinct_parts_per_supplier", "doc_chunks", "doc_fingerprint", "doc_repetition_ratio",
    "embedding_near_dup_pairs", "event_sessions_gap30", "events_funnel_view_purchase",
    "events_gap_fill_hourly", "events_session", "events_sliding", "events_tumbling",
    "events_weekly_retention", "filtered_aggs_by_nation", "flagship_daily_segment_ledger",
    "frame_sample_media", "full_outer_daily_activity", "fuzzy_part_name_pairs",
    "grouping_sets_flag_priority", "hash_split_documents", "json_extract_props",
    "kmeans_embeddings", "lag_qty_delta", "lang_id_detect", "latest_event_per_user",
    "lookup_passthrough_default", "media_metadata", "median_price_by_priority",
    "merge_update_orders", "minhash_lsh_near_dup", "minmax_by_customer",
    "near_dup_jaccard", "numeric_conditional_gallery", "order_price_distribution",
    "pack_documents_into_bins", "part_cooccurrence_lift", "pivot_returnflag_qty",
    "posexplode_doc_tokens", "price_histogram", "price_stats_by_priority",
    "priority_runs_per_customer", "purchase_attribution", "q10_returned_item_customers",
    "q11_important_parts", "q12_priority_by_returnflag", "q13_order_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_parts_supplier_cnt",
    "q17_small_qty_revenue", "q18_large_volume_orders", "q19_bracket_revenue",
    "q1_pricing_summary", "q20_dominant_shippers", "q21_waiting_suppliers",
    "q22_idle_rich_customers", "q2_min_cost_supplier", "q3_top_open_orders",
    "q4_late_ship_orders", "q5_regional_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit", "quantile_profile_by_priority",
    "range_join_value_tiers", "regexp_string_gallery", "resize_normalize_media",
    "rollup_returnflag_status", "salted_agg_by_returnflag", "salted_join_returnflag",
    "scalar_function_gallery", "segments_per_nation", "semi_customers_with_urgent_orders",
    "setop_churned_customers", "setop_repeat_customers", "simhash_fingerprint",
    "sql_api_priority_share", "stratified_sample_customers", "surname_extract",
    "text_quality", "tfidf_top_terms", "time_weighted_value_per_user",
    "token_counts", "top20_orders_global", "topk_orders_per_segment",
    "training_pipeline_summary", "union_sheets_lineage", "unpivot_lineitem_measures",
    "value_stats_by_event_type", "week_range_parse", "window_first_last_nth",
    "window_running_qty", "window_trailing_30d_qty",
])

# Tamper guard: cohort_total is only comparable round-over-round if the
# membership NEVER changes. Any edit to FROZEN_COHORT breaks this hash
# loudly instead of silently redefining the metric.
_COHORT_SHA256 = "2cb7c23b430be5030619dee42cffa42f0434e3a3b1eab52eb58dfbf619fbccd7"

# Low-variance serial protocol: the 4-worker cohort sweep amortizes JVM
# cost but its run-to-run noise band (44-81s measured across identical-
# code runs, NOTES.md r5) has exceeded round-over-round deltas two
# rounds running — the parallel total stopped being a usable signal.
# These 12 headline queries additionally run ONE AT A TIME on the full
# CPU count, median-of-3 passes, machine otherwise idle (the serial
# section runs after the pool has drained), so their numbers are
# attributable: no sibling JVMs stealing cores, and the median rejects
# the one-sided scheduling outliers min-of-2 can still admit.
SERIAL_SET = [
    "flagship_daily_segment_ledger", "q1_pricing_summary",
    "minhash_lsh_near_dup", "cosine_topk_bruteforce",
    "dedup_cluster_assign", "semantic_dedup_kmeans",
    "pca_top_component", "bigram_surprisal_score",
    "span_dedup_clean", "ann_recall_at_k",
    "fuzzy_part_name_pairs", "ann_ivf_topk",
]

# r9 extension: the expensive ITERATIVE class (classifier trainings,
# BPE encode, PQ refine serve, index build+serve, operating curve) now
# dominates the pooled tail, and r8's pooled numbers manufactured a
# phantom 4.3× "regression" on classifier_holdout_eval that only an
# ad-hoc serial rerun could refute. These run under the same serial
# median-of-3 protocol but are summed SEPARATELY (serial_ext_total) so
# serial_total stays comparable to the r6–r8 ≈30–34.5s band.
SERIAL_SET_EXT = [
    "classifier_holdout_eval", "curation_pipeline_v3",
    "bpe_encode_corpus", "ann_ivf_pq_refine_topk",
    "bm25_index_topk", "ivf_operating_curve",
    # r10 additions: the fusion retrieval query was r9's only pooled
    # mover with no serial twin (4.3→12.2s, untouched code — pure
    # contention, unadjudicable without this), and the snapshot table
    # format had zero serial coverage despite seven scored queries.
    # serial_ext_total therefore jumps by their cost in r10 — compare
    # the SHARED six against the r9 32-38s band, not the total.
    "multimodal_rrf_retrieval", "snapshot_cdf_orders",
    # r11 addition: the heaviest pooled query of r10 (23.8s driver /
    # 11.5s builder — a 2× spread the pooled protocol cannot
    # adjudicate). As with the r10 additions, compare the SHARED
    # queries round-over-round, never ext_total.
    "snapshot_replicate_orders",
]


def _assert_cohort_integrity() -> None:
    import hashlib

    h = hashlib.sha256("\n".join(sorted(FROZEN_COHORT)).encode()).hexdigest()
    assert len(FROZEN_COHORT) == 114 and h == _COHORT_SHA256, (
        f"FROZEN_COHORT redefined (n={len(FROZEN_COHORT)}, sha256={h}) — "
        "the frozen cohort must stay the mid-round-2 114-query set"
    )


def run_one(name: str, sf_dir: str, warm_dir: str) -> None:
    """Child mode: warm up, time one query (min of 2 passes), print a
    JSON line.

    Two timed passes with the cache cleared between them, reporting
    the MIN: scheduling noise from the concurrent worker pool is
    one-sided (delays only), so min-of-2 roughly halves run-to-run
    variance — which is what makes round-over-round total comparisons
    meaningful. clearCache() keeps pass 2 honest for queries that
    persist shared subtrees (it stays warm-JIT but cold-cache, the
    same state pass 1 ran in)."""
    from exceldatatransform_py_spark import get_spark
    from exceldatatransform_py_spark.plans.queries import QUERIES

    spark = get_spark(app_name=f"bench-{name}")
    fn = QUERIES[name]
    if warm_dir != sf_dir:
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    secs = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        secs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(json.dumps({
        "name": name,
        "sec": round(min(secs), 3),
        "passes": [round(s, 3) for s in secs],
    }))
    sys.stdout.flush()
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2], sf_dir, warm_dir)
        return

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from exceldatatransform_py_spark.plans.queries import QUERIES

    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    workers = int(os.environ.get("SPARK_GRAFT_BENCH_WORKERS", "4"))
    child_env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(max(total_cpus // workers, 1)),
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
    )

    def run_child(name: str) -> dict:
        print(f"bench: {name} ...", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            timeout=600,
            env=child_env,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr, flush=True)
            raise RuntimeError(f"bench: query {name} failed")
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"bench: {name} {rec['sec']}s", file=sys.stderr, flush=True)
        return rec

    def _median(vals: list[float]) -> float:
        s = sorted(vals)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    def run_serial() -> dict:
        """Serial mini-bench: each SERIAL_SET query in its own child,
        one at a time, on ALL cpus, median of 3 passes."""
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(total_cpus),
            SPARK_GRAFT_BENCH_PASSES=os.environ.get(
                "SPARK_GRAFT_BENCH_SERIAL_PASSES", "3"
            ),
            SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        out = {}
        for name in SERIAL_SET + SERIAL_SET_EXT:
            print(f"bench[serial]: {name} ...", file=sys.stderr, flush=True)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=600, env=env,
            )
            if proc.returncode != 0:
                print(proc.stderr[-2000:], file=sys.stderr, flush=True)
                raise RuntimeError(f"bench[serial]: query {name} failed")
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            rec["median"] = round(_median(rec["passes"]), 3)
            print(f"bench[serial]: {name} median {rec['median']}s "
                  f"(passes {rec['passes']})", file=sys.stderr, flush=True)
            out[name] = rec
        return out

    _assert_cohort_integrity()
    names = list(QUERIES)
    if os.environ.get("SPARK_GRAFT_BENCH_SERIAL_ONLY") == "1":
        sr = run_serial()
        print(json.dumps({
            "metric": "serial_median_seconds",
            "value": round(sum(
                r["median"] for k, r in sr.items() if k in SERIAL_SET
            ), 3),
            "unit": "sec", "sf": sf,
            "serial": {k: r["median"] for k, r in sr.items()},
            "serial_ext_total": round(sum(
                r["median"] for k, r in sr.items() if k in SERIAL_SET_EXT
            ), 3),
        }))
        return
    with ThreadPoolExecutor(max_workers=workers) as pool:
        recs = dict(zip(names, pool.map(run_child, names)))
    serial_recs = (
        {} if os.environ.get("SPARK_GRAFT_BENCH_SERIAL") == "0"
        else run_serial()
    )
    times = {k: float(r["sec"]) for k, r in recs.items()}

    total = round(sum(times.values()), 3)
    cohort_total = round(
        sum(v for k, v in times.items() if k in FROZEN_COHORT), 3
    )
    # Variance bound for round-over-round attribution: per query, the
    # gap between the two best passes directly measures run-to-run
    # variability AT the reported timing point (min-of-N). Summed over
    # the frozen cohort it bounds how much of a cohort_total delta can
    # be noise: |Δcohort_total| below this band is not evidence of a
    # regression or a win (NOTES.md bench protocol).
    def _gap(r: dict) -> float:
        ps = sorted(r.get("passes", [r["sec"]]))
        return ps[1] - ps[0] if len(ps) > 1 else 0.0

    cohort_noise_band = round(
        sum(_gap(r) for k, r in recs.items() if k in FROZEN_COHORT), 3
    )
    serial = {k: r["median"] for k, r in serial_recs.items()}
    # serial_total sums ONLY the original 12-query SERIAL_SET so it
    # stays comparable to the r6–r8 band; the r9 extension queries are
    # summed separately.
    serial_total = round(sum(
        v for k, v in serial.items() if k in SERIAL_SET
    ), 3) if serial else None
    serial_ext_total = round(sum(
        v for k, v in serial.items() if k in SERIAL_SET_EXT
    ), 3) if serial else None
    details_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_details.json")
    with open(details_path, "w") as f:
        json.dump({"total": total, "cohort_total": cohort_total,
                   "cohort_noise_band": cohort_noise_band,
                   "sf": sf, "n_queries": len(times),
                   "serial_total": serial_total, "serial": serial,
                   "serial_ext_total": serial_ext_total,
                   "serial_passes": {k: r.get("passes")
                                     for k, r in serial_recs.items()},
                   "queries": times,
                   "passes": {k: r.get("passes") for k, r in recs.items()}},
                  f, indent=1, sort_keys=True)

    # Final stdout line must stay SHORT (the driver truncates long tails
    # and recorded parsed:null in round 1): total + a handful of headline
    # queries only; the full per-query map lives in bench_details.json.
    headline = [
        "flagship_daily_segment_ledger", "q1_pricing_summary",
        "minhash_lsh_near_dup", "dedup_cluster_assign",
        "cosine_topk_bruteforce",
    ]
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "cohort_total": cohort_total,
                "cohort_n": sum(1 for k in times if k in FROZEN_COHORT),
                "cohort_noise_band": cohort_noise_band,
                "serial_total": serial_total,
                "serial_ext_total": serial_ext_total,
                "serial": serial,
                "queries": {k: times[k] for k in headline if k in times},
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
