#!/usr/bin/env python
"""Physical-plan audit: prints, per headline query, the plan markers that
matter at scale — exchange count, broadcast vs sort-merge joins, pushed
filters, read schemas. PLANS.md records the reviewed state; re-run this
after plan-affecting changes and update PLANS.md if shapes move.

The ENFORCED version of this audit runs in CI: tests/test_plans.py::
test_plan_audit_whole_registry sweeps every registered query through
scylla_cdc_java_spark.plans.audit_plan (no cartesian, no row-at-a-time
Python, hints/BNLJ only within recorded allowances). This CLI remains the
human-readable inspection companion.

Usage: PYTHONPATH=/root/repo python tools/plan_audit.py [--sf-dir DIR] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scylla_cdc_java_spark.queries import QUERIES  # noqa: E402
from scylla_cdc_java_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "s1_window_scan",
    "agg_lineitem_pushdown",
    "join_broadcast_revenue",
    "r1_apply_delta",
    "r1_apply_lww_fast",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "mm_feature_extract",
    "text_vocab",
    # round-4 surface
    "text_tfidf_topk",
    "text_countmin_probe",
    "agg_cube_revenue",
    "set_ops_customers",
    "dedup_incremental",
    "events_interval_join",
    "events_lag_lead",
    "join_promo_revenue",
    "dedup_simhash_hamming",
    "dedup_containment",
    "text_weighted_sample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    names = args.only.split(",") if args.only else DEFAULT

    spark = get_spark(app_name="plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        fn, _, _ = QUERIES[name]
        try:
            plan = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"== {name}: ERROR {str(e)[:120]}")
            continue
        print(
            f"== {name}: exchanges={plan.count('Exchange')}"
            f" bhj={plan.count('BroadcastHashJoin')}"
            f" smj={plan.count('SortMergeJoin')}"
            f" python={plan.count('Python') + plan.count('ArrowEval')}"
        )
        for p in re.findall(r"PushedFilters: \[[^\]]*\]", plan)[:3]:
            print("   ", p[:160])
        for r in re.findall(r"ReadSchema: [^\n]*", plan)[:3]:
            print("   ", r[:160])
    spark.stop()


if __name__ == "__main__":
    main()
