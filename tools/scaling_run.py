#!/usr/bin/env python
"""Empirical scaling run: the heaviest gate queries at sf0.1 AND the 10x
sf1 fixture (tools/make_scale_data.py), reporting per-query wall-clock
and the 10x scaling factor. A hidden superlinear shape (the thing plan
inspection can miss) shows up as factor >> 10·(1 + log-ish slack).

Same protocol as bench.py: noop-sink materialization, min of 2 cold-plan
runs, warmup pass first. Prints one JSON line; paste the table into
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from scylla_cdc_java_spark.session import get_spark  # noqa: E402
from scylla_cdc_java_spark.queries import QUERIES  # noqa: E402
from scylla_cdc_java_spark.sources.tables import load_table  # noqa: E402

HEAVY = [
    "pipeline_embeddings_index",
    "dedup_minhash_lsh",
    "pipeline_end_to_end",
    "ann_pq_topk",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    # round-6 extension: CDC apply kernel, event-stream analytics, and
    # the relational join/agg anchors (fixture now scales events +
    # key-consistent lineitem/orders/customer too)
    "r1_apply_delta",
    "r9_delta_full_mix",
    "events_sessionize",
    "events_asof_join",
    "events_sliding_topk",
    "agg_lineitem_pushdown",
    "join_broadcast_revenue",
    "join_shipping_priority",
    "text_bpe_train",
    # dedup_winnow (per-doc fingerprints) and NOT dedup_winnow_pairs: the
    # replica fixture gives every doc 9 near-copies, so pair ENUMERATION
    # output grows ~45x per duplicate group (quadratic in group size —
    # inherent to emitting all matching pairs, and a property of this
    # synthetic dup-heavy corpus, not of the operator's plan). Measured:
    # the sf1 pairs run exceeded 13 min where every other gate finished
    # in seconds. At real scale the answer is clustering (keep-one per
    # component) over capped pair lists, which dedup_clusters implements.
    "dedup_winnow",
    # round-7 extension: the SQ8 scan tier (stats collect is O(dim)
    # regardless of corpus; scoring is one linear scan) and the banded
    # perceptual-hash media dedup (near-dup pair output grows with the
    # replica fixture's dup groups like minhash does)
    "ann_sq8_topk",
    "mm_phash_pairs",
    "agg_large_orders",
    # round-8 extension: the two-pass bucketed rank (MUST scale near-
    # linearly — its entire reason to exist vs the segment-capped
    # window), the composite-key fact join to the derived partsupp, the
    # per-cell SQ8 tier, and the shuffle-free chunker
    "events_value_ntile",
    "agg_product_profit",
    "ann_ivf_sq8_cell_topk",
    "text_chunk_windows",
    # round-9 extension: the sliding-window chunk-dedup composition
    # (chunk count scales with tokens; window fan-out is a fixed ×2) and
    # the two-pass rank over the derived-partsupp domain (part×4 rows —
    # scales with the part table)
    "text_chunk_dedup_windowed",
    "agg_stock_value_ntile",
    # round-9 wave 2: the recall harness — brute chain is O(corpus) per
    # query (fixed query set), IVF chain probe-bounded; must stay linear
    "ann_ivf_recall",
]

SF_DIRS = {
    "sf0.1": os.environ.get("SCALE_BASE", "/root/testdata/sf0.1"),
    "sf1": os.environ.get("SCALE_DST", "/root/repo/.scale/sf1"),
}


def main() -> None:
    only = os.environ.get("SCALE_QUERIES")
    heavy = [q for q in only.split(",") if q] if only else HEAVY
    spark = get_spark(app_name="scylla_cdc_java_spark-scaling")
    for t in ("documents", "embeddings", "events", "lineitem", "orders"):
        for d in SF_DIRS.values():
            load_table(spark, d, t).count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for name in heavy:
        fn, _, _ = QUERIES[name]
        row: dict[str, float] = {}
        for label, d in SF_DIRS.items():
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 3)
        row["factor_10x"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "scaling_10x", "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
