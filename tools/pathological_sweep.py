#!/usr/bin/env python
"""Pathological-text differential sweep.

The driver fixture's documents are clean ASCII; this tool rebuilds a data
directory whose ``documents`` table is deliberately hostile — empty
strings, single tokens, doubled/leading/trailing spaces (empty tokens
under the single-space tokenizer), accented/CJK/emoji unicode, tabs and
newlines inside text, quotes/backslashes, a 5000-char token, pure
repetition, and planted near/exact dups — then runs the REAL contract
comparator (tools/check_contract.py) over every document-dependent gate
query against its DuckDB oracle on that data.

A second section does the same for the EVENT/CDC family: an events table
built from exact-timestamp bursts (10 events at one instant for one
user), cross-user timestamp ties, and null value/props — the data shape
where unstable sort ties and null handling break hash equality.

A third section covers EMBEDDINGS: a zero vector, exact duplicates,
a negated pair, and one-hot axis vectors (tie storms in every top-k).

A fourth section covers the RELATIONAL anchors: hostile lineitem/orders/
customer/part/supplier with decimal-cast rounding edges (x.005 prices and
discounts, 2.675), zero/negative amounts, discount=1.0, duplicate
(orderkey, linenumber) rows, orphan foreign keys, timestamps exactly on
every gate filter boundary, and unicode/quote/empty part types.

Round-5 recorded results: documents 36/36, events 30/30, embeddings
12/12 (incl. the composite index build), relational 10/10 MATCH — tokenization, hashing, length semantics, float rounding,
and every ordering tie-break agree across engines on all of it. The
round-5 additions earned their place immediately: the first hostile run
caught the BPE-encode oracle counting empty words as 0 tokens where
Spark's split('','') yields one empty symbol (fixed in queries.py).

Usage: PYTHONPATH=/root/repo python tools/pathological_sweep.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.001"
OUT = "/tmp/pathological_sf"

EVENT_QUERIES = ",".join(
    [
        "s1_window_scan", "s4_ordered_stream_read", "p2_dedup_resume",
        "p3_projection_split", "p7_op_dispatch", "a1_stream_task_grouping",
        "a2_min_generation_after", "a3_consumed_barrier", "t1_tumbling_windows",
        "t2_confidence_window", "t6_generation_rollover",
        "j1_range_delete_pairing", "j2_postimage_pairing",
        "f1_timeuuid_roundtrip", "f3_vnode_extract", "r1_apply_delta",
        "r1_apply_lww_fast", "r4_row_delete_effect", "r9_delta_full_mix",
        "events_sessionize", "events_funnel", "events_asof_join",
        "events_retention_cohorts", "events_sliding_topk",
        "events_anomaly_zscore", "events_pivot_types", "events_lag_lead",
        "events_interval_join", "o3_list_ops", "ttl_apply_visibility",
        # round-8 late: the NULL-key event rows exposed a native-path
        # divergence (plain key joins dropping NULL groups) — keep the
        # whole delta-ops family in the hostile loop
        "o3_list_ops_native", "r3_set_delta_ops", "r3_set_delta_ops_native",
        "r3_udt_delta_ops", "r3_udt_delta_ops_native", "r6_range_prefix_bounds",
        "r3_set_delta",
        # round-7: streaming session_window (same-instant bursts all land
        # in one session; ties must agree across engines) + streaming
        # tumbling windows (burst instants on window boundaries)
        "pipeline_stream_sessionize", "pipeline_stream_tumbling",
        "pipeline_stream_late_data", "pipeline_stream_crash_tumbling",
        "pipeline_stream_interval_join",
        # round-9: source-side fault gates (file vanished after commit;
        # file replaced in place — first-writer-wins) on the burst/NULL
        # event shapes
        "pipeline_stream_source_vanish", "pipeline_stream_source_replace",
        # round-9 late: native ingest dedup — burst instants make same-
        # batch duplicates and the NULL event_type groups the output
        "pipeline_stream_dedup_watermark",
        # round-10: T7 dynamic task add — the burst/NULL users split
        # across the two tablet tables and the arrival-split backfill
        "t7_dynamic_task_add",
        # round-10: z-order curve segments over the burst/NULL events
        # (same-instant bursts collapse hour buckets; NULL users hit the
        # pmod/cast path)
        "events_zorder_stats",
        # round-7 late: rank-function trio on burst ties / null values
        "events_value_ntile",
    ]
)

EMB_QUERIES = ",".join(
    [
        "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_kmeans_train",
        "ann_ivf_trained_topk", "dedup_embedding_pairs",
        "dedup_embedding_pairs_exact", "dedup_embedding_clusters",
        "dedup_keep_best",
        # round-5 hash-gated additions (oracles unroll the Lloyd rounds)
        "ann_pq_topk", "ann_ivf_pq_topk", "pipeline_embeddings_index",
        # round-6: residual IVF-PQ (textbook IVF-ADC) + frozen-artifact
        # incremental index encode
        "ann_ivf_pq_residual_topk", "ann_index_extend",
        # round-7: SQ8 scalar quantization (step degenerates to 1 on the
        # zero/one-hot fixture dims — the lossless edge) + the IVF
        # composition of it
        "ann_sq8_topk", "ann_ivf_sq8_topk",
        # round-8: locally-adaptive per-cell SQ8 tier + rotated PQ
        "ann_ivf_sq8_cell_topk", "ann_pq_rotated_topk",
        "ann_ivf_pq_rotated_topk",
        # round-9: recall@k of IVF / PQ-ADC vs brute force — the tie
        # storms make the intersection itself tie-sensitive, the hard case
        "ann_ivf_recall", "ann_pq_recall",
        # round-10: the remaining recall tiers (SQ8 quantization-lossless
        # edge on one-hot dims; residual chain on degenerate centroids)
        "ann_sq8_recall", "ann_residual_recall",
        # round-9: input-quality screen — the zero vector and one-hot
        # axes are exactly its flag cases
        "emb_validate",
    ]
)

DOC_QUERIES = ",".join(
    [
        "text_token_count", "text_quality", "text_langid", "text_fingerprint",
        "text_vocab", "text_split_assign", "text_repetition",
        "text_stratified_sample", "text_quality_filter", "text_mixture_weights",
        "text_redact", "text_vocab_by_source", "text_lm_score", "text_bpe_pairs",
        "text_bm25", "text_length_quantiles", "text_length_histogram",
        "text_tfidf_topk", "text_countmin_probe", "text_distinct_hll",
        "text_temperature_weights", "text_weighted_sample", "dedup_exact",
        "dedup_ngram_jaccard", "dedup_ngram_jaccard_exact", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_simhash_hamming", "dedup_containment",
        "dedup_exact_substring", "dedup_line_spans", "dedup_winnow",
        "dedup_incremental",
        # round-5 hash-gated additions (oracles unroll the merge rounds)
        "text_bpe_train", "text_bpe_encode", "text_pack_sequences",
        # round-6 additions: text-format round-trip and the composed
        # streaming pipeline (evolution + restart + admission dedup)
        "source_jsonl_documents", "source_csv_documents",
        "pipeline_stream_cdc_dedup",
        # round-8: literal-sentinel docs (ids 14-16) force the dynamic
        # sentinel escalation; the control + bisection slices must all
        # round-trip them
        "source_parquet_documents", "source_csv_counts", "source_csv_tokens",
        "source_csv_md5", "source_jsonl_counts", "source_jsonl_tokens",
        "source_jsonl_md5",
        # round-9: ORC (columnar-binary third format) must round-trip the
        # literal-sentinel/BOM/CRLF/NULL docs byte-exactly too
        "source_orc_documents",
        # round-7: perceptual-hash media dedup (unicode codepoints ARE the
        # fake pixel stream here, so the hostile docs hit it directly)
        "mm_phash_pairs", "mm_phash_dedup",
        # round-7 late: NFC canonical-equivalence dedup (the unicode docs
        # are the entire point here)
        "text_nfc_dedup",
        # round-8: overlapping token-window chunking (empty/unicode/5000-
        # char docs exercise the short-last-window and md5 canary paths)
        # + the composed cross-doc repeated-chunk detector
        "text_chunk_windows", "text_chunk_dedup",
        # round-9: sliding-arrival-window chunk dedup (doc_id-derived
        # arrival hours; the hostile ids stress the k∈{0,1} window
        # instance assignment incl. doc_id 0's negative-start window)
        "text_chunk_dedup_windowed",
        # round-9: LSH-vs-exact quality classification — the planted
        # near/exact dup groups are the tp mass, the estimator noise the
        # fp/fn edges
        "dedup_minhash_quality",
        # round-10: simhash-vs-Jaccard and winnow-vs-Jaccard truth
        # classification (different similarity signals; unicode/empty/
        # sub-8-char docs stress both chains' length guards)
        "dedup_simhash_quality", "dedup_winnow_quality",
        "dedup_containment_quality",
    ]
)


def build_dir() -> None:
    import duckdb

    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{OUT}/{t}.parquet")
    rows = [
        (0, "", "src0"),
        (1, "single", "src0"),
        (2, "a  b", "src0"),
        (3, " leading and trailing ", "src1"),
        (4, "Ünïcødé tökens with áccents everywhere today", "src1"),
        (5, "日本語 中文 한국어 mixed with english words here", "src1"),
        (6, "emoji 🚀 in 🎉 the 🔥 stream of tokens", "src2"),
        (7, "tab\tinside and newline\ninside the text", "src2"),
        (8, "quotes 'single' and \"double\" and back\\slash", "src2"),
        (9, "x" * 5000 + " tiny", "src0"),
        (10, "the the the the the the the the the the", "src1"),
        (11, "the quick brown fox jumps over the lazy dog today", "src2"),
        (12, "the quick brown fox jumps over the lazy cat today", "src2"),
        (13, "the quick brown fox jumps over the lazy dog today", "src0"),
        # the r07 judge's demonstrated CSV data-loss hole: a text value
        # that IS the null sentinel (and the escalation ladder) must
        # round-trip as a string, not reload as NULL — exercised by the
        # dynamic-sentinel writer (sources/tables.py write_csv_table)
        (14, "\\N", "src1"),
        (15, "\\N1", "src2"),
        (16, "ends with \\N", "src0"),
        # round-8 late: BOM, CRLF, U+2028 line separator, and a NULL text
        # (the phash oracle's NULL-payload handling — r07 ADVICE — plus
        # every gate's split/md5/NULL semantics under a missing document)
        (17, "﻿BOM leading token here", "src1"),
        (18, "crlf line\r\nsecond line after", "src2"),
        (19, "u2028 separator inside text", "src0"),
        (20, None, "src1"),
    ] + [
        (100 + i, f"filler words number {i} for bulk volume in the corpus", f"src{i % 3}")
        for i in range(30)
    ] + [
        # hot-shingle skew case (round 6): one 3-gram ("boiler plate header")
        # shared by 300 docs — the d²-candidate-rows-on-one-join-key shape.
        # 300 keeps the oracle's all-pairs replay tractable (~45k pairs);
        # the 10⁴-df mechanism itself is covered by the salted-join plan
        # guard + row-identity test in tests/test_plans.py.
        (
            1000 + i,
            f"boiler plate header unique{i}p unique{i}q unique{i}r unique{i}s",
            f"src{i % 3}",
        )
        for i in range(300)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    for d, t, s in rows:
        con.execute(
            "INSERT INTO d VALUES (?,?,?,?,?)",
            [d, t, "en", s, len(t) if t is not None else None],
        )
    con.execute(f"COPY d TO '{OUT}/documents.parquet' (FORMAT PARQUET)")


EV_OUT = "/tmp/pathological_events_sf"


def build_events_dir() -> None:
    import datetime

    import duckdb

    shutil.rmtree(EV_OUT, ignore_errors=True)
    os.makedirs(EV_OUT)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{EV_OUT}/{t}.parquet")
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0

    def add(ts, uid, typ, val, props):
        nonlocal eid
        rows.append((eid, ts, uid, typ, val, props))
        eid += 1

    for i in range(10):  # burst: 10 events at ONE instant, one user
        add(base, 1, "update", float(i), f'{{"k":{i}}}')
    for u in range(2, 7):  # same instant across users
        add(base, u, "insert", 1.5, '{"x":1}')
    t1 = base + datetime.timedelta(seconds=30)
    for u in (1, 2):  # interleaved ties + null payloads
        for i in range(3):
            add(t1, u, "delete" if i == 2 else "update", None if i == 1 else -i, None)
    for d in range(40):
        ts = base + datetime.timedelta(minutes=5 * d)
        add(ts, d % 5, ["insert", "update", "delete", "view"][d % 4], 0.0, '{"d":%d}' % d)
    # round-8 late: NULL event_type (a groupBy/partition key!) and NULL
    # user_id — both engines must agree on NULL-group semantics in every
    # sessionize/rank/pivot/window gate
    t2 = base + datetime.timedelta(hours=2)
    add(t2, 3, None, 7.5, '{"n":1}')
    add(t2 + datetime.timedelta(seconds=5), 3, None, None, None)
    add(t2 + datetime.timedelta(seconds=9), None, "view", 2.0, '{"n":2}')
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    for r in rows:
        con.execute("INSERT INTO e VALUES (?,?,?,?,?,?)", list(r))
    con.execute(f"COPY e TO '{EV_OUT}/events.parquet' (FORMAT PARQUET)")


EMB_OUT = "/tmp/pathological_emb_sf"


def build_emb_dir() -> None:
    import duckdb
    import numpy as np

    shutil.rmtree(EMB_OUT, ignore_errors=True)
    os.makedirs(EMB_OUT)
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "events",
    ):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{EMB_OUT}/{t}.parquet")
    rng = np.random.RandomState(5)

    def unit(v):
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    rows = [(0, [0.0] * 64, 0)]  # zero vector
    dup = unit(rng.randn(64))
    rows += [(i, [float(x) for x in dup], 1) for i in (1, 2, 3)]  # exact dups
    v = unit(rng.randn(64))
    rows += [(4, [float(x) for x in v], 2), (5, [float(x) for x in -v], 2)]
    for i in range(6, 10):  # one-hot axis vectors: tie storms
        oh = [0.0] * 64
        oh[i] = 1.0
        rows.append((i, oh, 3))
    rows += [
        (i, [float(x) for x in unit(rng.randn(64))], i % 10) for i in range(10, 60)
    ]
    # round-8 late: NULL label (the metadata column every gate carries)
    rows.append((60, [float(x) for x in unit(rng.randn(64))], None))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INT)")
    for r in rows:
        con.execute("INSERT INTO e VALUES (?,?,?)", list(r))
    con.execute(f"COPY e TO '{EMB_OUT}/embeddings.parquet' (FORMAT PARQUET)")




REL_OUT = "/tmp/pathological_rel_sf"

REL_QUERIES = ",".join(
    [
        "agg_lineitem_pushdown", "agg_cube_revenue", "agg_rollup_revenue",
        "join_broadcast_revenue", "join_shipping_priority",
        "join_region_volume", "join_salted_revenue", "join_bucketed_revenue",
        "join_promo_revenue", "set_ops_customers",
        # round-7 TPC-H shapes: EXISTS semi-join, bilateral nation volume,
        # conditional-sum share (zero-denominator guard), left-outer
        # histogram, group-having, scalar-subquery + anti-join
        "agg_order_priority", "join_volume_shipping", "join_market_share",
        "agg_customer_distribution", "agg_large_orders",
        "join_lost_opportunity",
        "agg_forecast_revenue", "join_returned_items", "join_top_supplier",
        "agg_small_qty_revenue", "agg_grouping_sets_revenue",
        "join_waiting_suppliers",
        # round-8 derived-partsupp family: Q2/Q9/Q11/Q16/Q20 — the
        # derivation formula itself must hold on the hostile key space
        "join_min_cost_supplier", "agg_product_profit",
        "agg_important_stock", "agg_part_supplier_cnt",
        "join_excess_availability",
        # round-9: ntile over the derived view — the hostile key space
        # stresses the integer-cents order + unique (part,supp) tiebreak
        "agg_stock_value_ntile",
        # round-9 late: Q12/Q19 shapes — NULL returnflags hit the IN
        # filter's 3VL, boundary timestamps hit the ship-window edges,
        # and the bracket OR runs over the unicode/empty part rows
        "agg_late_shipment_priority", "join_bracketed_revenue",
    ]
)


def build_rel_dir() -> None:
    """Hostile relational tables: decimal-cast rounding edges (x.005
    prices/discounts), zero and negative amounts (returns), discount=1.0
    (zero revenue), duplicate (orderkey, linenumber) rows, timestamps
    EXACTLY on every gate query's filter boundary (strict vs inclusive
    must agree across engines), orphan foreign keys (inner joins drop
    them identically), unicode/quote/empty part types, revenue ties
    across groups, and customers straddling the 96/97 cohort boundary."""
    import datetime as dt

    import duckdb

    shutil.rmtree(REL_OUT, ignore_errors=True)
    os.makedirs(REL_OUT)
    for t in ("region", "nation", "documents", "events", "embeddings"):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{REL_OUT}/{t}.parquet")

    con = duckdb.connect()

    def ts(s_):
        return dt.datetime.fromisoformat(s_)

    # customers: BUILDING segment (Q3 filter), dup names, extreme balances
    cust = [
        # nationkey 2 is in ASIA in the fixture nation/region tables —
        # keeps the Q5 snowflake (incl. the local-supplier constraint)
        # non-empty so the hostile decimal arithmetic is value-checked
        (1, "alpha", 2, 0.005, "BUILDING"),
        (2, "alpha", 1, -999999.99, "BUILDING"),
        (3, "beta", 2, 1e9, "AUTOMOBILE"),
        (4, "gamma", 3, 0.0, "BUILDING"),
        (5, "delta", 0, 1.005, "MACHINERY"),
        (6, "epsilon", 1, 2.675, "BUILDING"),  # classic float-rounding edge
    ]
    # orders: boundary timestamps for the 96/97 cohorts and Q3's < 1998
    odates = [
        "1996-01-01 00:00:00", "1996-06-30 23:59:59.999999",
        "1996-07-01 00:00:00", "1996-12-31 23:59:59.999999",
        "1997-01-01 00:00:00", "1997-12-31 23:59:59.999999",
        "1998-01-01 00:00:00", "1995-12-31 23:59:59.999999",
    ]
    orders = []
    for i, d in enumerate(odates):
        orders.append((100 + i, cust[i % len(cust)][0], "O", 0.005 + i, ts(d), "1-URGENT"))
    # customer 1 in both years (retained), customer 2 only 96 (churned),
    # customer 4 only 97
    orders += [
        (200, 1, "F", 1.0, ts("1996-03-03 00:00:00"), "2-HIGH"),
        (201, 1, "F", 1.0, ts("1997-03-03 00:00:00"), "2-HIGH"),
        (202, 2, "F", 1.0, ts("1996-05-05 00:00:00"), "3-MEDIUM"),
        (203, 4, "F", 1.0, ts("1997-05-05 00:00:00"), "3-MEDIUM"),
    ]
    # parts: hostile type strings (promo gate groups by p_type)
    parts = [
        (1, "p one", "Brand#1", "PROMO BURNISHED 'COPPER'", 1, 0.005),
        (2, "p two", "Brand#2", "", 2, 1.005),
        (3, "p thr", "Brand#3", "ünïcødé tÿpe", 3, 2.675),
        (4, "p fou", "Brand#4", "STANDARD\tTABBED", 4, 0.0),
        (5, "p fiv", "Brand#5", "PROMO BURNISHED 'COPPER'", 5, -1.0),
        # round-8 partsupp-family coverage: 'small…' names (Q20 semi-join
        # chain), STANDARD type + size in [10,25] (Q2 min-cost), Brand#5
        # exclusion (Q16 filter)
        (6, "small thing", "Brand#6", "STANDARD", 15, 3.005),
        (7, "small ünïcødé", "Brand#5", "STANDARD", 13, 1.5),
    ]
    # supplier 2 sits in an EUROPE nation (regionkey 3) so the Q2/Q20
    # region-filtered partsupp paths are value-checked non-empty
    sups = [(1, "s one", 2, 0.0), (2, "s two", 3, -5.5)]
    # lineitems: shipdates straddle every boundary used by the gates
    ldates = [
        "1996-01-01 00:00:00", "1996-06-30 23:59:59.999999",
        "1996-07-01 00:00:00", "1995-06-01 00:00:00",
        "1998-01-01 00:00:00", "1998-01-01 00:00:00.000001",
        "1998-06-06 00:00:00",
    ]
    li = []
    for ok in range(100, 108):
        for ln, d in enumerate(ldates):
            price = [0.005, 1.005, 2.675, 9e9, 0.01, 0.0, -42.42][ln % 7]
            disc = [0.0, 1.0, 0.5, 0.005, 0.045, -0.05, 0.055][ln % 7]
            qty = [1.0, 0.0, -3.0, 2.5, 1e6, 7.0, 0.1][ln % 7]
            li.append((ok, (ok + ln) % 7, sups[ln % 2][0], ln, qty, price, disc,
                       0.05, "ARN"[ln % 3], "OF"[ln % 2], ts(d)))
    # duplicate (orderkey, linenumber) rows + orphan part/supp keys
    li.append(li[0])
    li.append((999, 424242, 777, 0, 1.0, 10.0, 0.1, 0.0, "A", "O", ts("1996-02-02 00:00:00")))
    # round-8 late: REAL NULL grouping keys — the cube/rollup/grouping-sets
    # gates must distinguish a genuine NULL group from a set-level
    # placeholder via grouping() flags, and every filter/join must agree
    # on NULL exclusion semantics
    li.append((998, 1, 1, 0, 2.0, 7.5, 0.1, 0.0, None, None, ts("1996-03-03 00:00:00")))
    li.append((998, 1, 2, 1, 1.0, 3.0, 0.0, 0.0, None, "F", ts("1996-04-04 00:00:00")))
    orders.append((210, 1, "O", 2.0, ts("1996-08-08 00:00:00"), None))
    cust.append((7, "zeta", 2, 1.0, None))
    parts.append((8, "null type part", "Brand#9", None, 20, 1.0))
    # round-9: Q12-shape coverage — 1997 ship window with the late
    # predicate EXACTLY on its 60-day boundary (== must be excluded by
    # the strict >, both engines), one late high-priority, one late
    # low-priority, one late NULL-priority (3VL: counts in the ELSE
    # arm), and a NULL returnflag inside the window (IN-filter 3VL)
    orders += [
        (220, 1, "O", 1.0, ts("1997-02-01 00:00:00"), "1-URGENT"),
        (221, 1, "O", 1.0, ts("1997-02-01 00:00:00"), "5-LOW"),
        (222, 1, "O", 1.0, ts("1997-02-01 00:00:00"), None),
    ]
    li += [
        # exactly +60 days: NOT late under strict >
        (220, 1, 1, 0, 1.0, 5.0, 0.0, 0.0, "A", "O", ts("1997-04-02 00:00:00")),
        # +61 days: late, high priority
        (220, 1, 1, 1, 1.0, 5.0, 0.0, 0.0, "R", "O", ts("1997-04-03 00:00:00")),
        # late, low priority
        (221, 1, 2, 0, 1.0, 5.0, 0.0, 0.0, "A", "F", ts("1997-06-01 00:00:00")),
        # late, NULL priority (counts as low: NOT IN a NULL is the CASE
        # ELSE arm both sides)
        (222, 1, 2, 0, 1.0, 5.0, 0.0, 0.0, "R", "O", ts("1997-07-01 00:00:00")),
        # late but NULL returnflag: the IN ('A','R') filter drops it
        (220, 1, 1, 2, 1.0, 5.0, 0.0, 0.0, None, "O", ts("1997-05-01 00:00:00")),
    ]
    # round-9: Q19-shape coverage — bracket-boundary rows: Brand#1 does
    # not match any bracket (brands are Brand#11/12/13); add parts ON
    # the bracket edges and lineitems on the quantity edges
    parts += [
        (9, "bracket lo", "Brand#11", "STANDARD", 5, 1.0),   # size edge (<=5)
        (10, "bracket hi", "Brand#12", "STANDARD", 10, 1.0),  # size edge (<=10)
        (11, "bracket out", "Brand#13", "STANDARD", 16, 1.0),  # size 16 > 15: out
    ]
    li += [
        (223, 9, 1, 0, 11.0, 4.0, 0.0, 0.0, "N", "O", ts("1996-02-02 00:00:00")),  # qty edge in
        (223, 9, 1, 1, 12.0, 4.0, 0.0, 0.0, "N", "O", ts("1996-02-02 00:00:00")),  # qty 12 > 11: out
        (223, 10, 2, 2, 10.0, 4.0, 0.5, 0.0, "N", "O", ts("1996-02-02 00:00:00")),  # bracket 2 in
        (223, 11, 2, 3, 25.0, 4.0, 0.0, 0.0, "N", "O", ts("1996-02-02 00:00:00")),  # size out
    ]
    orders.append((223, 3, "O", 1.0, ts("1996-02-02 00:00:00"), "4-NOT SPECIFIED"))

    con.execute("CREATE TABLE x (c_custkey BIGINT, c_name VARCHAR, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    for r in cust:
        con.execute("INSERT INTO x VALUES (?,?,?,?,?)", list(r))
    con.execute(f"COPY x TO '{REL_OUT}/customer.parquet' (FORMAT PARQUET)"); con.execute("DROP TABLE x")

    con.execute("CREATE TABLE x (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    for r in orders:
        con.execute("INSERT INTO x VALUES (?,?,?,?,?,?)", list(r))
    con.execute(f"COPY x TO '{REL_OUT}/orders.parquet' (FORMAT PARQUET)"); con.execute("DROP TABLE x")

    con.execute("CREATE TABLE x (p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INT, p_retailprice DOUBLE)")
    for r in parts:
        con.execute("INSERT INTO x VALUES (?,?,?,?,?,?)", list(r))
    con.execute(f"COPY x TO '{REL_OUT}/part.parquet' (FORMAT PARQUET)"); con.execute("DROP TABLE x")

    con.execute("CREATE TABLE x (s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT, s_acctbal DOUBLE)")
    for r in sups:
        con.execute("INSERT INTO x VALUES (?,?,?,?)", list(r))
    con.execute(f"COPY x TO '{REL_OUT}/supplier.parquet' (FORMAT PARQUET)"); con.execute("DROP TABLE x")

    con.execute("CREATE TABLE x (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)")
    for r in li:
        con.execute("INSERT INTO x VALUES (?,?,?,?,?,?,?,?,?,?,?)", list(r))
    con.execute(f"COPY x TO '{REL_OUT}/lineitem.parquet' (FORMAT PARQUET)"); con.execute("DROP TABLE x")


def main() -> int:
    env = dict(os.environ, PYTHONPATH=REPO)
    check = os.path.join(REPO, "tools", "check_contract.py")
    build_dir()
    rc1 = subprocess.call(
        [sys.executable, check, "--sf-dir", OUT, "--only", DOC_QUERIES], env=env
    )
    build_events_dir()
    rc2 = subprocess.call(
        [sys.executable, check, "--sf-dir", EV_OUT, "--only", EVENT_QUERIES], env=env
    )
    build_emb_dir()
    rc3 = subprocess.call(
        [sys.executable, check, "--sf-dir", EMB_OUT, "--only", EMB_QUERIES], env=env
    )
    build_rel_dir()
    rc4 = subprocess.call(
        [sys.executable, check, "--sf-dir", REL_OUT, "--only", REL_QUERIES], env=env
    )
    return rc1 or rc2 or rc3 or rc4


if __name__ == "__main__":
    raise SystemExit(main())
