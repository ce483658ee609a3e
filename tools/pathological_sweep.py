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

Round-5 recorded results: documents 36/36, events 30/30, embeddings
11/11 MATCH — tokenization, hashing, length semantics, float rounding,
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
    ] + [
        (100 + i, f"filler words number {i} for bulk volume in the corpus", f"src{i % 3}")
        for i in range(30)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    for d, t, s in rows:
        con.execute("INSERT INTO d VALUES (?,?,?,?,?)", [d, t, "en", s, len(t)])
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
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INT)")
    for r in rows:
        con.execute("INSERT INTO e VALUES (?,?,?)", list(r))
    con.execute(f"COPY e TO '{EMB_OUT}/embeddings.parquet' (FORMAT PARQUET)")


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
    return rc1 or rc2 or rc3


if __name__ == "__main__":
    raise SystemExit(main())
