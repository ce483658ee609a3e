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

Round-4 recorded result: 33/33 MATCH — tokenization, md5/xxhash hashing,
length semantics, and float rounding agree across engines on all of it.

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


def main() -> int:
    build_dir()
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_contract.py"),
            "--sf-dir", OUT,
            "--only", DOC_QUERIES,
        ],
        env=env,
    )


if __name__ == "__main__":
    raise SystemExit(main())
