"""Unit tests for the round-2 text-pipeline additions: target-count
sampling, quality filter chain, mixture weights, exact-substring pairs,
pattern redaction, and the k-means IVF trainer."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from scylla_cdc_java_spark.pipeline.similarity import ivf_topk, kmeans_train
from scylla_cdc_java_spark.pipeline.text import (
    apply_quality_filters,
    exact_substring_pairs,
    mixture_weights,
    redact_patterns,
    stratified_take,
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    words = ["the", "a", "of", "and", "is", "cat", "dog", "tree", "rock", "sun"]
    rows = [
        (f"d{i:04d}", f"s{i % 3}", " ".join(rng.choice(words) for _ in range(rng.randint(20, 60))))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_stratified_take_exact_counts(spark, docs):
    taken = stratified_take(docs, {"s0": 10, "s1": 25}, stratum_col="source")
    counts = {r["source"]: r["n"] for r in taken.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"s0": 10, "s1": 25}  # s2 has no target -> dropped


def test_stratified_take_scale_path_matches_exact(spark, docs):
    """The hash-cutoff pre-filter must select the same rows as the full
    per-stratum rank (the cutoff is rank-aligned by construction)."""
    fast = {r["doc_id"] for r in stratified_take(docs, {"s0": 15, "s2": 30}).collect()}
    slow = {r["doc_id"] for r in stratified_take(docs, {"s0": 15, "s2": 30}, exact=True).collect()}
    assert fast == slow


def test_stratified_take_oversized_target_keeps_all(spark, docs):
    n_s0 = docs.where(F.col("source") == "s0").count()
    taken = stratified_take(docs, {"s0": n_s0 + 50})
    assert taken.count() == n_s0


def test_quality_filter_first_rule_wins(spark):
    # 3 tokens -> too_short even though stopword ratio is also 0.
    df = spark.createDataFrame(
        [("a", "xyz qrs tuv"), ("b", " ".join(["tok"] * 40))],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in apply_quality_filters(df).collect()}
    assert rows["a"]["reject_reason"] == "too_short" and not rows["a"]["keep"]
    # 40 copies of one token -> passes length, fails repetitive_token (but
    # low_stopword fires FIRST in rule order).
    assert rows["b"]["reject_reason"] == "low_stopword"


def test_quality_filter_keeps_normal_text(spark):
    text = (
        "the cat sat near a tree while the dog ran over rocks and "
        "the sun was warm during morning light"
    )
    df = spark.createDataFrame([("a", text)], "doc_id string, text string")
    r = apply_quality_filters(df).collect()[0]
    assert r["keep"] and r["reject_reason"] is None


def test_mixture_weights_sum_and_zero(spark, docs):
    out = {r["source"]: r for r in mixture_weights(docs, {"s0": 0.7, "s1": 0.3}).collect()}
    assert out["s2"]["weight"] == 0.0 and out["s2"]["target_share"] == 0.0
    assert abs(sum(r["actual_share"] for r in out.values()) - 1.0) < 1e-4
    assert out["s0"]["weight"] > 0


def test_exact_substring_catches_copy_paste(spark):
    shared = "this exact passage was copied verbatim between two documents"
    df = spark.createDataFrame(
        [
            ("a", "intro text. " + shared + " plus a unique tail here"),
            ("b", "different opening words. " + shared + " and another end"),
            ("c", "completely unrelated content with no overlap whatsoever at all"),
        ],
        "doc_id string, text string",
    )
    pairs = exact_substring_pairs(df, k=20, stride=1, min_common=2).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {("a", "b")}


def test_exact_substring_short_doc_safe(spark):
    df = spark.createDataFrame(
        [("a", "tiny"), ("b", ""), ("c", "x" * 30), ("d", "x" * 30)],
        "doc_id string, text string",
    )
    pairs = exact_substring_pairs(df, k=20, stride=5, min_common=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {("c", "d")}


def test_redact_order_and_counts(spark):
    df = spark.createDataFrame(
        [("e1", "mail bob42@example.com or call 555 1234")],
        "event_id string, text string",
    )
    r = redact_patterns(df).collect()[0]
    assert r["redacted"] == "mail <EMAIL> or call <NUM> <NUM>"
    # the email's digits must NOT be double-counted by the number rule
    assert r["n_email"] == 1 and r["n_number"] == 2


def test_kmeans_trained_centroids_feed_ivf(spark):
    rng = random.Random(3)
    import math

    centers = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(5)]
    rows = []
    for i in range(200):
        c = centers[i % 5]
        v = [x + rng.gauss(0, 0.05) for x in c]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((i, [x / n for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = kmeans_train(emb, centroid_mod=40, n_iter=2)
    got = cent.collect()
    assert len(got) == 5 and sum(r["n_members"] for r in got) == 200
    # trained centroids plug into ivf_topk and find true same-cluster neighbors
    queries = emb.where(F.col("vec_id") < 5)
    res = ivf_topk(emb, queries, nprobe=1, centroids=cent).collect()
    assert res, "trained-centroid IVF returned no neighbors"
    for r in res:
        assert r["neighbor_id"] % 5 == r["query_id"] % 5


def test_nfc_dedup_collapses_decomposed_forms(spark):
    """'é' composed (U+00E9) and decomposed (e + U+0301) must land in the
    same dedup group after NFC normalization — plain exact dedup keeps
    them apart (the blindness this operator exists to fix)."""
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.pipeline.text import nfc_exact_dedup_groups

    composed = "café éclair"
    decomposed = "café éclair"
    assert composed != decomposed  # different byte strings...
    docs = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, "unrelated"), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["keep_doc_id"]: r["n_members"]
        for r in nfc_exact_dedup_groups(docs).collect()
    }
    assert got == {1: 2, 3: 1}  # ...one canonical group; null text dropped
