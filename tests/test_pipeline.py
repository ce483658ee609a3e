"""Pipeline operator tests: similarity scale paths and multimodal plumbing."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from scylla_cdc_java_spark.pipeline.multimodal import (
    documents_as_media,
    extract_features,
    sample_frames,
)
from scylla_cdc_java_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    ivf_topk,
    lsh_bucketed_topk,
)


def _clustered_unit_vecs(rng, n, dim, n_clusters=10, noise=0.15):
    """Clustered vectors: true neighbors are genuinely close (the ANN use
    case) — with i.i.d. gaussian data every 'neighbor' is near-orthogonal
    and bucketed search couldn't (and shouldn't) find it."""
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    out = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = [x + rng.gauss(0, noise) for x in c]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append((i, [x / norm for x in v]))
    return out


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = random.Random(5)
    return spark.createDataFrame(
        _clustered_unit_vecs(rng, 200, 16), "vec_id long, embedding array<float>"
    )


def test_lsh_bucketed_recall(spark, emb_df):
    """LSH-bucketed ANN must agree with brute force for a decent fraction
    of top-1 neighbors (recall < 1 by construction, >> 0 by usefulness)."""
    rng = random.Random(9)
    planes = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(4)]  # 16 buckets
    queries = emb_df.where(F.col("vec_id") < 20)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk_bruteforce(emb_df, queries, k=1).collect()
    }
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in lsh_bucketed_topk(emb_df, queries, planes, k=1).collect()
    }
    hits = sum(1 for q, n in exact.items() if approx.get(q) == n)
    assert hits >= len(exact) * 0.5, f"recall too low: {hits}/{len(exact)}"


# full: IVF-vs-brute agreement (~31 s); pinned by the ann_ivf_recall gate.
@pytest.mark.full
def test_ivf_agrees_with_bruteforce_on_probed_buckets(spark, emb_df):
    """IVF with nprobe == n_centroids degenerates to exact search."""
    queries = emb_df.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_bruteforce(emb_df, queries, k=3).collect()
    }
    # centroid_mod=50 -> 4 centroids; probing all 4 covers the whole corpus
    full = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb_df, queries, k=3, nprobe=4, centroid_mod=50).collect()
    }
    assert full == exact


def test_media_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "src1", 11), (2, "", "en", "src2", 0)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    media = documents_as_media(docs)
    f1 = extract_features(media, dim=4).collect()
    f2 = extract_features(media, dim=4).collect()
    by = {r["media_id"]: r for r in f1}
    assert {r["media_id"]: r for r in f2} == by  # deterministic
    assert by[1]["n_bytes"] == 11
    assert len(by[1]["feature"]) == 4
    assert all(0.0 <= x < 1.0 for x in by[1]["feature"])


def test_media_strict_mode_raises(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    media = documents_as_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        extract_features(media, decode="strict").collect()


def test_frame_sampling_bounds(spark):
    docs = spark.createDataFrame(
        [(2, "abcde", "en", "s", 5), (5, "ab", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # doc_id % 3 == 2 -> video; durations 50 ms and 20 ms
    frames = sample_frames(documents_as_media(docs), every_ms=20).collect()
    by = {}
    for r in frames:
        by.setdefault(r["media_id"], []).append(r["frame_ms"])
    assert sorted(by[2]) == [0, 20, 40]
    assert sorted(by[5]) == [0]
    assert 5 in by and 2 in by


# full: exhaustive shard-pair enumeration (~66 s); the embedding-pairs
# oracle gates pin the output.
@pytest.mark.full
def test_sharded_gemm_pairs_exactly_once(spark, emb_df):
    """The sharded block GEMM must emit every qualifying unordered pair
    exactly once (diagonal + off-diagonal blocks), matching a brute-force
    per-pair computation, for shard counts spanning the corpus size."""
    from scylla_cdc_java_spark.pipeline.similarity import (
        quantize_embedding,
        quantized_dot,
        quantized_pairs_gemm,
    )

    q = emb_df.select("vec_id", quantize_embedding("embedding").alias("qv"))
    a = q.select(F.col("vec_id").alias("vec_a"), F.col("qv").alias("qa"))
    b = q.select(F.col("vec_id").alias("vec_b"), F.col("qv").alias("qb"))
    want = sorted(
        (r["vec_a"], r["vec_b"], r["dot_q"])
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot_q", quantized_dot(F.col("qa"), F.col("qb")))
        .where(F.col("dot_q") >= 800_000)
        .collect()
    )
    assert want  # fixture must actually produce qualifying pairs
    for n_shards in (1, 3, 8):
        got = sorted(
            (r["vec_a"], r["vec_b"], r["dot_q"])
            for r in quantized_pairs_gemm(
                emb_df, threshold=800_000, n_shards=n_shards
            ).collect()
        )
        assert got == want, f"n_shards={n_shards}"


def test_dedup_clusters_multihop_chain(spark):
    """Connected components must propagate across multi-hop chains, not
    just direct pairs."""
    from scylla_cdc_java_spark.pipeline.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (7, 8)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}


def test_dedup_clusters_deep_chain_logarithmic(spark):
    """A 300-node chain has diameter 300: min-label propagation would need
    300 rounds, large-star/small-star must converge within max_iter=20."""
    from scylla_cdc_java_spark.pipeline.dedup import dedup_clusters

    n = 300
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = dedup_clusters(docs, pairs, max_iter=20).collect()
    assert all(r["cluster_id"] == 0 for r in got) and len(got) == n


def test_ngram_max_df_caps_hot_shingles(spark):
    from scylla_cdc_java_spark.pipeline.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the site"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words here {boiler}") for i in range(6)],
        "doc_id long, text string",
    )
    uncapped = ngram_jaccard_pairs(docs, n=3, threshold=0.1).count()
    capped = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_df=3).count()
    assert uncapped > 0 and capped == 0  # only boilerplate shingles joined them


def test_shingles_short_documents(spark):
    """Docs with fewer than n tokens must yield zero shingles, not a
    descending-sequence crash (negative slice indices abort the job)."""
    from scylla_cdc_java_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from scylla_cdc_java_spark.pipeline.text import shingles

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words"), (4, "now three tokens"),
         (5, "four tokens right here"), (6, "four tokens right here")],
        "doc_id long, text string",
    )
    sh = shingles(docs, n=3)
    got = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert got == {4, 5, 6}  # short docs silently contribute nothing
    # consumers survive a corpus containing short/empty docs end-to-end
    assert ngram_jaccard_pairs(docs, n=3, threshold=0.9).count() == 1
    assert minhash_lsh_pairs(docs, n=3).count() >= 1


# full: streaming twin of the batch exact-dedup (kept + oracle gate).
@pytest.mark.full
def test_stream_exact_dedup(spark, tmp_path):
    """Streaming exact dedup drops redelivered/duplicate documents."""
    import os

    from scylla_cdc_java_spark.pipeline.dedup import stream_exact_dedup

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows1 = [(1, "alpha beta"), (2, "gamma")]
    rows2 = [(3, "alpha beta"), (4, "delta"), (5, "gamma")]  # 3,5 are dups
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("docs_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    texts = sorted(r["text"] for r in spark.sql("select text from docs_dedup").collect())
    assert texts == ["alpha beta", "delta", "gamma"]


def test_line_dedup_removes_repeated_spans_and_keeps_first(spark):
    from scylla_cdc_java_spark.pipeline.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # spans: "a b c", "d e f"
            (2, "a b c x y z"),          # "a b c" duplicates doc 1
            (3, "a b c d e f"),          # both spans duplicated
            (4, ""),                      # empty doc: no spans, no crash
            (5, "q r"),                   # short doc: one partial span
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, block=3).collect()}
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[1]["n_spans_removed"] == 0
    assert out[2]["clean_text"] == "x y z"
    assert out[2]["n_spans_removed"] == 1
    assert out[3]["clean_text"] == ""
    assert out[3]["n_spans_removed"] == 2
    # empty doc: split('') == [''] in Spark AND DuckDB, so it carries one
    # empty span (kept at first occurrence) — consistent across engines
    assert out[4]["clean_text"] == "" and out[4]["n_spans_removed"] == 0
    assert out[5]["clean_text"] == "q r"


def test_sessionize_gap_boundaries(spark):
    from scylla_cdc_java_spark.pipeline.sessions import session_stats, sessionize

    s = F  # noqa: F841
    rows = [
        # user 1: gap exactly == threshold stays in-session; gap+1 splits
        (1, 1, 0),
        (2, 1, 1800 * 10**9),            # gap == 1800 s -> same session
        (3, 1, 2 * 1800 * 10**9 + 1),    # gap 1800 s + 1 ns -> new session
        # user 2: single event -> one singleton session
        (4, 2, 5),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts__ns long")
    sess = sessionize(df, gap_s=1800)
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"] for r in sess.collect()
    }
    assert got[(1, 1)] == 1 and got[(1, 2)] == 1 and got[(1, 3)] == 2
    assert got[(2, 4)] == 1
    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(sess).collect()
    }
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["duration_s"] == 1800
    assert stats[(2, 1)]["duration_s"] == 0


def test_asof_join_directions_tolerance_and_null_payload(spark):
    from scylla_cdc_java_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 50), (4, "x", 10)],
        "id long, key string, t long",
    )
    # right has a legitimately-NULL payload at t=200: the fill must carry
    # the WHOLE row (v=None), not mix v from an older row
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 200, None), ("k", 300, 3.0)],
        "key string, t long, v double",
    )
    back = {
        r["id"]: (r["t_r"], r["v"])
        for r in asof_join(left, right, on=["key"], ts_col="t").collect()
    }
    assert back[1] == (100, 1.0)        # inclusive: equal ts matches
    assert back[2] == (200, None)       # latest row wins, null payload intact
    assert back[3] == (None, None)      # nothing at or before t=50
    assert back[4] == (None, None)      # no right rows for key x
    fwd = {
        r["id"]: (r["t_r"], r["v"])
        for r in asof_join(
            left, right, on=["key"], ts_col="t", direction="forward"
        ).collect()
    }
    assert fwd[1] == (100, 1.0)
    assert fwd[2] == (300, 3.0)
    assert fwd[3] == (100, 1.0)
    tol = {
        r["id"]: (r["t_r"], r["v"])
        for r in asof_join(
            left, right, on=["key"], ts_col="t", tolerance=10
        ).collect()
    }
    assert tol[1] == (100, 1.0)
    assert tol[2] == (200, None)        # 205-200=5 <= 10
    assert tol[3] == (None, None)


def test_funnel_requires_strict_step_order(spark):
    from scylla_cdc_java_spark.pipeline.sessions import funnel

    rows = [
        # user 1: full ordered funnel
        (1, "signup", 10), (1, "view", 20), (1, "purchase", 30),
        # user 2: purchase BEFORE view -> step 3 never completes
        (2, "signup", 10), (2, "purchase", 15), (2, "view", 20),
        # user 3: view before signup doesn't count; later view does
        (3, "view", 5), (3, "signup", 10), (3, "view", 40),
        # user 4: never signed up -> absent entirely
        (4, "view", 1), (4, "purchase", 2),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts__ns long")
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"])
        for r in funnel(df, ["signup", "view", "purchase"]).collect()
    }
    assert got == {1: (10, 20, 30), 2: (10, 20, None), 3: (10, 40, None)}


def test_salted_join_matches_plain_join(spark):
    from scylla_cdc_java_spark.operators.salted import salted_join

    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ("hot", f"k{i % 5}")],
        "key string, payload long",
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k0", 2.0), ("k1", 3.0), ("zz", 9.0)],
        "key string, dim double",
    )
    plain_inner = sorted(map(tuple, left.join(right, ["key"]).collect()))
    for n_salts in (1, 4):
        got = sorted(
            map(tuple, salted_join(left, right, ["key"], n_salts=n_salts).collect())
        )
        assert got == plain_inner, f"n_salts={n_salts}"
    plain_left = sorted(
        map(tuple, left.join(right, ["key"], "left").collect()),
        key=lambda t: tuple(map(str, t)),
    )
    got_left = sorted(
        map(tuple, salted_join(left, right, ["key"], n_salts=4, how="left").collect()),
        key=lambda t: tuple(map(str, t)),
    )
    assert got_left == plain_left


def test_validate_embeddings_malformed_edges(spark):
    """The validation screen's reason to exist: the malformed shapes the
    fixtures (deliberately) never contain — NULL embedding, NaN/Inf
    elements, NULL elements, the empty vector — each flagged exactly,
    with NULL-embedding rows reporting NULL dim (not Spark's size()=-1
    sentinel) so missing and malformed are distinguishable."""
    from scylla_cdc_java_spark.pipeline.similarity import validate_embeddings

    nan, inf = float("nan"), float("inf")
    rows = [
        (0, None),
        (1, [nan, 1.0]),
        (2, [1.0, -inf]),
        (3, [None, 0.0]),
        (4, [0.0, 0.0, 0.0]),
        (5, []),
        (6, [0.5, -0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in validate_embeddings(df).collect()}
    assert got[0]["dim"] is None and got[0]["has_nan"] is None
    assert got[1]["has_nan"] and not got[1]["has_inf"]
    assert got[2]["has_inf"] and not got[2]["has_nan"]
    assert got[3]["n_null_elems"] == 1 and got[3]["is_zero"]  # no nonzero elem
    assert got[4]["is_zero"] and got[4]["n_null_elems"] == 0
    assert got[5]["dim"] == 0 and not got[5]["is_zero"]  # empty ≠ zero vector
    assert got[6]["dim"] == 2 and not any(
        (got[6]["has_nan"], got[6]["has_inf"], got[6]["is_zero"])
    )


# full: walks EVERY ANN tier (~70 s); each tier's recall/topk oracle gate
# plus the kept per-tier tests pin the behavior.
@pytest.mark.full
def test_screen_embeddings_enforced_in_every_ann_tier(spark):
    """validate= wiring (VERDICT r09 #6): a planted NaN vector either
    raises (reject) or is excluded from every tier's output
    (quarantine); validate=None is the default and leaves the plan
    IDENTICAL (no extra filter/shuffle) so every gate hash is preserved."""
    import pytest as _pytest

    from scylla_cdc_java_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
        ivf_pq_residual_topk,
        ivf_pq_topk,
        ivf_sq8_topk,
        ivf_topk,
        pq_topk,
        sq8_topk,
    )

    rng_rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)])
        for i in range(40)
    ]
    poison = rng_rows + [(99, [float("nan")] + [0.1] * 7)]
    clean = spark.createDataFrame(rng_rows, "vec_id long, embedding array<float>")
    dirty = spark.createDataFrame(poison, "vec_id long, embedding array<float>")
    qs_clean = clean.where(F.col("vec_id") < 3)

    tiers = [
        lambda c, q, v: cosine_topk_bruteforce(c, q, k=3, validate=v),
        lambda c, q, v: ivf_topk(c, q, k=3, nprobe=2, n_centroids=8, validate=v),
        lambda c, q, v: pq_topk(c, q, k=3, m=4, n_codes=8, validate=v),
        lambda c, q, v: sq8_topk(c, q, k=3, validate=v),
        lambda c, q, v: ivf_sq8_topk(c, q, k=3, nprobe=2, n_centroids=8, validate=v),
        lambda c, q, v: ivf_pq_topk(
            c, q, k=3, nprobe=2, n_centroids=8, m=4, n_codes=8, validate=v
        ),
        lambda c, q, v: ivf_pq_residual_topk(
            c, q, k=3, nprobe=2, n_centroids=8, m=4, n_codes=8, validate=v
        ),
    ]
    for tier in tiers:
        # reject: fails loudly with per-flag counts
        with _pytest.raises(ValueError, match="nan=1"):
            tier(dirty, qs_clean, "reject").collect()
        # quarantine: the poisoned vector never reaches the index/output
        got = tier(dirty, qs_clean, "quarantine")
        assert not [r for r in got.collect() if r["neighbor_id"] == 99]
    # default is plan-identical by construction: screen_embeddings(df,
    # None) IS df (object identity — pinned in the next test), so the
    # gate hashes of every unvalidated call are untouched.

    # the composed index BUILD enforces the screen too
    from scylla_cdc_java_spark.pipeline.similarity import build_embedding_index

    with _pytest.raises(ValueError, match="nan=1"):
        build_embedding_index(
            dirty, dim=8, n_centroids=8, m=4, n_codes=8, validate="reject"
        ).collect()
    idx = build_embedding_index(
        dirty, dim=8, n_centroids=8, m=4, n_codes=8, validate="quarantine"
    )
    assert not [r for r in idx.collect() if r["vec_id"] == 99]


def test_screen_embeddings_clean_pass_and_dim(spark):
    """reject on a clean corpus is a no-op passthrough; the optional dim
    pin catches ragged corpora both ways."""
    import pytest as _pytest

    from scylla_cdc_java_spark.pipeline.similarity import screen_embeddings

    rows = [(0, [0.1, 0.2]), (1, [0.3, 0.4]), (2, [0.5, 0.6, 0.7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert screen_embeddings(df, "reject", dim=None) is df is screen_embeddings(df, None)
    with _pytest.raises(ValueError, match="bad_dim=1"):
        screen_embeddings(df, "reject", dim=2)
    assert screen_embeddings(df, "quarantine", dim=2).count() == 2
    with _pytest.raises(ValueError, match="validate must be"):
        screen_embeddings(df, "bogus")


def test_resize_and_chunk_multimodal(spark):
    from scylla_cdc_java_spark.pipeline.multimodal import (
        chunk_audio,
        documents_as_media,
        resize_images,
    )

    docs = spark.createDataFrame(
        [
            (3, "abcdef", "en", "s", 6),   # 3 % 3 == 0 -> image
            (4, "xy", "en", "s", 2),       # 4 % 3 == 1 -> audio, 20 ms
            (7, "", "en", "s", 0),         # audio with zero duration -> no chunks
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    media = documents_as_media(docs)
    rs = {r["media_id"]: r for r in resize_images(media, 4, 5).collect()}
    assert set(rs) == {3}
    assert rs[3]["n_bytes_in"] == 6 and rs[3]["n_bytes_out"] == 4 * 5 * 3
    ch = sorted(
        (r["media_id"], r["chunk_idx"], r["chunk_start_ms"], r["chunk_end_ms"])
        for r in chunk_audio(media, chunk_ms=15).collect()
    )
    assert ch == [(4, 0, 0, 15), (4, 1, 15, 20)]

    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|media decoding"):
        resize_images(media, decode="strict").collect()


def test_winnow_guarantee_and_short_docs(spark):
    """Winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 must share at least one fingerprint; docs shorter than
    k + w - 1 emit none (and must not crash the sequence guard)."""
    from scylla_cdc_java_spark.pipeline.dedup import winnow_fingerprints

    shared = "zqxjkvbwpy mfgthl"          # 17 chars: k+w-1 = 11 guaranteed
    docs = spark.createDataFrame(
        [
            (1, "aaaa " + shared + " bbbb"),
            (2, "cccc " + shared + " dddd"),
            (3, "unrelated text entirely"),
            (4, "tiny"),                   # < k chars: no grams at all
            (5, "tencharsxx"),             # 10 < k+w-1: grams exist, m < w
            (6, "elevenchars"),            # exactly k+w-1: one window
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4).collect()
    by = {}
    for r in fps:
        by.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by[1] & by[2], "shared substring must yield a shared fingerprint"
    assert 4 not in by and 5 not in by
    assert len(by[6]) == 1
    assert by.get(3)


def test_winnow_pairs_df_cap_drops_boilerplate_only(spark):
    """The r10 scale fix: a boilerplate passage shared by EVERY doc (the
    77%-df fingerprint shape that made the uncapped self-join 13x at
    10x) must not generate pairs on its own once capped, while a real
    shared passage between two docs still does; max_df=None reproduces
    the old exact semantics (boilerplate-only pairs reappear)."""
    from scylla_cdc_java_spark.pipeline.dedup import winnow_pairs

    boiler = "this footer appears on every single page of the corpus"
    passage = "zqxjkvbwpy mfgthl unique copied passage here indeed"
    rows = [(i, f"doc {i} body text {i*7} " + boiler) for i in range(20)]
    rows += [(100, "alpha " + passage + " omega " + boiler),
             (101, "gamma " + passage + " delta " + boiler)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {(r["doc_a"], r["doc_b"])
              for r in winnow_pairs(docs, k=8, w=4, min_shared=3, max_df=5).collect()}
    assert (100, 101) in capped, "real shared passage must survive the cap"
    assert all(p == (100, 101) for p in capped), f"boilerplate-only pairs leaked: {sorted(capped)[:5]}"
    exact = {(r["doc_a"], r["doc_b"])
             for r in winnow_pairs(docs, k=8, w=4, min_shared=3, max_df=None).collect()}
    assert len(exact) > len(capped), "uncapped mode must re-admit boilerplate pairs"


def test_sq8_lossless_when_range_fits_one_byte(spark):
    """With every per-dim range <= 255 the SQ8 step is 1 and dequant is
    the identity — adc must EQUAL the exact quantized dot and the
    ranking must match brute force (tie-break included)."""
    import numpy as np

    from scylla_cdc_java_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
        sq8_topk,
    )

    rng = np.random.RandomState(17)
    rows = [(i, [float(x) for x in rng.uniform(-0.1, 0.1, 12)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc"])
        for r in sq8_topk(emb, qs, k=5).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["dot_q"])
        for r in cosine_topk_bruteforce(emb, qs, k=5).collect()
    }
    assert got == want


def test_sq8_codes_fit_one_byte_and_bound_error(spark):
    """General data: every code is in [0, 255] and the dequantization
    error per dimension is < step (the SQ8 contract)."""
    import numpy as np

    from scylla_cdc_java_spark.pipeline.similarity import sq8_encode, sq8_stats

    rng = np.random.RandomState(29)
    rows = [(i, [float(x) for x in rng.randn(8) * 5]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = sq8_stats(emb)
    st = {r["pos"]: (r["lo"], r["step"]) for r in stats.collect()}
    codes = {r["vid"]: r["codes"] for r in sq8_encode(emb, stats).collect()}
    qv = {
        i: [int(np.round(x * 1000)) for x in v] for i, v in rows
    }
    assert len(codes) == 40
    for vid, cs in codes.items():
        for pos, c in enumerate(cs):
            lo, step = st[pos]
            assert 0 <= c <= 255
            dq = lo + c * step
            assert 0 <= qv[vid][pos] - dq < step


def test_ivf_sq8_cell_stats_strictly_finer_than_global(spark):
    """The per-cell tier's reason to exist: each cell's (lo, step) spans
    only its residents, so cell step <= global step everywhere and is
    STRICTLY smaller somewhere on the fixture (otherwise the gate would
    be a vacuous twin of the global-stats one). Also pins that the
    per-cell dequantization error stays < its cell step."""
    import numpy as np

    from scylla_cdc_java_spark.pipeline.similarity import (
        _collect_centroid_rows,
        _coarse_probe_kernel,
        quantize_embedding,
        sq8_stats,
    )
    from scylla_cdc_java_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    g = {r["pos"]: r["step"] for r in sq8_stats(emb).collect()}
    cent_rows = _collect_centroid_rows(
        emb.select(F.col("vec_id").alias("cid"), quantize_embedding("embedding").alias("cv")),
        16,
        None,
    )
    cent_ids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    cent_mat = np.array([r["cv"] for r in cent_rows], dtype=np.int64)
    assigned = emb.select(
        F.col("vec_id").alias("vid"), quantize_embedding("embedding").alias("qv")
    ).mapInPandas(
        _coarse_probe_kernel(cent_ids, cent_mat, 1), schema="vid long, qv array<long>, cid long"
    )
    cell = (
        assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
        .withColumn(
            "step",
            F.greatest(F.lit(1).cast("long"), F.expr("((hi - lo) + 254) div 255")),
        )
        .collect()
    )
    assert all(r["step"] <= g[r["pos"]] for r in cell)
    assert any(r["step"] < g[r["pos"]] for r in cell)


def test_signed_permutation_preserves_quantized_dots(spark):
    """The rotated-PQ gate's foundation: a signed permutation is
    orthogonal AND commutes with quantization (sign flip is exact), so
    exact brute-force top-k over rotated vectors equals the original —
    ids, ranks, and dot values bit-for-bit."""
    from scylla_cdc_java_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
        rotate_embedding,
        signed_permutation,
    )
    from scylla_cdc_java_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").head()[0])
    perm, signs = signed_permutation(dim)
    assert sorted(perm) == list(range(dim)) and all(s in (1.0, -1.0) for s in signs)
    rot = emb.select("vec_id", rotate_embedding("embedding", perm, signs).alias("embedding"))
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["dot_q"])
    a = sorted(map(key, cosine_topk_bruteforce(emb, emb.where(F.col("vec_id") < 3), k=5).collect()))
    b = sorted(map(key, cosine_topk_bruteforce(rot, rot.where(F.col("vec_id") < 3), k=5).collect()))
    assert a == b


def test_phash_deterministic_and_null_payload(spark):
    """The packed phash replays the per-stride FNV-1a fold exactly (pure
    Python mirror), identical payloads collide, and a NULL payload yields
    a NULL hash that phash_pairs drops."""
    from scylla_cdc_java_spark.pipeline.multimodal import (
        perceptual_hash,
        phash_pairs,
    )

    def expected(text: str) -> int:
        cps = [ord(c) for c in text]
        h = 0
        for j in range(64):
            stride = cps[j::64] or [0]
            acc = 2166136261
            for v in stride:
                acc = ((acc ^ v) * 16777619) % 2**32
            if acc % 1000 >= 500:
                h |= 1 << j
        return h - 2**64 if h >= 2**63 else h

    rows = [
        (0, "the quick brown fox jumps over the lazy dog é漢", None),
        (1, "the quick brown fox jumps over the lazy dog é漢", None),
        (2, "a completely different document body", None),
        (3, None, None),
        (4, "", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, text string, pad string"
    ).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    ph = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert ph[0] == ph[1] == expected(rows[0][1])
    assert ph[2] == expected(rows[2][1])
    assert ph[4] == expected("")
    assert ph[3] is None
    pairs = phash_pairs(
        perceptual_hash(media), radius=3
    ).collect()
    keys = {(r["media_a"], r["media_b"]) for r in pairs}
    assert (0, 1) in keys
    for r in pairs:
        assert r["hamming"] <= 3
        assert 3 not in (r["media_a"], r["media_b"])


def test_phash_strict_mode_raises(spark):
    import pytest

    from scylla_cdc_java_spark.pipeline.multimodal import perceptual_hash

    media = spark.createDataFrame(
        [(0, "image", b"xx")], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|decoder"):
        perceptual_hash(media, decode="strict").collect()


def test_phash_banding_finds_spread_bit_flips(spark):
    """Pigeonhole exactness: flipping 3 bits in three DIFFERENT 16-bit
    bands still leaves one band identical, so the pair must surface."""
    from scylla_cdc_java_spark.pipeline.multimodal import phash_pairs

    base = 0x0123_4567_89AB_CDEF
    flipped = base ^ (1 << 2) ^ (1 << 17) ^ (1 << 33)  # bands 0,1,2
    far = base ^ (1 << 2) ^ (1 << 17) ^ (1 << 33) ^ (1 << 49)  # all 4 bands
    df = spark.createDataFrame(
        [(0, base), (1, flipped), (2, far)], "media_id long, phash long"
    )
    got = {(r["media_a"], r["media_b"]): r["hamming"] for r in phash_pairs(df).collect()}
    assert got.get((0, 1)) == 3
    assert (0, 2) not in got  # hamming 4: excluded by the radius filter


def test_stream_sessionize_restart_merges_boundary_sessions(spark, tmp_path):
    """A session whose events straddle the two arrival chunks must come
    back as ONE merged session after the stop/restart (state resumes
    from the checkpoint); an event exactly `gap` after its predecessor
    still EXTENDS the session (session windows merge when they touch —
    same strictly-greater split as the batch sessionize)."""
    import datetime as dt

    from scylla_cdc_java_spark.pipeline.sessions import stream_sessionize

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    gap = 60
    rows1 = [  # chunk 1: user 1 session A open at the boundary
        (0, 1, s(0), 1.0),
        (1, 1, s(30), 2.0),
        (2, 2, s(10), 5.0),
    ]
    rows2 = [  # chunk 2: continues session A (59s after event 1), an
        # ==gap event that still merges, a >gap event that starts a new
        # session; the sentinel flushes everything
        (3, 1, s(89), 4.0),
        (4, 1, s(89 + gap), 8.0),
        (5, 1, s(89 + gap + gap + 1), 16.0),
        (-1, -1, s(10_000), 0.0),
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    spark.createDataFrame(rows1, schema).write.parquet(src)
    stream_sessionize(spark, src, out, ckpt, schema, gap_s=gap).awaitTermination()
    spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
    stream_sessionize(spark, src, out, ckpt, schema, gap_s=gap).awaitTermination()

    got = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).where(F.col("user_id") >= 0).collect()
    }
    us = lambda sec: int((s(sec) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    assert got == {
        # merged across the restart AND across the ==gap touch
        (1, us(0)): (us(89 + gap), 4, 15.0),
        # strictly greater than gap -> new session
        (1, us(89 + 2 * gap + 1)): (us(89 + 2 * gap + 1), 1, 16.0),
        (2, us(10)): (us(10), 1, 5.0),
    }


def test_ivf_sq8_agrees_with_sq8_on_probed_cells(spark):
    """With nprobe == n_centroids every cell is probed, so IVF+SQ8 must
    return EXACTLY the plain SQ8 brute-force ranking (same dequantized
    scores, same tie-breaks); with byte-fitting ranges that is also the
    exact integer-dot ranking."""
    import numpy as np

    from scylla_cdc_java_spark.pipeline.similarity import ivf_sq8_topk, sq8_topk

    rng = np.random.RandomState(31)
    rows = [(i, [float(x) for x in rng.uniform(-0.1, 0.1, 12)]) for i in range(24)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") < 3)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["adc"])
    full = sorted(map(key, sq8_topk(emb, qs, k=4).collect()))
    ivf = sorted(
        map(key, ivf_sq8_topk(emb, qs, k=4, nprobe=4, n_centroids=4).collect())
    )
    assert ivf == full


def test_knn_graph_shard_invariant_and_tie_exact(spark, emb_df):
    """knn_graph must equal the brute-force per-vector ranking for every
    shard count (block-local top-k + window merge is exact), including
    on planted EXACT dot ties (duplicate vector content under distinct
    ids — ties must break toward the smaller neighbor id in every block
    role)."""
    from scylla_cdc_java_spark.pipeline.similarity import (
        cosine_topk_bruteforce,
        knn_graph,
    )

    rows = emb_df.collect()
    dup = spark.createDataFrame(
        [(1000 + r["vec_id"], r["embedding"]) for r in rows[:5]],
        "vec_id long, embedding array<float>",
    )
    corpus = emb_df.unionByName(dup)
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["dot_q"])
        for r in cosine_topk_bruteforce(corpus, corpus, k=3).collect()
    )
    for n_shards in (1, 3, 8):
        got = sorted(
            (r["vec_id"], r["rank"], r["neighbor_id"], r["dot_q"])
            for r in knn_graph(corpus, k=3, n_shards=n_shards).collect()
        )
        assert got == want, f"n_shards={n_shards}"


def test_phash_matches_python_reference_on_random_unicode(spark):
    """Property: the vectorized Arrow kernel replays the pure-Python
    FNV-per-stride fold byte-for-byte on arbitrary unicode payloads
    (one Spark job per example batch, many strings per batch)."""
    from hypothesis import given, settings, strategies as st

    from scylla_cdc_java_spark.pipeline.multimodal import perceptual_hash

    def expected(text: str) -> int:
        cps = [ord(c) for c in text]
        h = 0
        for j in range(64):
            stride = cps[j::64] or [0]
            acc = 2166136261
            for v in stride:
                acc = ((acc ^ v) * 16777619) % 2**32
            if acc % 1000 >= 500:
                h |= 1 << j
        return h - 2**64 if h >= 2**63 else h

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=24,
    )

    @settings(max_examples=8, deadline=None)
    @given(texts)
    def check(batch):
        media = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "media_id long, text string"
        ).select(
            "media_id",
            F.lit("image").alias("kind"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
        got = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
        assert got == {i: expected(t) for i, t in enumerate(batch)}

    check()


# full: late-data boundary of the tumbling stream (t1 gate + kept window test).
@pytest.mark.full
def test_stream_tumbling_late_data_boundary(spark, tmp_path):
    """Watermark admission boundary, pinned exactly: after chunk 1 the
    watermark is max(chunk-1 event time) − delay; a late row whose
    window END equals the watermark is DROPPED (the window was evicted
    at end <= wm), one whose window end is a full window later is
    ADMITTED and merges into open state."""
    import datetime as dt

    from scylla_cdc_java_spark.pipeline.sessions import stream_tumbling_agg

    day = dt.timedelta(days=1)
    d0 = dt.datetime(2024, 1, 1)  # window [d0, d0+1d)
    schema = "event_id long, event_type string, ts timestamp, value double"
    src, out, ckpt = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c")
    # chunk 1: max event time = Jan 3 00:00 -> wm = Jan 2 00:00 (delay 1d)
    rows1 = [(0, "a", d0, 1.0), (1, "a", d0 + 2 * day, 2.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src)
    stream_tumbling_agg(
        spark, src, out, ckpt, schema, window_s=86400, delay="1 day"
    ).awaitTermination()
    # chunk 2: late row into [Jan 1, Jan 2) — window end == wm -> DROPPED;
    # late row into [Jan 2, Jan 3) — end Jan 3 > wm -> ADMITTED; sentinel
    rows2 = [
        (2, "a", d0 + dt.timedelta(hours=5), 100.0),          # dropped
        (3, "a", d0 + day + dt.timedelta(hours=5), 200.0),    # admitted
        (-1, "__sentinel", d0 + 30 * day, 0.0),
    ]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    stream_tumbling_agg(
        spark, src, out, ckpt, schema, window_s=86400, delay="1 day"
    ).awaitTermination()
    got = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out)
        .where(F.col("event_type") != "__sentinel")
        .collect()
    }
    us = lambda t: int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    assert got == {
        (us(d0), "a"): (1, 1.0),                 # late row 2 was dropped
        (us(d0 + day), "a"): (1, 200.0),         # late row 3 admitted
        (us(d0 + 2 * day), "a"): (1, 2.0),
    }


def test_export_zorder_bounds_per_file_spans(spark, tmp_path):
    """export_zorder's reason to exist, verified on REAL parquet footers:
    a z-ordered layout bounds every file's min/max span on BOTH
    clustered columns (so a reader's predicate on either prunes files /
    row groups), while a single-column-sorted layout of the same data
    leaves the other column's per-file span at ~the full domain."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.pipeline.export import export_zorder
    from scylla_cdc_java_spark.sources.tables import epoch_micros, load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        epoch_micros(ev, "ts").alias("tus"),
    ).select("user_id", F.expr("tus div 3600000000").alias("hour"))

    zdir, tdir = str(tmp_path / "z"), str(tmp_path / "t")
    export_zorder(base, zdir, ["user_id", "hour"], bits=8, n_files=16)
    base.repartitionByRange(16, F.col("hour")).sortWithinPartitions(
        "hour"
    ).write.parquet(tdir)

    def user_spans(d):
        spans = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "user_id" and col.statistics:
                        los.append(col.statistics.min)
                        his.append(col.statistics.max)
            if los:
                spans.append(max(his) - min(los))
        return spans

    full = base.agg(
        (F.max("user_id") - F.min("user_id")).alias("s")
    ).first()["s"]
    z_spans = user_spans(zdir)
    t_spans = user_spans(tdir)
    assert z_spans and t_spans
    # the hour-sorted layout scatters users across ~the full domain in
    # every file (zero skipping on user_id); the z layout bounds the
    # typical file's user span to a fraction of it
    assert min(t_spans) >= full * 0.8, (t_spans, full)
    mean_z = sum(z_spans) / len(z_spans)
    mean_t = sum(t_spans) / len(t_spans)
    assert mean_z <= mean_t * 0.6, (z_spans, t_spans)
