"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for the 100 TB posture:

* exact dedup — hash-groupBy (partial-aggregatable, one shuffle);
* n-gram Jaccard — inverted-index self-join on shingles (shuffle on the
  shingle key; hot shingles are the skew risk → AQE skew join / frequency
  cap at scale);
* MinHash + LSH — the scale path: k-permutation signatures via one
  groupBy-min, banding, candidate pairs only within equal band buckets;
  cost is O(docs x k) not O(docs^2);
* SimHash — 32-bit sign-aggregated token hashes.

Everything is native expressions (no UDF). Hash function shared with the
SQL oracles: ``h31(s) = int(md5(s)[:15 hex]) % (2^31 - 1)`` — identical in
Spark (``conv``) and DuckDB (``'0x'||substr``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import shingles, tokens_col

MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime


def h31(c: Column) -> Column:
    """31-bit integer hash of a string, portable across engines."""
    return (F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % F.lit(MERSENNE31))


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one group per distinct content hash with
    the canonical (min) id and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.2, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard via inverted index.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct word n-grams.
    """
    sh = shingles(df.select(id_col, "text"), n=n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    j = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
                6,
            ),
        )
    )
    return j.where(F.col("jaccard") >= F.lit(threshold)).select(
        "doc_a", "doc_b", "common", "jaccard"
    )


def minhash_signatures(
    df: DataFrame, k: int = 32, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signatures: one row per (doc, i) with the min
    of ``(2i+1) * h31(shingle) + 7919 i  mod  2^31-1`` over the doc's shingles."""
    spark = df.sparkSession
    sh = shingles(df.select(id_col, "text"), n=n).withColumn("h", h31(F.col("shingle")))
    perms = spark.range(k).select(F.col("id").cast("long").alias("i"))
    return (
        sh.crossJoin(F.broadcast(perms))
        .select(
            id_col,
            "i",
            (
                ((F.lit(2) * F.col("i") + F.lit(1)) * F.col("h") + F.lit(7919) * F.col("i"))
                % F.lit(MERSENNE31)
            ).alias("hv"),
        )
        .groupBy(id_col, "i")
        .agg(F.min("hv").alias("mh"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 32,
    band_rows: int = 4,
    n: int = 3,
    threshold: float = 0.25,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated Jaccard.

    Bands the signature (k/band_rows bands), buckets docs by identical band
    values, emits candidate pairs from shared buckets, then estimates
    similarity as the equal-minhash fraction over the full signature.
    """
    sig = minhash_signatures(df, k=k, n=n, id_col=id_col).cache()
    bands = (
        sig.withColumn("band", (F.col("i") / F.lit(band_rows)).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.concat_ws(",", F.transform(F.array_sort(F.collect_list(F.struct("i", "mh"))), lambda s: s["mh"].cast("string"))).alias("band_key"))
    )
    ba = bands.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    bb = bands.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    cand = (
        ba.join(bb, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    siga = sig.select(F.col(id_col).alias("doc_a"), "i", F.col("mh").alias("mh_a"))
    sigb = sig.select(F.col(id_col).alias("doc_b"), "i", F.col("mh").alias("mh_b"))
    est = (
        cand.join(siga, "doc_a")
        .join(sigb, ["doc_b", "i"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")).cast("double") / F.lit(float(k)),
                6,
            ).alias("est_jaccard")
        )
    )
    return est.where(F.col("est_jaccard") >= F.lit(threshold)).select(
        "doc_a", "doc_b", "est_jaccard"
    )


def simhash(df: DataFrame, bits: int = 32, id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over distinct tokens: bit j of the output is the sign
    of the sum over tokens of ±1 according to bit j of the token hash."""
    spark = df.sparkSession
    toks = (
        df.select(id_col, F.explode(tokens_col("text")).alias("tok"))
        .dropDuplicates([id_col, "tok"])
        .withColumn("h", h31(F.col("tok")))
    )
    bits_df = spark.createDataFrame(
        [(j, 1 << j) for j in range(bits)], "j int, pow2 long"
    )
    contrib = toks.crossJoin(F.broadcast(bits_df)).select(
        id_col,
        "j",
        "pow2",
        (F.lit(2) * ((F.col("h") / F.col("pow2")).cast("long") % F.lit(2)) - F.lit(1)).alias("c"),
    )
    bitvals = contrib.groupBy(id_col, "j", "pow2").agg(F.sum("c").alias("s"))
    return (
        bitvals.withColumn("bitval", F.when(F.col("s") > 0, F.col("pow2")).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )
