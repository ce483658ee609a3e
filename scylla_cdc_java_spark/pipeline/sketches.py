"""Sketch-based approximate analytics over the document corpus.

At 100 TB exact per-token state (a row per distinct token, a buffer per
group) is the scaling hazard; the standard answer is fixed-size mergeable
sketches whose partial states combine map-side. Two are implemented here
natively (no UDF, no driver state):

* ``countmin_counts`` — a count-min sketch (Cormode & Muthukrishnan 2005)
  as a ``depth x width`` DataFrame: per hash row the token stream folds
  into ``width`` buckets, so the shuffled state is ``depth*width`` rows
  regardless of corpus size, with map-side partial aggregation doing the
  heavy fold. Point queries take the min over the ``depth`` rows.
  Guarantees: never under-estimates; over-estimates by more than
  ``eps * N`` (``eps = e/width``) with probability < ``(1/e)^depth``.
* ``approx_distinct_by`` — per-group distinct-token cardinality via
  Spark's HyperLogLog++ (``approx_count_distinct``), the fixed-state
  replacement for ``count_distinct``'s per-group hash table.

Correctness gating follows the sketch pattern established by the t-digest
quantile row: sketch outputs are engine-specific, so the gate rows return
the EXACT value (value-checked against the SQL oracle) plus booleans
asserting the sketch landed inside its published error bound — a sketch
drifting out of bound fails the gate rather than passing rows-only.

Reference scope note: the reference (scylla-cdc-java) has no sketch
operators; these extend the training-data-pipeline surface
(SURVEY.md "beyond-reference" section) alongside dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def countmin_sketch(
    df: DataFrame,
    depth: int = 4,
    width: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Build the CMS table ``(r, bucket, cnt)`` from the token stream.

    One explode + one groupBy whose key space is ``depth * width`` —
    partial aggregation collapses each task's contribution to at most
    that many rows before the (tiny) shuffle, so the plan's shuffled
    bytes are O(depth*width*tasks), independent of corpus size.
    """
    tok = df.select(F.explode(tokens_col(text_col)).alias("tok"))
    rows = tok.select(
        "tok", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    )
    return (
        rows.select("r", F.pmod(F.xxhash64("tok", "r"), F.lit(width)).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    depth: int = 4,
    width: int = 512,
    term_col: str = "term",
) -> DataFrame:
    """Point-query the CMS for each probe term: min over the depth rows of
    the term's bucket count. ``terms`` is a (small) probe table; the join
    key is (r, bucket), the sketch side is depth*width rows, so AQE
    broadcasts it without a hint."""
    probe = terms.select(
        term_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).withColumn("bucket", F.pmod(F.xxhash64(F.col(term_col), "r"), F.lit(width)))
    return (
        probe.join(sketch, ["r", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def countmin_probe_report(
    df: DataFrame,
    probe_terms: list[str],
    depth: int = 4,
    width: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """Gate-shaped CMS report: per probe term, the EXACT corpus count
    (value-checked by the oracle) plus the sketch's two published
    guarantees as booleans the oracle pins TRUE:

    * ``never_under`` — est >= exact (a hard CMS property: every counter a
      term hashes to contains at least all of that term's increments);
    * ``within_bound`` — est <= exact + ceil(e/width * N) where N is the
      total token count (the (eps, delta) bound; at depth 4 the failure
      probability is e^-4 ~= 1.8%, and on the deterministic fixture the
      outcome is reproducible, so a pass is stable, not flaky).

    The estimate itself is intentionally NOT returned: it depends on
    xxhash64 bucket collisions, which no other engine reproduces.
    """
    import math

    spark = df.sparkSession
    sk = countmin_sketch(df, depth=depth, width=width, text_col=text_col)
    terms = spark.createDataFrame([(t,) for t in probe_terms], "term string")
    est = countmin_estimate(sk, terms, depth=depth, width=width)

    toks = df.select(F.explode(tokens_col(text_col)).alias("tok"))
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    exact = (
        toks.join(F.broadcast(terms), toks["tok"] == terms["term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    eps = math.e / width
    return (
        terms.join(exact, "term", "left")
        .withColumn("exact_cnt", F.coalesce("exact_cnt", F.lit(0)))
        .join(est, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("never_under"),
            (
                F.col("est")
                <= F.col("exact_cnt") + F.ceil(F.lit(eps) * F.col("n_tokens"))
            ).alias("within_bound"),
        )
    )


def approx_distinct_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    rsd: float = 0.02,
    sigma: float = 5.0,
) -> DataFrame:
    """Per-group distinct-token report gating HLL++ against its error
    bound: returns the EXACT distinct count (value-checked) and
    ``hll_ok`` = |approx - exact| <= sigma * rsd * exact, which the
    oracle pins TRUE. ``rsd`` is the sketch's relative standard
    deviation; ``sigma`` standard deviations gives a deterministic-fixture
    margin far outside plausible drift while still rejecting a broken
    sketch (which errs by orders of magnitude, not percent).

    Scale posture: ``approx_count_distinct`` keeps one fixed-size HLL
    register set per group and merges map-side; the exact
    ``count_distinct`` next to it expands to a (group, token) distinct
    shuffle — at 100 TB run the HLL column alone (drop the exact column),
    the gate pairs them only to prove the bound.
    """
    tok = df.select(F.col(group_col), F.explode(tokens_col(text_col)).alias("tok"))
    out = tok.groupBy(group_col).agg(
        F.count_distinct("tok").alias("n_distinct"),
        F.approx_count_distinct("tok", rsd).alias("__approx"),
    )
    bound = F.lit(sigma * rsd) * F.col("n_distinct")
    return out.select(
        group_col,
        "n_distinct",
        (F.abs(F.col("__approx") - F.col("n_distinct")) <= bound).alias("hll_ok"),
    )
