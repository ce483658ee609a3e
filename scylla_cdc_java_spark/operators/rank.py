"""Two-pass distributed ranking over low-cardinality segments.

``Window.partitionBy(segment).orderBy(...)`` caps sort parallelism at the
segment cardinality: with ~10 event types, exact ranking of a 100×-scale
events table becomes ~10 single-task sorts of ~100M rows each — correct,
but the plan you never want on a 1000-executor cluster (the r07 verdict's
one perf-weak finding). This module computes the SAME exact ranking
functions (row rank → ntile / percent_rank / cume_dist) with a two-pass
bucketed assembly, the same discipline ``pack_sequences`` uses:

1. bucket rows by deterministic VALUE boundaries (approxQuantile of the
   leading order column, frozen as literals — a pure function of the
   row's value, so separate jobs over the same lineage agree; a
   ``repartitionByRange`` pid would NOT: the RangePartitioner re-samples
   per job and a boundary row can switch partitions between the counts
   job and the rank job — observed as off-by-one rank drift);
2. per-(bucket, segment) local row_number — parallelism is
   n_buckets × |segments|, not |segments|;
3. per-(bucket, segment) counts → driver-side prefix offsets (bounded
   rows) broadcast back; global rank = local rank + offset.

Boundary *balance* is approximate but order is exact for any boundary
choice: ``bucket(x) = |{b : b <= x}|`` is monotone, ties at a boundary
land in one bucket, and NULLs (dropped by the comparison) land in bucket
0 — consistent with ascending NULLS FIRST.

With a UNIQUE order key (callers must include a tiebreaker column) the
rank determines every frame function in closed form:
``percent_rank = (rank-1)/(n-1)`` (0 when n = 1), ``cume_dist = rank/n``,
and ntile's equal-fill buckets from (rank, n) arithmetic — all IEEE
divisions of identical integers, hence bit-identical to any engine's
window implementation on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_frames(
    df: DataFrame,
    segment_col: str,
    order_cols: list[str],
    n_tiles: int = 4,
    n_buckets: int | None = None,
) -> DataFrame:
    """Append exact ``rank``/``quartile``/``pr``/``cd`` columns per
    ``segment_col`` ordered by ``order_cols`` (ascending, NULLS FIRST —
    Spark's default). The leading order column must be numeric (it seeds
    the bucket boundaries) and the combination of all order columns must
    be unique per segment for the closed forms to be exact."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32") or 32)
    lead = order_cols[0]
    order_exprs = [F.col(c).asc_nulls_first() for c in order_cols]
    bkt = F.lit(0)
    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted(set(df.stat.approxQuantile(lead, qs, 0.001)))
        if bounds:
            barr = F.array(*[F.lit(float(b)) for b in bounds])
            lv = F.col(lead).cast("double")
            bkt = F.size(F.filter(barr, lambda b: b <= lv))
    local = df.withColumn("__bkt", bkt)
    w_local = Window.partitionBy("__bkt", segment_col).orderBy(*order_exprs)
    local = local.withColumn("__lrank", F.row_number().over(w_local))
    # bounded (n_buckets × |segments|) count matrix → prefix offsets on
    # the driver; broadcast back. The collect is O(parallelism), not
    # O(rows). A NULL segment is a legitimate group (window partitioning
    # treats NULL keys as one partition): the sort key tolerates None and
    # only the per-segment BUCKET order matters for the prefix sum.
    counts = sorted(
        (
            (r["__bkt"], r[segment_col], r["cnt"])
            for r in local.groupBy("__bkt", segment_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ),
        # correctness needs only ASCENDING bucket order per segment (the
        # prefix sum accumulates per segment independently); str() makes
        # the tie order deterministic for any segment type incl. None
        key=lambda t: (t[0], str(t[1])),
    )
    seen: dict = {}
    offsets = []
    for b, seg, cnt in counts:
        offsets.append((b, seg, seen.get(seg, 0)))
        seen[seg] = seen.get(seg, 0) + cnt
    seg_type = dict(df.dtypes)[segment_col]
    off_df = spark.createDataFrame(
        offsets, f"__bkt int, {segment_col} {seg_type}, __off long"
    )
    tot_df = spark.createDataFrame(
        list(seen.items()), f"{segment_col} {seg_type}, __n long"
    )
    rank = F.col("__lrank") + F.col("__off")
    n = F.col("__n")
    # ntile's equal-fill contract: the first (n % t) buckets hold
    # ceil(n/t) rows, the rest floor(n/t)
    base = (n / n_tiles).cast("long")
    rem = n % n_tiles
    big = base + 1
    in_big = rank <= rem * big
    tile = F.when(in_big, ((rank - 1) / big).cast("long") + 1).otherwise(
        rem + ((rank - 1 - rem * big) / F.when(base > 0, base)).cast("long") + 1
    )
    # NULL-SAFE equi-joins: a plain column-list join drops NULL-segment
    # rows (NULL = NULL is NULL), silently losing the whole NULL group
    off2 = off_df.withColumnRenamed(segment_col, "__seg_o").withColumnRenamed(
        "__bkt", "__bkt_o"
    )
    tot2 = tot_df.withColumnRenamed(segment_col, "__seg_t")
    off_j = local.join(
        F.broadcast(off2),
        (F.col("__bkt") == F.col("__bkt_o"))
        & F.col(segment_col).eqNullSafe(F.col("__seg_o")),
    ).drop("__bkt_o", "__seg_o")
    return (
        off_j.join(
            F.broadcast(tot2), F.col(segment_col).eqNullSafe(F.col("__seg_t"))
        )
        .drop("__seg_t")
        .withColumn("rank", rank)
        .withColumn("quartile", tile.cast("int"))
        .withColumn(
            "pr",
            F.when(n > 1, (rank - 1).cast("double") / (n - 1).cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("cd", rank.cast("double") / n.cast("double"))
        .drop("__bkt", "__lrank", "__off", "__n")
    )
