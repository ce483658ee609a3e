"""Training-corpus export: the handoff step that turns a processed
DataFrame into the partitioned parquet layout a training job consumes.

At 100 TB the failure modes of a naive ``df.write.parquet`` are
well-known: thousands of tiny files per partition directory (one per
task per partition value — metadata pressure on every downstream
planner), or single giant files (no read parallelism). This writer
controls both:

* ``partition_by`` — hive-style directory partitioning (``split=train/
  source=web/``): downstream reads of one split/domain prune at the
  directory level, no data scan;
* a pre-write ``repartition`` on the partition columns (+ optional
  salt) bounds files-per-directory to the salt width instead of
  tasks x values;
* ``max_records_per_file`` re-splits oversized partitions so every
  file stays individually parallelizable.

Reference scope: scylla-cdc-java has no file sink (its sink is CQL
re-apply, K3); this is pipeline-extension surface, the write-side
counterpart of ``sources/tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_corpus(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    files_per_partition: int = 1,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet corpus with bounded file
    counts and sizes.

    ``files_per_partition`` salts the pre-write shuffle so each
    partition-value directory receives at most that many writer tasks
    (raise it for hot partitions that need parallel writers);
    ``max_records_per_file`` caps rows per file regardless. Without
    ``partition_by`` the frame is written with its current layout
    plus the per-file cap.
    """
    if partition_by:
        # salt from the NON-partition columns: hashing a column that is
        # (or correlates with) a partition_by column makes the salt
        # constant within each directory and silently collapses
        # files_per_partition back to one writer task per partition
        salt_cols = [c for c in df.columns if c not in set(partition_by)] or df.columns
        salt = F.pmod(F.xxhash64(*salt_cols), F.lit(files_per_partition))
        # explicit partition count: a bare expression-repartition is an
        # AQE-coalescible shuffle, and on a small frame AQE merges it to
        # ONE task — silently undoing the salt. A user-specified number
        # (REPARTITION_BY_NUM) is exempt from coalescing; files per
        # directory stay bounded by the salt key space either way
        try:
            n_shuffle = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200") or 200
            )
        except ValueError:
            # some deployments hold a non-numeric value here (e.g. "auto"
            # under auto-optimized shuffle) — any fixed fan-out works,
            # the salt key space bounds files per directory either way
            n_shuffle = 200
        out = df.repartition(n_shuffle, *[F.col(c) for c in partition_by], salt)
        writer = out.write.partitionBy(*partition_by)
    else:
        writer = df.write
    (
        writer.option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .mode(mode)
        .parquet(path)
    )


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read an exported corpus back; partition columns return as regular
    columns (hive-style discovery), and filters on them prune at the
    directory level before any file is opened."""
    return spark.read.parquet(path)


def zvalue(cols, bits: int = 16):
    """Morton / Z-order value: interleave the low ``bits`` bits of each
    input column (col j's bit i lands at position ``i*n + j``).

    THE multi-dimensional layout key for parquet data skipping: sorting
    by one column gives perfect row-group min/max pruning on that column
    and none on the others; sorting by the z-value bounds EVERY input
    dimension's span within each run of rows, so point/range predicates
    on ANY of the interleaved columns prune row groups. Pure integer
    column arithmetic (division/modulo — no engine-specific shift
    semantics), so an SQL oracle replays it bit-for-bit. Inputs are
    masked to ``bits`` via ``pmod`` (hash or bucketize wider domains
    first — interleaving only the low bits of a monotone id is what
    keeps the curve locality-preserving)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if not (1 <= n * bits <= 62):
        raise ValueError(f"n_cols*bits must fit a signed long, got {n}x{bits}")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        m = F.pmod(c.cast("long"), F.lit(1 << bits))
        for i in range(bits):
            # shift+mask, not double division: (m / 2^i) round-trips
            # through a double, whose 53-bit mantissa corrupts bit
            # extraction for bits > 53 (the guard allows up to 62) —
            # and the all-integer form stays inside codegen'd long ops
            bit = F.shiftright(m, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * n + j))
    return z


def quantile_bucket(df: DataFrame, col: str, bits: int = 8):
    """Rank-normalize ``col`` into ``2^bits`` quantile buckets — the
    Delta-style preprocessing that makes Z-ordering work on columns of
    ANY domain width or skew: interleaving RAW bits wastes positions
    when one column's domain is narrower than another's (its high bits
    are constant zeros, so the curve degenerates to a single-column
    sort). Boundaries come from one ``approxQuantile`` pass (bounded
    driver state: 2^bits doubles per column, the ranked_frames
    discipline) and bake into the expression as an array literal —
    bucket id = #boundaries <= value, a map-side scan of a 256-element
    array, no join.

    NULL convention: the boundary comparison yields NULL per element, so
    the filtered array is empty and NULLs land in bucket 0 — colocated
    with the smallest values (ascending NULLS FIRST, the ranked_frames
    convention). Route NULLs to a sentinel bucket upstream if they are
    frequent enough to widen bucket 0's span."""
    return _bucket_exprs(df, [col], bits)[0]


def _bucket_exprs(df: DataFrame, cols: list[str], bits: int = 8):
    """Quantile-bucket expressions for ALL ``cols`` from ONE
    ``approxQuantile`` pass (the DataFrame API takes a column list and
    computes every column's sketch in the same scan) — one full read of
    the frame regardless of how many columns are clustered, instead of
    one per column. Semantics per column are identical to the
    single-column form."""
    n = 1 << bits
    qs = [i / n for i in range(1, n)]
    all_bounds = df.stat.approxQuantile(list(cols), qs, 0.001)
    exprs = []
    for col, raw in zip(cols, all_bounds):
        bounds = sorted(set(raw))
        if not bounds:
            exprs.append(F.lit(0))
            continue
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(col).cast("double")
        exprs.append(F.size(F.filter(barr, lambda b: b <= v)))
    return exprs


def export_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
    max_records_per_file: int = 1_000_000,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ORDER clustered on ``cols``: rank-normalize each
    column into ``2^bits`` quantile buckets (:func:`quantile_bucket` —
    raw-bit interleaving degenerates whenever domains have unequal
    widths), interleave the bucket ids into the Morton value, then
    range-partition by it (contiguous curve segments per file — the
    locality the curve exists for; hash-partitioning would scatter
    them) and sort within partitions. Parquet row-group min/max stats
    come out tight on EVERY clustered column, so a reader's predicate
    on any of them skips most of the corpus. The z column is dropped
    before the write — it is a layout key, not data."""
    # one boundary pass for ALL clustered columns (approxQuantile takes a
    # column list) — at 100 TB this saves a full scan per extra column
    buckets = _bucket_exprs(df, cols, bits=bits)
    out = df.withColumn("__z", zvalue(buckets, bits=bits))
    if n_files is not None:
        out = out.repartitionByRange(int(n_files), F.col("__z"))
    else:
        out = out.repartitionByRange(F.col("__z"))
    (
        out.sortWithinPartitions("__z")
        .drop("__z")
        .write.option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .mode(mode)
        .parquet(path)
    )
