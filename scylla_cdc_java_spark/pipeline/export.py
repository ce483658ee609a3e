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
