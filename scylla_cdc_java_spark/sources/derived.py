"""Deterministic derived ``partsupp`` view.

The synthetic fixture has no ``partsupp`` table, which blocked the five
TPC-H shapes whose decorrelation patterns the suite had not yet proven
(Q2 correlated min-cost subquery, Q9 profit attribution, Q11 global
HAVING threshold, Q16 anti-join + count-distinct, Q20 nested semi-join
chain). Derive one: every part is assigned ``min(4, |supplier|)``
suppliers by a pure integer formula over the part key and the supplier's
DENSE RANK (so the construction never assumes contiguous supplier keys),
with availqty/supplycost derived from integer hashes of the pair. Every
formula below is mirrored VERBATIM in the DuckDB oracle CTE
(:data:`ORACLE_PARTSUPP_CTE`), so the derived view is itself part of the
externally-verified surface, not a trusted fixture.

Determinism disciplines (the cross-engine hash gate's rules):
- supplier count ``S`` and the stride ``max(1, S // 4)`` are computed
  driver-side from one bounded ``count()`` over the dim table;
- the four stride offsets ``i * max(1, S//4)`` for ``i < min(4, S)`` are
  distinct mod S (``3 * (S//4) < S``), so each part gets distinct
  suppliers with no dedup step;
- ``ps_supplycost`` is an EXACT decimal built by integer-hash cents times
  ``0.01`` as ``DECIMAL(3,2)`` — no double division anywhere, so sums over
  it are order-independent and byte-identical cross-engine.

At scale: part × 4 is a narrow projection of the part table (no shuffle —
the explode is map-side), and the supplier rank join broadcasts the dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_table


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp view: columns ``ps_partkey, ps_suppkey,
    ps_availqty, ps_supplycost`` (supplycost an exact decimal in
    [100.00, 1000.00))."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    s_n = sup.count()  # bounded: one scalar off a dim table
    stride = max(1, s_n // 4)
    n_per = min(4, s_n)
    ranked = sup.select(
        "s_suppkey",
        (F.row_number().over(Window.orderBy("s_suppkey")) - 1).alias("idx"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    cents = (
        F.pmod(F.col("p_partkey") * 31 + F.col("s_suppkey") * 17, F.lit(90000))
        + 10000
    )
    return (
        part.withColumn("i", F.explode(F.array(*[F.lit(i) for i in range(n_per)])))
        .withColumn(
            "idx", F.pmod(F.col("p_partkey") + F.col("i") * stride, F.lit(s_n))
        )
        .join(F.broadcast(ranked), "idx")
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.col("s_suppkey").alias("ps_suppkey"),
            (
                F.pmod(F.col("p_partkey") * 7 + F.col("s_suppkey") * 11, F.lit(9999))
                + 1
            ).alias("ps_availqty"),
            (
                cents.cast("decimal(12,2)")
                * F.lit(0.01).cast("decimal(3,2)")
            ).alias("ps_supplycost"),
        )
    )


#: DuckDB CTE mirroring :func:`derived_partsupp` formula-for-formula.
#: Prepend to any oracle needing partsupp:  "WITH " + ORACLE_PARTSUPP_CTE + ", ..."
ORACLE_PARTSUPP_CTE = """\
s AS (SELECT count(*) AS n FROM supplier),
sup_ranked AS (
  SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) - 1 AS idx
  FROM supplier
),
iota AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(i)),
partsupp AS (
  SELECT p.p_partkey AS ps_partkey,
         sr.s_suppkey AS ps_suppkey,
         ((p.p_partkey * 7 + sr.s_suppkey * 11) % 9999) + 1 AS ps_availqty,
         CAST(((p.p_partkey * 31 + sr.s_suppkey * 17) % 90000) + 10000
              AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(3,2)) AS ps_supplycost
  FROM part p
  CROSS JOIN s
  JOIN iota ON iota.i < LEAST(4, s.n)
  JOIN sup_ranked sr
    ON sr.idx = ((p.p_partkey + iota.i * GREATEST(1, s.n // 4)) % s.n)
)"""
