"""Derived partsupp view invariants (sources/derived.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_partsupp_four_distinct_suppliers_per_part(spark):
    from scylla_cdc_java_spark.sources.derived import derived_partsupp
    from scylla_cdc_java_spark.sources.tables import load_table

    ps = derived_partsupp(spark, SF)
    s_n = load_table(spark, SF, "supplier").count()
    n_parts = load_table(spark, SF, "part").count()
    per = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("nd"),
    )
    bad = per.where(
        (F.col("n") != min(4, s_n)) | (F.col("nd") != min(4, s_n))
    ).count()
    assert bad == 0
    assert per.count() == n_parts


def test_partsupp_supplycost_bounds_and_exactness(spark):
    from scylla_cdc_java_spark.sources.derived import derived_partsupp

    rows = derived_partsupp(spark, SF).select("ps_supplycost", "ps_availqty").collect()
    for r in rows:
        c = r["ps_supplycost"]
        assert 100 <= c < 1000, c
        # exact cents: scaling by 100 must be integral (no float residue)
        assert (c * 100) == int(c * 100), c
        assert 1 <= r["ps_availqty"] <= 9999


def test_partsupp_deterministic_rebuild(spark):
    from scylla_cdc_java_spark.sources.derived import derived_partsupp

    key = lambda r: (r["ps_partkey"], r["ps_suppkey"], r["ps_availqty"], str(r["ps_supplycost"]))
    a = sorted(map(key, derived_partsupp(spark, SF).collect()))
    b = sorted(map(key, derived_partsupp(spark, SF).collect()))
    assert a == b and len(a) > 0


def test_partsupp_small_supplier_pool(spark):
    """S < 4 suppliers: every part pairs with ALL suppliers, no dups —
    the LEAST(4, S) / stride-1 degenerate branch of the formula."""
    from scylla_cdc_java_spark.sources.derived import derived_partsupp
    from scylla_cdc_java_spark.sources.tables import load_table

    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="ps_small_")
    # single-file parquet like the fixture (load_table reads file paths)
    pq.write_table(
        pa.table({"p_partkey": list(range(1, 11))}),
        os.path.join(tmp, "part.parquet"),
    )
    # non-contiguous supplier keys: the dense-rank construction must not
    # assume 0..S-1
    pq.write_table(
        pa.table({"s_suppkey": [5, 17, 900]}),
        os.path.join(tmp, "supplier.parquet"),
    )
    ps = derived_partsupp(spark, tmp)
    per = ps.groupBy("ps_partkey").agg(F.countDistinct("ps_suppkey").alias("nd"))
    assert per.where(F.col("nd") != 3).count() == 0
    got = {r["ps_suppkey"] for r in ps.select("ps_suppkey").distinct().collect()}
    assert got == {5, 17, 900}
