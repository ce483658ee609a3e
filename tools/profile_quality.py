#!/usr/bin/env python
"""Decompose the dedup quality-harness rows into their component chains
and time each through the noop sink (guide §1.4/§1.5). Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_quality.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from scylla_cdc_java_spark.queries import (  # noqa: E402
    QUERIES,
    _docs,
    q_dedup_simhash_hamming,
    q_dedup_winnow_pairs,
)
from scylla_cdc_java_spark.pipeline.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from scylla_cdc_java_spark.session import get_spark  # noqa: E402


def t(spark, label, df, n=2):
    best = None
    for _ in range(n):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    print(f"{best:7.3f}  {label}", flush=True)


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-quality")
    from scylla_cdc_java_spark.sources.tables import load_table

    for tbl in ("documents",):
        load_table(spark, sf, tbl).count()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    docs = _docs(spark, sf)
    from scylla_cdc_java_spark.pipeline.text import shingles

    t(spark, "shingles+hash only", shingles(docs.select("doc_id", "text"), n=3)
      .select("doc_id", F.xxhash64("shingle").alias("sh")))
    t(spark, "jaccard_exact pairs", ngram_jaccard_pairs(docs, n=3, threshold=0.2))
    t(spark, "jaccard_capped pairs", ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=5))
    t(spark, "simhash values", simhash(docs))
    t(spark, "simhash_hamming pairs", q_dedup_simhash_hamming(spark, sf))
    t(spark, "winnow pairs", q_dedup_winnow_pairs(spark, sf))
    t(spark, "minhash_lsh pairs", minhash_lsh_pairs(docs, k=32, band_rows=4, threshold=0.25))
    for name in ("dedup_simhash_quality", "dedup_winnow_quality",
                 "dedup_containment_quality", "dedup_containment"):
        fn, _, _ = QUERIES[name]
        t(spark, f"FULL {name}", fn(spark, sf))
    spark.stop()


if __name__ == "__main__":
    main()
