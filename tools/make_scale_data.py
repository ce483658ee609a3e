#!/usr/bin/env python
"""Build the sf1 scaling fixture (10x sf0.1) for the empirical scaling
run — documents + embeddings only (the tables the heavy gates touch).

NOT a correctness fixture: replicas get id offsets, a per-replica text
suffix (so dedup doesn't see 10 exact copies of every doc, which would
superlinearly explode pair counts and measure the wrong thing), and
rotated embedding vectors (norm- and distribution-preserving, decorrelates
replicas so LSH bucket occupancy scales like real data growth). Output is
deterministic. Writes /root/repo/.scale/sf1/ (gitignored).
"""

import os

import duckdb

SRC = os.environ.get("SCALE_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SCALE_DST", "/root/repo/.scale/sf1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.sql(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT d.doc_id + r.range * {n_docs} AS doc_id,
                 CASE WHEN r.range = 0 THEN d.text
                      ELSE d.text || ' r' || r.range::VARCHAR END AS text,
                 d.source
          FROM '{SRC}/documents.parquet' d, range({REPLICAS}) r
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n_vec = con.sql(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT e.vec_id + r.range * {n_vec} AS vec_id,
                 CASE WHEN r.range = 0 THEN e.embedding
                      ELSE list_concat(e.embedding[r.range + 1 :],
                                       e.embedding[1 : r.range])
                 END AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e, range({REPLICAS}) r
          ORDER BY vec_id
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
