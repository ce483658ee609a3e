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
                 d.lang,
                 d.source,
                 -- n_chars == length(text) in the base fixture; keep the
                 -- invariant for the suffixed replicas (multimodal gates
                 -- derive width/height/duration from it)
                 length(CASE WHEN r.range = 0 THEN d.text
                             ELSE d.text || ' r' || r.range::VARCHAR END) AS n_chars
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
    # events: replicate as NEW users with the same temporal pattern —
    # sessionization / as-of / window state scales with users, which is
    # how a real event stream grows (not by densifying one user's day)
    n_ev, n_usr = con.sql(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()
    con.sql(
        f"""
        COPY (
          SELECT e.event_id + r.range * {n_ev} AS event_id, e.ts,
                 e.user_id + r.range * {n_usr} AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e, range({REPLICAS}) r
          ORDER BY event_id
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    # relational fact chain, key-consistent across tables: orderkeys and
    # custkeys offset by the same replica stride so joins stay valid
    n_ord = con.sql(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()[0]
    n_cust = con.sql(f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT l_orderkey + r.range * {n_ord} AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet', range({REPLICAS}) r
          ORDER BY l_orderkey, l_linenumber
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT o_orderkey + r.range * {n_ord} AS o_orderkey,
                 o_custkey + r.range * {n_cust} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{SRC}/orders.parquet', range({REPLICAS}) r
          ORDER BY o_orderkey
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT c_custkey + r.range * {n_cust} AS c_custkey, c_name,
                 c_nationkey, c_acctbal, c_mktsegment
          FROM '{SRC}/customer.parquet', range({REPLICAS}) r
          ORDER BY c_custkey
        ) TO '{DST}/customer.parquet' (FORMAT PARQUET)
        """
    )
    # dims don't scale: copy verbatim so snowflake joins resolve
    import shutil

    for t in ("region", "nation", "supplier", "part"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    for t in ("documents", "embeddings", "events", "lineitem", "orders", "customer"):
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
