"""Generate a LARGER synthetic SF dir by replicating /root/testdata/sf0.1
K times with consistent key shifts — the r12 verdict's task 6: at sf0.1
every bench entry is job-floor-bound (8 cores ≈ 32 cores, 60-90% idle),
so plan-level wins are invisible and scaling claims unverifiable. This
probe dir restores the signal for the heavy entries.

NOT driver-contract data: /root/testdata is read-only driver data; this
writes elsewhere (default /tmp/scale/sf1.0) and exists only for the
committed 8c-vs-32c scaling table in BASELINE.md.

Replication scheme (referential integrity preserved):
  - dims nation/region copied once (low-cardinality dims stay dims);
  - every other table gets K copies with fact/dim keys shifted by
    i * (max_key + 1), so each copy joins onto its own shifted
    customers/suppliers/parts/orders — the join graph scales linearly;
  - documents.text gets a per-copy suffix token (copies are near- but
    not exact duplicates — keeps dedup entries' candidate structure
    linear instead of degenerate);
  - embeddings get a tiny deterministic per-copy perturbation on the
    first component (copies cluster near the original — realistic for
    ANN entries — without being bit-identical).

Usage: python scripts/gen_scale_probe.py [--k 10] [--out /tmp/scale/sf1.0]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale/sf1.0")
    ap.add_argument("--src", default=SRC)
    args = ap.parse_args()

    import duckdb

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    k = args.k

    def copies(select_tpl: str, table: str) -> str:
        return " UNION ALL ".join(select_tpl.format(i=i) for i in range(k))

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        out = f"{args.out}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")

    # key offsets: next power-of-10 above max key keeps ids readable
    def off(t: str, col: str) -> int:
        mx = con.execute(f"SELECT max({col}) FROM {src(t)}").fetchone()[0] or 0
        o = 1
        while o <= mx:
            o *= 10
        return o

    o_ord = off("orders", "o_orderkey")
    o_cust = off("customer", "c_custkey")
    o_supp = off("supplier", "s_suppkey")
    o_part = off("part", "p_partkey")
    o_doc = off("documents", "doc_id")
    o_vec = off("embeddings", "vec_id")
    o_ev = off("events", "event_id")
    o_usr = off("events", "user_id")

    for t in ("nation", "region"):
        write(t, f"SELECT * FROM {src(t)}")
    write("customer", copies(
        f"SELECT c_custkey + {{i}} * {o_cust} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM {src('customer')}", "customer"))
    write("supplier", copies(
        f"SELECT s_suppkey + {{i}} * {o_supp} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM {src('supplier')}", "supplier"))
    write("part", copies(
        f"SELECT p_partkey + {{i}} * {o_part} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM {src('part')}", "part"))
    write("orders", copies(
        f"SELECT o_orderkey + {{i}} * {o_ord} AS o_orderkey, "
        f"o_custkey + {{i}} * {o_cust} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM {src('orders')}", "orders"))
    write("lineitem", copies(
        f"SELECT l_orderkey + {{i}} * {o_ord} AS l_orderkey, "
        f"l_partkey + {{i}} * {o_part} AS l_partkey, "
        f"l_suppkey + {{i}} * {o_supp} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}", "lineitem"))
    write("events", copies(
        f"SELECT event_id + {{i}} * {o_ev} AS event_id, ts, "
        f"user_id + {{i}} * {o_usr} AS user_id, event_type, value, props "
        f"FROM {src('events')}", "events"))
    write("documents", copies(
        f"SELECT doc_id + {{i}} * {o_doc} AS doc_id, "
        f"CASE WHEN text IS NULL THEN NULL ELSE text || ' copytok{{i}}' END AS text, "
        f"lang, source, n_chars FROM {src('documents')}", "documents"))
    write("embeddings", copies(
        f"SELECT vec_id + {{i}} * {o_vec} AS vec_id, "
        f"CASE WHEN embedding IS NULL THEN NULL ELSE "
        f"list_prepend((embedding[1] + {{i}} * 0.001)::FLOAT, embedding[2:]) END AS embedding, "
        f"label FROM {src('embeddings')}", "embeddings"))


if __name__ == "__main__":
    main()
