#!/usr/bin/env python3
"""Build an adversarial clone corpus for scale smokes: every document /
embedding duplicated `factor` times with shifted ids (worst-case duplicate
density — every doc is a near-dup of factor-1 others). Other tables are
copied through unchanged so the full query suite still runs.

Round-4 used an uncommitted throwaway for the 10x/100x cap-verification
smokes (BASELINE.md); this commits the generator so the numbers are
reproducible. `--single-source` additionally rewrites documents.source to
one constant value — the q110 sequence-packing adversary, where a
per-source window plan serializes the whole corpus through one task.

`--orders` clones the ORDERS table instead of copying it through
(o_orderkey shifted per copy, every other column — prices, priorities,
custkeys — byte-identical): the scale adversary for the rank/test
statistics family (q220 Mann-Whitney, q229 Kruskal-Wallis), where N
drives the chunk-bounded prefix windows and cloned rows maximize ties.

`--tpch` clones ORDERS and LINEITEM together with MATCHED key shifts
(o_orderkey and l_orderkey both + 100M*i), so every cloned order keeps
exactly its original lineitems — per-order selectivities (q243's
">=2 suppliers, exactly 1 failed", q242's per-part averages via the
unshifted partkeys) are preserved while the fact tables scale 10x.
This is the sf1-equivalent smoke for the TPC-H planner shapes
(q234-q248, VERDICT r9 #5); dims stay 1x, which only makes the
broadcast-vs-shuffle choice MORE visible.

Usage: make_clone_corpus.py <sfDir> <outDir> <factor>
       [--single-source] [--orders] [--tpch]
"""
import os, shutil, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]

def main(sf_dir, out_dir, factor, single_source, clone_orders=False,
         tpch=False):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    # 8-file layout so Spark gets parallel scan partitions even when the
    # parquet row-group count is small
    con.execute("SET threads TO 8")
    src_expr = "'web_clone'" if single_source else "source"
    con.execute(f"""
      COPY (
        SELECT d.doc_id + 1000000 * f.i AS doc_id, d.text, d.lang,
               {src_expr} AS source, d.n_chars
        FROM '{sf_dir}/documents.parquet' d,
             (SELECT unnest(range({factor})) AS i) f
      ) TO '{out_dir}/documents.parquet'
      (FORMAT parquet, PER_THREAD_OUTPUT true, OVERWRITE_OR_IGNORE true)""")
    con.execute(f"""
      COPY (
        SELECT e.vec_id + 1000000 * f.i AS vec_id, e.embedding, e.label
        FROM '{sf_dir}/embeddings.parquet' e,
             (SELECT unnest(range({factor})) AS i) f
      ) TO '{out_dir}/embeddings.parquet'
      (FORMAT parquet, PER_THREAD_OUTPUT true, OVERWRITE_OR_IGNORE true)""")
    for t in TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        if t == "orders" and (clone_orders or tpch):
            con.execute(f"""
              COPY (
                SELECT o.o_orderkey + 100000000 * f.i AS o_orderkey,
                       o.* EXCLUDE (o_orderkey)
                FROM '{sf_dir}/orders.parquet' o,
                     (SELECT unnest(range({factor})) AS i) f
              ) TO '{dst}'
              (FORMAT parquet, PER_THREAD_OUTPUT true,
               OVERWRITE_OR_IGNORE true)""")
        elif t == "lineitem" and tpch:
            # matched shift: cloned lineitems follow their cloned order
            con.execute(f"""
              COPY (
                SELECT l.l_orderkey + 100000000 * f.i AS l_orderkey,
                       l.* EXCLUDE (l_orderkey)
                FROM '{sf_dir}/lineitem.parquet' l,
                     (SELECT unnest(range({factor})) AS i) f
              ) TO '{dst}'
              (FORMAT parquet, PER_THREAD_OUTPUT true,
               OVERWRITE_OR_IGNORE true)""")
        else:
            shutil.copy(f"{sf_dir}/{t}.parquet", dst)
    n = con.sql(f"SELECT count(*) FROM '{out_dir}/documents.parquet/*.parquet'"
                if os.path.isdir(f"{out_dir}/documents.parquet")
                else f"SELECT count(*) FROM '{out_dir}/documents.parquet'")
    print(f"{out_dir}: documents x{factor}"
          f"{' single-source' if single_source else ''} -> {n.fetchone()[0]}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         "--single-source" in sys.argv[4:],
         "--orders" in sys.argv[4:],
         "--tpch" in sys.argv[4:])
