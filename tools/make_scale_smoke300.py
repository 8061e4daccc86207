"""Build the FOURTH-decade smoke dataset (300x sf0.1 ~ sf30) for the
spill-heaviest family (VERDICT r9 item 6): only the tables q213/q214
(lineitem) and q216 (documents) read, plus dim symlinks for the q214
landmark seeds.

Replication scheme = tools/make_scale_smoke100.py exactly (disjoint
key shifts; bijective per-copy token rename for documents so corpora
are isomorphic with zero cross-copy overlap — pair/vocab structure
grows LINEARLY in copies, which is what a real fourth-decade corpus
asks of the devices).

Honesty note recorded up front: the q214 DEFAULT (in-session
support-edge build) is deliberately NOT expected to run here — its
measured sf10 spill is 59.2 GB and grows ~linearly, so the projected
~180 GB at sf30 exceeds this host's 77 GB free disk. That ceiling is
the measured argument for the landed pair table: the fourth-decade
rows are collected on the PREPARED path (tools/ab_prepared_pairs.py
prep + variants against .scale_smoke/sf30) where the pair explosion
happens once in the landing and never in the jobs.

Usage: python tools/make_scale_smoke300.py [table ...]
        (writes .scale_smoke/sf30/)
"""

from __future__ import annotations

import os
import sys

import duckdb

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_smoke",
    "sf30",
)
SRC = "/root/testdata/sf0.1"
SHIFT = 10**9
COPIES = 300


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "lineitem": ("l_orderkey", "l_partkey"),
        "documents": ("doc_id",),
        # round-11 (VERDICT r10 item 4): q87's customer-part graph at
        # the fourth decade needs orders; o_orderkey shares the
        # lineitem shift (joins stay within-copy), o_custkey disjoint
        # per copy (same scheme as make_scale_smoke100.py)
        "orders": ("o_orderkey", "o_custkey"),
    }
    only = set(sys.argv[1:])
    for table, keys in specs.items():
        if only and table not in only:
            continue
        src = f"{SRC}/{table}.parquet"
        cols = [
            r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        parts = []
        for c in range(COPIES):

            def col_sel(col, c=c, keys=keys, table=table):
                if col in keys:
                    return f"{col} + {c * SHIFT} AS {col}"
                if table == "documents" and col == "text":
                    return (
                        f"regexp_replace(text, '([^ ]+)', "
                        f"'\\1zc{c}', 'g') AS text"
                    )
                return col

            sel = ", ".join(col_sel(col) for col in cols)
            parts.append(f"SELECT {sel} FROM '{src}'")
        sql = " UNION ALL ".join(parts)
        dst = f"{OUT}/{table}.parquet"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        link = f"{OUT}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)


if __name__ == "__main__":
    main()
