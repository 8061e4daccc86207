"""Build a derived sf10-equivalent dataset (100x sf0.1) for the
second-decade scale smoke (VERDICT r5 item #5): the three flagship
devices — partitioned_prefix (q166/q128), AllPairs prefix-filter
(q173), explicit-register HLL (q176) — measured two decades up.

Replication scheme follows tools/make_scale_smoke.py (key shifts far
past the original id range keep copies disjoint; continuous values get
a per-copy 1e-7 jitter so distinct-value counts grow ~organically),
with one deliberate difference for documents:

- make_scale_smoke.py repeats text verbatim across its 10 copies (a
  conservative exact-clone stress for the dedup family). At 100 copies
  that would make the J=1.0 clone-pair OUTPUT itself quadratic in
  copies (C(100,2) pairs per doc family) — measuring output explosion,
  not the device. Here every copy instead applies a BIJECTIVE token
  rename (suffix each token with the copy tag): each copy is an
  isomorphic corpus under token renaming, so within-copy shingle/pair
  structure is exactly sf0.1's and cross-copy similarity is zero.
  The expected q173 behavior at 100x rows is therefore LINEAR output
  (100x sf0.1's pairs) and linear candidate volume — which is what a
  real 100 TB corpus (no 100-way duplicate families after the q133
  clone-collapse stage) asks of the device.

Only the tables the flagship queries read are built: events (q166,
q176), documents (q173, q135), orders (q128). The dimension tables
(region/nation/customer/supplier/part) symlink to sf0.1 like the sf1
builder — so q189's part universe and q193's customer seed cohort are
the UNREPLICATED copy-0 sets, i.e. a fixed dim/seed population while
the fact tables grow 100x (the realistic decade shape: at 100 TB the
entity dims don't scale with the event volume).

Usage: python tools/make_scale_smoke100.py  (writes .scale_smoke/sf10/)
"""

from __future__ import annotations

import os

import duckdb

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_smoke",
    "sf10",
)
SRC = "/root/testdata/sf0.1"
SHIFT = 10**9
COPIES = 100


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "events": ("event_id", "user_id"),
        "documents": ("doc_id",),
        "orders": ("o_orderkey", "o_custkey"),
        # q117 IVF-PQ third-decade smoke: 100x vectors; per-copy 1e-6
        # component shift keeps copies distinct (organic-ish vector
        # growth) while the 20 probe queries stay the copy-0 originals
        "embeddings": ("vec_id",),
        # q152 AUC reads lineitem; disjoint key shifts as in the sf1
        # builder (l_partkey too — shared part ids across copies would
        # multiply support densities artificially)
        "lineitem": ("l_orderkey", "l_partkey"),
    }
    import sys

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
                if table == "events" and col == "value":
                    return f"value + {c} * 1e-7 AS value"
                if table == "orders" and col == "o_totalprice":
                    return f"o_totalprice + {c} * 1e-7 AS o_totalprice"
                if table == "embeddings" and col == "embedding":
                    return (
                        f"CAST(list_transform(embedding, "
                        f"x -> x + {c} * 1e-6) AS FLOAT[]) AS embedding"
                    )
                if table == "documents" and col == "text":
                    # bijective token rename per copy: isomorphic
                    # corpora, zero cross-copy shingle overlap
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
    # Dimension tables stay the unreplicated sf0.1 sets (see module
    # docstring) — symlink them so q189 (part universe) and q193
    # (customer seed cohort) resolve.
    for t in ["region", "nation", "customer", "supplier", "part"]:
        link = f"{OUT}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)


if __name__ == "__main__":
    main()
