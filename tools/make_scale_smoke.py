"""Build a derived sf1-equivalent dataset for the heavy-operator scale
smoke (VERDICT r3 item #7): 10x the sf0.1 tables the q99/q115/q117/q121
family reads, written under the repo (testdata itself is read-only).

Replication scheme: 10 copies with key shifts far past the original id
range (doc_id/vec_id += copy * 10^9, l_orderkey += copy * 10^9) so keys
stay unique per copy. Text/vector payloads repeat across copies — which
makes the dedup family's duplicate load HEAVIER than the organic sf1
would be (every doc has >=9 exact clones), a conservative stress for
shuffle growth. Row counts: documents 50k, embeddings 20k, lineitem 6M.

Usage: python tools/make_scale_smoke.py  (writes .scale_smoke/sf1/)
"""

from __future__ import annotations

import os

import duckdb

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_smoke", "sf1")
SRC = "/root/testdata/sf0.1"
SHIFT = 10**9
COPIES = 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    specs = {
        "documents": ("doc_id",),
        "embeddings": ("vec_id",),
        # l_partkey shifts too: q121's co-purchase graph thresholds on
        # basket support, and shared part ids across copies would give
        # every pair 10x support (an artificial density explosion, not a
        # scale-up) — disjoint copies keep organic density at 10x rows.
        "lineitem": ("l_orderkey", "l_partkey"),
        # events: 10x the series so the window family (q144 KS ECDF,
        # q147 changepoint scan, q41/q125-class) measures real row
        # growth. Copies shift both ids; `value` gets a per-copy 1e-7
        # jitter so DISTINCT values grow ~10x like organic continuous
        # data would (clone values would otherwise collapse in the
        # per-(group, value) frames and understate shuffle growth).
        "events": ("event_id", "user_id"),
        # orders: 10x customers for the per-entity aggregate family
        # (q128 RFM distributed ranks). Shifting o_custkey keeps each
        # copy's customers disjoint, so the collapsed per-customer
        # frame genuinely grows 10x; o_totalprice gets the same 1e-7
        # per-copy jitter as events.value so rank keys stay ~distinct.
        "orders": ("o_orderkey", "o_custkey"),
    }
    for table, keys in specs.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        parts = []
        for c in range(COPIES):
            def col_sel(col, c=c, keys=keys, table=table):
                if col in keys:
                    return f"{col} + {c * SHIFT} AS {col}"
                if table == "events" and col == "value":
                    return f"value + {c} * 0.0000001 AS value"
                if table == "orders" and col == "o_totalprice":
                    return f"o_totalprice + {c} * 0.0000001 AS o_totalprice"
                return col

            sel = ", ".join(col_sel(col) for col in cols)
            parts.append(f"SELECT {sel} FROM '{src}'")
        union = " UNION ALL ".join(parts)
        dst = f"{OUT}/{table}.parquet"
        con.sql(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")
    # The remaining tables are read by the gate loaders but not by the
    # smoke queries — symlink them so load_table finds a complete dir.
    for t in ["region", "nation", "customer", "supplier", "part"]:
        link = f"{OUT}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    print("done")


if __name__ == "__main__":
    main()
