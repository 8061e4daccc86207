"""Unit-level oracle pins for the three round-11-staged corpus
operators (vocab_coverage, kneser_ney_bigram, kneser_ney_doc_scores —
see NOTES_r11), validated against their DuckDB oracle SQL at sf0.001
with the driver's comparison semantics (sorted columns, sorted rows,
bit-exact floats). Registered in round 12 as q234/q235/q236 — the SQL
strings below are the oracle_sql() entries verbatim; this file keeps
the fast unit-level check alive without a full registry sweep."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

# portable-fixture guard (ADVICE r11): skip, don't error, on a machine
# without the driver-generated parquet
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} fixture absent"
)
TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
)

STAGED_VOCAB_COVERAGE_SQL = f"""
    WITH wc AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({TOKENS_SQL}) AS token FROM documents)
        GROUP BY token),
    r AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rk,
               COUNT(*) OVER () AS n,
               SUM(CAST(cnt AS HUGEINT)) OVER () AS t
        FROM wc),
    a AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n, MAX(t) AS t,
               COALESCE(SUM(CASE WHEN rk <= 100
                                 THEN CAST(cnt AS HUGEINT) END), 0) AS c100,
               COALESCE(SUM(CASE WHEN rk <= 1000
                                 THEN CAST(cnt AS HUGEINT) END), 0) AS c1000,
               COALESCE(SUM(CASE WHEN rk <= 10000
                                 THEN CAST(cnt AS HUGEINT) END), 0) AS c10000
        FROM r)
    SELECT CAST(b.budget AS BIGINT) AS budget,
           CAST(least(b.budget, a.n) AS BIGINT) AS n_types_used,
           CAST(b.cov AS BIGINT) AS covered_tokens,
           floor(CAST(b.cov AS DOUBLE) / CAST(a.t AS DOUBLE) * 1e6 + 0.5)
               / 1e6 AS coverage
    FROM a, LATERAL (VALUES (100, a.c100), (1000, a.c1000),
                            (10000, a.c10000)) AS b(budget, cov)
"""

STAGED_KNESER_NEY_SQL = f"""
    WITH toks AS (SELECT {TOKENS_SQL} AS t FROM documents),
    big AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM (
            SELECT t[pos] AS w1, t[pos + 1] AS w2
            FROM (SELECT t, unnest(range(1, len(t))) AS pos
                  FROM toks WHERE len(t) >= 2))
        GROUP BY w1, w2),
    ctx AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS fanout
        FROM big GROUP BY w1),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r FROM big GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1a FROM big)
    SELECT b.w1, b.w2, b.c12, c.c1, c.fanout,
           floor(CAST(n1r AS DOUBLE) / CAST(n1a AS DOUBLE) * 1e9 + 0.5)
               / 1e9 AS p_cont,
           floor((0.75 * CAST(fanout AS DOUBLE)) / CAST(c1 AS DOUBLE)
                 * 1e9 + 0.5) / 1e9 AS lambda_w1,
           floor((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                      / CAST(c1 AS DOUBLE)
                  + ((0.75 * CAST(fanout AS DOUBLE)) / CAST(c1 AS DOUBLE))
                    * (CAST(n1r AS DOUBLE) / CAST(n1a AS DOUBLE)))
                 * 1e9 + 0.5) / 1e9 AS p_kn
    FROM big b JOIN ctx c USING (w1) JOIN cont USING (w2), tot
"""


STAGED_KN_DOC_SCORES_SQL = f"""
    WITH toks AS (
        SELECT doc_id, {TOKENS_SQL} AS t FROM documents),
    doc_pairs AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, t[pos] AS w1, t[pos + 1] AS w2
              FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS pos
                    FROM toks WHERE len(t) >= 2))
        GROUP BY doc_id, w1, w2),
    big AS (
        SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS c12
        FROM doc_pairs GROUP BY w1, w2),
    ctx AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS fanout
        FROM big GROUP BY w1),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r FROM big GROUP BY w2),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1a FROM big),
    model AS (
        SELECT b.w1, b.w2,
               floor((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                          / CAST(c1 AS DOUBLE)
                      + ((0.75 * CAST(fanout AS DOUBLE))
                             / CAST(c1 AS DOUBLE))
                        * (CAST(n1r AS DOUBLE) / CAST(n1a AS DOUBLE)))
                     * 1e9 + 0.5) / 1e9 AS p_kn
        FROM big b JOIN ctx c USING (w1) JOIN cont USING (w2), tot),
    scored AS (
        SELECT doc_id, c,
               CAST(CAST(c AS DOUBLE) * ln(p_kn) AS DECIMAL(28,12)) AS lp
        FROM doc_pairs JOIN model USING (w1, w2)),
    per AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_pairs,
               CAST(SUM(lp) AS DOUBLE) / SUM(c) AS avg
        FROM scored GROUP BY doc_id)
    SELECT doc_id, n_pairs, ROUND(avg, 6) AS avg_logprob,
           ROUND(exp(-avg), 6) AS ppl
    FROM per
"""


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _assert_bit_equal(sdf: pd.DataFrame, ddf: pd.DataFrame) -> None:
    s, d = _norm(sdf), _norm(ddf)
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d) and len(s) > 0
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]):
            assert (
                s[c].to_numpy().view(np.int64)
                == d[c].to_numpy().view(np.int64)
            ).all(), c  # bit-exact, the driver's standard
        else:
            assert s[c].equals(d[c]), c


@pytest.mark.parametrize(
    "which", ["vocab_coverage", "kneser_ney", "kn_doc_scores"]
)
def test_staged_oracle_bit_exact_at_sf0001(spark, which):
    from big_data_project_datapipeline_spark.functions.corpus import (
        kneser_ney_bigram,
        kneser_ney_doc_scores,
        vocab_coverage,
    )
    from big_data_project_datapipeline_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    if which == "vocab_coverage":
        sdf = vocab_coverage(docs, budgets=(100, 1000, 10000)).toPandas()
        ddf = _duck(STAGED_VOCAB_COVERAGE_SQL)
    elif which == "kneser_ney":
        sdf = kneser_ney_bigram(docs).toPandas()
        ddf = _duck(STAGED_KNESER_NEY_SQL)
    else:
        sdf = kneser_ney_doc_scores(docs).toPandas()
        ddf = _duck(STAGED_KN_DOC_SCORES_SQL)
    _assert_bit_equal(sdf, ddf)
