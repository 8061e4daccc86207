"""Grouped pandas operators (applyInPandas) — the escape hatch tier.

The engine's rule (SURVEY.md §2.12): built-in expressions first, Arrow-
batched pandas only where no native expression exists. These wrappers
demonstrate the grouped-map path with semantics that ALSO exist natively
(operators/scale.py, q31), so tests can assert the two tiers agree —
the template for genuinely non-native per-group logic (sklearn transforms,
scipy fits, model scoring).

Scale: one shuffle on the group key; each group must fit in one executor's
memory as a pandas frame — use only for bounded groups (the native tier
has no such limit).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_zscore_pandas(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score (population std, fillna(0) first) via
    applyInPandas — numerically the numpy/sklearn formulation, matching
    operators/scale.zscore_scale semantics per group."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].fillna(0.0)
        std = v.std(ddof=0)
        pdf[out_col] = (v - v.mean()) / (std if std > 0 else 1.0)
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema)


def grouped_quantiles_pandas(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group exact quantiles via pandas (numpy linear interpolation —
    a semantics Spark's approx_percentile doesn't offer exactly)."""
    schema = T.StructType(
        [df.schema[group_col]]
        + [T.StructField(f"q{round(q * 100)}", T.DoubleType(), True) for q in quantiles]
    )

    def _q(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].dropna()
        row = {group_col: [pdf[group_col].iloc[0]]}
        for q in quantiles:
            row[f"q{round(q * 100)}"] = [
                float(vals.quantile(q)) if len(vals) else None
            ]
        return pd.DataFrame(row)

    return df.groupBy(group_col).applyInPandas(_q, schema)
