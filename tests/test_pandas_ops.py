"""applyInPandas grouped ops: the pandas tier must agree with the native
expression tier on shared semantics (per-group population z-score)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions.pandas_ops import (
    grouped_quantiles_pandas,
    grouped_zscore_pandas,
)
from big_data_project_datapipeline_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pandas_zscore_matches_native(spark):
    """Same data → applyInPandas z-score ≡ the native q31 expression."""
    import __spark_entry__ as entrymod

    native = {
        r["event_id"]: r["zscore_in_type"]
        for r in entrymod.queries()["q31_grouped_zscore"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    pandas_tier = {
        r["event_id"]: r["zscore"]
        for r in grouped_zscore_pandas(ev, "event_type", "value").collect()
    }
    assert len(native) == len(pandas_tier) == 1000
    for k, v in native.items():
        assert abs(pandas_tier[k] - v) < 1e-6, k


def test_grouped_quantiles(spark):
    ev = load_table(spark, SF, "events")
    out = {r["event_type"]: r for r in grouped_quantiles_pandas(ev, "event_type", "value").collect()}
    assert set(out) == {"click", "error", "purchase", "signup", "view"}
    for r in out.values():
        assert r["q25"] <= r["q50"] <= r["q75"]

    # cross-check one group against numpy directly
    vals = np.array(
        [r["value"] for r in ev.filter("event_type = 'click'").collect() if r["value"] is not None]
    )
    assert abs(out["click"]["q50"] - float(np.quantile(vals, 0.5))) < 1e-9
