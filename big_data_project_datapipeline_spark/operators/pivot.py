"""Record→wide pivot (S4-class).

The reference receives the generation mix as a list of ``{fuel, perc}``
records and pivots it into one wide row, keeping a whitelist of 6 fuels
(reference raw_data.py:144-154). Generalized: ``groupBy(keys).pivot(col,
values).agg(first(value))``.

Scale note: always pass the explicit ``values`` list. Without it Spark runs
an extra distinct-collect job over the pivot column *and* the output schema
becomes data-dependent — both unacceptable on a 100 TB input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_records(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    value_col: str,
    agg: str = "first",
    prefix: str = "",
    suffix: str = "",
) -> DataFrame:
    """Pivot ``pivot_col`` (restricted to ``values``) into wide columns of
    ``agg(value_col)``, one output row per distinct ``keys``.

    ``agg``: any of first/sum/avg/min/max/count. Output columns are named
    ``{prefix}{value}{suffix}`` (the reference uses ``uk_gen_{fuel}_%``).
    """
    agg_fn = {
        "first": F.first,
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }[agg]
    wide = (
        df.groupBy(*keys)
        .pivot(pivot_col, list(values))
        .agg(agg_fn(F.col(value_col)))
    )
    renamed = wide
    for v in values:
        renamed = renamed.withColumnRenamed(v, f"{prefix}{v}{suffix}")
    return renamed
