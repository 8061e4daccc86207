"""Rolling (frame-bounded) window statistics over ordered series.

Moving mean/std/min/max over a trailing ROWS frame — the feature-
engineering primitive the reference computes eagerly with pandas
``.rolling()`` windows and an analytics engine exposes as window
functions. One window spec serves every statistic, so Catalyst plans a
single sort per series partition.

Parity: frame sums accumulate in DECIMAL (exact, order-independent within
the frame) and the variance is clamped at zero before sqrt — ss/n − m²
can land at −1e-18 for a constant frame, and sqrt of that is NaN on every
engine, poisoning the hash gate differently per engine.

Scale: partition by the series key (users/sensors — high-cardinality,
uniform); per-partition state is one frame, O(frame) memory. Never an
unpartitioned window: a global rolling stat must be chunked (cumsum per
shard + shard-boundary fix-up, cf. text.sequence_packing's device).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_stats(
    df: DataFrame,
    series_col: str,
    order_cols: list[str],
    value: Column,
    n: int = 5,
    prefix: str = "roll_",
) -> DataFrame:
    """Append trailing-frame stats over the last ``n`` rows per series:
    count, mean, std (population, ddof=0 — the reference's scaler
    convention), min, max.
    """
    w = (
        Window.partitionBy(series_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    dec = value.cast("decimal(18,4)")
    cnt = F.count(value).over(w)
    s = F.sum(dec).over(w).cast("double")
    ss = F.sum(dec * dec).over(w).cast("double")
    mean = s / cnt
    var = F.greatest(ss / cnt - mean * mean, F.lit(0.0))
    return df.withColumns(
        {
            f"{prefix}n": cnt,
            f"{prefix}mean": mean,
            f"{prefix}std": F.round(F.sqrt(var), 6),
            f"{prefix}min": F.min(value).over(w),
            f"{prefix}max": F.max(value).over(w),
        }
    )


def trailing_ewma(
    df: DataFrame,
    series_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.8,
    n: int = 8,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated trailing exponentially-weighted moving average: over the
    last ``n`` rows of each series, EWMA = Σ αᵏ·v₋ₖ / Σ αᵏ, where the
    weight of a lag is included only when that lag exists AND its value
    is non-null (missing observations carry no weight).

    Parity note: the truncated form is a FIXED lag chain — weights are
    Python-computed double literals and the numerator/denominator fold
    left in lag order, so any engine evaluates the identical sequence of
    IEEE operations (the recursive infinite-memory EWMA, by contrast,
    needs either per-row recursion or a pow(α, −i) prefix trick that
    overflows and reorders arithmetic). round(6) on the output only.

    Scale: one window sort per series partition serves all ``n`` lag()
    calls; no extra exchange beyond the series key.
    """
    w = Window.partitionBy(series_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    num = None
    den = None
    for k in range(n):
        lagged = F.lag(F.col(value_col), k).over(w) if k else F.col(value_col)
        wk = F.lit(float(alpha) ** k)
        term = F.when(lagged.isNotNull(), lagged * wk).otherwise(F.lit(0.0))
        wgt = F.when(lagged.isNotNull(), wk).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    return df.withColumn(
        out_col,
        F.when(den > 0, F.round(num / den, 6)),
    )
