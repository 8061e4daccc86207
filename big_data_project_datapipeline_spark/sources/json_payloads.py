"""JSON payload layout normalizers (S1–S5, SURVEY.md §2.1).

Each function takes a parsed JSON payload (a Python dict — the body the
reference fetches at raw_data.py:22-206) or a DataFrame of raw records, and
returns a typed DataFrame. The shapes:

- S1/S2 *parallel arrays*: ``{"hourly": {"time": [...], "temperature_2m":
  [...]}}`` → zip columns row-wise (reference raw_data.py:36-45,65-76).
- S3 *record list with nulls*: ``{"data": [{"from": ts, "intensity":
  {"actual": ..}}]}`` → flatten nested structs, skip records missing the
  key, coerce bad timestamps to null (reference raw_data.py:114-131).
- S4 *pivot*: ``{"data": {"generationmix": [{"fuel": .., "perc": ..}]}}`` →
  one wide row, whitelist of 6 fuels (reference raw_data.py:144-154).
- S5 *catalog + rates*: filter product codes containing "AGILE", parse the
  tariff code out of a URL, ``value_inc_vat/100`` (reference
  raw_data.py:158-206).

At 100 TB the same normalizers apply unchanged to landed JSON files: swap
``spark.createDataFrame(payload_rows)`` for ``spark.read.json(path)`` — the
column expressions are identical.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_project_datapipeline_spark import schemas
from big_data_project_datapipeline_spark.operators.pivot import pivot_records

UTC_FMT = "yyyy-MM-dd'T'HH:mm"


def normalize_parallel_arrays(
    spark: SparkSession,
    payload: dict[str, Any],
    section: str,
    mapping: dict[str, str],
    ts_key: str = "time",
    ts_col: str = "datetime",
) -> DataFrame:
    """S1/S2: parallel-array JSON → typed rows.

    ``mapping``: payload array name → output column name, e.g.
    ``{"temperature_2m": "temperature_C"}`` (reference raw_data.py:36-45).
    """
    block = payload.get(section) or {}
    times = block.get(ts_key) or []
    arrays = {out: (block.get(src) or []) for src, out in mapping.items()}
    # float() coercion: real APIs emit JSON integers (humidity 55, not
    # 55.0) and createDataFrame's DoubleType verifier REJECTS python int
    # (review fix, reproduced on live-shaped payloads)
    def _num(x):
        return float(x) if isinstance(x, (int, float)) and not isinstance(x, bool) else x

    rows = [
        tuple(
            [times[i]]
            + [_num(arr[i]) if i < len(arr) else None for arr in arrays.values()]
        )
        for i in range(len(times))
    ]
    schema = T.StructType(
        [T.StructField(ts_col, T.StringType(), True)]
        + [T.StructField(c, T.DoubleType(), True) for c in arrays]
    )
    df = spark.createDataFrame(rows, schema)
    # Lenient cast: malformed stamps → null (pandas errors="coerce", P4).
    return df.withColumn(ts_col, F.try_to_timestamp(F.col(ts_col)))


# Nested carbon-intensity record shape (reference raw_data.py:114-128).
CARBON_RECORD = T.StructType(
    [
        T.StructField("from", T.StringType(), True),
        T.StructField("to", T.StringType(), True),
        T.StructField(
            "intensity",
            T.StructType(
                [
                    T.StructField("actual", T.DoubleType(), True),
                    T.StructField("forecast", T.DoubleType(), True),
                    T.StructField("index", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def lenient_iso_timestamp(col: "F.Column") -> "F.Column":
    """pandas-``to_datetime``-like leniency (reference raw_data.py:129-131,
    144) for the APIs' ISO variants: second or minute precision, with or
    without a trailing zone. Unparseable → NULL (P4), never an ANSI error.
    Spark's default parser accepts second-precision and zone-less
    minute-precision but NOT ``2024-01-15T00:00Z`` — the carbon/generation
    APIs' actual format."""
    return F.coalesce(
        F.try_to_timestamp(col),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mmX")),
    )


def carbon_record_columns(df: DataFrame) -> DataFrame:
    """The S3 column recipe on a frame of CARBON_RECORD rows — shared by
    the dict-payload batch path and the landed-file streaming path (one
    definition, two runtimes). Skip-record guard (``from`` missing → drop,
    reference raw_data.py:116-117, F6) and coerce-to-null timestamp cast
    (:129-131, P4) as column predicates, not Python loops."""
    return (
        df.filter(F.col("from").isNotNull() & (F.col("from") != ""))
        .select(
            lenient_iso_timestamp(F.col("from")).alias("datetime"),  # ANSI-safe coerce-to-null
            F.col("intensity.actual").alias("carbon_intensity_actual"),
            F.col("intensity.forecast").alias("carbon_intensity_forecast"),
            F.col("intensity.index").alias("carbon_index"),
        )
        .filter(F.col("datetime").isNotNull())
    )


def normalize_carbon_records(
    spark: SparkSession, payloads: list[dict[str, Any]]
) -> DataFrame:
    """S3: union of per-day record-list payloads → flat typed rows."""
    records: list[Any] = []
    for p in payloads:
        for r in p.get("data") or []:
            inten = dict(r.get("intensity") or {})
            for k in ("actual", "forecast"):
                v = inten.get(k)
                if isinstance(v, int) and not isinstance(v, bool):
                    inten[k] = float(v)  # DoubleType rejects python int
            records.append({**r, "intensity": inten})
    df = spark.createDataFrame(records, CARBON_RECORD) if records else (
        spark.createDataFrame([], CARBON_RECORD)
    )
    return carbon_record_columns(df)


def normalize_generation_mix(
    spark: SparkSession, payload: dict[str, Any]
) -> DataFrame:
    """S4: list of {fuel, perc} → one wide whitelisted row (pivot).

    ``lower().replace(" ","_")`` on fuel names (reference raw_data.py:149)
    → ``lower`` + ``regexp_replace``; whitelist membership (:151) → pivot
    value list (non-listed fuels drop out of the explicit pivot values).
    """
    data = payload.get("data") or {}
    ts = data.get("from")
    mix = data.get("generationmix") or []
    schema = T.StructType(
        [
            T.StructField("fuel", T.StringType(), True),
            T.StructField("perc", T.DoubleType(), True),
        ]
    )
    def _numf(x):
        return float(x) if isinstance(x, (int, float)) and not isinstance(x, bool) else x

    df = spark.createDataFrame(
        [(r.get("fuel"), _numf(r.get("perc"))) for r in mix], schema
    ).withColumn("datetime", lenient_iso_timestamp(F.lit(ts)))
    df = df.withColumn("fuel", F.regexp_replace(F.lower("fuel"), " ", "_"))
    return pivot_records(
        df,
        keys=["datetime"],
        pivot_col="fuel",
        values=schemas.GENERATION_FUELS,
        value_col="perc",
        prefix="uk_gen_",
        suffix="_%",
    )


def normalize_prices(
    spark: SparkSession, payload: dict[str, Any]
) -> DataFrame:
    """S5 (rates part): half-hourly tariff records → (datetime, price).

    ``value_inc_vat / 100`` (reference raw_data.py:200, P2) then prune to
    2 columns (:206, P1).
    """
    results = payload.get("results") or []
    df = spark.createDataFrame(
        [
            (
                r.get("valid_from"),
                float(r["value_inc_vat"])
                if isinstance(r.get("value_inc_vat"), (int, float))
                and not isinstance(r.get("value_inc_vat"), bool)
                else r.get("value_inc_vat"),
            )
            for r in results
        ],
        T.StructType(
            [
                T.StructField("valid_from", T.StringType(), True),
                T.StructField("value_inc_vat", T.DoubleType(), True),
            ]
        ),
    )
    return df.select(
        F.try_to_timestamp(F.col("valid_from")).alias("datetime"),
        (F.col("value_inc_vat") / F.lit(100.0)).alias("retail_price_£_per_kWh"),
    )


def quarantine_split(
    df: DataFrame, valid: "F.Column"
) -> tuple[DataFrame, DataFrame]:
    """Per-record error quarantine (S3-class fault tolerance, SURVEY §2.1):
    route rows failing the validity predicate to a quarantine frame instead
    of dropping them silently — at scale the quarantine side lands in its
    own sink for replay/debugging.

    Both frames share one lineage; Catalyst plans two filters over a single
    scan (no double read when the source is cached or columnar)."""
    return df.filter(valid), df.filter(~F.coalesce(valid, F.lit(False)))


def read_landed_json(
    spark,
    path: str,
    schema: "T.StructType",
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """The S1–S3 scale path: scan LANDED JSON-lines payloads (one file per
    fetch, dumped by collectors) with an EXPLICIT schema — no sampling-based
    inference pass over 100 TB — plus corrupt-record quarantine.

    Returns ``(good, quarantine)``: rows that parsed cleanly (typed per
    ``schema``) and raw malformed lines with their source file for replay.
    Mirrors the reference's per-record fault tolerance
    (raw_data_collection/raw_data.py:93-118) at file scale.

    Spark disallows queries whose only referenced source column is the
    corrupt-record column, so the parsed frame is persisted before the
    split (the documented workaround). That is the right call for the
    reference's MB-scale daily batches; at 100 TB you land ONE bronze
    parquet pass (schema + corrupt column) and filter the columnar copy —
    same plan shape, spill-safe, no JSON re-parse per side.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .withColumn("source_file", F.input_file_name())
        .cache()
    )
    good = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col, "source_file")
    quarantine = raw.filter(F.col(corrupt_col).isNotNull()).select(
        corrupt_col, "source_file"
    )
    return good, quarantine


def agile_tariff_code(products_url_col: str = "link"):
    """S5 (catalog part) column recipe: tariff code = second-to-last URL path
    segment (reference raw_data.py:176) — ``split`` + ``element_at(-2)``."""
    return F.element_at(F.split(F.col(products_url_col), "/"), -2)
