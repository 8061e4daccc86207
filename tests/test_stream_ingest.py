"""Streaming twin of the cron fetch→ingest loop: land carbon payload
files (the fetch CLI's conventions), drain with availableNow into parquet,
land MORE files, drain again — file-source checkpointing must process each
payload exactly once, and the streamed rows must match the batch
normalizer on the same payloads."""

from __future__ import annotations

import json
import os

from big_data_project_datapipeline_spark.sources.fetch import write_payload_dir
from big_data_project_datapipeline_spark.sources.json_payloads import (
    normalize_carbon_records,
)
from big_data_project_datapipeline_spark.streaming.incremental import (
    run_available_now_to_parquet,
    stream_carbon_payloads,
)


def _carbon_payload(day: str, n: int, base: int = 100) -> dict:
    return {
        "data": [
            {
                "from": f"{day}T{h:02d}:00Z",
                "to": f"{day}T{h:02d}:30Z",
                "intensity": {
                    "actual": float(base + h),
                    "forecast": float(base + h + 1),
                    "index": "moderate",
                },
            }
            for h in range(n)
        ]
    }


def _drain(spark, landing, out, cp):
    q = run_available_now_to_parquet(
        stream_carbon_payloads(spark, landing), out, cp
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_incremental_drain_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "bronze")
    cp = str(tmp_path / "cp")

    wave1 = [_carbon_payload("2024-01-15", 4), _carbon_payload("2024-01-16", 3)]
    write_payload_dir(
        {
            "weather": {},
            "air_quality": {},
            "generation_mix": {},
            "prices": {},
            "carbon": wave1,
        },
        landing,
    )
    got1 = _drain(spark, landing, out, cp)
    assert got1.count() == 7

    # streamed rows == batch normalizer on the same payloads
    batch = normalize_carbon_records(spark, wave1)
    assert sorted(got1.columns) == sorted(batch.columns)
    assert got1.exceptAll(batch).count() == 0
    assert batch.exceptAll(got1).count() == 0

    # wave 2: a NEW payload file lands (next cron tick); old files must
    # not be reprocessed (exactly-once via the checkpointed file log)
    with open(os.path.join(landing, "carbon_2.json"), "w") as fh:
        json.dump(_carbon_payload("2024-01-17", 5, base=200), fh)
    got2 = _drain(spark, landing, out, cp)
    assert got2.count() == 12  # 7 + 5, no duplicates
    assert (
        got2.filter("carbon_intensity_actual >= 200").count() == 5
    )


def test_skip_record_guard_and_lenient_ts_in_stream(spark, tmp_path):
    """F6 + P4 semantics survive the streaming path: records missing
    `from` drop; unparseable timestamps coerce to null and drop."""
    landing = str(tmp_path / "landing")
    payload = {
        "data": [
            {"from": "2024-01-15T00:00Z", "intensity": {"actual": 1, "forecast": 2, "index": "low"}},
            {"from": None, "intensity": {"actual": 3, "forecast": 4, "index": "low"}},
            {"from": "", "intensity": {"actual": 5, "forecast": 6, "index": "low"}},
            {"from": "not-a-date", "intensity": {"actual": 7, "forecast": 8, "index": "low"}},
        ]
    }
    os.makedirs(landing)
    with open(os.path.join(landing, "carbon_0.json"), "w") as fh:
        json.dump(payload, fh)
    # non-carbon files in the landing dir are ignored by the glob
    with open(os.path.join(landing, "weather.json"), "w") as fh:
        json.dump({"hourly": {"time": []}}, fh)

    got = _drain(
        spark, landing, str(tmp_path / "out"), str(tmp_path / "cp")
    )
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["carbon_intensity_actual"] == 1
