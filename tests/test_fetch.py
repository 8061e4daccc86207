"""HTTP fetch layer (injectable transport): URL construction, per-API
failure policies (carbon fallback-to-empty vs propagate), AGILE tariff
discovery + fallback code, multi-day carbon union through the normalizer,
payload-dir landing consumed by the ingest CLI, and health probes —
all without network, mirroring reference raw_data.py:22-206,360-394."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from big_data_project_datapipeline_spark.sources import fetch as FX
from big_data_project_datapipeline_spark.sources.json_payloads import (
    normalize_carbon_records,
    normalize_prices,
)

DAY = dt.date(2024, 1, 15)


class FakeTransport:
    """Canned per-URL responses; a value that is an Exception is raised.
    Records every (url, timeout) call for assertions."""

    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, url, timeout):
        self.calls.append((url, timeout))
        for prefix, resp in self.responses.items():
            if url.startswith(prefix):
                if isinstance(resp, Exception):
                    raise resp
                return resp
        raise AssertionError(f"unexpected URL {url}")


def test_weather_url_has_day_window_and_hourly_vars():
    url = FX.weather_url(DAY)
    assert "start_date=2024-01-15" in url and "end_date=2024-01-15" in url
    assert "temperature_2m" in url and "shortwave_radiation" in url
    assert url.startswith(FX.API_ENDPOINTS["weather"])


def test_weather_failure_propagates():
    t = FakeTransport({FX.API_ENDPOINTS["weather"]: RuntimeError("503")})
    with pytest.raises(RuntimeError):
        FX.fetch_weather(t, DAY)


def test_carbon_partial_failure_keeps_other_day(spark):
    ok = {"data": [{"from": "2024-01-15T00:00Z", "intensity": {"actual": 101.0}}]}
    t = FakeTransport(
        {
            f"{FX.API_ENDPOINTS['carbon_intensity']}/2024-01-15": ok,
            f"{FX.API_ENDPOINTS['carbon_intensity']}/2024-01-16": TimeoutError("slow"),
        }
    )
    payloads = FX.fetch_carbon(t, DAY)
    assert payloads == [ok]
    assert all(timeout == 10.0 for _, timeout in t.calls)  # reference timeout
    df = normalize_carbon_records(spark, payloads)
    assert df.count() == 1


def test_carbon_total_failure_yields_empty_frame_not_error(spark):
    t = FakeTransport(
        {FX.API_ENDPOINTS["carbon_intensity"]: ConnectionError("down")}
    )
    payloads = FX.fetch_carbon(t, DAY)
    assert payloads == []
    df = normalize_carbon_records(spark, payloads)
    assert df.count() == 0
    assert "carbon_intensity_actual" in df.columns  # typed empty frame


def test_agile_discovery_parses_tariff_from_link():
    catalog = {
        "results": [
            {"code": "FIXED-2024", "links": []},
            {
                "code": "AGILE-24-04-03",
                "links": [
                    {
                        "href": "https://api.octopus.energy/v1/products/"
                        "AGILE-24-04-03/electricity-tariffs/"
                        "E-1R-AGILE-24-04-03-C/"
                    }
                ],
            },
        ]
    }
    assert FX.discover_agile_tariff(catalog) == (
        "AGILE-24-04-03",
        "E-1R-AGILE-24-04-03-C",
    )


def test_agile_discovery_fallback_code_and_no_agile_error():
    code, tariff = FX.discover_agile_tariff(
        {"results": [{"code": "AGILE-X", "links": [{"href": "https://other"}]}]}
    )
    assert (code, tariff) == ("AGILE-X", "E-1R-AGILE-X-A")
    with pytest.raises(ValueError, match="No Agile"):
        FX.discover_agile_tariff({"results": [{"code": "FIXED"}]})


def test_prices_two_step_fetch_and_window(spark):
    now = dt.datetime(2024, 1, 16, 8, 0, tzinfo=dt.timezone.utc)
    catalog = {"results": [{"code": "AGILE-X", "links": []}]}
    rates = {
        "results": [
            {"valid_from": "2024-01-15T00:00:00Z", "value_inc_vat": 21.5}
        ]
    }
    t = FakeTransport(
        {
            FX.API_ENDPOINTS["octopus_prices"] + "AGILE-X/": rates,
            FX.API_ENDPOINTS["octopus_prices"]: catalog,
        }
    )
    payload = FX.fetch_prices(t, now=now)
    rates_call = t.calls[-1][0]
    assert "period_from=2024-01-13T08:00:00Z" in rates_call  # 3-day window
    assert "period_to=2024-01-16T08:00:00Z" in rates_call
    assert "E-1R-AGILE-X-A" in rates_call
    df = normalize_prices(spark, payload)
    row = df.collect()[0]
    assert abs(row["retail_price_£_per_kWh"] - 0.215) < 1e-12  # /100


def test_fetch_all_lands_cli_payload_conventions(tmp_path):
    ok_arrays = {"hourly": {"time": ["2024-01-15T00:00"], "temperature_2m": [5.0]}}
    t = FakeTransport(
        {
            FX.API_ENDPOINTS["weather"]: ok_arrays,
            FX.API_ENDPOINTS["air_quality"]: {"hourly": {"time": []}},
            f"{FX.API_ENDPOINTS['carbon_intensity']}/2024-01-15": {"data": []},
            f"{FX.API_ENDPOINTS['carbon_intensity']}/2024-01-16": RuntimeError(),
            FX.API_ENDPOINTS["generation_mix"]: {
                "data": {"from": "2024-01-15T00:00Z", "generationmix": []}
            },
            FX.API_ENDPOINTS["octopus_prices"] + "AGILE-X/": {"results": []},
            FX.API_ENDPOINTS["octopus_prices"]: {
                "results": [{"code": "AGILE-X", "links": []}]
            },
        }
    )
    payloads = FX.fetch_all(
        t, DAY, now=dt.datetime(2024, 1, 16, tzinfo=dt.timezone.utc)
    )
    out = tmp_path / "landed"
    FX.write_payload_dir(payloads, str(out))
    names = sorted(p.name for p in out.iterdir())
    assert names == [
        "air_quality.json",
        "carbon_0.json",
        "generation_mix.json",
        "prices.json",
        "weather.json",
    ]
    assert json.loads((out / "weather.json").read_text()) == ok_arrays


def test_probe_api_health_metrics():
    calls = []

    def head(url, timeout):
        calls.append((url, timeout))
        if "octopus" in url:
            raise ConnectionError("down")

    ticks = iter(range(100))
    metrics = FX.probe_api_health(head, clock=lambda: float(next(ticks)))
    assert metrics["total_apis"] == 5
    assert metrics["api_success_rate"] == 0.8  # 4/5, reference rounding
    assert metrics["avg_api_response_time"] == 1.0  # successful probes only
    assert all(t == 5.0 for _, t in calls)  # reference HEAD timeout


def test_probe_all_down_gives_none_latency():
    def head(url, timeout):
        raise ConnectionError("down")

    metrics = FX.probe_api_health(head)
    assert metrics["api_success_rate"] == 0.0
    assert metrics["avg_api_response_time"] is None
