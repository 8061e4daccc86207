"""HTTP fetch layer with injectable transport (reference raw_data.py:22-206).

The reference's five fetchers are ``requests`` calls with per-API quirks:

- weather / air quality (S1/S2): one GET each, parallel-array body,
  ``raise_for_status`` — a failure aborts the run (raw_data.py:32-33,61-62);
- carbon intensity (S3): TWO dated URLs (yesterday + today), each in its
  own try/except with ``timeout=10`` — a failed URL just contributes no
  records, both failing yields an EMPTY frame, never an error
  (raw_data.py:93-111);
- generation mix (S4): one GET, raise on failure (raw_data.py:144-145);
- prices (S5): two-step — product catalog GET, discover the first AGILE
  product (``ValueError`` if none), tariff code parsed from the
  electricity-tariffs link with an ``E-1R-{code}-A`` fallback, then a
  3-day-window rates GET (raw_data.py:158-206).

This module reproduces those URL constructions and failure policies around
an injectable ``transport`` callable ``(url, timeout) -> parsed JSON`` so
the whole layer is testable without network (the sandbox has none) and
swappable for any HTTP client in production. ``requests_transport()``
builds the real one when ``requests`` is importable.

The returned payloads are exactly what the normalizers
(``sources.json_payloads``) and the ingest CLI consume; ``fetch_all`` +
``write_payload_dir`` is the reference's cron fetch step end-to-end.

Health monitoring (reference raw_data.py:360-394): ``probe_api_health``
HEADs each endpoint with ``timeout=5``, counting successes and averaging
the successful probes' latencies — same metric definitions
(``api_success_rate`` rounded to 2, ``avg_api_response_time`` to 3, None
when everything failed).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time
from collections.abc import Callable
from typing import Any

Transport = Callable[[str, float | None], dict[str, Any]]
HeadTransport = Callable[[str, float | None], None]  # raises on failure

WEATHER_HOURLY = (
    "temperature_2m,relative_humidity_2m,wind_speed_10m,"
    "cloudcover,shortwave_radiation"
)
AIR_QUALITY_HOURLY = (
    "pm10,pm2_5,carbon_monoxide,nitrogen_dioxide,sulphur_dioxide,ozone,us_aqi"
)

API_ENDPOINTS = {
    "weather": "https://archive-api.open-meteo.com/v1/archive",
    "air_quality": "https://air-quality-api.open-meteo.com/v1/air-quality",
    "carbon_intensity": "https://api.carbonintensity.org.uk/intensity/date",
    "generation_mix": "https://api.carbonintensity.org.uk/generation",
    "octopus_prices": "https://api.octopus.energy/v1/products/",
}


def requests_transport(retries: int = 0) -> Transport:
    """Real transport over ``requests`` (importable only — no network in
    this sandbox). ``retries`` re-GETs transient failures; the reference
    itself never retries, so the default keeps parity."""
    import requests  # noqa: PLC0415 — optional dependency

    def _get(url: str, timeout: float | None) -> dict[str, Any]:
        last: Exception | None = None
        for _ in range(retries + 1):
            try:
                resp = requests.get(url, timeout=timeout)
                resp.raise_for_status()
                return resp.json()
            except Exception as exc:  # noqa: BLE001 — retried, then re-raised
                last = exc
        assert last is not None
        raise last

    return _get


def weather_url(target_date: dt.date, lat: float = 51.5072, lon: float = -0.1276) -> str:
    return (
        f"{API_ENDPOINTS['weather']}?"
        f"latitude={lat}&longitude={lon}"
        f"&start_date={target_date}&end_date={target_date}"
        f"&hourly={WEATHER_HOURLY}"
    )


def air_quality_url(
    target_date: dt.date, lat: float = 51.5072, lon: float = -0.1276
) -> str:
    return (
        f"{API_ENDPOINTS['air_quality']}?"
        f"latitude={lat}&longitude={lon}"
        f"&start_date={target_date}&end_date={target_date}"
        f"&hourly={AIR_QUALITY_HOURLY}"
    )


def fetch_weather(
    transport: Transport, target_date: dt.date, lat: float = 51.5072,
    lon: float = -0.1276,
) -> dict[str, Any]:
    """S1 fetch — no fallback: an HTTP error propagates (reference
    raise_for_status, raw_data.py:32-33)."""
    return transport(weather_url(target_date, lat, lon), None)


def fetch_air_quality(
    transport: Transport, target_date: dt.date, lat: float = 51.5072,
    lon: float = -0.1276,
) -> dict[str, Any]:
    """S2 fetch — no fallback (reference raw_data.py:61-62)."""
    return transport(air_quality_url(target_date, lat, lon), None)


def fetch_carbon(
    transport: Transport,
    target_date: dt.date,
    next_date: dt.date | None = None,
    timeout: float = 10.0,
) -> list[dict[str, Any]]:
    """S3 fetch: one dated URL for the target day and one for the day
    after (the reference fetches yesterday + today so late half-hours
    land, raw_data.py:88-98). Each URL fails independently — an error
    contributes zero records instead of propagating; the caller's
    normalizer turns an empty list into an empty typed frame."""
    next_date = next_date or (target_date + dt.timedelta(days=1))
    payloads: list[dict[str, Any]] = []
    for day in (target_date, next_date):
        url = f"{API_ENDPOINTS['carbon_intensity']}/{day}"
        try:
            payloads.append(transport(url, timeout))
        except Exception as exc:  # noqa: BLE001 — per-URL fallback by design
            print(f"Error fetching data from {url}: {exc}")
    return payloads


def fetch_generation_mix(transport: Transport) -> dict[str, Any]:
    """S4 fetch — no fallback (reference raw_data.py:144-145)."""
    return transport(API_ENDPOINTS["generation_mix"], None)


def discover_agile_tariff(catalog: dict[str, Any]) -> tuple[str, str]:
    """From the product catalog payload, pick the first AGILE product and
    parse its tariff code from the electricity-tariffs link; fall back to
    ``E-1R-{code}-A`` when no link matches (reference raw_data.py:163-180).
    Raises ``ValueError`` when no AGILE product exists."""
    agile = [p for p in catalog.get("results", []) if "AGILE" in p["code"]]
    if not agile:
        raise ValueError("No Agile tariffs found")
    product = agile[0]
    code = product["code"]
    tariff = None
    for link in product.get("links", []):
        if "electricity-tariffs" in link.get("href", ""):
            tariff = link["href"].split("/")[-2]
            break
    return code, tariff or f"E-1R-{code}-A"


def rates_url(product_code: str, tariff_code: str, now: dt.datetime) -> str:
    """3-day rates window ending now (reference raw_data.py:182-193)."""
    start = now - dt.timedelta(days=3)
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    return (
        f"https://api.octopus.energy/v1/products/{product_code}/"
        f"electricity-tariffs/{tariff_code}/standard-unit-rates/"
        f"?period_from={start.strftime(fmt)}&period_to={now.strftime(fmt)}"
    )


def fetch_prices(
    transport: Transport, now: dt.datetime | None = None
) -> dict[str, Any]:
    """S5 fetch: catalog → AGILE discovery → rates. Either GET failing
    propagates (reference raise_for_status on both)."""
    now = now or dt.datetime.now(dt.timezone.utc)
    catalog = transport(API_ENDPOINTS["octopus_prices"], None)
    product_code, tariff_code = discover_agile_tariff(catalog)
    return transport(rates_url(product_code, tariff_code, now), None)


def fetch_all(
    transport: Transport,
    target_date: dt.date,
    now: dt.datetime | None = None,
) -> dict[str, Any]:
    """The reference's whole fetch step: five sources with their
    individual failure policies. Returns the payload dict the ingest CLI
    consumes (carbon as a list — one payload per fetched day)."""
    return {
        "weather": fetch_weather(transport, target_date),
        "air_quality": fetch_air_quality(transport, target_date),
        "carbon": fetch_carbon(transport, target_date),
        "generation_mix": fetch_generation_mix(transport),
        "prices": fetch_prices(transport, now),
    }


def write_payload_dir(payloads: dict[str, Any], payload_dir: str) -> None:
    """Land the fetched payloads in the ingest CLI's file conventions
    (weather.json, air_quality.json, generation_mix.json, prices.json,
    carbon_0.json, carbon_1.json, ...)."""
    os.makedirs(payload_dir, exist_ok=True)
    for name in ("weather", "air_quality", "generation_mix", "prices"):
        with open(os.path.join(payload_dir, f"{name}.json"), "w") as fh:
            json.dump(payloads[name], fh)
    # clear stale carbon shards first: the ingest CLI globs carbon_*.json,
    # and a run that fetched FEWER payloads than the previous one would
    # otherwise leave a prior day's file to be ingested as fresh (review
    # fix)
    import glob as _glob

    for stale in _glob.glob(os.path.join(payload_dir, "carbon_*.json")):
        os.remove(stale)
    for i, payload in enumerate(payloads.get("carbon", [])):
        with open(os.path.join(payload_dir, f"carbon_{i}.json"), "w") as fh:
            json.dump(payload, fh)


def probe_api_health(
    head: HeadTransport,
    endpoints: dict[str, str] | None = None,
    timeout: float = 5.0,
    clock: Callable[[], float] = time.monotonic,
) -> dict[str, Any]:
    """API health probes (reference raw_data.py:360-394): HEAD each
    endpoint; success rate over all endpoints, mean latency over the
    SUCCESSFUL probes only (None when none succeeded). Inject ``head``
    and ``clock`` to test without network or real time."""
    endpoints = endpoints if endpoints is not None else API_ENDPOINTS
    success = 0
    total_latency = 0.0
    for url in endpoints.values():
        try:
            start = clock()
            head(url, timeout)
            total_latency += round(clock() - start, 3)
            success += 1
        except Exception:  # noqa: BLE001 — a failed probe is a data point
            pass
    return {
        "total_apis": len(endpoints),
        "api_success_rate": round(success / len(endpoints), 2) if endpoints else None,
        "avg_api_response_time": round(total_latency / success, 3) if success else None,
    }
