"""NOAA connector tests with a deterministic fake HTTP layer —
pagination, whitelist pushdown, distributed fetch, end-to-end into the
Bronze pivot."""

from __future__ import annotations

import pytest

from tests.fixtures import DATATYPES


def fake_http_get(url: str, params: dict) -> dict:
    """Deterministic NOAA-shaped responder: 2.5 pages of records per
    station-year (limit/offset honored), plus metadata lookups."""
    if url.endswith("/data") or "cdo-web/api/v2/data" in url:
        station = params["stationid"]
        year = int(params["startdate"][:4])
        total = 2500  # forces 3 pages at limit=1000
        offset = params["offset"] - 1
        limit = params["limit"]
        results = []
        for i in range(offset, min(offset + limit, total)):
            dt = DATATYPES[i % len(DATATYPES)] if i % 11 else "PSUN"  # rogue
            day = i % 28 + 1
            results.append(
                {
                    "date": f"{year}-01-{day:02d}T00:00:00",
                    "station": station,
                    "datatype": dt,
                    "value": float(i % 300) / 10,
                    "latitude": 40.0,
                    "longitude": -70.0,
                }
            )
        return {"results": results}
    # station metadata endpoint
    sid = url.rsplit("/", 1)[-1]
    return {"name": f"STATION {sid[-4:]}", "latitude": 41.5, "longitude": -71.25}


def test_pagination_visits_all_pages():
    from weather_analysis_bigdata__spark.sources.noaa import fetch_station_year

    recs = list(fetch_station_year("GHCND:X1", 2020, fake_http_get))
    assert len(recs) == 2500


def test_distributed_ingest_and_pivot(spark):
    from weather_analysis_bigdata__spark.pipeline.bronze import build_bronze
    from weather_analysis_bigdata__spark.sources.noaa import distributed_ingest

    long_df = distributed_ingest(
        spark, ["GHCND:X1", "GHCND:X2"], [2020, 2021], fake_http_get
    )
    # whitelist applied at the source: no rogue datatypes shipped
    assert long_df.filter(long_df.datatype == "PSUN").count() == 0
    n = long_df.count()
    assert n == 4 * (2500 - 2500 // 11 - 1)  # per slice minus rogue rows
    bronze = build_bronze(long_df)
    assert bronze.count() == 2 * 2 * 28  # stations × years × distinct days
    assert "max_temperature" in bronze.columns


def test_station_metadata_lookup():
    from weather_analysis_bigdata__spark.sources.noaa import station_metadata

    rows = station_metadata(["GHCND:A", "GHCND:B"], fake_http_get)
    assert len(rows) == 2
    assert rows[0][1].startswith("STATION")
    assert rows[0][2] == 41.5


def test_requests_layer_is_import_gated():
    from weather_analysis_bigdata__spark.sources import noaa

    try:
        import requests  # noqa: F401

        pytest.skip("requests installed; gate not exercised")
    except ImportError:
        with pytest.raises(ImportError):
            noaa._requests_http_get("tok")
