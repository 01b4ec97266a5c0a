"""Deterministic NOAA-shaped fixtures (FIXTURES.md §A).

Synthetic long-format records mirroring one NOAA CDO v2 ``results[]``
record (Weather_API.py:76-91), with the edge cases the Bronze/Silver
layers must handle: duplicate (date, station, datatype) measurements
(last-write-wins), fully-duplicated rows (dedup), missing datatypes
(pivot nulls), whole year×location groups with no wind data (imputation
fallback-to-0), and avg_temperature derivable from min/max.

Values are pure hash functions of (station, day, datatype) — no RNG, no
clock — so every test run sees identical data.
"""

from __future__ import annotations

import hashlib

STATIONS = [
    # (station_id, name, latitude, longitude) — same shape as
    # API-station_data.csv:1-5.
    ("GHCND:USW00094728", "NY CITY CENTRAL PARK", 40.77898, -73.96925),
    ("GHCND:USW00023234", "SAN FRANCISCO INTL", 37.6197, -122.36469),
    ("GHCND:USW00023174", "LOS ANGELES INTL", 33.93816, -118.38866),
    ("GHCND:USW00012960", "HOUSTON INTERCONT", 29.98027, -95.36039),
]

DATATYPES = ("PRCP", "SNOW", "SNWD", "TMAX", "TMIN", "TAVG",
             "AWND", "WSF2", "WDF2", "WT01")

#: A datatype outside the whitelist — must be filtered by the pivot.
ROGUE_DATATYPE = "PSUN"


def _h(*parts: object) -> int:
    return int(hashlib.md5(":".join(map(str, parts)).encode()).hexdigest()[:8], 16)


def _value(station: str, day: int, dt: str) -> float:
    base = _h(station, day, dt) % 1000
    if dt in ("TMAX", "TAVG"):
        return round(base / 50 + 10, 1)
    if dt == "TMIN":
        return round(base / 50 - 5, 1)
    if dt == "WDF2":
        return float(base % 360)
    if dt == "WT01":
        return 1.0
    return round(base / 10, 1)


def noaa_long_rows(years: tuple[int, ...] = (2023, 2024), days_per_year: int = 40):
    """Long-format rows: (date, station, lat, lon, datatype, value, seq)."""
    rows = []
    seq = 0
    for sid, _name, lat, lon in STATIONS:
        for year in years:
            for day in range(days_per_year):
                month = day // 28 + 1
                dom = day % 28 + 1
                date = f"{year}-{month:02d}-{dom:02d}T00:00:00"
                for dt in DATATYPES:
                    h = _h(sid, year, day, dt)
                    # ~20% of measurements missing → pivot nulls
                    if h % 5 == 0:
                        continue
                    # station 0 in 2023 reports no wind at all → whole
                    # year×location group null → impute falls back to 0
                    if sid == STATIONS[0][0] and year == 2023 and dt in (
                        "AWND", "WDF2"
                    ):
                        continue
                    # avg_temperature often missing → derived (min+max)/2
                    if dt == "TAVG" and h % 3 == 0:
                        continue
                    rows.append(
                        (date, sid, lat, lon, dt, _value(sid, day, dt), seq)
                    )
                    seq += 1
                # duplicate measurement for TMAX on some days:
                # last-write-wins must pick this (higher seq)
                if _h(sid, year, day) % 7 == 0:
                    rows.append(
                        (date, sid, lat, lon, "TMAX",
                         _value(sid, day, "TMAX") + 100.0, seq)
                    )
                    seq += 1
                # out-of-whitelist datatype — must disappear in the pivot
                rows.append((date, sid, lat, lon, ROGUE_DATATYPE, 1.0, seq))
                seq += 1
    # fully duplicated rows (same seq!) — Bronze dedup must collapse them
    rows.extend(rows[:25])
    return rows


def station_dim_rows():
    return list(STATIONS)
