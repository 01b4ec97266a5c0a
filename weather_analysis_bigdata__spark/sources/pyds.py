"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests weather rows by paginating a REST API inside the
driver loop (Weather_API.py:50-113); sources/noaa.py re-expressed that
as a partitioned mapInPandas fetch. This module goes one step further
and packages ingestion as a first-class **pluggable connector**: a
``DataSource`` with named registration, options, a declared schema, and
one ``InputPartition`` per station — Spark schedules each partition's
``read()`` on an executor, so ingestion scales horizontally exactly
like any other scan and composes with every downstream operator
(filters on the declared schema still prune columns Spark-side).

The payload here is a deterministic synthetic weather generator
(integer-derived, so the DuckDB oracle can reproduce it bit-for-bit);
swapping the generator body for real HTTP calls (the noaa.py fetch
logic) turns it into a live connector without touching the API surface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class StationPartition(InputPartition):
    def __init__(self, station_idx: int):
        self.station_idx = station_idx


class SyntheticWeatherReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_stations = int(options.get("stations", 5))
        self.n_days = int(options.get("days", 365))

    def partitions(self) -> list[InputPartition]:
        # One partition per station: the unit of parallel ingest.
        return [StationPartition(i) for i in range(self.n_stations)]

    def read(self, partition: StationPartition) -> Iterator[tuple]:
        i = partition.station_idx
        for d in range(self.n_days):
            # Integer-derived weather: exactly reproducible anywhere.
            tmax = ((i * 37 + d * 13) % 400 - 100) / 10.0
            prcp = ((i * 7 + d * 3) % 250) / 10.0
            yield (f"STATION_{i}", d, tmax, prcp)


class SyntheticWeatherDataSource(DataSource):
    """``spark.read.format("synthetic_weather").option("days", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_weather"

    def schema(self) -> str:
        return "station string, day int, tmax_c double, prcp_mm double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticWeatherReader(self.options)


def register_synthetic_weather(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(SyntheticWeatherDataSource)
