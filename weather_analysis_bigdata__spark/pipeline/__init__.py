"""Reference-parity medallion pipeline (Bronze → Silver → Gold).

The reference (Weather_API.py) is a Databricks notebook implementing this
pipeline imperatively over NOAA GHCND data; here it is a parameterized
library: explicit schemas, Parquet-materialized layers, every analytic
pushed into Spark (SURVEY.md §7.1).
"""
