"""Explicit StructType schemas (SURVEY.md §1.3-§1.4).

The reference declares its schema up front as Postgres DDL
(/root/reference/daily_weather_etl_kenya.py:78-113) and consumes a
nested OpenWeatherMap JSON document per region
(/root/reference/daily_weather_etl_kenya.py:157-188). We declare both
as StructTypes — no schema inference anywhere on the hot path (at
100 TB, inference means an extra full scan).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# Raw OpenWeatherMap "current weather" response (nested), per
# /root/reference/daily_weather_etl_kenya.py:157-188 field accesses and
# FIXTURES.md §1.1. All fields nullable: the reference tolerates missing
# visibility/wind.deg/rain via .get() defaults (:170-172, :183-188).
# ---------------------------------------------------------------------------
RAW_WEATHER_SCHEMA = StructType(
    [
        StructField("region", StringType()),  # injected by the per-region fetch loop
        StructField("dt", LongType()),  # epoch seconds (:178)
        StructField("visibility", IntegerType()),  # nullable (:170)
        StructField(
            "main",
            StructType(
                [
                    StructField("temp", DoubleType()),
                    StructField("feels_like", DoubleType()),
                    StructField("temp_min", DoubleType()),
                    StructField("temp_max", DoubleType()),
                    StructField("pressure", IntegerType()),
                    StructField("humidity", IntegerType()),
                ]
            ),
        ),
        StructField(
            "wind",
            StructType(
                [
                    StructField("speed", DoubleType()),
                    StructField("deg", IntegerType()),
                ]
            ),
        ),
        StructField("clouds", StructType([StructField("all", IntegerType())])),
        StructField(
            "weather",
            ArrayType(
                StructType(
                    [
                        StructField("main", StringType()),
                        StructField("description", StringType()),
                    ]
                )
            ),
        ),
        StructField(
            "rain",
            StructType(
                [
                    StructField("1h", DoubleType()),
                    StructField("3h", DoubleType()),
                ]
            ),
        ),
        StructField(
            "sys",
            StructType(
                [
                    StructField("sunrise", LongType()),
                    StructField("sunset", LongType()),
                ]
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# weather_data fact table, per the DDL
# (/root/reference/daily_weather_etl_kenya.py:80-111). `id SERIAL` and
# `created_at DEFAULT now()` are dropped (Parquet target; the key is
# (region, data_timestamp), :112). DECIMALs become doubles: the engine is
# columnar/vectorized and the oracle comparisons run on doubles.
# TIMESTAMP_NTZ: naive timestamps end-to-end (no session-tz skew vs oracle).
# ---------------------------------------------------------------------------
WEATHER_DATA_SCHEMA = StructType(
    [
        StructField("region", StringType(), False),
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("temperature", DoubleType()),
        StructField("feels_like", DoubleType()),
        StructField("temp_min", DoubleType()),
        StructField("temp_max", DoubleType()),
        StructField("pressure", IntegerType()),
        StructField("humidity", IntegerType()),
        StructField("visibility", IntegerType()),
        StructField("wind_speed", DoubleType()),
        StructField("wind_direction", IntegerType()),
        StructField("cloudiness", IntegerType()),
        StructField("weather_main", StringType()),
        StructField("weather_description", StringType()),
        StructField("rainfall_1h", DoubleType()),
        StructField("rainfall_3h", DoubleType()),
        StructField("sunrise", TimestampNTZType()),
        StructField("sunset", TimestampNTZType()),
        StructField("data_timestamp", TimestampNTZType(), False),
        StructField("extraction_timestamp", TimestampNTZType()),
        StructField("heat_index", DoubleType()),
        StructField("dew_point", DoubleType()),
        StructField("is_favorable_temp", BooleanType()),
        StructField("is_high_humidity", BooleanType()),
        StructField("rainfall_category", StringType()),
        StructField("date", DateType()),
        StructField("hour", IntegerType()),
        StructField("month", IntegerType()),
        StructField("year", IntegerType()),
    ]
)

#: Hard-coded ordered column list the loader uses
#: (/root/reference/daily_weather_etl_kenya.py:406-414), minus id/created_at.
WEATHER_LOAD_COLUMNS: tuple[str, ...] = tuple(f.name for f in WEATHER_DATA_SCHEMA.fields)

#: Upsert / uniqueness key (/root/reference/daily_weather_etl_kenya.py:112, :425).
WEATHER_KEY: tuple[str, str] = ("region", "data_timestamp")
