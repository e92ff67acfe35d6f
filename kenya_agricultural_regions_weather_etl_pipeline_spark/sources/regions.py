"""Static agricultural-region dimension (SURVEY.md §2 S3).

The reference keeps 15 regions with coordinates as a Python dict
constant (/root/reference/daily_weather_etl_kenya.py:27-43) and loops
over it for per-region HTTP fetches. Here it is a 15-row broadcastable
dimension DataFrame: any join against it is a broadcast hash join
(no shuffle), which is exactly what you want at 100 TB — the fact side
streams, the dim side ships once per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Same 15 regions/coordinates as the reference constant
# (/root/reference/daily_weather_etl_kenya.py:27-43).
AGRICULTURAL_REGIONS: dict[str, dict[str, float]] = {
    "Nakuru": {"lat": -0.3031, "lon": 36.0800},
    "Meru": {"lat": 0.0467, "lon": 37.6500},
    "Eldoret": {"lat": 0.5143, "lon": 35.2698},
    "Kitale": {"lat": 1.0154, "lon": 35.0062},
    "Kericho": {"lat": -0.3676, "lon": 35.2866},
    "Nyeri": {"lat": -0.4167, "lon": 36.9500},
    "Embu": {"lat": -0.5308, "lon": 37.4500},
    "Machakos": {"lat": -1.5177, "lon": 37.2634},
    "Thika": {"lat": -1.0332, "lon": 37.0692},
    "Mombasa": {"lat": -4.0435, "lon": 39.6682},
    "Kisumu": {"lat": -0.1022, "lon": 34.7617},
    "Narok": {"lat": -1.0833, "lon": 35.8667},
    "Bungoma": {"lat": 0.5692, "lon": 34.5606},
    "Kakamega": {"lat": 0.2827, "lon": 34.7519},
    "Bomet": {"lat": -0.7833, "lon": 35.3333},
}


def regions_df(spark: SparkSession) -> DataFrame:
    """15-row region dimension: region string, latitude double, longitude double.

    Built as a pure-JVM VALUES relation (functions.jvmframes): this
    frame is referenced by EVERY weather micro-batch, and a Python-local
    createDataFrame would re-run a Python-RDD scan task per action."""
    from ..functions.jvmframes import values_frame

    rows = [(r, c["lat"], c["lon"]) for r, c in AGRICULTURAL_REGIONS.items()]
    return values_frame(
        spark, rows, "region string, latitude double, longitude double"
    )
