"""kenya_agricultural_regions_weather_etl_pipeline_spark.

A brand-new PySpark-native analytics engine with the query and
data-processing capabilities of the reference
``HillaryOnyango/Kenya-Agricultural-Regions-Weather-ETL-Pipeline``
(an Airflow + pandas + PostgreSQL daily weather ETL), re-expressed as
lazy, columnar DataFrame/SQL plans on Catalyst with partitioned
Parquet storage, and extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession builders (local test + scale notes)
- ``schemas``    : explicit StructType schemas (raw API JSON, weather_data)
- ``sources``    : table loaders, static region dim, simulated weather API source
- ``functions``  : native Column expression libraries (weather, text, vectors)
- ``operators``  : dedup / merge / quality / similarity / top-k operators
- ``plans``      : end-to-end composed pipelines (the reference DAG as one lazy plan)
- ``streaming``  : Structured Streaming analogue of the daily micro-batch
"""

__version__ = "0.1.0"
