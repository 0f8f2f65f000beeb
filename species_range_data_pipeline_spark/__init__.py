"""PySpark-native analytics engine with the capabilities of
American-Forests/species-range-data-pipeline, re-expressed Spark-first.

The reference (/root/reference/species_range_etl.py) is a single-node batch
ETL for species-range geospatial data.  This package expresses each of its
dataflow operators (SURVEY.md §2) as idiomatic DataFrame/SQL plans, adds the
standard relational surface, and extends it with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing, streaming) designed for 100 TB / 1000-executor scale.

Layout
------
- ``session``    SparkSession builder with scale-tuned defaults
- ``catalog``    explicit schemas + loaders for the fixture tables
- ``sources``    text/CSV, binary/zip, JDBC sink adapters (S1/S2/S4/T1/K1)
- ``functions``  column-expression libraries: strings (T2/T6), vectors,
                 text analysis, WKB geometry codec + grid geometry
- ``operators``  dedup, similarity search, idempotency anti-join (D1)
- ``plans``      named queries registered with the driver contract
- ``pipeline``   the species-range ETL itself, Spark-first (raster →
                 threshold → polygonize → dissolve → area → sink)
- ``streaming``  Structured Streaming over the events table
- ``multimodal`` opaque-binary column plumbing with stubbed decoders
"""

__version__ = "0.1.0"
