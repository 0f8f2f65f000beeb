"""The species-range ETL itself, re-expressed as one lazy Spark dataflow
(reference lifecycle: SURVEY.md §3; ``species_range_etl.py:239-286``)."""
