"""Source adapters: species-list TSV (S1/S2), HTML scenario scrape (S3);
binary/zip sources live in pipeline/raster.py, the JDBC sink (K1) in
pipeline/species.py."""
