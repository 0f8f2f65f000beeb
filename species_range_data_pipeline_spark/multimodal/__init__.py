"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` payload columns plus typed struct
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` / ``pandas_udf`` stages.  The container ships
no image/audio libraries, so real-format decoding is STUBBED behind
``NotImplementedError`` while a deterministic fake codec (FAKEIMG/FAKEVID
headers) keeps the Spark-side plumbing — schema, batch shape, partitioning —
real and tested (see tests/test_multimodal.py)."""
