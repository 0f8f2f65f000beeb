"""Read-side evidence for SCALE.md rule 60 (VERDICT r15 next #5).

Rule 60's WRITE-side bound is pinned (shard count derived from input
bytes; every published shard asserted under binaryFile's 2 GiB row
cap).  The READ-side claim — that byte-derived shard sizing is what
keeps `read_warc`'s per-task input bounded as the corpus grows — was
argued, not measured.  This sweep measures it:

corpus arms: the documents fixture replicated 1x and 10x (url-keyed
copies, so shard routing spreads them); writer arms: AUTO
(`n_shards=None`, byte-derived at a small 64 KiB target so the fixture
exercises the sizing path instead of the floor) vs FIXED (the old
`n_shards=4` default).  For each (corpus, writer) cell the read path's
binaryFile scan is materialized with `spark_partition_id()` and the
per-task input bytes / file rows are aggregated — the quantity that
becomes task memory at scale, since binaryFile materializes one whole
shard per row.

Expected shape (and what r16 measured — SCALE.md rule 60 extension):
AUTO holds max-per-task bytes roughly at the shard target as the corpus
grows 10x (more data -> more shards -> more tasks); FIXED grows
max-per-task bytes ~10x (more data -> same 4 shards -> fatter rows).

Usage: python scripts/container_read_sweep.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources.warc import (  # noqa: E402
    write_warc_corpus,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TARGET = 64 * 1024  # small target so the fixture exercises sizing


def corpus(spark, mult: int):
    """doc_id x copy keyed corpus with ~1 KiB INCOMPRESSIBLE bodies (a
    32-block keyed md5 chain).  Two measured reasons (r16 first run):

    - replicating the fixture TEXT 10x produced parquet that
      dictionary-compressed ~22x below the gzip WARC output (est 78 KB
      vs 1.7 MB written) — on an exact-duplicate corpus the input-byte
      estimate is structurally blind, which is now a documented caveat
      on ``_estimated_input_bytes`` with ``_check_shard_bytes`` as the
      hard backstop;
    - hex md5 output is LZ-incompressible enough that parquet bytes ~
      gzip-member bytes, so the sweep isolates the SIZING behavior the
      rule claims rather than a compression-ratio artifact.
    """
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    keyed = docs.crossJoin(copies)
    block = lambda i: F.md5(  # noqa: E731
        F.concat(F.lit(f"b{i}:"), F.col("doc_id"), F.lit("/"), F.col("copy"))
    )
    return keyed.select(
        F.concat(
            F.lit("https://corpus.example/c"),
            "copy",
            F.lit("/doc/"),
            "doc_id",
        ).alias("url"),
        F.encode(F.concat(*[block(i) for i in range(32)]), "UTF-8").alias(
            "body"
        ),
    )


def read_task_profile(spark, out_dir: str) -> dict:
    """Per-scan-task input bytes/rows of the binaryFile read (the exact
    scan read_warc opens), plus the shard-size distribution."""
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(out_dir)
        .select(
            F.spark_partition_id().alias("pid"),
            F.length("content").alias("nbytes"),
        )
    )
    per_task = (
        scan.groupBy("pid")
        .agg(
            F.sum("nbytes").alias("task_bytes"),
            F.count(F.lit(1)).alias("task_files"),
        )
        .collect()
    )
    shard_sizes = sorted(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.endswith(".warc.gz")
    )
    return {
        "n_shards": len(shard_sizes),
        "max_shard_bytes": shard_sizes[-1],
        "n_read_tasks": len(per_task),
        "max_task_bytes": max(r.task_bytes for r in per_task),
        "max_task_files": max(r.task_files for r in per_task),
    }


def main() -> None:
    spark = get_spark("container_read_sweep")
    # bin-packing would merge our deliberately tiny shards into few
    # tasks and mask the per-row bound; at production scale shards are
    # ~1 GiB >> maxPartitionBytes so one task holds ~one shard — mirror
    # that regime by scaling the knob down with the target
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(TARGET))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    cells = {}
    for mult in (1, 10):
        # STAGE the replicated corpus to parquet first: _auto_shards
        # sizes from the frame's inputFiles() bytes, and a generated
        # (crossJoin-replicated) frame still points at the small
        # fixture file — the first run of this sweep measured exactly
        # that failure (auto == floor at 10x).  Staging mirrors the
        # production shape (the corpus IS a table on disk) and is now a
        # documented caveat on _auto_shards.
        staged = tempfile.mkdtemp(prefix=f"readsweep_src_{mult}x_")
        corpus(spark, mult).write.mode("overwrite").parquet(staged)
        src = spark.read.parquet(staged)
        try:
            for arm, n_shards in (("auto", None), ("fixed4", 4)):
                out = tempfile.mkdtemp(prefix=f"readsweep_{arm}_{mult}x_")
                try:
                    write_warc_corpus(
                        src,
                        out,
                        n_shards=n_shards,
                        target_shard_bytes=TARGET,
                    ).collect()
                    cells[f"{arm}_{mult}x"] = read_task_profile(spark, out)
                finally:
                    shutil.rmtree(out, ignore_errors=True)
        finally:
            shutil.rmtree(staged, ignore_errors=True)
    auto_growth = (
        cells["auto_10x"]["max_task_bytes"]
        / cells["auto_1x"]["max_task_bytes"]
    )
    fixed_growth = (
        cells["fixed4_10x"]["max_task_bytes"]
        / cells["fixed4_1x"]["max_task_bytes"]
    )
    print(
        json.dumps(
            {
                "metric": "container_read_per_task_bytes",
                "target_shard_bytes": TARGET,
                "cells": cells,
                "auto_max_task_bytes_growth_10x": round(auto_growth, 2),
                "fixed4_max_task_bytes_growth_10x": round(fixed_growth, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
