"""WebDataset-style sharded tar export/import (stdlib ``tarfile``).

The de-facto interchange format for large-scale training corpora: samples
are files named ``<key>.<ext>`` inside fixed-size ``.tar`` shards, so a
dataloader streams each shard sequentially with zero random I/O.  The
public format is just POSIX tar + the key/extension naming convention
(github.com/webdataset/webdataset), so no dependency is needed.

Scale shape:

- ``write_webdataset`` routes rows to shards with a deterministic hash
  of the key column, ``repartition(n_shards, shard)`` so each task owns
  exactly one shard file, and ``sortWithinPartitions`` so shard contents
  are byte-stable (tar metadata is zeroed).  The write happens inside
  ``mapInPandas`` — one streaming pass per task, no driver involvement —
  and returns a driver-sized MANIFEST DataFrame (shard path, samples,
  bytes) the caller can commit atomically (e.g. into
  ``sources/manifest_table.py``).
- ``read_webdataset`` scans ``*.tar`` with ``binaryFile`` (one task per
  shard — shards are sized for that) and explodes members into
  (shard, key, ext, content) rows; a pivot by extension rebuilds the
  sample table.

Writers on a real cluster target shard files on shared storage; the
local-path semantics here are what the test environment exercises, and
nothing in the lane assumes a driver-local filesystem.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    payload_cols: dict[str, str],
    n_shards: int | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard-NNNNN.tar`` and return the manifest.

    ``payload_cols`` maps column name -> file extension (e.g.
    ``{"text": "txt", "meta": "json"}``); string columns are UTF-8
    encoded, binary columns pass through.  Shard routing is
    ``xxhash64(key) % n_shards`` (deterministic; any engine re-derives
    it), and samples are key-sorted within a shard.  The tar stream is
    already written incrementally (task memory = one sample);
    ``n_shards=None`` sizes the shard count from the input's on-disk
    bytes (SCALE.md rule 60 — fixture inputs hit the floor of 4, the
    old fixed default) so shard size is bounded at any corpus size.
    """
    if n_shards is None:
        from .warc import WARC_TARGET_SHARD_BYTES, _auto_shards

        n_shards = _auto_shards(df, WARC_TARGET_SHARD_BYTES)
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, *payload_cols]
    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    routed = (
        df.select(*cols)
        .withColumn("__shard", shard)
        .repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", key_col)
    )
    exts = dict(payload_cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # shards are staged under a task-unique temp name and published
        # with an atomic rename at the end: a reader (or a manifest
        # getsize) never observes a partial shard, and a task retry or
        # speculative duplicate re-renders byte-identical content (shards
        # are key-sorted, metadata-zeroed), so last-rename-wins is safe
        import uuid

        from .warc import _check_shard_bytes

        os.makedirs(out_dir, exist_ok=True)
        attempt = uuid.uuid4().hex[:8]
        tars: dict[int, tuple[str, tarfile.TarFile, list[int]]] = {}
        published = False
        try:
            for pdf in batches:
                for rec in pdf.to_dict("records"):
                    sh = int(rec["__shard"])
                    if sh not in tars:
                        path = os.path.join(out_dir, f"shard-{sh:05d}.tar")
                        tars[sh] = (
                            path,
                            tarfile.open(f"{path}.tmp-{attempt}", "w"),
                            [0, 0],
                        )
                    path, tf, stats = tars[sh]
                    key = str(rec[key_col])
                    for col, ext in exts.items():
                        val = rec[col]
                        data = (
                            val
                            if isinstance(val, (bytes, bytearray))
                            else str(val).encode("utf-8")
                        )
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # byte-stable shards
                        tf.addfile(info, io.BytesIO(bytes(data)))
                    stats[0] += 1
            # close + validate EVERY shard against the binaryFile 2 GiB
            # read cap before publishing ANY (ADVICE r15): a breach must
            # leave zero published files for the finally sweep
            sizes: dict[int, int] = {}
            for sh, (path, tf, _stats) in tars.items():
                tf.close()
                sizes[sh] = os.path.getsize(f"{path}.tmp-{attempt}")
                _check_shard_bytes(path, sizes[sh])
            out = []
            for sh, (path, tf, stats) in sorted(tars.items()):
                os.replace(f"{path}.tmp-{attempt}", path)  # atomic publish
                out.append(
                    {"shard": path, "n_samples": stats[0],
                     "n_bytes": sizes[sh]}
                )
            published = True
            yield pd.DataFrame(
                out, columns=[f.name for f in MANIFEST_SCHEMA.fields]
            )
        finally:
            if not published:
                # mid-partition failure: close staged handles and unlink
                # the .tmp-* partials so retries never accumulate
                # garbage in the published directory (ADVICE r15)
                for path, tf, _stats in tars.values():
                    try:
                        tf.close()
                    except OSError:
                        pass
                    try:
                        os.unlink(f"{path}.tmp-{attempt}")
                    except OSError:
                        pass

    return routed.mapInPandas(fn, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.tar`` shards -> one row per member file:
    (shard, key, ext, content)."""
    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for member in tf.getmembers():
                        if not member.isfile():
                            continue
                        key, _, ext = member.name.rpartition(".")
                        data = tf.extractfile(member).read()
                        out.append(
                            {"shard": shard_path, "key": key,
                             "ext": ext, "content": data}
                        )
            yield pd.DataFrame(out, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return tars.mapInPandas(fn, MEMBER_SCHEMA)


def read_webdataset_samples(spark: SparkSession, path: str) -> DataFrame:
    """Member rows pivoted back to one row per sample key, one binary
    column per extension observed."""
    members = read_webdataset(spark, path)
    return (
        members.groupBy("key")
        .pivot("ext")
        .agg(F.first("content"))
        .orderBy("key")
    )
