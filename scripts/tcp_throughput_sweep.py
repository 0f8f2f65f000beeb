"""Feed-size throughput sweep for the replayable TCP source (r11;
companion to the stream_tcp_* lanes and SCALE.md rule 44).

The driver-oracled TCP lanes prove correctness on a 25-row dimension
feed; this sweep measures the source's THROUGHPUT posture as the feed
grows 1k -> 10k -> 100k lines: end-to-end wall (connect, spool, drain
through the streaming engine into a memory sink) and the derived
lines/s, asserting the exact line count arrives at every size (the
no-loss contract under volume, not just under replay).

Also reports the spool byte size and the partitions-per-batch behavior
implied by the 64 KiB split floor: small feeds drain as single-split
batches; past ~256 KiB the byte-range splitter starts fanning out to
maxPartitions, which is where executor-side parallel reads begin.

Prints one JSON line per size.  Usage: python scripts/tcp_throughput_sweep.py
"""

from __future__ import annotations

import json
import os
import shutil
import socketserver
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources.tcp_lines import (  # noqa: E402
    register_tcp_lines_source,
)

SIZES = [1_000, 10_000, 100_000]


def run_size(spark, n: int, seq: int) -> dict:
    lines = [f"k{i % 97},{i}" for i in range(n)]
    payload = ("\n".join(lines) + "\n").encode()

    class _H(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(payload)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _H)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    sink = f"tcp_tp_{seq}"
    tmp = tempfile.mkdtemp(prefix="tcp_tp_")
    try:
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.server_address[1])
            .option("spool", os.path.join(tmp, "spool"))
            .option("onEof", "complete")
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 300
        while spark.table(sink).count() < n:
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
            if time.time() > deadline:
                raise RuntimeError(f"drain stalled at {spark.table(sink).count()}/{n}")
            time.sleep(0.05)
        wall = time.perf_counter() - t0
        got = spark.table(sink).count()
        q.stop()
        q.awaitTermination()
        assert got == n, (got, n)
        spool_bytes = os.path.getsize(
            os.path.join(tmp, "spool", "spool-00000.txt")
        )
    finally:
        srv.shutdown()
        srv.server_close()
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            spark.catalog.dropTempView(sink)
        except Exception:
            pass
    return {
        "n_lines": n,
        "wall_s": round(wall, 3),
        "lines_per_s": round(n / wall),
        "spool_bytes": spool_bytes,
        "exact_count": True,
    }


def main() -> None:
    spark = get_spark("tcp-throughput")
    register_tcp_lines_source(spark)
    for seq, n in enumerate(SIZES):
        print(json.dumps(run_size(spark, n, seq)), flush=True)


if __name__ == "__main__":
    main()
