"""Live-socket streaming source (sources/tcp_lines.py): an in-process TCP
server feeds newline-delimited events; the source spools them and serves
replayable byte-offset microbatches (VERDICT r9 next #8 — the last
missing source family, with the manifest source's offset/replay
contract rather than the built-in socket source's none)."""

from __future__ import annotations

import socketserver
import threading
import time


class _FeedServer:
    """TCP server that sends each connected client the queued lines."""

    def __init__(self):
        self._queues: list[list[bytes]] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                q: list[bytes] = []
                with outer._lock:
                    outer._queues.append(q)
                try:
                    while True:
                        with outer._lock:
                            batch, q[:] = list(q), []
                        for item in batch:
                            if item is None:
                                return
                            self.request.sendall(item)
                        time.sleep(0.02)
                except OSError:
                    pass

        self._srv = socketserver.ThreadingTCPServer(
            ("127.0.0.1", 0), Handler, bind_and_activate=True
        )
        self._srv.daemon_threads = True
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()

    @property
    def port(self) -> int:
        return self._srv.server_address[1]

    def send(self, lines: list[str]) -> None:
        self.send_raw(("".join(f"{ln}\n" for ln in lines)).encode())

    def send_raw(self, data: bytes) -> None:
        with self._lock:
            for q in self._queues:
                q.append(data)

    def close(self) -> None:
        with self._lock:
            for q in self._queues:
                q.append(None)
        self._srv.shutdown()
        self._srv.server_close()


def _await(predicate, timeout=90.0, step=0.1):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return True
        time.sleep(step)
    return False


def test_tcp_lines_end_to_end_counts(spark, tmp_path):
    """Live feed -> tcp_lines source -> parsed aggregation -> memory sink:
    every line sent arrives exactly once across multiple microbatches."""
    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    srv = _FeedServer()
    try:
        stream = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.port)
            .option("spool", str(tmp_path / "spool"))
            .load()
        )
        from pyspark.sql import functions as F

        parsed = stream.select(
            F.split("value", ",").getItem(0).alias("k"),
            F.split("value", ",").getItem(1).cast("long").alias("v"),
        )
        agg = parsed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("tcp_counts")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        # wait for the receiver to connect before feeding
        assert _await(lambda: len(srv._queues) > 0)
        for wave in range(4):
            srv.send([f"k{i % 3},{wave * 10 + i}" for i in range(10)])
        def _total():
            try:  # the sink table appears only after the first commit
                return spark.sql("SELECT sum(n) FROM tcp_counts").first()[0]
            except Exception:
                return None

        done = _await(lambda: _total() == 40)
        got = {
            r.k: (r.n, r.s)
            for r in spark.table("tcp_counts").collect()
        }
        q.stop()
        assert done, f"sink never reached 40 rows: {got}"
        # exact per-key counts and sums (k0: i=0,3,6,9 per wave, ...)
        want_n = {"k0": 16, "k1": 12, "k2": 12}
        assert {k: n for k, (n, _) in got.items()} == want_n
        expect_s = {}
        for wave in range(4):
            for i in range(10):
                k = f"k{i % 3}"
                expect_s[k] = expect_s.get(k, 0) + wave * 10 + i
        assert {k: s for k, (_, s) in got.items()} == expect_s
    finally:
        srv.close()


def test_tcp_lines_crash_replay_no_loss_no_dup(spark, tmp_path):
    """The offset/replay contract: stop the query mid-stream (crash), keep
    feeding the spool's port offline, restart from the same checkpoint —
    the resumed query replays/continues with NO loss and NO duplicates
    into an append sink."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def start_query(port):
        stream = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", port)
            .option("spool", spool)
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def _sink_count() -> int:
        try:  # dir appears (metadata first) only once a batch commits
            return spark.read.parquet(out_dir).count()
        except Exception:
            return 0

    srv = _FeedServer()
    try:
        q = start_query(srv.port)
        assert _await(lambda: len(srv._queues) > 0)
        srv.send([f"a,{i}" for i in range(50)])
        # wait until at least one batch committed, then "crash"
        assert _await(lambda: _sink_count() >= 1)
        q.stop()
        # second half arrives while the query is down: the server is
        # gone too (connection drops with the receiver) — restart both
        srv.close()
        srv2 = _FeedServer()
        q2 = start_query(srv2.port)
        assert _await(lambda: len(srv2._queues) > 0)
        srv2.send([f"b,{i}" for i in range(50)])
        assert _await(
            lambda: _sink_count() == 100,
        ), f"got {_sink_count()} rows"
        q2.stop()
        vals = sorted(r.value for r in spark.read.parquet(out_dir).collect())
        assert vals == sorted(
            [f"a,{i}" for i in range(50)] + [f"b,{i}" for i in range(50)]
        )
        srv2.close()
    finally:
        try:
            srv.close()
        except Exception:
            pass


def test_tcp_lines_split_alignment_unit(tmp_path):
    """Byte-range splits follow the Hadoop text convention: every line
    lands in exactly one split, for ANY interior bound placement."""
    from species_range_data_pipeline_spark.sources.tcp_lines import (
        TcpLinesStreamReader,
        _SpoolRange,
    )

    spool = tmp_path / "s.txt"
    lines = [f"line-{i:03d}" for i in range(40)]
    spool.write_bytes(("".join(f"x{ln}\n" for ln in lines)).encode())
    size = spool.stat().st_size
    reader = TcpLinesStreamReader.__new__(TcpLinesStreamReader)  # no socket
    for cut in range(1, size):
        parts = [
            _SpoolRange(str(spool), 0, cut),
            _SpoolRange(str(spool), cut, size),
        ]
        got = [v for p in parts for (v,) in reader.read(p)]
        assert got == [f"x{ln}" for ln in lines], f"cut={cut}"


def test_tcp_lines_read_roundtrip_fuzz(tmp_path):
    """Hypothesis: ANY spooled line content (arbitrary bytes minus the
    newline delimiter, including invalid UTF-8 and trailing \\r) round-
    trips through multi-split reads exactly, for arbitrary split bounds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        TcpLinesStreamReader,
        _SpoolRange,
    )

    reader = TcpLinesStreamReader.__new__(TcpLinesStreamReader)

    @settings(max_examples=150, deadline=None)
    @given(
        lines=st.lists(
            st.binary(max_size=40).map(lambda b: b.replace(b"\n", b"x")),
            min_size=1,
            max_size=20,
        ),
        data=st.data(),
    )
    def _run(lines, data):
        spool = tmp_path / f"fuzz-{abs(hash(tuple(lines))) % 10**9}.txt"
        spool.write_bytes(b"".join(ln + b"\n" for ln in lines))
        size = spool.stat().st_size
        n_cuts = data.draw(st.integers(min_value=0, max_value=3))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=1, max_value=max(size - 1, 1)),
                    min_size=n_cuts,
                    max_size=n_cuts,
                )
            )
        )
        bounds = [0] + cuts + [size]
        got = [
            v
            for a, b in zip(bounds, bounds[1:])
            if b > a
            for (v,) in reader.read(_SpoolRange(str(spool), a, b))
        ]
        want = [
            ln.rstrip(b"\r").decode("utf-8", "replace") for ln in lines
        ]
        assert got == want
        spool.unlink()

    _run()


def test_tcp_lines_dead_feed_fails_query(spark, tmp_path):
    """ADVICE r10: a receiver whose connection drops must FAIL the query
    (latestOffset raises), not plateau forever while ingesting nothing.
    Default onEof=fail treats even a clean peer close as terminal."""
    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    srv = _FeedServer()
    try:
        q = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.port)
            .option("spool", str(tmp_path / "spool"))
            .load()
            .writeStream.format("memory")
            .queryName("tcp_dead_feed")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        assert _await(lambda: len(srv._queues) > 0)
        srv.send(["x,1"])
        srv.close()  # feed dies underneath the running query
        assert _await(lambda: q.exception() is not None, timeout=60)
        msg = str(q.exception())
        assert "tcp_lines" in msg and ("EOF" in msg or "dead" in msg)
    finally:
        try:
            srv.close()
        except Exception:
            pass


def test_tcp_lines_on_eof_complete_plateaus(spark, tmp_path):
    """onEof=complete: the feeder closing the socket is the end-of-stream
    signal — everything sent before the close is delivered, the offset
    plateaus, and the query stays healthy (no exception)."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    srv = _FeedServer()
    try:
        q = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.port)
            .option("spool", str(tmp_path / "spool"))
            .option("onEof", "complete")
            .load()
            .writeStream.format("memory")
            .queryName("tcp_eof_complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        assert _await(lambda: len(srv._queues) > 0)
        srv.send([f"k,{i}" for i in range(25)])

        def _rows():
            try:
                return spark.table("tcp_eof_complete").count()
            except Exception:
                return 0

        assert _await(lambda: _rows() == 25)
        srv.close()  # clean EOF: plateau, not failure
        import time as _t

        _t.sleep(2.0)
        assert q.exception() is None
        assert _rows() == 25
        q.stop()
    finally:
        try:
            srv.close()
        except Exception:
            pass


def test_tcp_lines_checkpoint_outliving_spool_raises(spark, tmp_path):
    """ADVICE r10: a checkpoint that outlives its spool (dir deleted and
    recreated) must raise instead of silently serving misaligned byte
    ranges — the recreated spool has a fresh identity marker."""
    import shutil

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")

    def start_query(port):
        return (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", port)
            .option("spool", spool)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    srv = _FeedServer()
    try:
        q = start_query(srv.port)
        assert _await(lambda: len(srv._queues) > 0)
        srv.send([f"a,{i}" for i in range(30)])

        def _sink_count():
            try:
                return spark.read.parquet(str(tmp_path / "out")).count()
            except Exception:
                return 0

        assert _await(lambda: _sink_count() >= 1)
        q.stop()
        srv.close()
        shutil.rmtree(spool)  # the spool is lost; the checkpoint is not
        srv2 = _FeedServer()
        q2 = start_query(srv2.port)
        assert _await(lambda: q2.exception() is not None, timeout=60)
        assert "identity" in str(q2.exception())
        srv2.close()
    finally:
        for s in ("srv", "srv2"):
            try:
                locals()[s].close()
            except Exception:
                pass


def test_tcp_lines_spool_lock_exclusive(tmp_path):
    """ADVICE r10/r11: two receivers on one spool would interleave appends
    and corrupt line-boundary offsets — the second must fail fast while
    the flock is held, and the lock must free itself the moment the
    holder releases (kernel-owned liveness: no pid heuristic, no steal
    race, no host-locality assumption)."""
    import os

    import pytest

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        _SPOOL_LOCK_FILE,
        _acquire_spool_lock,
    )

    spool_dir = str(tmp_path / "spool")
    os.makedirs(spool_dir)
    lock = _acquire_spool_lock(spool_dir)
    with pytest.raises(RuntimeError, match="locked by live receiver"):
        _acquire_spool_lock(spool_dir)
    lock.release()
    # a crashed owner's lock is implicitly free: flock dies with its fd,
    # so reacquisition needs no staleness logic — even with leftover
    # diagnostic content in the file
    with open(os.path.join(spool_dir, _SPOOL_LOCK_FILE), "w") as fh:
        fh.write("somehost:999999999")
    lock2 = _acquire_spool_lock(spool_dir)
    assert lock2.path.endswith(_SPOOL_LOCK_FILE)
    lock2.release()


def test_tcp_lines_spool_lock_survives_unlocked_writers(tmp_path):
    """A process that merely OPENS/WRITES the lock file without flocking it
    (the r10 TOCTOU shape: a stealer recreating the file) cannot displace
    the holder — the fd-held flock, not the file's existence, is the
    lock."""
    import pytest

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        _acquire_spool_lock,
    )

    spool_dir = str(tmp_path / "spool")
    import os

    os.makedirs(spool_dir)
    lock = _acquire_spool_lock(spool_dir)
    with open(lock.path, "w") as fh:  # overwrite content, hold no flock
        fh.write("intruder:1")
    with pytest.raises(RuntimeError, match="locked by live receiver"):
        _acquire_spool_lock(spool_dir)
    lock.release()


def test_tcp_lines_eof_flushes_unterminated_final_line(spark, tmp_path):
    """ADVICE r11: under onEof=complete, EOF is the declared end-of-stream
    — a final line the feeder never newline-terminated is still data and
    must be delivered, not silently dropped from the receive buffer."""
    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    srv = _FeedServer()
    try:
        q = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.port)
            .option("spool", str(tmp_path / "spool"))
            .option("onEof", "complete")
            .load()
            .writeStream.format("memory")
            .queryName("tcp_eof_tail")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        assert _await(lambda: len(srv._queues) > 0)
        srv.send_raw(b"a,1\nb,2\nc,3")  # final line unterminated

        def _rows():
            try:
                return {
                    r["value"] for r in spark.table("tcp_eof_tail").collect()
                }
            except Exception:
                return set()

        assert _await(lambda: _rows() >= {"a,1", "b,2"})
        srv.close()  # EOF: the buffered "c,3" must flush as a final line
        assert _await(lambda: _rows() == {"a,1", "b,2", "c,3"}, timeout=60)
        assert q.exception() is None
        q.stop()
    finally:
        try:
            srv.close()
        except Exception:
            pass


def test_tcp_lines_spool_below_high_water_mark_raises(tmp_path):
    """ADVICE r11: spool FILE deleted/truncated while spool.id survived —
    the identity check passes and the offsets-vs-size check only trips
    until a new feed regrows past the committed offsets.  The recorded
    high-water mark closes that window: a receiver starting over a spool
    smaller than the recorded HWM must refuse."""
    import os
    import socket as _socket

    import pytest

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        _SPOOL_FILE,
        _SPOOL_HWM_FILE,
        _Receiver,
    )

    spool_dir = tmp_path / "spool"
    spool_dir.mkdir()
    (spool_dir / _SPOOL_FILE).write_bytes(b"a,1\n")  # 4 bytes
    (spool_dir / _SPOOL_HWM_FILE).write_text(f"{100:020d}\n")
    srv = _socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        with pytest.raises(RuntimeError, match="high-water mark"):
            _Receiver(
                "127.0.0.1",
                srv.getsockname()[1],
                str(spool_dir / _SPOOL_FILE),
            )
        # and the refusing receiver must not leave the spool locked
        os.unlink(spool_dir / _SPOOL_HWM_FILE)  # clear the planted HWM
        ok = _Receiver(
            "127.0.0.1", srv.getsockname()[1], str(spool_dir / _SPOOL_FILE)
        )
        ok.close()
    finally:
        srv.close()


def test_tcp_lines_max_bytes_per_batch_caps_offers(tmp_path):
    """Admission control (r12, amended r16): the FIRST offer is never
    capped (it is the offset Trigger.AvailableNow snapshots as its
    drain target — VERDICT r15 #3), then latestOffset advances at most
    maxBytesPerBatch past the previous offer — monotone, chunked."""
    from species_range_data_pipeline_spark.sources.tcp_lines import (
        TcpLinesStreamReader,
    )

    reader = TcpLinesStreamReader(
        {
            "host": "127.0.0.1",
            "port": "1",
            "spool": str(tmp_path / "spool"),
            "maxBytesPerBatch": "100",
        }
    )

    class FakeReceiver:
        initial = 0

        def __init__(self):
            self._flushed = 1000

        def flushed(self):
            return self._flushed

    reader._receiver = FakeReceiver()
    reader._spool_id = "test"
    # first offer: full backlog, cap NOT applied
    assert reader.latestOffset()["pos"] == 1000
    # steady state: the feed races ahead, offers chunk at +100
    reader._receiver._flushed = 1500
    offers = [reader.latestOffset()["pos"] for _ in range(4)]
    assert offers == [1100, 1200, 1300, 1400]
    reader._receiver._flushed = 1430  # feed slows below the cap
    assert reader.latestOffset()["pos"] == 1430
    reader._receiver._flushed = 1420  # never regress below a prior offer
    assert reader.latestOffset()["pos"] == 1430


def test_tcp_lines_max_bytes_per_batch_end_to_end(spark, tmp_path):
    """With a cap far below the feed size, the drain must split into
    multiple microbatches (offset-log entries) and still deliver every
    line exactly once."""
    import os

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        register_tcp_lines_source,
    )

    register_tcp_lines_source(spark)
    srv = _FeedServer()
    ckpt = tmp_path / "ckpt"
    try:
        q = (
            spark.readStream.format("tcp_lines")
            .option("host", "127.0.0.1")
            .option("port", srv.port)
            .option("spool", str(tmp_path / "spool"))
            .option("maxBytesPerBatch", "64")
            .load()
            .writeStream.format("memory")
            .queryName("tcp_capped")
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="0 seconds")
            .start()
        )
        assert _await(lambda: len(srv._queues) > 0)
        # Wait for the reader's FIRST offer to commit (batch 0) before
        # sending any lines: the first offer is deliberately uncapped
        # (AvailableNow-snapshot safety, r16), so lines arriving before
        # it would drain in one big batch and break the multi-batch
        # assertion below.  After batch 0 every offer is capped at +64.
        assert _await(
            lambda: (ckpt / "offsets").exists()
            and any(
                not f.startswith(".") for f in os.listdir(ckpt / "offsets")
            )
        )
        srv.send([f"key,{i:04d}" for i in range(50)])  # 9 bytes/line

        def _rows():
            try:
                return {
                    r["value"] for r in spark.table("tcp_capped").collect()
                }
            except Exception:
                return set()

        assert _await(lambda: len(_rows()) == 50)
        assert _rows() == {f"key,{i:04d}" for i in range(50)}
        q.stop()
        n_batches = len(
            [f for f in os.listdir(ckpt / "offsets") if not f.startswith(".")]
        )
        # 50 lines x 9 bytes = 450 spool bytes at a 64-byte cap: even if
        # the feed arrives while draining, at least ~450/64 batches ran
        assert n_batches >= 5, n_batches
    finally:
        try:
            srv.close()
        except Exception:
            pass


def test_tcp_lines_available_now_drain_not_truncated(tmp_path):
    """VERDICT r15 #3: Trigger.AvailableNow snapshots latestOffset
    exactly ONCE as the drain target (pyspark's runner dispatches only
    initialOffset/latestOffset/partitions/commit, so the trigger is
    invisible to the reader).  This replays that exact call protocol
    against a capped reader over a real spool file and asserts the
    single snapshot covers the FULL backlog — i.e. the cap can no
    longer silently truncate a bounded drain (the old construction-time
    UserWarning is gone because the hazard is gone by construction).
    """
    import warnings

    from species_range_data_pipeline_spark.sources.tcp_lines import (
        TcpLinesStreamReader,
    )

    lines = [f"key,{i:04d}" for i in range(50)]  # 9 bytes each
    spool = tmp_path / "spool"
    spool.mkdir()
    spool_file = spool / "feed.spool"
    spool_file.write_bytes(("".join(f"{ln}\n" for ln in lines)).encode())

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        reader = TcpLinesStreamReader(
            {
                "host": "127.0.0.1",
                "port": "1",
                "spool": str(spool),
                "maxBytesPerBatch": "64",  # far below the 450-byte backlog
            }
        )
    assert [str(w.message) for w in caught] == []  # no warning path left

    class FakeReceiver:
        # a drain scenario: 450 bytes arrived between connect (initial=0,
        # e.g. the checkpointed start offset is 0) and the snapshot
        initial = 0

        def flushed(self):
            return spool_file.stat().st_size

    reader._receiver = FakeReceiver()
    reader._spool_id = "test"
    reader._spool_path = str(spool_file)

    # the AvailableNow protocol: ONE latestOffset call = the drain target
    snapshot = reader.latestOffset()
    assert snapshot["pos"] == 450  # full backlog, not initial + 64

    got = []
    for part in reader.partitions({"pos": 0, "id": "test"}, snapshot):
        got.extend(v for (v,) in reader.read(part))
    assert got == lines  # every line delivered, exactly once, in order
    reader.commit(snapshot)
