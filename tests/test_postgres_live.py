"""LIVE PostgreSQL integration for the K1 sink (VERDICT r7 carry #7).

This environment ships a real PostgreSQL 15 server (no JDBC jar, no
Python driver), so the sink speaks the v3 wire protocol directly.  The
test provisions a THROWAWAY cluster per module — initdb into a tmpdir,
trust auth, unix socket only, no TCP — runs the reference's
``to_postgis``-equivalent round trip from a real Spark DataFrame, and
tears the cluster down.  Skips loudly where the server binaries or the
run-as user are unavailable (postgres refuses to run as root)."""

from __future__ import annotations

import shutil
import subprocess
import uuid

import pytest

from species_range_data_pipeline_spark.sources.pgwire import (
    PgConnection,
    PgError,
    quote_literal,
)


def _pg_runnable() -> str | None:
    """Reason this environment cannot run a local cluster, or None."""
    for exe in ("initdb", "pg_ctl", "postgres"):
        if shutil.which(exe) is None:
            return f"{exe} not installed"
    import os

    if os.geteuid() != 0:
        return None  # non-root can run postgres directly
    # root must be able to drop to a postgres user
    r = subprocess.run(
        ["su", "postgres", "-c", "true"], capture_output=True, cwd="/"
    )
    if r.returncode != 0:
        return "no usable postgres user to drop privileges to"
    return None


def _su(cmd: str, cwd: str) -> subprocess.CompletedProcess:
    import os

    if os.geteuid() == 0:
        return subprocess.run(
            ["su", "postgres", "-c", cmd], capture_output=True, cwd=cwd
        )
    return subprocess.run(
        cmd, shell=True, capture_output=True, cwd=cwd
    )


@pytest.fixture(scope="module")
def pg_cluster(tmp_path_factory):
    reason = _pg_runnable()
    if reason:
        pytest.skip(f"live PostgreSQL unavailable: {reason}")
    import os
    import tempfile
    from pathlib import Path

    # NOT tmp_path_factory: pytest's basetemp ancestors are 0700, which
    # the dropped-privilege postgres user cannot traverse
    base = Path(tempfile.mkdtemp(prefix=f"pglive_{uuid.uuid4().hex[:6]}_"))
    data, sock = base / "data", base / "sock"
    sock.mkdir()
    if os.geteuid() == 0:
        base.chmod(0o755)
        sock.chmod(0o777)
        subprocess.run(["chown", "-R", "postgres:postgres", str(base)])
    r = _su(f"initdb -D {data} -A trust --no-locale -E UTF8", cwd="/")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr.decode()[-300:]}")
    r = _su(
        f"pg_ctl -D {data} -l {base}/pg.log -w "
        f"-o '-k {sock} -c listen_addresses=' start",
        cwd="/",
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr.decode()[-300:]}")
    try:
        yield {"sock": str(sock), "data": str(data)}
    finally:
        _su(f"pg_ctl -D {data} -m immediate stop", cwd="/")
        shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def pg_socket_dir(pg_cluster):
    return pg_cluster["sock"]


def _species_df(spark):
    from species_range_data_pipeline_spark.functions.wkb import encode_polygon

    # two real (Multi)Polygon WKBs, like the dissolve emits
    g1 = encode_polygon([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]])
    g2 = encode_polygon([[(5, 5), (6, 5), (6, 7), (5, 7), (5, 5)]])
    return spark.createDataFrame(
        [
            (0, "abies-balsamea", 3, bytearray(g1), "25", "vtech",
             "2020", "current", 4.0),
            (1, "acer-rubrum", 1, bytearray(g2), "50", "gfdl",
             "2080", "rcp45", 2.0),
            (2, "o'hara-oak", 2, None, "75", "it's",
             "2099", 'rcp"85"', 0.0),  # quoting + NULL-geometry paths
        ],
        "sid long, species string, species_id long, geometry binary, "
        "threshold string, source string, year string, scenario string, "
        "area double",
    ).repartition(3)  # exercise multiple executor-side connections


def test_wire_protocol_basics(pg_socket_dir):
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        cols, rows = c.query("SELECT 1 AS one, 'a''b' AS s, NULL AS n")
        assert cols == ["one", "s", "n"]
        assert rows == [("1", "a'b", None)]
        blob = bytes(range(256))
        c.query("CREATE TABLE wire_t (b bytea)")
        c.query(f"INSERT INTO wire_t VALUES ({quote_literal(blob)})")
        _, back = c.query("SELECT b FROM wire_t")
        assert bytes.fromhex(back[0][0][2:]) == blob
        with pytest.raises(PgError) as ei:
            c.query("SELECT * FROM no_such_table")
        assert ei.value.fields["C"] == "42P01"  # undefined_table
        # the connection survives an error (ReadyForQuery resync)
        assert c.query("SELECT 2 AS two")[1] == [("2",)]


def test_sink_replace_roundtrip_ewkb(spark, pg_socket_dir):
    from species_range_data_pipeline_spark.functions.wkb import to_ewkb
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        read_table_postgres,
        write_speciesdata_postgres,
    )

    df = _species_df(spark)
    for _ in range(2):  # replace is idempotent, like if_exists="replace"
        write_speciesdata_postgres(
            df, "speciesdata", unix_socket_dir=pg_socket_dir,
            mode="replace", geometry_format="ewkb", batch_rows=2,
        )
    cols, rows = read_table_postgres(
        spark, "speciesdata", unix_socket_dir=pg_socket_dir
    )
    assert cols == ["sid", "species", "species_id", "geometry",
                    "threshold", "source", "year", "scenario", "area"]
    got = {int(r[0]): r for r in rows}
    assert len(got) == 3
    src = {r.sid: r for r in df.collect()}
    for sid, r in got.items():
        want = src[sid]
        assert r[1] == want.species and r[7] == want.scenario
        if want.geometry is None:
            assert r[3] is None
        else:  # bytea \x-hex back to bytes == EWKB(SRID=4326) of the WKB
            assert bytes.fromhex(r[3][2:]) == to_ewkb(bytes(want.geometry), 4326)
        assert float(r[8]) == want.area


def test_sink_truncate_preserves_ddl_and_ewkt(spark, pg_socket_dir):
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS species_ewkt")
        c.query(
            "CREATE TABLE species_ewkt (sid bigint PRIMARY KEY, "
            "species text, species_id bigint, geometry text, threshold text,"
            " source text, year text, scenario text, area double precision)"
        )
    df = _species_df(spark)
    write_speciesdata_postgres(
        df, "species_ewkt", unix_socket_dir=pg_socket_dir,
        mode="truncate", geometry_format="ewkt",
    )
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        _, rows = c.query(
            "SELECT geometry FROM species_ewkt WHERE sid = 0"
        )
        assert rows[0][0].startswith("SRID=4326;POLYGON")
        # PRIMARY KEY DDL survived the truncate-mode write
        _, idx = c.query(
            "SELECT count(*) FROM pg_indexes WHERE tablename = 'species_ewkt'"
        )
        assert idx[0][0] == "1"


def test_sink_replace_rejects_unmappable_types(spark, pg_socket_dir):
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    df = spark.createDataFrame([([1, 2],)], "xs array<int>")
    with pytest.raises(ValueError, match="no PostgreSQL mapping"):
        write_speciesdata_postgres(
            df, "bad", unix_socket_dir=pg_socket_dir, mode="replace"
        )


def test_partitioned_read_source(spark, pg_socket_dir):
    """Distributed read over the wire client: Spark-JDBC range-split
    semantics (outer slices unbounded, no dropped rows even when the
    bounds under-cover), values coerced back to the Spark schema, and
    byte-exact geometry after the full write->read cycle."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        read_postgres_partitioned,
        write_speciesdata_postgres,
    )

    df = _species_df(spark)
    write_speciesdata_postgres(
        df, "species_read", unix_socket_dir=pg_socket_dir,
        mode="replace", geometry_format="wkb",
    )
    schema = ("sid long, species string, species_id long, geometry binary,"
              " threshold string, source string, year string,"
              " scenario string, area double")
    # bounds deliberately UNDER-cover (only sid=1 falls inside [1, 2)):
    # the unbounded outer slices must still return sid=0 and sid=2
    back = read_postgres_partitioned(
        spark, "species_read", schema, "sid",
        lower=1, upper=2, num_partitions=3,
        unix_socket_dir=pg_socket_dir,
    )
    assert back.schema == df.schema
    got = {r.sid: r for r in back.collect()}
    want = {r.sid: r for r in df.collect()}
    assert set(got) == set(want) == {0, 1, 2}
    for sid in want:
        g, w = got[sid], want[sid]
        assert (g.species, g.scenario, g.area) == (w.species, w.scenario, w.area)
        assert (g.geometry is None) == (w.geometry is None)
        if w.geometry is not None:
            assert bytes(g.geometry) == bytes(w.geometry)
    # single-partition degenerate split reads everything too
    one = read_postgres_partitioned(
        spark, "species_read", schema, "sid",
        lower=0, upper=3, num_partitions=1,
        unix_socket_dir=pg_socket_dir,
    )
    assert one.count() == 3


def test_scram_sha256_auth(pg_cluster):
    """Real SCRAM-SHA-256 against the live server: a password-gated role
    plus a targeted pg_hba rule, then the stdlib client's full RFC 5802
    exchange — correct password in, wrong password refused, and the
    server-signature check on the way out (mutual auth)."""
    sock, data = pg_cluster["sock"], pg_cluster["data"]
    with PgConnection("postgres", "postgres", unix_socket_dir=sock) as c:
        c.query("SET password_encryption = 'scram-sha-256'")
        c.query("DROP ROLE IF EXISTS scramuser")
        c.query("CREATE ROLE scramuser LOGIN PASSWORD 'tr0ut-keys'")
        c.query("GRANT ALL ON SCHEMA public TO scramuser")
    hba = f"{data}/pg_hba.conf"
    rule = "local all scramuser scram-sha-256\n"
    original = open(hba).read()
    open(hba, "w").write(rule + original)  # specific rule must come FIRST
    try:
        with PgConnection("postgres", "postgres", unix_socket_dir=sock) as c:
            c.query("SELECT pg_reload_conf()")
        with PgConnection(
            "scramuser", "postgres", password="tr0ut-keys",
            unix_socket_dir=sock,
        ) as c:
            _, rows = c.query("SELECT current_user")
            assert rows == [("scramuser",)]
        with pytest.raises(PgError, match="password"):
            PgConnection(
                "scramuser", "postgres", password="wrong",
                unix_socket_dir=sock,
            )
        with pytest.raises(PgError, match="none was given"):
            PgConnection("scramuser", "postgres", unix_socket_dir=sock)
    finally:
        open(hba, "w").write(original)
        with PgConnection("postgres", "postgres", unix_socket_dir=sock) as c:
            c.query("SELECT pg_reload_conf()")


def test_copy_text_value_encoding():
    """Pure encoder unit: COPY text-format escapes per the public COPY
    docs — no server needed."""
    from species_range_data_pipeline_spark.sources.pgwire import (
        copy_text_value,
    )

    assert copy_text_value(None) == "\\N"
    assert copy_text_value(True) == "t" and copy_text_value(False) == "f"
    assert copy_text_value(7) == "7"
    assert copy_text_value(float("nan")) == "NaN"
    assert copy_text_value(float("inf")) == "Infinity"
    assert copy_text_value(float("-inf")) == "-Infinity"
    assert copy_text_value(b"\x01\xff") == "\\\\x01ff"
    assert copy_text_value("a\tb\nc\\d\re") == "a\\tb\\nc\\\\d\\re"


def test_quote_literal_nonfinite_floats():
    assert quote_literal(float("nan")) == "'NaN'::float8"
    assert quote_literal(float("inf")) == "'Infinity'::float8"
    assert quote_literal(float("-inf")) == "'-Infinity'::float8"


def test_copy_in_client(pg_socket_dir):
    """Protocol-level COPY IN: bulk rows land, NULLs/escapes/bytea
    decode exactly, a mid-COPY server error surfaces as PgError and the
    connection resyncs to ReadyForQuery."""
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS copy_t")
        c.query("CREATE TABLE copy_t (i int, s text, b bytea, x double precision)")
        from species_range_data_pipeline_spark.sources.pgwire import (
            copy_text_value as ctv,
        )

        rows = [
            (1, "plain", b"\x00\x01", 1.5),
            (2, "tab\there", None, float("nan")),
            (3, None, bytes(range(64)), float("-inf")),
        ]
        c.copy_in(
            "COPY copy_t (i, s, b, x) FROM STDIN",
            ("\t".join(ctv(v) for v in r) for r in rows),
        )
        c.query("SET bytea_output = 'hex'")
        _, back = c.query("SELECT i, s, b, x FROM copy_t ORDER BY i")
        assert [r[1] for r in back] == ["plain", "tab\there", None]
        assert bytes.fromhex(back[2][2][2:]) == bytes(range(64))
        assert back[1][3] == "NaN" and back[2][3] == "-Infinity"
        # server rejects bad data mid-COPY -> PgError, connection survives
        with pytest.raises(PgError):
            c.copy_in(
                "COPY copy_t (i) FROM STDIN", iter(["not-an-int"])
            )
        assert c.query("SELECT count(*) FROM copy_t")[1] == [("3",)]


def test_sink_copy_lane_matches_insert_lane(spark, pg_socket_dir):
    """VERDICT r8 next #3: COPY-written table == INSERT-written table
    byte-exactly, including EWKB bytea, quotes, NULL geometry, and a
    COPY-hostile string (tab/newline/backslash) plus non-finite
    doubles on both lanes."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        read_table_postgres,
        write_speciesdata_postgres,
    )

    base = _species_df(spark)
    hostile = spark.createDataFrame(
        [(3, "tab\tnl\nback\\slash", 9, None, "25", "s", "2020",
          "sc", float("inf")),
         (4, "nan-row", 9, None, "25", "s", "2020", "sc", float("nan"))],
        base.schema,
    )
    df = base.unionByName(hostile)
    write_speciesdata_postgres(
        df, "lane_insert", unix_socket_dir=pg_socket_dir,
        mode="replace", method="insert", batch_rows=2,
    )
    write_speciesdata_postgres(
        df, "lane_copy", unix_socket_dir=pg_socket_dir,
        mode="replace", method="copy", batch_rows=2,
    )
    # auto with batch_rows=1 routes every >1-row partition through COPY
    write_speciesdata_postgres(
        df.coalesce(1), "lane_auto", unix_socket_dir=pg_socket_dir,
        mode="replace", method="auto", batch_rows=1,
    )
    _, ins = read_table_postgres(spark, "lane_insert", unix_socket_dir=pg_socket_dir)
    _, cop = read_table_postgres(spark, "lane_copy", unix_socket_dir=pg_socket_dir)
    _, aut = read_table_postgres(spark, "lane_auto", unix_socket_dir=pg_socket_dir)
    assert sorted(ins) == sorted(cop) == sorted(aut)
    got = {int(r[0]): r for r in cop}
    assert len(got) == 5
    assert got[3][1] == "tab\tnl\nback\\slash"
    assert got[3][8] == "Infinity" and got[4][8] == "NaN"


def test_sink_partition_transaction_rollback(spark, pg_socket_dir):
    """ADVICE r8: a partition that fails mid-write must leave ZERO rows
    behind (one transaction per partition, like Spark's JDBC writer).
    batch_rows=1 forces multiple INSERT round trips, the third of which
    violates a CHECK constraint."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS txn_t")
        c.query("CREATE TABLE txn_t (sid bigint CHECK (sid < 10), s text)")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "boom")], "sid long, s string"
    ).coalesce(1)
    with pytest.raises(Exception):
        write_speciesdata_postgres(
            df, "txn_t", unix_socket_dir=pg_socket_dir,
            mode="append", method="insert", batch_rows=1,
            geometry_col="none",
        )
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        assert c.query("SELECT count(*) FROM txn_t")[1] == [("0",)]
    # same guarantee on the COPY lane
    with pytest.raises(Exception):
        write_speciesdata_postgres(
            df, "txn_t", unix_socket_dir=pg_socket_dir,
            mode="append", method="copy", geometry_col="none",
        )
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        assert c.query("SELECT count(*) FROM txn_t")[1] == [("0",)]


def test_sink_exactly_once_epoch_ledger(spark, pg_socket_dir):
    """exactly_once_epoch (r9): re-running an append with the SAME epoch
    is a no-op (every partition skips on the ledger's PK), a new epoch
    appends again, and a partition that fails mid-write leaves neither
    data nor its ledger row — so a retry of a FAILED attempt still
    writes."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS eo_t")
        c.query("DROP TABLE IF EXISTS eo_t__write_ledger")
        c.query("CREATE TABLE eo_t (sid bigint, s text)")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "sid long, s string"
    ).repartition(2)

    def _count() -> int:
        with PgConnection(
            "postgres", "postgres", unix_socket_dir=pg_socket_dir
        ) as c:
            return int(c.query("SELECT count(*) FROM eo_t")[1][0][0])

    kw = dict(
        unix_socket_dir=pg_socket_dir, mode="append", method="insert",
        geometry_col="none",
    )
    write_speciesdata_postgres(df, "eo_t", exactly_once_epoch="job-1", **kw)
    assert _count() == 4
    # identical resubmission (a whole-job retry): every partition skips
    write_speciesdata_postgres(df, "eo_t", exactly_once_epoch="job-1", **kw)
    assert _count() == 4
    # a NEW epoch is a new logical write
    write_speciesdata_postgres(df, "eo_t", exactly_once_epoch="job-2", **kw)
    assert _count() == 8
    # failed attempt: ledger row rolls back WITH the data, so the retry
    # under the same epoch still writes
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("ALTER TABLE eo_t ADD CONSTRAINT cap CHECK (sid < 99)")
    bad = spark.createDataFrame([(100, "boom")], "sid long, s string").coalesce(1)
    with pytest.raises(Exception):
        write_speciesdata_postgres(
            bad, "eo_t", exactly_once_epoch="job-3", **kw
        )
    assert _count() == 8
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        _, rows = c.query(
            "SELECT count(*) FROM eo_t__write_ledger WHERE epoch_id = 'job-3'"
        )
        assert rows == [("0",)]
    ok = spark.createDataFrame([(5, "e")], "sid long, s string").coalesce(1)
    write_speciesdata_postgres(ok, "eo_t", exactly_once_epoch="job-3", **kw)
    assert _count() == 9

def test_copy_in_producer_error_propagates_original(pg_socket_dir):
    """ADVICE r9: when the row producer raises mid-COPY, the ORIGINAL
    exception must surface — the CopyFail/abort handshake is best-effort
    and must never replace it with a socket error."""
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS copyfail_t")
        c.query("CREATE TABLE copyfail_t (i int)")

        def _producer():
            yield "1"
            raise ValueError("producer blew up")

        with pytest.raises(ValueError, match="producer blew up"):
            c.copy_in("COPY copyfail_t (i) FROM STDIN", _producer())
        # connection resynced: usable for further queries, nothing landed
        assert c.query("SELECT count(*) FROM copyfail_t")[1] == [("0",)]


def test_sink_epoch_ledger_cleared_on_replace_and_truncate(spark, pg_socket_dir):
    """ADVICE r9 (medium): replace/truncate wipe the data table, so a
    previously-used epoch's ledger rows must not turn the re-write into a
    silent no-op (empty table)."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS led_t")
        c.query("DROP TABLE IF EXISTS led_t__write_ledger")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "sid long, s string"
    ).repartition(2)

    def _count() -> int:
        with PgConnection(
            "postgres", "postgres", unix_socket_dir=pg_socket_dir
        ) as c:
            return int(c.query("SELECT count(*) FROM led_t")[1][0][0])

    kw = dict(unix_socket_dir=pg_socket_dir, method="insert", geometry_col="none")
    write_speciesdata_postgres(
        df, "led_t", mode="replace", exactly_once_epoch="ep-1", **kw
    )
    assert _count() == 3
    # replace again with the SAME epoch: ledger dropped with the table,
    # data must land again (previously: silently empty table)
    write_speciesdata_postgres(
        df, "led_t", mode="replace", exactly_once_epoch="ep-1", **kw
    )
    assert _count() == 3
    # truncate with the same epoch: that epoch's ledger rows are cleared
    write_speciesdata_postgres(
        df, "led_t", mode="truncate", exactly_once_epoch="ep-1", **kw
    )
    assert _count() == 3
    # ...but OTHER epochs' ledger rows survive a truncate-path write, and
    # append with a fresh epoch still dedups normally
    write_speciesdata_postgres(
        df, "led_t", mode="append", exactly_once_epoch="ep-2", **kw
    )
    write_speciesdata_postgres(
        df, "led_t", mode="append", exactly_once_epoch="ep-2", **kw
    )
    assert _count() == 6


def test_sink_exactly_once_under_concurrent_speculative_attempts(
    spark, pg_socket_dir
):
    """VERDICT r9 next #6: two racing writers of the SAME (epoch,
    partition) — simulated speculative execution — must land exactly one
    copy of each partition's rows.  The ledger PK serializes them: the
    loser blocks on the winner's row lock, then hits 23505 and skips."""
    import threading

    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS race_t")
        c.query("DROP TABLE IF EXISTS race_t__write_ledger")
        c.query("CREATE TABLE race_t (sid bigint, s text)")
    n = 3000  # big enough for the COPY lane + real overlap in-flight
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(n)], "sid long, s string"
    ).repartition(2)
    kw = dict(
        unix_socket_dir=pg_socket_dir, mode="append", method="copy",
        geometry_col="none", exactly_once_epoch="spec-1",
    )
    barrier = threading.Barrier(2)
    errs: list[BaseException] = []

    def _attempt():
        barrier.wait()
        try:
            write_speciesdata_postgres(df, "race_t", **kw)
        except BaseException as e:  # noqa: BLE001 - collected for assert
            errs.append(e)

    threads = [threading.Thread(target=_attempt) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, f"racing attempts must both succeed-or-skip: {errs}"
    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        _, rows = c.query(
            "SELECT count(*), count(DISTINCT sid) FROM race_t"
        )
        assert rows == [(str(n), str(n))], rows  # exactly one copy of each
        _, led = c.query(
            "SELECT count(*) FROM race_t__write_ledger WHERE epoch_id = 'spec-1'"
        )
        assert led == [("2",)]  # one ledger row per partition


def test_sink_truncate_epoch_partial_failure_then_retry(spark, pg_socket_dir):
    """VERDICT r10 next #5 composite: a truncate-mode epoch write that
    PARTIALLY fails (one partition committed with its ledger row, the
    other rolled back) must be completable.  An append-mode retry under
    the SAME epoch writes ONLY the missing partition (the ledger skips
    the survivor — no duplicates), and a whole-job truncate re-run of
    the same epoch rebuilds the table exactly once (the truncate-path
    ledger clear makes every partition write again against the emptied
    table)."""
    from species_range_data_pipeline_spark.pipeline.postgres_sink import (
        write_speciesdata_postgres,
    )

    with PgConnection("postgres", "postgres", unix_socket_dir=pg_socket_dir) as c:
        c.query("DROP TABLE IF EXISTS pf_t")
        c.query("DROP TABLE IF EXISTS pf_t__write_ledger")
        c.query(
            "CREATE TABLE pf_t (sid bigint CHECK (sid < 1000000), s text)"
        )

    def _q(sql: str):
        with PgConnection(
            "postgres", "postgres", unix_socket_dir=pg_socket_dir
        ) as c:
            return c.query(sql)[1]

    # Explicit 2-slice parallelize pins the physical layout (a union
    # of two coalesce(1) LocalRelations gets collapsed back into ONE
    # partition by the optimizer): partition 0 = good rows, partition 1
    # = rows ending in a CHECK violation.  batch_rows=1 forces partition
    # 1 through thousands of single-row INSERT round trips before the
    # failing one, so partition 0's 5-round-trip transaction commits
    # long before the job dies and cancels running tasks.
    good = [(1, "a"), (2, "b")]
    tail_ok = [(10 + i, f"x{i}") for i in range(3000)]

    def _two_part_df(part1_rows):
        rdd = spark.sparkContext.parallelize([0, 1], 2).flatMap(
            lambda i: good if i == 0 else part1_rows
        )
        return spark.createDataFrame(rdd, "sid long, s string")

    kw = dict(
        unix_socket_dir=pg_socket_dir, method="insert", batch_rows=1,
        geometry_col="none", exactly_once_epoch="pf-1",
    )
    with pytest.raises(Exception):
        write_speciesdata_postgres(
            _two_part_df(tail_ok + [(1000000, "boom")]), "pf_t",
            mode="truncate", **kw
        )
    # partial state: partition 0 committed (data + ledger row),
    # partition 1 rolled back entirely
    assert _q("SELECT count(*) FROM pf_t") == [("2",)]
    assert _q(
        "SELECT partition_id FROM pf_t__write_ledger"
        " WHERE epoch_id = 'pf-1' ORDER BY 1"
    ) == [("0",)]

    # retry of the FIXED logical write under the SAME epoch, in append
    # mode (a retry must not re-truncate: that would wipe the committed
    # partition's work): only the missing partition lands
    fixed = _two_part_df(tail_ok)
    write_speciesdata_postgres(fixed, "pf_t", mode="append", **kw)
    assert _q("SELECT count(*) FROM pf_t") == [("3002",)]
    assert _q("SELECT count(*) FROM pf_t WHERE sid = 1") == [("1",)]  # no dup
    assert _q(
        "SELECT count(*) FROM pf_t__write_ledger WHERE epoch_id = 'pf-1'"
    ) == [("2",)]

    # alternative recovery: whole-job truncate re-run of the same epoch
    # rebuilds everything exactly once (truncate clears the epoch's
    # ledger rows with the data, so neither partition is suppressed)
    write_speciesdata_postgres(fixed, "pf_t", mode="truncate", **kw)
    assert _q("SELECT count(*) FROM pf_t") == [("3002",)]
    assert _q("SELECT count(*) FROM pf_t WHERE sid = 1") == [("1",)]
    assert _q(
        "SELECT count(*) FROM pf_t__write_ledger WHERE epoch_id = 'pf-1'"
    ) == [("2",)]
