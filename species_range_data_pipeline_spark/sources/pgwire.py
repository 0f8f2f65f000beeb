"""Minimal PostgreSQL v3 wire-protocol client (stdlib sockets only).

The reference loads its final feature table into PostGIS with
``gdf.to_postgis("speciesdata", engine, if_exists="replace",
index_label="sid", chunksize=5)`` (``species_range_etl.py:230-236``).
This container ships a real PostgreSQL 15 server but neither a JDBC
driver jar (so ``df.write.format("jdbc")`` cannot reach it) nor any
Python driver — so, in the same spirit as the repo's from-scratch WARC/
Avro/GeoPackage codecs, the sink speaks the public frontend/backend
protocol directly:
https://www.postgresql.org/docs/current/protocol-message-formats.html

Scope is deliberately the SIMPLE QUERY flow over trust auth — exactly
what an executor-side batched-INSERT sink needs:

- StartupMessage(protocol 3.0, user, database) -> AuthenticationOk(0)
  (trust), ParameterStatus*, BackendKeyData, ReadyForQuery.
- Query('Q'): RowDescription('T') + DataRow('D')* + CommandComplete('C')
  [repeated per statement] + ReadyForQuery('Z'); ErrorResponse('E')
  raises with the server's message fields.
- All values travel in TEXT format (simple-query default); ``bytea``
  comes back as ``\\x``-hex, which the caller decodes.

Auth: ``trust`` (local sockets) and ``SCRAM-SHA-256`` (RFC 5802/7677 —
PostgreSQL's default for networked hosts since v14), both pure stdlib
(hashlib/hmac/secrets).  Channel binding is not offered (``n,,`` GS2
flag), which PostgreSQL accepts on non-SSL connections.  MD5 auth and
the extended (prepare/bind) protocol are out of scope.

COPY ... FROM STDIN (text format) IS in scope (``copy_in``): it is the
protocol's bulk lane — CopyInResponse('G') -> CopyData('d')* ->
CopyDone('c') -> CommandComplete + ReadyForQuery — and the sink routes
large partitions through it (the reference's ``to_postgis`` likewise
rides pandas' bulk path, ``species_range_etl.py:236``).  Small batches
stay on multi-row ``INSERT ... VALUES`` (one round trip, no mode
switch).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets
import socket
import struct


class PgError(RuntimeError):
    """Server ErrorResponse, with the severity/code/message fields."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', '(no message)')}"
        )


class PgConnection:
    """One trust-auth connection; use as a context manager."""

    def __init__(
        self,
        user: str,
        database: str,
        *,
        password: str | None = None,
        unix_socket_dir: str | None = None,
        host: str = "127.0.0.1",
        port: int = 5432,
        timeout: float = 30.0,
    ):
        self._user = user
        self._password = password
        if unix_socket_dir is not None:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(f"{unix_socket_dir}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host, port), timeout)
        self._buf = b""
        params = (
            b"user\x00" + user.encode() + b"\x00"
            b"database\x00" + database.encode() + b"\x00\x00"
        )
        body = struct.pack(">i", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack(">i", len(body) + 4) + body)
        self._handshake()

    # -- framing ---------------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError({"M": "server closed the connection"})
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        tag, length = head[:1], struct.unpack(">i", head[1:])[0]
        return tag, self._recv_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return fields

    def _handshake(self) -> None:
        while True:
            tag, payload = self._read_message()
            if tag == b"R":
                code = struct.unpack(">i", payload[:4])[0]
                if code == 0:  # AuthenticationOk
                    pass
                elif code == 10:  # AuthenticationSASL
                    self._scram_auth(payload[4:])
                else:
                    raise PgError(
                        {"M": f"unsupported auth method {code} "
                              "(trust and SCRAM-SHA-256 supported)"}
                    )
            elif tag == b"E":
                raise PgError(self._error_fields(payload))
            elif tag == b"Z":  # ReadyForQuery
                return
            # ParameterStatus('S'), BackendKeyData('K'), NoticeResponse('N')
            # carry nothing the sink needs.

    # -- SCRAM-SHA-256 (RFC 5802/7677) -------------------------------------

    def _send_password_msg(self, body: bytes) -> None:
        self._sock.sendall(b"p" + struct.pack(">i", len(body) + 4) + body)

    def _read_auth(self, want: int) -> bytes:
        """Next AuthenticationSASLContinue/Final payload, or raise."""
        while True:
            tag, payload = self._read_message()
            if tag == b"E":
                raise PgError(self._error_fields(payload))
            if tag == b"R":
                code = struct.unpack(">i", payload[:4])[0]
                if code != want:
                    raise PgError(
                        {"M": f"expected SASL auth code {want}, got {code}"}
                    )
                return payload[4:]
            # notices may interleave

    def _scram_auth(self, mechanisms: bytes) -> None:
        if b"SCRAM-SHA-256" not in mechanisms.split(b"\x00"):
            raise PgError(
                {"M": "server offers no SCRAM-SHA-256 "
                      "(channel-binding variants unsupported)"}
            )
        if self._password is None:
            raise PgError(
                {"M": f"server demands a password for user {self._user!r} "
                      "and none was given"}
            )
        nonce = base64.b64encode(secrets.token_bytes(18)).decode()
        # the server takes the username from the startup message; n= stays
        # empty per the PostgreSQL SASL exchange
        client_first_bare = f"n=,r={nonce}"
        initial = b"n,," + client_first_bare.encode()
        mech = b"SCRAM-SHA-256\x00"
        self._send_password_msg(
            mech + struct.pack(">i", len(initial)) + initial
        )

        server_first = self._read_auth(11).decode()  # SASLContinue
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        full_nonce, salt, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not full_nonce.startswith(nonce):
            raise PgError({"M": "SCRAM server nonce does not extend ours"})

        salted = hashlib.pbkdf2_hmac(
            "sha256",
            self._password.encode(),
            base64.b64decode(salt),
            iters,
        )
        client_key = hmac.digest(salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = f"c=biws,r={full_nonce}"  # biws = b64("n,,")
        auth_message = ",".join(
            [client_first_bare, server_first, without_proof]
        ).encode()
        client_sig = hmac.digest(stored_key, auth_message, "sha256")
        proof = base64.b64encode(
            bytes(a ^ b for a, b in zip(client_key, client_sig))
        ).decode()
        self._send_password_msg(f"{without_proof},p={proof}".encode())

        server_final = self._read_auth(12).decode()  # SASLFinal
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        want_sig = hmac.digest(server_key, auth_message, "sha256")
        got = dict(kv.split("=", 1) for kv in server_final.split(","))
        if base64.b64decode(got.get("v", "")) != want_sig:
            raise PgError(
                {"M": "SCRAM server signature mismatch "
                      "(not talking to who holds the credential)"}
            )

    # -- simple query ----------------------------------------------------

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        """Run one simple-query message; return (columns, text rows) of
        the LAST result set (DDL/INSERT return ([], []))."""
        body = sql.encode() + b"\x00"
        self._sock.sendall(b"Q" + struct.pack(">i", len(body) + 4) + body)
        columns: list[str] = []
        rows: list[tuple] = []
        error: dict[str, str] | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"T":
                columns, rows = [], []
                (n_fields,) = struct.unpack(">h", payload[:2])
                off = 2
                for _ in range(n_fields):
                    end = payload.index(b"\x00", off)
                    columns.append(payload[off:end].decode())
                    off = end + 1 + 18  # fixed per-field descriptor tail
            elif tag == b"D":
                (n_fields,) = struct.unpack(">h", payload[:2])
                off = 2
                vals: list[str | None] = []
                for _ in range(n_fields):
                    (ln,) = struct.unpack(">i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off : off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif tag == b"E":
                error = self._error_fields(payload)
            elif tag == b"Z":
                if error is not None:
                    raise PgError(error)
                return columns, rows
            # 'C' CommandComplete / 'N' notices / 'I' EmptyQueryResponse:
            # nothing to collect.

    def copy_in(self, sql: str, lines) -> None:
        """Bulk-load via ``COPY ... FROM STDIN`` (text format).

        ``sql`` is the COPY statement; ``lines`` yields pre-encoded
        text-format rows WITHOUT the trailing newline (build fields with
        :func:`copy_text_value` and join with tabs).  Protocol flow per
        https://www.postgresql.org/docs/current/protocol-flow.html#PROTOCOL-COPY:
        Query('Q') -> CopyInResponse('G') -> CopyData('d')* ->
        CopyDone('c') -> CommandComplete('C') -> ReadyForQuery('Z').
        """
        body = sql.encode() + b"\x00"
        self._sock.sendall(b"Q" + struct.pack(">i", len(body) + 4) + body)
        error: dict[str, str] | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"G":  # CopyInResponse
                break
            if tag == b"E":
                error = self._error_fields(payload)
            elif tag == b"Z":
                raise PgError(
                    error or {"M": "server never entered COPY-IN mode"}
                )
        buf = bytearray()
        try:
            for line in lines:
                buf += line.encode()
                buf += b"\n"
                if len(buf) >= 65536:
                    self._sock.sendall(
                        b"d" + struct.pack(">i", len(buf) + 4) + bytes(buf)
                    )
                    buf.clear()
            if buf:
                self._sock.sendall(
                    b"d" + struct.pack(">i", len(buf) + 4) + bytes(buf)
                )
        except Exception:
            # CopyFail('f') so the server aborts the COPY cleanly and
            # returns to ReadyForQuery instead of waiting for more data.
            # Best-effort: the socket may be the thing that just failed
            # (e.g. BrokenPipeError mid-CopyData) — never let the abort
            # handshake replace the original exception (ADVICE r9).
            try:
                msg = b"producer failed\x00"
                self._sock.sendall(
                    b"f" + struct.pack(">i", len(msg) + 4) + msg
                )
                self._drain_to_ready()
            except Exception:
                pass  # expected COPY-abort error / dead socket
            raise
        self._sock.sendall(b"c" + struct.pack(">i", 4))  # CopyDone
        self._drain_to_ready()

    def _drain_to_ready(self) -> None:
        error: dict[str, str] | None = None
        while True:
            tag, payload = self._read_message()
            if tag == b"E":
                error = self._error_fields(payload)
            elif tag == b"Z":
                if error is not None:
                    raise PgError(error)
                return

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack(">i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "PgConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# -- literal quoting (sink side) ------------------------------------------


def quote_literal(v) -> str:
    """Render a Python value as a standard-conforming SQL literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr() renders non-finite doubles as bare nan/inf tokens,
        # which the parser rejects — PostgreSQL wants the quoted
        # special literals (ADVICE r8).
        if v != v:
            return "'NaN'::float8"
        if v == float("inf"):
            return "'Infinity'::float8"
        if v == float("-inf"):
            return "'-Infinity'::float8"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return f"'\\x{bytes(v).hex()}'::bytea"
    return "'" + str(v).replace("'", "''") + "'"


def copy_text_value(v) -> str:
    """Render one field for COPY ... FROM STDIN (text format): ``\\N``
    for NULL, ``t``/``f`` booleans, backslash-escaped ``\\xHEX`` bytea,
    the unquoted ``NaN``/``Infinity`` specials (which COPY text DOES
    accept, unlike the SQL parser), and backslash/tab/newline escapes
    per https://www.postgresql.org/docs/current/sql-copy.html."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == float("inf"):
            return "Infinity"
        if v == float("-inf"):
            return "-Infinity"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return f"\\\\x{bytes(v).hex()}"
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'
