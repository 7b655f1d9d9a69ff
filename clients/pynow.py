#!/usr/bin/env python3
"""Minimal Python client for the graft wire protocol — the counterpart
of the reference's pynow binding (reference: pynow/now.py), over the
line protocol served by graft.engine.Server.

Stdlib only. Usage:

    from pynow import Connection
    with Connection("127.0.0.1", 55505) as c:
        c.execute("use myscope")
        for row in c.query("select id, name from gadget"):
            print(row)

`execute` returns (ok, message) for status statements; `query` pages a
SELECT through the server-side cursor (fetch/close) and yields tuples
of strings (None for NULL).
"""
import socket
import struct


def _unesc(cell):
    if cell == "\\N":
        return None
    out, i = [], 0
    while i < len(cell):
        ch = cell[i]
        if ch == "\\" and i + 1 < len(cell):
            nxt = cell[i + 1]
            out.append({"n": "\n", "t": "\t", "r": "\r",
                        "\\": "\\"}.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class WireError(Exception):
    pass


class Connection:
    def __init__(self, host="127.0.0.1", port=55505, timeout=120):
        self._sock = socket.create_connection((host, port), timeout)
        # read side is BINARY so the same buffered stream can carry
        # text head lines and (in `mode binary`) typed row frames
        self._r = self._sock.makefile("rb")
        self._w = self._sock.makefile("w", encoding="utf-8", newline="\n")
        greeting = self._readline()
        if not greeting.startswith("+ok"):
            raise WireError("bad greeting: %r" % greeting)

    def _readline(self):
        return self._r.readline().decode("utf-8")

    def _send(self, stmt):
        self._w.write(stmt.replace("\n", " ") + "\n")
        self._w.flush()
        head = self._readline()
        if not head:
            raise WireError("server closed the connection")
        return head.rstrip("\n")

    def execute(self, stmt):
        """Run a status/report statement. Returns (ok, message)."""
        head = self._send(stmt)
        if head.startswith("+ok"):
            return True, head[3:].strip()
        if head.startswith("+report"):
            return True, head[1:]
        if head.startswith("-err"):
            return False, head[4:].strip()
        if head.startswith("+cursor"):  # caller meant query(); drain it
            self._send("close " + head.split(" ")[1])
            return True, head[1:]
        raise WireError("unexpected frame: %r" % head)

    def query(self, stmt):
        """Run a SELECT; yields one tuple of (str|None) per row.
        The column names are available as .columns after the first
        fetched page."""
        head = self._send(stmt)
        if head.startswith("-err"):
            raise WireError(head[4:].strip())
        if not head.startswith("+cursor"):
            raise WireError("expected cursor, got %r" % head)
        cur = head.split(" ")[1]
        more = True
        rows_left = 0
        try:
            while more:
                batch = self._send("fetch " + cur)
                if not batch.startswith("+batch"):
                    raise WireError("expected batch, got %r" % batch)
                _, n, more_flag = batch.split(" ")
                header = self._readline().rstrip("\n")
                self.columns = [_unesc(c) for c in
                                header.lstrip("#").split("\t")]
                rows_left = int(n)
                while rows_left > 0:
                    line = self._readline().rstrip("\n")
                    rows_left -= 1
                    yield tuple(_unesc(c) for c in line.split("\t"))
                more = more_flag == "1"
        finally:
            # abandoned early (consumer stopped iterating / closed the
            # generator): drain the partially-read batch so the wire
            # stays in sync, then release the server-side cursor — it
            # pins a persisted frame until closed
            if more or rows_left:
                for _ in range(rows_left):
                    self._readline()
                try:
                    self._send("close " + cur)
                except (WireError, OSError):
                    pass

    def _read_binary_field(self):
        """One [tag][value] field, value only (see _read_binary_tagged)."""
        return self._read_binary_tagged()[1]

    def _read_binary_tagged(self):
        """One [tag][value] field of the reference's binary row format
        (row.c framing), returned as (tag, value): NOTHING(0)+zero
        byte -> None, TEXT(1) is NUL-terminated UTF-8, DATE(2)/
        TIME(3)/INT(5)/UINT(6) are 8-byte little-endian int64 (TIME
        in ns since epoch), FLOAT(4) an LE double, BOOL(9) one byte.
        The tag is what lets a typed layer (nowapi's PEP-249 cursor)
        convert DATE/TIME to datetime without parsing SQL."""
        tag = self._r.read(1)[0]
        if tag == 0:
            self._r.read(1)
            return tag, None
        if tag == 1:
            out = bytearray()
            c = self._r.read(1)
            while c != b"\x00":
                out += c
                c = self._r.read(1)
            return tag, out.decode("utf-8")
        if tag in (2, 3, 5, 6):
            return tag, struct.unpack("<q", self._r.read(8))[0]
        if tag == 4:
            return tag, struct.unpack("<d", self._r.read(8))[0]
        if tag == 9:
            return tag, self._r.read(1) == b"\x01"
        raise WireError("unknown type tag %d" % tag)

    def query_binary(self, stmt):
        """Run a SELECT with the server in `mode binary`: yields one
        tuple of TYPED values (int/float/bool/str/None) per row —
        the reference client's typed-field view instead of TSV
        strings. Switches the session mode around the query."""
        ok, msg = self.execute("mode binary")
        if not ok:
            raise WireError("mode binary refused: %s" % msg)
        head = self._send(stmt)
        if head.startswith("-err"):
            self.execute("mode text")
            raise WireError(head[4:].strip())
        if not head.startswith("+cursor"):
            self.execute("mode text")
            raise WireError("expected cursor, got %r" % head)
        cur = head.split(" ")[1]
        more = True
        rows_left = 0
        ncols = 0
        desynced = False
        try:
            while more:
                batch = self._send("fetch " + cur)
                if not batch.startswith("+batch"):
                    # text head consumed in full — the stream is still
                    # in sync, normal recovery below applies
                    raise WireError("expected batch, got %r" % batch)
                _, n, more_flag = batch.split(" ")
                header = self._readline().rstrip("\n")
                self.columns = [_unesc(c) for c in
                                header.lstrip("#").split("\t")]
                ncols = len(self.columns)
                rows_left = int(n)
                while rows_left > 0:
                    try:
                        row = tuple(self._read_binary_field()
                                    for _ in range(ncols))
                        if self._r.read(1) != b"\n":
                            raise WireError("missing row terminator")
                    except WireError:
                        # a framing error mid-row leaves the stream
                        # position unknowable: any further round-trip
                        # (drain/close/mode text) could block on a
                        # readline until the socket timeout. Fail
                        # fast: mark broken, tear the socket down.
                        desynced = True
                        raise
                    rows_left -= 1
                    yield row
                more = more_flag == "1"
        finally:
            if desynced:
                self._sock.close()  # connection is unusable
            else:
                # abandoned early: drain the partial batch
                # field-by-field so the wire stays in sync, release
                # the cursor, and restore text mode for subsequent
                # statements
                for _ in range(rows_left):
                    for _ in range(ncols):
                        self._read_binary_field()
                    self._r.read(1)
                if more or rows_left:
                    try:
                        self._send("close " + cur)
                    except (WireError, OSError):
                        pass
                try:
                    self.execute("mode text")
                except (WireError, OSError):
                    pass

    def close(self):
        try:
            self._send("quit")
        except (WireError, OSError):
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
