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
        self._r = self._sock.makefile("r", encoding="utf-8", newline="\n")
        self._w = self._sock.makefile("w", encoding="utf-8", newline="\n")
        greeting = self._r.readline()
        if not greeting.startswith("+ok"):
            raise WireError("bad greeting: %r" % greeting)

    def _send(self, stmt):
        self._w.write(stmt.replace("\n", " ") + "\n")
        self._w.flush()
        head = self._r.readline()
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
                header = self._r.readline().rstrip("\n")
                self.columns = [_unesc(c) for c in
                                header.lstrip("#").split("\t")]
                rows_left = int(n)
                while rows_left > 0:
                    line = self._r.readline().rstrip("\n")
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
                    self._r.readline()
                try:
                    self._send("close " + cur)
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
