#!/usr/bin/env python3
"""PEP 249 (Python DB-API 2.0) layer over the pynow wire client — the
counterpart of the reference's pynow/nowapi.py (connection object,
cursor.execute/fetchone/fetchmany/fetchall, description, dict/tuple/
list row formats, %-style parameters), re-expressed over this engine's
wire protocol.

One deliberate improvement over the reference: the reference derives
`description` by re-parsing the SQL select list client-side
(nowapi.py:432 selparse) and issuing a DESCRIBE for `select *`; this
server already sends the authoritative column header with every batch,
so `description` here comes from the server and is correct for any
expression, alias, or `*` without a second round trip.

Stdlib only. Usage:

    import nowapi
    with nowapi.connect("127.0.0.1", 55505, "user", "pwd", "mydb") as con:
        with con.cursor() as cur:
            cur.execute("select id, nm from gadget where id > %d", (3,))
            print(cur.description)
            for row in cur:          # dict rows by default
                print(row["id"], row["nm"])
"""
from datetime import datetime, timedelta, timezone

from pynow import Connection as _WireConnection, WireError, _unesc

# -- module globals required by PEP 249 ------------------------------
apilevel = "2.0"
threadsafety = 2        # connections may be shared (socket is locked
                        # per statement by the server's session model)
paramstyle = "format"   # 'select ... where id = %d'

# row formats (reference nowapi.py:41-43)
dictrow = 1
tuplerow = 2
listrow = 3

utc = timezone.utc

# Opt-out of str-parameter escaping in addpars (raw reference parity);
# see addpars' docstring. Default False: embedded quotes are doubled.
rawstrings = False

# Opt-in to the reference's None-at-end fetchmany/fetchall return
# (PEP 249 mandates a possibly-empty sequence; default complies).
nonefetch = False

# wire type tags (reference ifc/nowdb.h row framing)
_T_NULL, _T_TEXT, _T_DATE, _T_TIME = 0, 1, 2, 3
_T_FLOAT, _T_INT, _T_UINT, _T_BOOL = 4, 5, 6, 9


# -- exception hierarchy required by PEP 249 -------------------------
class Warning(Exception):
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# -- type constructors (reference nowapi.py:109-134) -----------------
def Date(y, m, d):
    """Constructs a timestamp at midnight UTC (dates ARE timestamps)."""
    return datetime(y, m, d, tzinfo=utc)


def Timestamp(y, m, d, h, i, s):
    return datetime(y, m, d, h, i, s, tzinfo=utc)


def Time(h, i, s):
    raise NotSupportedError("Time is not supported; use Timestamp")


def DateFromTicks(t):
    raise NotSupportedError("fromTicks is not supported")


def TimeFromTicks(t):
    raise NotSupportedError("fromTicks is not supported")


def TimestampFromTicks(t):
    raise NotSupportedError("fromTicks is not supported")


def Binary(s):
    raise NotSupportedError("Binary is not supported")


# -- time conversions (reference now.py:161-175) ---------------------
def dt2now(dt):
    """datetime -> engine time (ns since epoch, int)."""
    x = int(dt.timestamp()) * 1000000 + dt.microsecond
    return x * 1000


def now2dt(p):
    """Engine time (ns since epoch) -> tz-aware UTC datetime
    (microsecond precision, like the reference's now2dt)."""
    t = p // 1000
    s = t // 1000000
    m = t - s * 1000000
    return datetime.fromtimestamp(s, utc) + timedelta(microseconds=m)


def convert(t, v):
    """Typed wire field -> Python value (reference nowapi.py:306)."""
    if t in (_T_TIME, _T_DATE) and v is not None:
        return now2dt(v)
    return v


def addpars(op, ps):
    """%-style parameter substitution (reference nowapi.py:312):
    None -> NULL, datetime -> engine ns stamp, rest via str().

    IMPORTANT — string parameters are NOT auto-quoted (reference
    parity: the SQL template must carry the quotes itself, e.g.
    ``... where nm = '%s'``). Embedded single quotes in str values
    ARE escaped (doubled), so a value like ``O'Brien`` can neither
    break the statement nor smuggle SQL past the template's quotes.
    Callers who need the raw reference behavior (no escaping) can set
    ``nowapi.rawstrings = True``."""
    if ps is None:
        return op
    subst = []
    for p in ps:
        if p is None:
            subst.append("NULL")
        elif isinstance(p, datetime):
            subst.append(str(dt2now(p)))
        elif isinstance(p, str) and not rawstrings:
            # backslash first (the engine lexer also treats \ as an
            # escape inside string literals), then quote doubling
            subst.append(p.replace("\\", "\\\\").replace("'", "''"))
        else:
            subst.append(str(p))
    return op % tuple(subst)


class Connection:
    """PEP-249 connection over the graft wire protocol. A resource
    manager (`with nowapi.connect(...) as con:`); commit/rollback are
    no-ops (statements are atomic server-side, as in the reference)."""

    def __init__(self):
        self._c = None

    def close(self):
        if self._c is not None:
            self._c.close()
            self._c = None

    def commit(self):
        pass

    def rollback(self):
        pass

    def cursor(self):
        if self._c is None:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def execute(self, stmt, parameters=None, rowformat=dictrow):
        """Convenience (reference nowapi.py:171): create a cursor,
        execute on it, return it — enables
        `for row in con.execute('select ...'):`."""
        cur = self.cursor()
        cur.setRowFormat(rowformat)
        cur.execute(stmt, parameters)
        return cur

    def __enter__(self):
        return self

    def __exit__(self, a, b, c):
        self.close()


def connect(host, port, u=None, p=None, db=None):
    """Connection constructor: host, port, username, password, and an
    optional database (scope) to `use`; u/p accepted for DB-API
    signature parity (this server does not authenticate). With db
    None, select one later via the SQL `use` command."""
    try:
        c = _WireConnection(host, int(port))
    except Exception as x:
        raise InterfaceError(str(x))
    # the whole DB-API session runs with binary (typed) row frames so
    # cursors can type-convert without guessing
    ok, msg = c.execute("mode binary")
    if not ok:
        c.close()
        raise InterfaceError("mode binary refused: %s" % msg)
    if db is not None:
        try:
            ok, msg = c.execute("use %s" % db)
        except Exception as x:
            c.close()
            raise DatabaseError(str(x))
        if not ok:
            c.close()
            raise InternalError("cannot use %s: %s" % (db, msg))
    con = Connection()
    con._c = c
    return con


class Cursor:
    """PEP-249 cursor. `execute` runs any statement; on a SELECT the
    first server batch is fetched eagerly so `description` (7-item
    sequences: name, type_code from the wire tag, then Nones) is
    available immediately after execute, per the spec. Fetching pages
    through the server-side cursor exactly like the reference client:
    fetchone only talks to the server when the local batch is
    exhausted. A resource manager and an iterator."""

    def __init__(self, con):
        self._con = con
        self._curid = None      # server cursor id, None = no resultset
        self._buf = []          # decoded rows of the current batch
        self._pos = 0
        self._more = False
        self._cols = []
        self.arraysize = 1
        self.description = None
        self.rowcount = -1
        self.rowformat = dictrow

    # -- internal wire paging ---------------------------------------
    def _wire(self):
        if self._con is None or self._con._c is None:
            raise InterfaceError("no connection")
        return self._con._c

    def _fetch_batch(self):
        c = self._wire()
        head = c._send("fetch %s" % self._curid)
        if not head.startswith("+batch"):
            raise InterfaceError("expected batch, got %r" % head)
        _, n, more_flag = head.split(" ")
        header = c._readline().rstrip("\n")
        self._cols = [_unesc(x) for x in header.lstrip("#").split("\t")]
        rows = []
        for _ in range(int(n)):
            row = tuple(c._read_binary_tagged()
                        for _ in range(len(self._cols)))
            if c._r.read(1) != b"\n":
                raise InterfaceError("missing row terminator")
            rows.append(row)
        self._buf = rows
        self._pos = 0
        self._more = more_flag == "1"

    # -- PEP 249 surface --------------------------------------------
    def close(self):
        """Releases the server-side cursor (it pins a persisted frame
        until closed) and local state."""
        if self._curid is not None:
            cur = self._curid
            self._curid = None
            if self._more:
                try:
                    self._wire()._send("close %s" % cur)
                except (WireError, InterfaceError, OSError):
                    pass
        self._buf = []
        self._pos = 0
        self._more = False
        self.description = None
        self.rowcount = -1

    def setRowFormat(self, rowtype):
        """dictrow: {fieldname: value}; tuplerow: value tuple;
        listrow: value list (reference nowapi.py:398)."""
        if rowtype not in (dictrow, tuplerow, listrow):
            raise InterfaceError("unknown row format: %s" % rowtype)
        self.rowformat = rowtype

    def callproc(self, name, parameters=None):
        """Engine procedures run through SQL EXEC."""
        ps = "" if not parameters else \
            ", ".join(addpars("%s", (p,)) for p in parameters)
        self.execute("exec %s(%s)" % (name, ps))

    def execute(self, op, parameters=None):
        if self._curid is not None or self.description is not None:
            self.close()
        opp = addpars(op, parameters)
        c = self._wire()
        try:
            head = c._send(opp)
        except WireError as x:
            raise DatabaseError(str(x))
        if head.startswith("-err"):
            raise DatabaseError(head[4:].strip())
        if head.startswith("+ok") or head.startswith("+report"):
            # status statement: no resultset (fetchone -> error, like
            # the reference's "not executed" contract for no cursor)
            self.description = None
            self.rowcount = -1
            return
        if not head.startswith("+cursor"):
            raise InterfaceError("unexpected frame: %r" % head)
        self._curid = head.split(" ")[1]
        self._fetch_batch()
        # type_code comes from the first row's wire tags — the +batch
        # frame carries names but not types. For an EMPTY result set
        # (and for a column whose first value is NULL) type_code is 0
        # = "unknown"; names are always authoritative. (A typed header
        # frame would fix this server-side; documented limitation.)
        first = self._buf[0] if self._buf else None
        self.description = [
            (name, first[i][0] if first is not None else 0,
             None, None, None, None, None)
            for i, name in enumerate(self._cols)]
        self.rowcount = 0

    def executemany(self, ops, seq_of_parameters=None):
        raise NotSupportedError("executemany is not supported")

    def _format_row(self, raw):
        vals = [convert(t, v) for (t, v) in raw]
        if self.rowformat == dictrow:
            return {self._cols[i]: vals[i] for i in range(len(vals))}
        if self.rowformat == tuplerow:
            return tuple(vals)
        return vals

    def fetchone(self):
        """One row, or None at end of the resultset. Talks to the
        server only when the local batch is exhausted."""
        if self.description is None:
            raise InterfaceError("not executed")
        if self._pos >= len(self._buf):
            if not self._more:
                return None
            self._fetch_batch()
            if not self._buf:
                return None
        raw = self._buf[self._pos]
        self._pos += 1
        self.rowcount += 1
        return self._format_row(raw)

    def fetchmany(self, size=None):
        """Up to `size` rows (default: .arraysize); [] at end, as PEP
        249 mandates (a sequence, possibly empty — pandas and generic
        DB-API consumers iterate the return value). The reference
        returns None instead; set ``nowapi.nonefetch = True`` for that
        parity behavior."""
        if size is None:
            size = self.arraysize
        out = []
        for _ in range(size):
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        if not out and nonefetch:
            return None
        return out

    def fetchall(self):
        """Every remaining row; [] when none remain (PEP 249 contract;
        ``nowapi.nonefetch = True`` restores the reference's None)."""
        out = []
        while True:
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        if not out and nonefetch:
            return None
        return out

    def setinputsizes(self, sizes):
        pass

    def setoutputsize(self, size, column=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, a, b, c):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        r = self.fetchone()
        if r is None:
            self.close()
            raise StopIteration
        return r

    next = __next__

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
