"""
Julia client for the graft wire protocol — the counterpart of the
reference's Julia binding (reference: julia/now.jl `NoW` module:
connect/execute/iterate, typed fields, time-conversion helpers).
Where the reference wraps its C client library via ccall, this module
speaks the line+binary wire protocol of graft.engine.Server directly
over a TCPSocket, stdlib only (Sockets, Dates).

The connection runs in `mode binary` (row.c:138-207 framing), so
every field arrives TYPED — tfield/field return Int64/Float64/Bool/
String/nothing, exactly like the reference's typed row accessors.

Usage:

    include("nowjl.jl"); using .NoW
    withconnection("127.0.0.1", "55505", "usr", "pwd", "mydb") do con
        for row in execute(con, "select id, name from gadget") |> asarray
            println(row[1], ": ", row[2])
        end
        println(onevalue(con, "select count(*) from gadget"))
    end

`loadsql` returns a NamedTuple of column vectors (feed it straight to
DataFrames.DataFrame if DataFrames is installed — kept stdlib-only
here, unlike the reference which hard-depends on DataFrames).

One deviation forced by the shared byte stream: if you BREAK out of a
row iteration early, call `release(res)` — it drains the half-read
batch and closes the server cursor. (The reference's C-library rows
live out-of-band, so its iterator never leaves bytes on a socket;
here abandoning without release would desync the wire.)
"""
module NoW

# import (not using): `connect`, `close` and `now` are defined by
# this module too, and a `using` binding would clash with the local
# definitions; Base.close is extended so `close(con)` works bare
import Sockets
import Dates
import Base: close
const TCPSocket = Sockets.TCPSocket

export NoConnectionError, ClientError, DBError, NothingError,
       TEXT, DATE, TIME, FLOAT, INT, UINT, BOOL,
       datetime2now, now2datetime, now2datetimens,
       now2date, now2time, now2datetimepair, now,
       connect, close, reconnect, withconnection, use, describe,
       execute, fillsql, loadsql, loaddf, tomatrix, asarray,
       onerow, onevalue, tfield, field, fieldcount, release, Report

struct NoConnectionError <: Exception end
struct WrongTypeError <: Exception end
struct NothingError <: Exception end
struct ClientError <: Exception
  code::Int
  msg::String
end
struct DBError <: Exception
  code::Int
  msg::String
end

# NoWDB types (reference types.h:89-99) — these are the wire tags
const NOTHING = 0
const TEXT = 1
const DATE = 2
const TIME = 3
const FLOAT = 4
const INT = 5
const UINT = 6
const BOOL = 9

# result kinds (reference now.jl result types)
const STATUS = 33
const REPORT = 34
const ROW = 35
const CURSOR = 36

const NPERSEC = 1000000000

# ── time conversions (identical math to the reference) ─────────────
now2unix(t::Int64) = Dates.unix2datetime(Float64(t) / NPERSEC)

function belowsec(t::Int64)
  s = t ÷ NPERSEC
  xs = t - s * NPERSEC
  ys = xs ÷ 1000
  ms = ys ÷ 1000
  ns = xs - 1000ys
  us = ys - 1000ms
  (ms, us, ns)
end

function datetime2now(t::Dates.DateTime; us = 0, ns = 0)
  n = Int64(1000 * Dates.datetime2unix(t))
  1000000n + 1000us + ns
end

now2datetime(t::Int64) = now2unix(t)

function now2datetimens(t::Int64)
  _, us, ns = belowsec(t)
  (now2unix(t), us, ns)
end

now2date(t::Int64) = Dates.Date(now2unix(t))

function now2time(t::Int64)
  nix = now2unix(t)
  ms, us, ns = belowsec(t)
  Dates.Time(Dates.hour(nix), Dates.minute(nix), Dates.second(nix),
             ms, us, ns)
end

now2datetimepair(t::Int64) = (now2date(t), now2time(t))

# ── wire-escape decode for text head lines (#header cells) ─────────
function _unesc(cell::AbstractString)
  cell == "\\N" && return nothing
  out = IOBuffer()
  i = firstindex(cell)
  while i <= lastindex(cell)
    ch = cell[i]
    if ch == '\\' && i < lastindex(cell)
      nxt = cell[nextind(cell, i)]
      write(out, nxt == 'n' ? '\n' : nxt == 't' ? '\t' :
                 nxt == 'r' ? '\r' : nxt == '\\' ? '\\' :
                 string('\\', nxt))
      i = nextind(cell, nextind(cell, i))
    else
      write(out, ch)
      i = nextind(cell, i)
    end
  end
  String(take!(out))
end

# ── connection ─────────────────────────────────────────────────────
mutable struct Connection
  _sock::Union{TCPSocket, Nothing}
  _addr::String
  _port::String
  _usr::String
  _pwd::String
  _db::String
end

function _sendline(con::Connection, stmt::String)
  con._sock === nothing && throw(NoConnectionError())
  write(con._sock, replace(stmt, "\n" => " ") * "\n")
  flush(con._sock)
  head = readline(con._sock)
  isempty(head) && !isopen(con._sock) &&
    throw(ClientError(-1, "server closed the connection"))
  head
end

"""
    connect(srv, port, usr="", pwd="", db="")

    Open a wire connection (port as String or Int, mirroring the
    reference's service-string signature). usr/pwd are accepted for
    signature parity; this server does not authenticate. If `db` is
    given, issue `use db`. Returns a Connection; throws on error.
"""
function connect(srv::String, port, usr::String = "", pwd::String = "",
                 db::String = "")
  sock = Sockets.connect(srv, parse(Int, string(port)))
  greeting = readline(sock)
  startswith(greeting, "+ok") ||
    throw(ClientError(-1, "bad greeting: $greeting"))
  con = Connection(sock, srv, string(port), usr, pwd, db)
  head = _sendline(con, "mode binary")
  head == "+ok mode binary" ||
    throw(ClientError(-1, "mode binary refused: $head"))
  use(con, db)
  con
end

function close(con::Connection)
  con._sock === nothing && return
  try
    write(con._sock, "quit\n")
    flush(con._sock)
  catch
  end
  Base.close(con._sock)
  con._sock = nothing
  nothing
end

function reconnect(con::Connection)
  c = connect(con._addr, con._port, con._usr, con._pwd, con._db)
  con._sock = c._sock
  nothing
end

function withconnection(f::Function, srv::String, port,
                        usr::String = "", pwd::String = "",
                        db::String = "")
  con = connect(srv, port, usr, pwd, db)
  try
    return f(con)
  finally
    close(con)
  end
end

use(con::Connection, db::String) =
  (db != "" && execute(con, "use $db"); nothing)

struct Report
  loaded::Int64
  errors::Int64
end

# ── results ────────────────────────────────────────────────────────
mutable struct Result
  _con::Connection
  _type::Int
  _cur::String          # server cursor id ("" once released)
  _ctype::Int8          # 0 = internal row view, 1 = asarray
  _fcount::Int64
  columns::Vector{String}
  _tags::Vector{Int}    # current row, wire type per field
  _vals::Vector{Any}    # current row, decoded values
  _left::Int            # rows remaining in the current batch
  _more::Bool           # server has further batches
end

"""
    execute(con, stmt)

    Send `stmt`. Status statements return nothing, LOAD reports a
    Report, SELECTs return a Result (iterate it for rows). Throws
    DBError on a server error.
"""
function execute(con::Connection, stmt::String)
  head = _sendline(con, stmt)
  if startswith(head, "+ok")
    return nothing
  elseif startswith(head, "-err")
    throw(DBError(-1, strip(head[5:end])))
  elseif startswith(head, "+report")
    p = split(head, " ")
    return Report(parse(Int64, p[2]), parse(Int64, p[3]))
  elseif startswith(head, "+cursor")
    cur = split(head, " ")[2]
    return Result(con, CURSOR, String(cur), Int8(0), -1,
                  String[], Int[], Any[], 0, true)
  end
  throw(ClientError(-1, "unexpected frame: $head"))
end

asarray(res::Result) = (res._ctype = Int8(1); res)

# one [tag][value] field (row.c framing; see clients/pynow.py twin).
# read! (not read(io, nb), which may return short on a socket) so an
# 8-byte value is always read whole.
function _read8(sock::TCPSocket)
  read!(sock, Vector{UInt8}(undef, 8))
end

function _readfield(sock::TCPSocket)
  tag = Int(read(sock, UInt8))
  if tag == NOTHING
    read(sock, UInt8)
    return (tag, nothing)
  elseif tag == TEXT
    return (tag, String(readuntil(sock, 0x00)))
  elseif tag == DATE || tag == TIME || tag == INT || tag == UINT
    return (tag, ltoh(only(reinterpret(Int64, _read8(sock)))))
  elseif tag == FLOAT
    return (tag, reinterpret(Float64,
                   ltoh(only(reinterpret(UInt64, _read8(sock))))))
  elseif tag == BOOL
    return (tag, read(sock, UInt8) == 0x01)
  end
  throw(ClientError(-1, "unknown type tag $tag"))
end

# pull the next batch head + header line; false on exhaustion
function _fetch(res::Result)
  res._more || return false
  head = _sendline(res._con, "fetch $(res._cur)")
  startswith(head, "+batch") ||
    throw(DBError(-1, "expected batch, got: $head"))
  p = split(head, " ")
  res._left = parse(Int, p[2])
  res._more = p[3] == "1"
  header = readline(res._con._sock)
  res.columns = [something(_unesc(c), "")
                 for c in split(lstrip(header, '#'), "\t")]
  res._fcount = length(res.columns)
  res._left > 0 || return _fetch(res)  # empty batch, try the next
  true
end

# read one binary row off the wire into the Result's current-row slots
function _nextrow(res::Result)
  res._left > 0 || return false
  sock = res._con._sock
  res._tags = Int[]
  res._vals = Any[]
  for _ in 1:res._fcount
    t, v = _readfield(sock)
    push!(res._tags, t)
    push!(res._vals, v)
  end
  read(sock, UInt8) == UInt8('\n') ||
    throw(ClientError(-1, "missing row terminator"))
  res._left -= 1
  true
end

"""
    iterate(res::Result, have=false)

    Row iteration exactly like the reference: yields the Result
    itself (use field/tfield/fieldcount) or, after |> asarray, a
    Vector{Any} per row. The cursor is released on exhaustion.
"""
function Base.iterate(res::Result, have = false)
  res._type == CURSOR || res._type == ROW || throw(WrongTypeError())
  if !have
    res._cur != "" || throw(ArgumentError("not a valid result"))
    _fetch(res) || (release(res); return nothing)
  end
  if !_nextrow(res)
    if !(res._more && _fetch(res) && _nextrow(res))
      release(res)
      return nothing
    end
  end
  (res._ctype == 0 ? res : copy(res._vals), true)
end

Base.IteratorSize(::Type{Result}) = Base.SizeUnknown()

row2array(res::Result) = copy(res._vals)

"""
    tfield(res, idx)   # 0-based, like the reference

    (NoWDB type, value) of field `idx` in the current row.
"""
function tfield(res::Result, idx::Int)
  0 <= idx < res._fcount || throw(BoundsError(res._vals, idx + 1))
  (res._tags[idx + 1], res._vals[idx + 1])
end

field(res::Result, idx::Int) = tfield(res, idx)[2]

fieldcount(res::Result) = res._fcount

"""
    release(res)

    Close the server-side cursor and drain any half-read batch so the
    wire stays in sync (cursors pin a persisted frame until closed).
"""
function release(res::Result)
  res._cur == "" && return
  sock = res._con._sock
  if sock !== nothing
    while res._left > 0   # drain abandoned rows field-by-field
      _nextrow(res)
    end
    try
      _sendline(res._con, "close $(res._cur)")
    catch
    end
  end
  res._cur = ""
  nothing
end

function onerow(con::Connection, stmt::String)
  res = execute(con, stmt)
  res isa Result || throw(NothingError())
  for r in res
    a = row2array(res)
    release(res)
    return a
  end
  throw(NothingError())
end

onevalue(con::Connection, stmt::String) = onerow(con, stmt)[1]

now(con::Connection) = onevalue(con, "select now()")

function describe(con::Connection, obj)
  a = Tuple{String, String}[]
  for row in execute(con, "describe $obj") |> asarray
    push!(a, (string(row[1]), string(row[2])))
  end
  a
end

"""
    fillsql(con, stmt; T=Any, cols=0, count="", limit=0)

    Result as a Matrix{T}, reference-identical semantics: `count`
    (a count(*) statement) or `limit` preallocates; otherwise rows
    are vcat'ed.
"""
function fillsql(con::Connection, stmt::String; T = Any, cols = 0,
                 count::String = "", limit = 0)
  l = limit
  if count != "" && l <= 0
    l = Int(onevalue(con, count))
  end
  res = execute(con, stmt) |> asarray
  res isa Result || throw(NothingError())
  rows = Vector{Any}[]
  i = 0
  for row in res
    push!(rows, row)
    i += 1
    if l > 0 && i == l
      release(res)
      break
    end
  end
  c = cols > 0 ? cols : (isempty(rows) ? length(res.columns) :
                         length(rows[1]))
  m = Matrix{T}(undef, length(rows), c)
  for (r, row) in enumerate(rows), j in 1:c
    m[r, j] = row[j]
  end
  m
end

"""
    loadsql(con, stmt; count="", limit=0)

    Result as a NamedTuple of column vectors, keyed by the server's
    column names — `DataFrames.DataFrame(loadsql(...))` gives the
    reference's DataFrame behavior without a hard dependency.
"""
function loadsql(con::Connection, stmt::String; count::String = "",
                 limit = 0)
  res = execute(con, stmt) |> asarray
  res isa Result || throw(NothingError())
  rows = Vector{Any}[]
  i = 0
  for row in res
    push!(rows, row)
    i += 1
    if limit > 0 && i == limit
      release(res)
      break
    end
  end
  names = Tuple(Symbol(c) for c in res.columns)
  NamedTuple{names}(Tuple([r[j] for r in rows]
                          for j in 1:length(names)))
end

"""
    loaddf(con, stmt; count="", limit=0)

    The reference's DataFrame surface (NoW.jl loadsql:628-656 returns
    a DataFrames.DataFrame named from the select list; exercised by
    julia/dftest.jl). This module stays stdlib-only, so the DataFrames
    dependency is resolved AT CALL TIME from the caller's session:
    `using DataFrames` first, then `loaddf(...)` — otherwise a
    ClientError explains what to load. Column names come from the
    server header (authoritative for expressions and aliases, no
    client-side select parsing like the reference's _parseselect).
"""
function loaddf(con::Connection, stmt::String; count::String = "",
                limit = 0)
  isdefined(Main, :DataFrames) ||
    throw(ClientError(-1,
      "loaddf needs DataFrames: run `using DataFrames` first " *
      "(loadsql returns the same data as a stdlib NamedTuple)"))
  nt = loadsql(con, stmt, count = count, limit = limit)
  Base.invokelatest(Main.DataFrames.DataFrame, nt)
end

"""
    tomatrix(nt::NamedTuple; T=Any)

    Column-vectors → Matrix{T} (rows × columns) — the pure-conversion
    half of the reference's fill (NoW.jl:602-624), usable on a
    loadsql result without a second server round trip:
    `tomatrix(loadsql(con, q))` ≡ `fillsql(con, q)`.
"""
function tomatrix(nt::NamedTuple; T = Any)
  c = length(nt)
  r = c == 0 ? 0 : length(nt[1])
  m = Matrix{T}(undef, r, c)
  for j in 1:c, i in 1:r
    m[i, j] = nt[j][i]
  end
  m
end

end # module
