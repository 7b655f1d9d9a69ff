-- Lua client for the graft wire protocol -- the counterpart of the
-- reference's Lua binding (reference: lua/now.lua API surface:
-- connect/execute/pexecute, polymorphic results with ok/errdetails/
-- rows() iteration), re-expressed over the text line protocol served
-- by graft.engine.Server instead of a C library binding.
--
-- Transport is injected so the module is runtime-agnostic: bind
--   now.transport = {
--     connect  = function(host, port) ... return handle end,
--     sendline = function(handle, line) ... end,
--     recvline = function(handle) ... return line_without_newline end,
--     close    = function(handle) ... end,
--   }
-- before calling now.connect. Any runtime with TCP (LuaSocket, or a
-- host harness) satisfies this in a few lines; ServerSpec binds it to
-- java sockets and drives a full session through this file.
--
-- Usage:
--   local con = now.connect('127.0.0.1', 55505)
--   con.execute('use myscope')
--   local r = con.execute('select id, name from gadget')
--   for row in r.rows() do print(row[1], row[2]) end
--   con.close()

now = {}
now.OK = 0
now.EOF = 8

-- split a line on tabs (plain find; cells were escaped by the server)
local function split_tabs(line)
  local cells = {}
  local start = 1
  while true do
    local at = string.find(line, '\t', start)
    if at == nil then
      cells[#cells + 1] = string.sub(line, start)
      return cells
    end
    cells[#cells + 1] = string.sub(line, start, at - 1)
    start = at + 1
  end
end

-- undo the wire escaping: \N whole-cell is NULL (nil); \t \n \r \\
-- inside a cell are the literal characters
local function unesc(cell)
  if cell == '\\N' then return nil end
  local out = ''
  local i = 1
  local n = string.len(cell)
  while i <= n do
    local c = string.sub(cell, i, i)
    if c == '\\' and i < n then
      local nxt = string.sub(cell, i + 1, i + 1)
      if nxt == 'n' then out = out .. '\n'
      elseif nxt == 't' then out = out .. '\t'
      elseif nxt == 'r' then out = out .. '\r'
      elseif nxt == '\\' then out = out .. '\\'
      else out = out .. c .. nxt end
      i = i + 2
    else
      out = out .. c
      i = i + 1
    end
  end
  return out
end

-- first word of a head line and the remainder after it
local function head_word(line)
  local sp = string.find(line, ' ')
  if sp == nil then return line, '' end
  return string.sub(line, 1, sp - 1), string.sub(line, sp + 1)
end

function now.connect(host, port)
  local t = now.transport
  if t == nil then error('now.transport not bound') end
  local h = t.connect(host, port)
  local greet = t.recvline(h)
  if string.sub(greet, 1, 3) ~= '+ok' then
    error('bad greeting: ' .. tostring(greet))
  end

  local function sendstmt(stmt)
    t.sendline(h, stmt)
    local head = t.recvline(h)
    if head == nil then error('server closed the connection') end
    return head
  end

  -- one FETCH round-trip: head, header line, n data rows
  local function read_batch(id)
    local head = sendstmt('fetch ' .. tostring(id))
    local tag, rest = head_word(head)
    if tag ~= '+batch' then error('fetch failed: ' .. head) end
    local nstr, morestr = head_word(rest)
    local n = tonumber(nstr)
    local more = (morestr == '1')
    local header = t.recvline(h) -- '#'-prefixed column names
    local cols = split_tabs(string.sub(header, 2))
    local rows = {}
    local i = 1
    while i <= n do
      local cells = split_tabs(t.recvline(h))
      local row = {}
      for j, cell in ipairs(cells) do row[j] = unesc(cell) end
      rows[#rows + 1] = row
      i = i + 1
    end
    return rows, cols, more
  end

  -- polymorphic result, reference-style (now.lua makeResult):
  -- rtype is 'status' | 'report' | 'cursor'
  local function make_result(head)
    local tag, rest = head_word(head)
    if tag == '+ok' then
      return {rtype = 'status', ok = true, msg = rest}
    end
    if tag == '-err' then
      return {rtype = 'status', ok = false, msg = rest}
    end
    if tag == '+report' then
      local lstr, estr = head_word(rest)
      return {rtype = 'report', ok = true,
              loaded = tonumber(lstr), errors = tonumber(estr)}
    end
    if tag == '+cursor' then
      local self = {rtype = 'cursor', ok = true, id = tonumber(rest)}
      self.columns = nil
      -- transparently paging row iterator (reference cursor rows())
      self.rows = function()
        local batch = {}
        local idx = 0
        local more = true
        return function()
          idx = idx + 1
          -- keep fetching while pages come back empty with more=1
          -- (an empty non-final page must not truncate the stream)
          while batch[idx] == nil do
            if not more then return nil end
            batch, self.columns, more = read_batch(self.id)
            idx = 1
          end
          return batch[idx]
        end
      end
      -- abandon before exhaustion (exhausted cursors self-close)
      self.close = function()
        sendstmt('close ' .. tostring(self.id))
      end
      return self
    end
    error('unexpected reply: ' .. head)
  end

  local self = {}

  -- protected execute: returns rc, result-or-message
  self.pexecute = function(stmt)
    local r = make_result(sendstmt(stmt))
    if r.ok then return now.OK, r end
    return 1, r.msg
  end

  -- execute or raise, reference-style
  self.execute = function(stmt)
    local rc, r = self.pexecute(stmt)
    if rc ~= now.OK then error(tostring(r)) end
    return r
  end

  self.close = function()
    t.sendline(h, 'quit')
    t.recvline(h) -- '+ok bye'
    t.close(h)
  end

  return self
end

return now
