/* C client for the graft wire protocol — see nowc.h for the contract.
 * Original implementation; mirrors only the reference client's API
 * surface (include/nowdb/nowclient.h), not its code. */
#define _GNU_SOURCE
#include "nowc.h"

#include <stdio.h>
#include <string.h>
#include <errno.h>
#include <time.h>
#include <unistd.h>
#include <netdb.h>
#include <sys/socket.h>
#include <sys/types.h>

/* ── internal structures ────────────────────────────────────────── */

struct nowdb_con_t {
  int   sock;
  FILE *in;     /* buffered reader over sock (lines AND row bytes) */
  int   binary; /* 1 after a successful "mode binary" switch        */
  int   broken; /* 1 after a framing desync: stream position is
                   unknowable, so no further round-trips (same fail-
                   fast contract as pynow.py's desynced flag)        */
};

typedef struct {
  int typ;
  union { int64_t l; double d; char *s; char b; } v;
} nowc_field_t;

struct nowdb_row_t {
  int ncols, nrows, cur;       /* cur = -1 before first next()      */
  nowc_field_t *cells;         /* nrows * ncols                     */
};

struct nowdb_result_t {
  int rtype, status, errcode;
  char *details;
  uint64_t affected, errors;
  uint64_t curid;
  nowdb_con_t con;
};

struct nowdb_cursor_t {
  nowdb_con_t con;
  uint64_t id;
  int more, eof, err;
  char details[256];
  struct nowdb_row_t batch;
};

/* ── error text ─────────────────────────────────────────────────── */

const char *nowdb_err_explain(int err) {
  switch (err) {
    case NOWDB_OK:          return "OK";
    case NOWDB_ERR_NOMEM:   return "out of memory";
    case NOWDB_ERR_NOCON:   return "no connection";
    case NOWDB_ERR_NOSOCK:  return "cannot create socket";
    case NOWDB_ERR_ADDR:    return "cannot resolve address";
    case NOWDB_ERR_NORES:   return "no result";
    case NOWDB_ERR_INVALID: return "invalid argument";
    case NOWDB_ERR_NOREAD:  return "cannot read";
    case NOWDB_ERR_NOWRITE: return "cannot write";
    case NOWDB_ERR_PROTO:   return "protocol error";
    case NOWDB_ERR_EOF:     return "end of data";
    default:                return "unknown error";
  }
}

char nowdb_client_init(void)  { return 1; }
char nowdb_client_close(void) { return 1; }

/* ── line i/o ───────────────────────────────────────────────────── */

/* allow_trunc: the stream is consumed to the newline either way, so
 * truncation never desyncs — but a truncated "#a\tb" BATCH HEADER
 * would be parsed into an undercounted column list and desync every
 * following binary row, so the batch path passes 0 (fail the frame);
 * status/greeting lines pass 1 (a long "-err ..." detail is merely
 * truncated, not mis-parsed). */
static int nowc_readline_ex(nowdb_con_t con, char *buf, size_t max,
                            int allow_trunc) {
  size_t n = 0;
  int c, truncated = 0;
  while ((c = fgetc(con->in)) != EOF && c != '\n') {
    if (n + 1 < max) buf[n++] = (char) c;
    else truncated = 1; /* rest of the line is consumed, not stored */
  }
  buf[n] = 0;
  if (c == EOF && n == 0) return NOWDB_ERR_NOREAD;
  if (truncated && !allow_trunc) return NOWDB_ERR_PROTO;
  return NOWDB_OK;
}

static int nowc_readline(nowdb_con_t con, char *buf, size_t max) {
  return nowc_readline_ex(con, buf, max, 1);
}

static int nowc_writeline(nowdb_con_t con, const char *s) {
  size_t l = strlen(s);
  char nl = '\n';
  const char *p = s;
  while (l > 0) {
    ssize_t w = write(con->sock, p, l);
    if (w <= 0) return NOWDB_ERR_NOWRITE;
    p += w; l -= (size_t) w;
  }
  return write(con->sock, &nl, 1) == 1 ? NOWDB_OK : NOWDB_ERR_NOWRITE;
}

/* ── connection ─────────────────────────────────────────────────── */

int nowdb_connect(nowdb_con_t *con, char *node, char *service,
                  char *user, char *pw, int flags) {
  (void) user; (void) pw; /* API parity; this server has no auth */
  struct addrinfo hints, *res = NULL;
  memset(&hints, 0, sizeof hints);
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(node, service, &hints, &res) != 0 || res == NULL)
    return NOWDB_ERR_ADDR;
  int sock = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (sock < 0) { freeaddrinfo(res); return NOWDB_ERR_NOSOCK; }
  if (connect(sock, res->ai_addr, res->ai_addrlen) != 0) {
    freeaddrinfo(res); close(sock); return NOWDB_ERR_NOCON;
  }
  freeaddrinfo(res);
  nowdb_con_t c = calloc(1, sizeof(struct nowdb_con_t));
  if (c == NULL) { close(sock); return NOWDB_ERR_NOMEM; }
  c->sock = sock;
  c->in = fdopen(sock, "r");
  if (c->in == NULL) { close(sock); free(c); return NOWDB_ERR_NOSOCK; }
  char line[512];
  if (nowc_readline(c, line, sizeof line) != NOWDB_OK ||
      strncmp(line, "+ok", 3) != 0) {
    nowdb_connection_close(c); return NOWDB_ERR_PROTO;
  }
  if (!(flags & NOWDB_FLAGS_TEXT)) { /* typed rows need binary mode */
    if (nowc_writeline(c, "mode binary") != NOWDB_OK ||
        nowc_readline(c, line, sizeof line) != NOWDB_OK ||
        strncmp(line, "+ok", 3) != 0) {
      nowdb_connection_close(c); return NOWDB_ERR_PROTO;
    }
    c->binary = 1;
  }
  *con = c;
  return NOWDB_OK;
}

int nowdb_connection_close(nowdb_con_t con) {
  if (con == NULL) return NOWDB_ERR_INVALID;
  nowc_writeline(con, "quit"); /* best effort */
  fclose(con->in);             /* closes the underlying socket too */
  free(con);
  return NOWDB_OK;
}

void nowdb_connection_destroy(nowdb_con_t con) {
  if (con == NULL) return;
  fclose(con->in);
  free(con);
}

/* ── results ────────────────────────────────────────────────────── */

static nowdb_result_t nowc_mkres(nowdb_con_t con) {
  nowdb_result_t r = calloc(1, sizeof(struct nowdb_result_t));
  if (r != NULL) r->con = con;
  return r;
}

int nowdb_exec_statement(nowdb_con_t con, char *statement,
                         nowdb_result_t *res) {
  if (con == NULL || con->broken) return NOWDB_ERR_NOCON;
  int rc = nowc_writeline(con, statement);
  if (rc != NOWDB_OK) return rc;
  char line[4096];
  rc = nowc_readline(con, line, sizeof line);
  if (rc != NOWDB_OK) return rc;
  nowdb_result_t r = nowc_mkres(con);
  if (r == NULL) return NOWDB_ERR_NOMEM;
  if (strncmp(line, "+ok", 3) == 0) {
    r->rtype = NOWDB_RESULT_STATUS; r->status = NOWDB_OK;
    r->details = strdup(line[3] == ' ' ? line + 4 : "");
  } else if (strncmp(line, "-err", 4) == 0) {
    r->rtype = NOWDB_RESULT_STATUS; r->status = -1; r->errcode = -1;
    r->details = strdup(line[4] == ' ' ? line + 5 : "");
  } else if (strncmp(line, "+report", 7) == 0) {
    r->rtype = NOWDB_RESULT_REPORT;
    sscanf(line + 7, "%lu %lu",
           (unsigned long *) &r->affected, (unsigned long *) &r->errors);
  } else if (strncmp(line, "+cursor", 7) == 0) {
    r->rtype = NOWDB_RESULT_CURSOR;
    r->curid = strtoull(line + 8, NULL, 10);
  } else {
    free(r); return NOWDB_ERR_PROTO;
  }
  *res = r;
  return NOWDB_OK;
}

int nowdb_result_type(nowdb_result_t res) {
  return res == NULL ? NOWDB_RESULT_NOTHING : res->rtype;
}
int nowdb_result_status(nowdb_result_t res) {
  return res == NULL ? -1 : res->status;
}
int nowdb_result_errcode(nowdb_result_t res) {
  return res == NULL ? NOWDB_ERR_NORES : res->errcode;
}
const char *nowdb_result_details(nowdb_result_t res) {
  return res == NULL || res->details == NULL ? "" : res->details;
}
void nowdb_result_report(nowdb_result_t res, uint64_t *affected,
                         uint64_t *errors, uint64_t *runtime) {
  if (res == NULL) return;
  if (affected != NULL) *affected = res->affected;
  if (errors != NULL)   *errors = res->errors;
  if (runtime != NULL)  *runtime = 0; /* not reported on this wire */
}
int nowdb_result_eof(nowdb_result_t res) {
  return res != NULL && res->errcode == NOWDB_ERR_EOF;
}
void nowdb_result_destroy(nowdb_result_t res) {
  if (res == NULL) return;
  free(res->details);
  free(res);
}

/* ── binary row frames ──────────────────────────────────────────── */

static int nowc_le64(nowdb_con_t con, int64_t *out) {
  unsigned char b[8];
  if (fread(b, 1, 8, con->in) != 8) return NOWDB_ERR_NOREAD;
  uint64_t v = 0;
  for (int i = 7; i >= 0; i--) v = (v << 8) | b[i];
  *out = (int64_t) v;
  return NOWDB_OK;
}

static void nowc_batch_free(struct nowdb_row_t *b) {
  if (b->cells != NULL) {
    for (int i = 0; i < b->nrows * b->ncols; i++)
      if (b->cells[i].typ == NOWDB_TYP_TEXT) free(b->cells[i].v.s);
    free(b->cells);
  }
  b->cells = NULL; b->nrows = 0; b->ncols = 0; b->cur = -1;
}

/* parse "+batch <n> <more>", the text header line, then n binary
 * rows into cur->batch */
static int nowc_read_batch(nowdb_cursor_t cur) {
  nowdb_con_t con = cur->con;
  char line[4096];
  char cmd[64];
  snprintf(cmd, sizeof cmd, "fetch %lu", (unsigned long) cur->id);
  int rc = nowc_writeline(con, cmd);
  if (rc != NOWDB_OK) return rc;
  rc = nowc_readline(con, line, sizeof line);
  if (rc != NOWDB_OK) return rc;
  if (strncmp(line, "-err", 4) == 0) {
    cur->err = -1;
    snprintf(cur->details, sizeof cur->details, "%.200s",
             line[4] == ' ' ? line + 5 : "");
    return NOWDB_ERR_PROTO;
  }
  int n = 0, more = 0;
  if (sscanf(line, "+batch %d %d", &n, &more) != 2)
    return NOWDB_ERR_PROTO;
  if (n < 0 || more < 0) return NOWDB_ERR_PROTO;
  /* from here on a failure leaves unread row bytes on the wire: the
   * stream position is unknowable, so mark the connection broken
   * (fail fast; no recovery round-trips) — pynow.py's contract */
  rc = nowc_readline_ex(con, line, sizeof line, 0); /* "#a\tb" header */
  if (rc != NOWDB_OK || line[0] != '#') {
    con->broken = 1;
    return NOWDB_ERR_PROTO;
  }
  int ncols = 1;
  for (const char *p = line; *p != 0; p++) if (*p == '\t') ncols++;
  /* n and ncols are server-controlled: bound the product in wide
   * arithmetic (an int overflow here would under-allocate and the
   * row loop would write past the buffer) */
  if ((long long) n * ncols > 50000000LL) {
    con->broken = 1; /* rows are unread either way */
    return NOWDB_ERR_PROTO;
  }
  nowc_batch_free(&cur->batch);
  cur->batch.ncols = ncols;
  cur->batch.nrows = n;
  cur->batch.cur = -1;
  cur->batch.cells = calloc((size_t) n * (size_t) ncols,
                            sizeof(nowc_field_t));
  if (n > 0 && cur->batch.cells == NULL) {
    con->broken = 1; /* header consumed, n rows unread */
    return NOWDB_ERR_NOMEM;
  }
  for (int r = 0; r < n; r++) {
    for (int cix = 0; cix < ncols; cix++) {
      nowc_field_t *f = &cur->batch.cells[r * ncols + cix];
      int tag = fgetc(con->in);
      if (tag == EOF) { con->broken = 1; return NOWDB_ERR_NOREAD; }
      f->typ = tag;
      switch (tag) {
        case NOWDB_TYP_NOTHING:
          if (fgetc(con->in) == EOF) { con->broken = 1; return NOWDB_ERR_NOREAD; }
          break;
        case NOWDB_TYP_TEXT: {
          size_t cap = 64, len = 0;
          char *s = malloc(cap);
          if (s == NULL) { con->broken = 1; return NOWDB_ERR_NOMEM; }
          int ch;
          while ((ch = fgetc(con->in)) != 0) {
            if (ch == EOF) { free(s); con->broken = 1; return NOWDB_ERR_NOREAD; }
            if (len + 1 >= cap) {
              cap *= 2;
              char *t = realloc(s, cap);
              if (t == NULL) { free(s); con->broken = 1; return NOWDB_ERR_NOMEM; }
              s = t;
            }
            s[len++] = (char) ch;
          }
          s[len] = 0;
          f->v.s = s;
          break;
        }
        case NOWDB_TYP_BOOL: {
          int ch = fgetc(con->in);
          if (ch == EOF) { con->broken = 1; return NOWDB_ERR_NOREAD; }
          f->v.b = (char)(ch != 0);
          break;
        }
        case NOWDB_TYP_DATE:
        case NOWDB_TYP_TIME:
        case NOWDB_TYP_INT:
        case NOWDB_TYP_UINT: {
          int64_t v;
          if (nowc_le64(con, &v) != NOWDB_OK) { con->broken = 1; return NOWDB_ERR_NOREAD; }
          f->v.l = v;
          break;
        }
        case NOWDB_TYP_FLOAT: {
          int64_t v;
          if (nowc_le64(con, &v) != NOWDB_OK) { con->broken = 1; return NOWDB_ERR_NOREAD; }
          memcpy(&f->v.d, &v, 8);
          break;
        }
        default:
          con->broken = 1;
          return NOWDB_ERR_PROTO;
      }
    }
    if (fgetc(con->in) != '\n') { con->broken = 1; return NOWDB_ERR_PROTO; }
  }
  cur->more = more;
  if (more == 0) cur->eof = 1; /* server auto-closed at last batch */
  return NOWDB_OK;
}

/* ── cursor api ─────────────────────────────────────────────────── */

int nowdb_cursor_open(nowdb_result_t res, nowdb_cursor_t *cur) {
  if (res == NULL || res->rtype != NOWDB_RESULT_CURSOR)
    return NOWDB_ERR_INVALID;
  if (res->con == NULL || !res->con->binary) return NOWDB_ERR_INVALID;
  nowdb_cursor_t c = calloc(1, sizeof(struct nowdb_cursor_t));
  if (c == NULL) return NOWDB_ERR_NOMEM;
  c->con = res->con;
  c->id = res->curid;
  c->batch.cur = -1;
  int rc = nowc_read_batch(c); /* cursor opens onto its first batch */
  if (rc != NOWDB_OK) { nowdb_cursor_close(c); return rc; }
  *cur = c;
  return NOWDB_OK;
}

int nowdb_cursor_fetch(nowdb_cursor_t cur) {
  if (cur == NULL) return NOWDB_ERR_INVALID;
  if (cur->con->broken) return NOWDB_ERR_NOCON;
  if (cur->eof && cur->more == 0) return NOWDB_ERR_EOF;
  return nowc_read_batch(cur);
}

nowdb_row_t nowdb_cursor_row(nowdb_cursor_t cur) {
  return cur == NULL ? NULL : &cur->batch;
}

int nowdb_cursor_errcode(nowdb_cursor_t cur) {
  return cur == NULL ? NOWDB_ERR_INVALID : cur->err;
}
const char *nowdb_cursor_details(nowdb_cursor_t cur) {
  return cur == NULL ? "" : cur->details;
}
int nowdb_cursor_eof(nowdb_cursor_t cur) {
  return cur != NULL && cur->eof &&
         cur->batch.cur >= cur->batch.nrows - 1;
}
int nowdb_cursor_ok(nowdb_cursor_t cur) {
  return cur != NULL && cur->err == 0;
}
uint64_t nowdb_cursor_id(nowdb_cursor_t cur) {
  return cur == NULL ? 0 : cur->id;
}

int nowdb_cursor_close(nowdb_cursor_t cur) {
  if (cur == NULL) return NOWDB_ERR_INVALID;
  if (!cur->eof && !cur->con->broken) {
    /* abandoned mid-stream: release server side (skipped on a
     * desynced connection — no recovery round-trips) */
    char cmd[64];
    snprintf(cmd, sizeof cmd, "close %lu", (unsigned long) cur->id);
    if (nowc_writeline(cur->con, cmd) == NOWDB_OK) {
      char line[512];
      nowc_readline(cur->con, line, sizeof line); /* +ok / -err */
    }
  }
  nowc_batch_free(&cur->batch);
  free(cur);
  return NOWDB_OK;
}

/* ── row api ────────────────────────────────────────────────────── */

int nowdb_row_next(nowdb_row_t row) {
  if (row == NULL) return NOWDB_ERR_INVALID;
  if (row->cur + 1 >= row->nrows) return NOWDB_ERR_EOF;
  row->cur++;
  return NOWDB_OK;
}

void nowdb_row_rewind(nowdb_row_t row) {
  if (row != NULL) row->cur = -1;
}

void *nowdb_row_field(nowdb_row_t row, int field, int *type) {
  if (row == NULL || row->cur < 0 || row->cur >= row->nrows ||
      field < 0 || field >= row->ncols) {
    if (type != NULL) *type = NOWDB_TYP_NOTHING;
    return NULL;
  }
  nowc_field_t *f = &row->cells[row->cur * row->ncols + field];
  if (type != NULL) *type = f->typ;
  switch (f->typ) {
    case NOWDB_TYP_TEXT:  return f->v.s;
    case NOWDB_TYP_BOOL:  return &f->v.b;
    case NOWDB_TYP_FLOAT: return &f->v.d;
    case NOWDB_TYP_DATE:
    case NOWDB_TYP_TIME:
    case NOWDB_TYP_INT:
    case NOWDB_TYP_UINT:  return &f->v.l;
    default:              return NULL;
  }
}

int nowdb_row_count(nowdb_row_t row) {
  return row == NULL ? 0 : row->nrows;
}

/* ── time helpers ───────────────────────────────────────────────── */

int nowdb_time_parse(const char *buf, const char *frm, nowdb_time_t *t) {
  (void) frm; /* both standard formats are recognized by shape */
  struct tm tm;
  memset(&tm, 0, sizeof tm);
  int y, mo, d, h = 0, mi = 0, s = 0, used = -1;
  /* %n + full-length check: a near-miss like "…T10:30" or a space
   * separator must ERROR, not silently parse as midnight of the
   * leading date (the date-only fallback would otherwise accept any
   * string with a date prefix and drop the time of day) */
  int64_t frac = 0;
  int n = sscanf(buf, "%d-%d-%dT%d:%d:%d%n", &y, &mo, &d, &h, &mi, &s,
                 &used);
  if (n == 6 && used > 0 && buf[used] == '.') {
    /* optional fractional seconds, 1..9 digits, ns resolution */
    int i = used + 1, digits = 0;
    while (digits < 9 && buf[i] >= '0' && buf[i] <= '9') {
      frac = frac * 10 + (buf[i] - '0'); i++; digits++;
    }
    if (digits == 0) return NOWDB_ERR_INVALID;
    while (digits < 9) { frac *= 10; digits++; }
    used = i;
  }
  if (n != 6 || used < 0 || buf[used] != 0) {
    used = -1; frac = 0;
    n = sscanf(buf, "%d-%d-%d%n", &y, &mo, &d, &used);
    if (n != 3 || used < 0 || buf[used] != 0) return NOWDB_ERR_INVALID;
    h = mi = s = 0;
  }
  tm.tm_year = y - 1900; tm.tm_mon = mo - 1; tm.tm_mday = d;
  tm.tm_hour = h; tm.tm_min = mi; tm.tm_sec = s;
  time_t es = timegm(&tm);
  if (es == (time_t) -1) return NOWDB_ERR_INVALID;
  *t = (nowdb_time_t) es * 1000000000LL + frac;
  return NOWDB_OK;
}

int nowdb_time_show(nowdb_time_t t, const char *frm, char *buf,
                    size_t max) {
  time_t es = (time_t)(t / 1000000000LL);
  struct tm tm;
  if (gmtime_r(&es, &tm) == NULL) return NOWDB_ERR_INVALID;
  return strftime(buf, max, frm, &tm) > 0 ? NOWDB_OK
                                          : NOWDB_ERR_INVALID;
}
