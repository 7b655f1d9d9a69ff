/* End-to-end exercise of the C client (nowc.c) against a live server:
 * DDL, inserts (incl. nulls), a paged typed-row cursor, computed TIME
 * tagging, error handling, and the time helpers. Driven by
 * ServerSpec; prints "NOWC DEMO OK" and exits 0 on success. */
#include "nowc.h"

#include <stdio.h>
#include <string.h>
#include <math.h>

static int fail(const char *what) {
  fprintf(stderr, "FAIL: %s\n", what);
  return 1;
}

static int exec_ok(nowdb_con_t con, char *stmt) {
  nowdb_result_t r = NULL;
  if (nowdb_exec_statement(con, stmt, &r) != NOWDB_OK) return 0;
  int ok = nowdb_result_type(r) != NOWDB_RESULT_STATUS ||
           nowdb_result_status(r) == NOWDB_OK;
  if (!ok) fprintf(stderr, "stmt failed: %s -> %s\n", stmt,
                   nowdb_result_details(r));
  nowdb_result_destroy(r);
  return ok;
}

int main(int argc, char **argv) {
  if (argc < 2) return fail("usage: nowc_demo <port>");
  if (!nowdb_client_init()) return fail("init");
  nowdb_con_t con = NULL;
  if (nowdb_connect(&con, "127.0.0.1", argv[1], NULL, NULL,
                    NOWDB_FLAGS_NOTHING) != NOWDB_OK)
    return fail("connect");

  if (!exec_ok(con, "create scope cdemo") ||
      !exec_ok(con, "use cdemo") ||
      !exec_ok(con, "create type item (id uint pk, name text, "
                    "score float, flag bool, at time)"))
    return fail("ddl");
  char stmt[256];
  for (int i = 1; i <= 7; i++) {
    snprintf(stmt, sizeof stmt,
             "insert into item (id, name, score, flag, at) "
             "(%d, 'n%d', %d.5, %s, '2024-03-0%dT10:00:00')",
             i, i, i, i % 2 == 0 ? "true" : "false", (i % 7) + 1);
    if (!exec_ok(con, stmt)) return fail("insert");
  }
  if (!exec_ok(con, "insert into item (id, score) (8, 9.25)"))
    return fail("insert nulls");

  /* failing statement surfaces as a NOK status with details */
  nowdb_result_t bad = NULL;
  if (nowdb_exec_statement(con, "select nope from nowhere", &bad)
        != NOWDB_OK) return fail("exec bad");
  if (nowdb_result_type(bad) != NOWDB_RESULT_STATUS ||
      nowdb_result_status(bad) == NOWDB_OK ||
      strlen(nowdb_result_details(bad)) == 0)
    return fail("bad statement not rejected with details");
  nowdb_result_destroy(bad);

  /* paged typed cursor: 8 rows at server page size 3 → 3 batches */
  nowdb_result_t res = NULL;
  if (nowdb_exec_statement(con,
        "select id, name, score, flag, at from item", &res) != NOWDB_OK)
    return fail("exec select");
  if (nowdb_result_type(res) != NOWDB_RESULT_CURSOR)
    return fail("expected cursor");
  nowdb_cursor_t cur = NULL;
  if (nowdb_cursor_open(res, &cur) != NOWDB_OK) return fail("open");
  nowdb_result_destroy(res);
  long idsum = 0;
  double scoresum = 0;
  int nrows = 0, ntime = 0, nnull = 0, batches = 0;
  for (;;) {
    nowdb_row_t row = nowdb_cursor_row(cur);
    batches++;
    while (nowdb_row_next(row) == NOWDB_OK) {
      int t;
      void *v = nowdb_row_field(row, 0, &t);
      if (t != NOWDB_TYP_INT && t != NOWDB_TYP_UINT)
        return fail("id type");
      idsum += (long) *(int64_t *) v;
      v = nowdb_row_field(row, 2, &t);
      if (t != NOWDB_TYP_FLOAT) return fail("score type");
      scoresum += *(double *) v;
      v = nowdb_row_field(row, 4, &t);
      if (t == NOWDB_TYP_TIME) ntime++;
      else if (t == NOWDB_TYP_NOTHING && v == NULL) nnull++;
      else return fail("at neither TIME nor null");
      nrows++;
    }
    if (nowdb_cursor_eof(cur)) break;
    if (nowdb_cursor_fetch(cur) != NOWDB_OK) return fail("fetch");
  }
  if (nowdb_cursor_close(cur) != NOWDB_OK) return fail("close");
  if (nrows != 8 || idsum != 36 || ntime != 7 || nnull != 1)
    return fail("row totals");
  if (fabs(scoresum - (1.5 + 2.5 + 3.5 + 4.5 + 5.5 + 6.5 + 7.5 + 9.25))
        > 1e-9) return fail("score sum");
  if (batches < 3) return fail("paging did not split batches");

  /* computed TIME keeps its tag (max over a time column) */
  if (nowdb_exec_statement(con, "select max(at) as mx from item", &res)
        != NOWDB_OK) return fail("exec max(at)");
  if (nowdb_cursor_open(res, &cur) != NOWDB_OK) return fail("open2");
  nowdb_result_destroy(res);
  nowdb_row_t row = nowdb_cursor_row(cur);
  if (nowdb_row_next(row) != NOWDB_OK) return fail("max(at) row");
  int t;
  void *v = nowdb_row_field(row, 0, &t);
  if (t != NOWDB_TYP_TIME) return fail("max(at) not TIME-tagged");
  nowdb_time_t expect;
  if (nowdb_time_parse("2024-03-07T10:00:00", NULL, &expect) != NOWDB_OK)
    return fail("time parse");
  if (*(int64_t *) v != expect) return fail("max(at) value");
  char shown[64];
  if (nowdb_time_show(expect, "%Y-%m-%dT%H:%M:%S", shown,
                      sizeof shown) != NOWDB_OK ||
      strcmp(shown, "2024-03-07T10:00:00") != 0)
    return fail("time show");
  nowdb_cursor_close(cur);

  /* abandon a cursor mid-stream: close must release it server-side */
  if (nowdb_exec_statement(con, "select id from item", &res) != NOWDB_OK)
    return fail("exec abandon");
  if (nowdb_cursor_open(res, &cur) != NOWDB_OK) return fail("open3");
  nowdb_result_destroy(res);
  if (nowdb_cursor_close(cur) != NOWDB_OK) return fail("abandon close");
  /* connection still usable afterwards */
  if (!exec_ok(con, "drop scope cdemo")) return fail("drop scope");

  if (nowdb_connection_close(con) != NOWDB_OK) return fail("conn close");
  nowdb_client_close();
  printf("NOWC DEMO OK\n");
  return 0;
}
