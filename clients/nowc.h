/* C client for the graft wire protocol.
 *
 * Mirrors the reference client library's API SURFACE
 * (reference include/nowdb/nowclient.h:254-291: connect/exec/result/
 * cursor/row accessors and the type tags of query/row.c) so a caller
 * of the reference client can port by re-linking — but it speaks this
 * engine's text+binary line protocol (see engine/Server.scala) and
 * shares no code with the reference implementation.
 *
 * Protocol: statements are LF-terminated lines; responses are one
 * head line ("+ok [msg]" | "-err msg" | "+report n m" | "+cursor id"
 * | "+batch n more"). After "mode binary", the rows following a
 * "+batch" head (and its text "#col\tcol" header line) are framed
 * [1-byte type tag][value] per field, '\n' per row: TEXT(1) is
 * NUL-terminated, BOOL(9) one byte, NOTHING(0) one zero byte, and
 * TIME(3)/FLOAT(4)/INT(5)/UINT(6) are 8 little-endian bytes.
 */
#ifndef NOWC_CLIENT_DECL
#define NOWC_CLIENT_DECL

#include <stdint.h>
#include <stdlib.h>

#define NOWDB_OK 0
#define NOWDB_ERR_NOMEM   -1
#define NOWDB_ERR_NOCON   -2
#define NOWDB_ERR_NOSOCK  -3
#define NOWDB_ERR_ADDR    -4
#define NOWDB_ERR_NORES   -5
#define NOWDB_ERR_INVALID -6
#define NOWDB_ERR_NOREAD  -101
#define NOWDB_ERR_NOWRITE -102
#define NOWDB_ERR_PROTO   -106
#define NOWDB_ERR_EOF     -200

#define NOWDB_TYP_NOTHING 0
#define NOWDB_TYP_TEXT    1
#define NOWDB_TYP_DATE    2
#define NOWDB_TYP_TIME    3
#define NOWDB_TYP_FLOAT   4
#define NOWDB_TYP_INT     5
#define NOWDB_TYP_UINT    6
#define NOWDB_TYP_BOOL    9

#define NOWDB_RESULT_NOTHING 0
#define NOWDB_RESULT_STATUS  0x21
#define NOWDB_RESULT_REPORT  0x22
#define NOWDB_RESULT_ROW     0x23
#define NOWDB_RESULT_CURSOR  0x24

#define NOWDB_FLAGS_NOTHING 0
#define NOWDB_FLAGS_TEXT    1

typedef int64_t nowdb_time_t;

typedef struct nowdb_con_t    *nowdb_con_t;
typedef struct nowdb_result_t *nowdb_result_t;
typedef struct nowdb_cursor_t *nowdb_cursor_t;
typedef struct nowdb_row_t    *nowdb_row_t;

const char *nowdb_err_explain(int err);

char nowdb_client_init(void);
char nowdb_client_close(void);

/* node = host, service = decimal port; user/pw accepted for API
 * parity (this server has no auth). NOWDB_FLAGS_TEXT skips the
 * binary-mode switch (rows then unavailable; statements still run). */
int  nowdb_connect(nowdb_con_t *con, char *node, char *service,
                   char *user, char *pw, int flags);
int  nowdb_connection_close(nowdb_con_t con);
void nowdb_connection_destroy(nowdb_con_t con);

int nowdb_exec_statement(nowdb_con_t con, char *statement,
                         nowdb_result_t *res);

int         nowdb_result_type(nowdb_result_t res);
int         nowdb_result_status(nowdb_result_t res);
int         nowdb_result_errcode(nowdb_result_t res);
const char *nowdb_result_details(nowdb_result_t res);
void        nowdb_result_report(nowdb_result_t res, uint64_t *affected,
                                uint64_t *errors, uint64_t *runtime);
int         nowdb_result_eof(nowdb_result_t res);
void        nowdb_result_destroy(nowdb_result_t res);

int         nowdb_cursor_open(nowdb_result_t res, nowdb_cursor_t *cur);
int         nowdb_cursor_close(nowdb_cursor_t cur);
int         nowdb_cursor_fetch(nowdb_cursor_t cur);
nowdb_row_t nowdb_cursor_row(nowdb_cursor_t cur);
int         nowdb_cursor_errcode(nowdb_cursor_t cur);
const char *nowdb_cursor_details(nowdb_cursor_t cur);
int         nowdb_cursor_eof(nowdb_cursor_t cur);
int         nowdb_cursor_ok(nowdb_cursor_t cur);
uint64_t    nowdb_cursor_id(nowdb_cursor_t cur);

int   nowdb_row_next(nowdb_row_t row);
void  nowdb_row_rewind(nowdb_row_t row);
void *nowdb_row_field(nowdb_row_t row, int field, int *type);
int   nowdb_row_count(nowdb_row_t row);

/* ISO-8601 'YYYY-MM-DD[THH:MM:SS]' (UTC) <-> ns stamp */
int nowdb_time_parse(const char *buf, const char *frm, nowdb_time_t *t);
int nowdb_time_show(nowdb_time_t t, const char *frm, char *buf,
                    size_t max);

#endif
