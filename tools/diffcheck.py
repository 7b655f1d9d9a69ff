#!/usr/bin/env python3
"""Local differential checker mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>, runs the matching
oracle SQL (from oracle_sql.json) in DuckDB over the sfDir tables,
sorts columns by name and rows by value, and compares cell-by-cell.
Dev tool only — the engine itself is pure Scala/Spark.
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b or str(a) == str(b)


def type_class(t):
    """Collapse a DuckDB type name to the numeric class the driver's
    type-sensitive hash distinguishes. HUGEINT gets its own class so a
    sum(BIGINT) oracle (int128) never silently matches Spark's int64."""
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if "HUGEINT" in s:
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    return s


def type_mismatch(got_rel_types, got_cols, exp_rel_types, exp_cols):
    """Column-name-aligned type-class compare; returns first mismatch."""
    gm = {c: type_class(t) for c, t in zip(got_cols, got_rel_types)}
    em = {c: type_class(t) for c, t in zip(exp_cols, exp_rel_types)}
    for c in sorted(set(gm) & set(em)):
        if em[c] == "hugeint":
            return (c, gm[c], em[c], "oracle returns HUGEINT — "
                    "CAST(... AS BIGINT) the sum")
        if gm[c] != em[c]:
            return (c, gm[c], em[c], "numeric class differs")
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no output parquet")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = list(got_rel.columns)
        got_types = [str(t) for t in got_rel.types]
        got = got_rel.fetchall()
        if name not in oracles:
            print(f"-     {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            exp_sql_rel = con.sql(oracles[name])
            exp_cols = list(exp_sql_rel.columns)
            exp_types = [str(t) for t in exp_sql_rel.types]
            exp = exp_sql_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        tm = type_mismatch(got_types, got_cols, exp_types, exp_cols)
        if tm:
            print(f"FAIL  {name}: col {tm[0]} type class "
                  f"spark={tm[1]} oracle={tm[2]} ({tm[3]})")
            n_fail += 1
            continue
        gc, g = canon(got, got_cols)
        ec, e = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for i, (gr, er) in enumerate(zip(g, e)):
            for j, (gv, ev) in enumerate(zip(gr, er)):
                if gv != ev and str(gv) != str(ev):
                    exact = False
                    if not eq(gv, ev):
                        bad = (i, gc[j], gv, ev)
                        break
            if bad:
                break
        if bad:
            print(f"FAIL  {name}: row {bad[0]} col {bad[1]}: "
                  f"got={bad[2]!r} exp={bad[3]!r}")
            n_fail += 1
        elif not exact:
            print(f"WARN  {name}: only tolerance-equal ({len(g)} rows) "
                  f"— driver hash compare may fail")
            n_pass += 1
        else:
            print(f"ok    {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_noracle} without oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
