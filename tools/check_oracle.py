#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate (dev tool only).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares it to
the Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted, values stringified (floats repr'd to 10 sig digits to absorb
binary noise the driver's hash would not absorb; so treat PASS here as
necessary, not sufficient — keep SURVEY §5.4 rounding discipline in queries).

Type-strict since r9: the driver's hash is TYPE-sensitive in exactly one
measured way — integer WIDTH drift (TINYINT/SMALLINT/INTEGER/BIGINT) passes
the driver gate (28 registered queries carry it and hash-match), but HUGEINT
does NOT (the r8 four: un-cast sum() typed HUGEINT, values identical, hash
split — int128 has no integral pandas/arrow representation downstream). So
alongside values we DESCRIBE both sides, collapse the int family, and fail
on any remaining column-type drift (HUGEINT vs int, int vs DOUBLE, ...).
Fix at the source: CAST(sum(..) AS BIGINT) on every oracle integer
reduction, windowed sums included.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}

def norm_type(t):
    # int widths collapse in the driver's canonicalization (measured r9:
    # INTEGER-vs-BIGINT drift hash-matches); HUGEINT intentionally does NOT
    return "INT" if t in INT_FAMILY else t

def col_types(con, sql):
    """name -> DuckDB column_type string, via DESCRIBE (exact, not DB-API)."""
    return {r[0]: norm_type(r[1])
            for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1; continue
        try:
            spark_sql = f"SELECT * FROM read_parquet({spark_glob!r})"
            sq = con.execute(spark_sql)
            scols = [d[0] for d in sq.description]; srows = sq.fetchall()
            stypes = col_types(con, spark_sql)
            oq = con.execute(oracle[name])
            ocols = [d[0] for d in oq.description]; orows = oq.fetchall()
            otypes = col_types(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        tdrift = [(c, stypes.get(c), otypes.get(c))
                  for c in sc if c in oc and stypes.get(c) != otypes.get(c)]
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
        elif tdrift:
            print(f"FAIL {name}: type drift (col, spark, oracle): {tdrift}")
            n_fail += 1
        elif sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            extra = f" first-diffs={diff}" if len(sr) == len(orr) else ""
            print(f"FAIL {name}: rows differ spark={len(sr)} oracle={len(orr)}{extra}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    # queries with no oracle: rows-only
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if os.path.isdir(full) and d not in oracle:
            n = len(glob.glob(os.path.join(full, "*.parquet")))
            print(f"INFO {d}: no oracle (rows-only check), files={n}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
