#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB over the
parquet tables in sfDir, sort columns by name, sort rows, and compare
row counts + a value hash (floats rounded to 6 significant decimals).
"""
import sys, os, json, math, hashlib
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(con, sql_from):
    # columns sorted by name, rows sorted by all columns
    cols = [d[0] for d in con.execute(f"SELECT * FROM {sql_from} LIMIT 0").description]
    colsq = ", ".join(f'"{c}"' for c in sorted(cols))
    rows = con.execute(f'SELECT {colsq} FROM {sql_from} ORDER BY ALL').fetchall()
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join(canon(v) for v in r) + "\n").encode())
    return len(rows), sorted(cols), h.hexdigest()

def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sn, sc, sh = table_hash(con, f"read_parquet('{spark_glob}')")
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS>0" if sn > 0 else "EMPTY!"
            print(f"{status} {name}: rows={sn} (no oracle)")
            n_noracle += 1
            continue
        try:
            on_, oc, oh = table_hash(con, f"({oracle[name]})")
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sc != oc:
            print(f"FAIL  {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1
        elif sn != on_ or sh != oh:
            print(f"FAIL  {name}: rows {sn} vs {on_}, hash {'ok' if sh==oh else 'MISMATCH'}")
            n_fail += 1
        else:
            print(f"pass  {name}: rows={sn}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
