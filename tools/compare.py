#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir, sort columns by
name / rows by values, and hash-compare. Usage:

    python3 tools/compare.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def frame_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for col in df.columns:
        s = df[col]
        if s.dtype == "float64":
            s = s.map(lambda v: "%.9g" % v if pd.notna(v) else "NaN")
        h.update(s.astype(str).str.cat(sep="\x01").encode())
    return h.hexdigest()


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = glob.glob(f"{outdir}/{name}/*.parquet")
        if not pq:
            print(f"{name}: NO SPARK OUTPUT")
            bad += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(pq[0]))
            ora_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"{name}: COMPARE ERROR {e}")
            bad += 1
            continue
        rows = len(spark_df) == len(ora_df)
        schema = list(spark_df.columns) == list(ora_df.columns)
        hmatch = rows and schema and frame_hash(spark_df) == frame_hash(ora_df)
        status = "OK" if (rows and schema and hmatch) else \
            f"rows={rows}({len(spark_df)}/{len(ora_df)}) schema={schema} hash={hmatch}"
        if status != "OK":
            bad += 1
            print(f"{name}: {status}")
            if rows and schema and not hmatch:
                merged = spark_df.compare(ora_df) if spark_df.shape == ora_df.shape else None
                if merged is not None and not merged.empty:
                    print(merged.head(10))
        else:
            print(f"{name}: OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
