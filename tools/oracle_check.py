#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the fixture parquet tables, load the Spark result parquet,
sort columns by name, sort rows, and hash-compare values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, os, sys, glob
import duckdb
import pandas as pd
from pandas.util import hash_pandas_object

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def table_glob(sf_dir: str, t: str) -> str:
    """Driver fixtures are single files; Spark-written scale corpora
    (graft.ScaleUp) are directories of part files."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: ints to int64, floats to float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
            sdf = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            odf = canon(con.execute(oracles[name]).df())
            rows = len(sdf) == len(odf)
            schema = list(sdf.columns) == list(odf.columns)
            h = False
            if rows and schema:
                h = hash_pandas_object(sdf.astype(str), index=False).tolist() == \
                    hash_pandas_object(odf.astype(str), index=False).tolist()
            ok = rows and schema and h
            if ok:
                n_pass += 1
                print(f"PASS {name} ({len(sdf)} rows)")
            else:
                n_fail += 1
                print(f"FAIL {name}: rows={rows} ({len(sdf)} vs {len(odf)}) "
                      f"schema={schema} ({list(sdf.columns)} vs {list(odf.columns)}) hash={h}")
                if rows and schema and not h:
                    neq = sdf.astype(str).ne(odf.astype(str)).any(axis=1)
                    print(sdf[neq].head(3))
                    print(odf[neq].head(3))
        except Exception as e:
            n_fail += 1
            print(f"ERR  {name}: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
