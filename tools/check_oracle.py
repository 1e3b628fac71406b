"""Driver-mimic correctness checker: runs each __spark_entry__ query on
Spark AND its DuckDB oracle over the same sf dir, canonicalizes (columns
sorted by name, rows sorted), and compares row counts / schemas / values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: tuple(x) if isinstance(x, (list, tuple)) else x)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from debezium_connector_cockroachdb_spark.session import build_session

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[2:] or list(qs)

    spark = build_session(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: no_oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {type(e).__name__}: {e}")
            failures += 1
            continue
        s, o = canon(sdf), canon(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        values = rows and schema and s.astype(str).equals(o.astype(str))
        status = "OK" if (rows and schema and values) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"{name}: {status} rows={len(s)}/{len(o)} schema={schema} values={values}")
            if schema and rows:
                diff = (s.astype(str) != o.astype(str)).any(axis=1)
                print("  spark:\n", s[diff].head(5))
                print("  oracle:\n", o[diff].head(5))
            else:
                print("  spark cols:", list(s.columns), "oracle cols:", list(o.columns))
        else:
            print(f"{name}: OK rows={len(s)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
