import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Pre-validate the driver's CORRECTNESS compare: every queries() entry vs
its oracle_sql() at $SPARK_GRAFT_SF_DIR (default sf0.01) — rows, schema
(sorted col names), value hash
(rows sorted)."""
import hashlib
import time

import duckdb
import pandas as pd

import __spark_entry__ as e
from webcrawl_spark.session import get_spark

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark("correctness-sweep", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == object:
            d[c] = d[c].astype(str)
        elif str(d[c].dtype).startswith("float"):
            d[c] = d[c].round(6)
    d = d.sort_values(cols).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()

oracles = e.oracle_sql()
fails = []
for name, fn in e.queries().items():
    t0 = time.time()
    try:
        sdf = fn(spark, sf).toPandas()
    except Exception as ex:
        fails.append((name, f"spark error: {ex}"))
        print(f"{name}: SPARK ERROR {ex}")
        continue
    if name not in oracles:
        print(f"{name}: rows-only ({len(sdf)} rows) {time.time()-t0:.1f}s")
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as ex:
        fails.append((name, f"oracle error: {ex}"))
        print(f"{name}: ORACLE ERROR {ex}")
        continue
    rows = len(sdf) == len(odf)
    schema = sorted(sdf.columns) == sorted(odf.columns)
    h = canon_hash(sdf) == canon_hash(odf)
    status = "OK" if (rows and schema and h) else "MISMATCH"
    if status != "OK":
        fails.append((name, f"rows={rows} schema={schema} hash={h}"))
    print(f"{name}: {status} rows={len(sdf)} {time.time()-t0:.1f}s")
print("FAILURES:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
