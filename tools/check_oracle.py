"""Side-by-side oracle gate: run each __spark_entry__ query on Spark AND
its DuckDB oracle SQL, compare sorted-column value sets — the same
check the grading driver performs (CORRECTNESS_r{N}.json).

Usage: python tools/check_oracle.py [query ...]   # default: all
       SF_DIR=/root/testdata/sf0.1 python tools/check_oracle.py
"""
import sys, os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
import duckdb, pandas as pd, numpy as np
import __spark_entry__ as e
from pyspark.sql import SparkSession

names = sys.argv[1:] or sorted(__import__("__spark_entry__").oracle_sql().keys())
sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
# BARE session, like the grading driver: no ship_package, so queries
# that need the package on executors must ship it themselves
spark = (SparkSession.builder.master("local[32]").appName("oracle-gate")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
con = duckdb.connect()
for t in ("region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"):
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from '{p}'")
qs, os_ = e.queries(), e.oracle_sql()
def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)
fails = 0
for name in names:
    try:
        got = norm(qs[name](spark, sf_dir).toPandas())
        exp = norm(con.execute(os_[name]).df())
        ok = got.shape == exp.shape and list(got.columns) == list(exp.columns)
        if ok:
            for c in got.columns:
                g, x = got[c], exp[c]
                if np.issubdtype(g.dtype, np.number):
                    ok = ok and bool(np.allclose(g.astype(float), x.astype(float), rtol=0, atol=0, equal_nan=True))
                else:
                    ok = ok and bool((g.values == x.values).all())
        print(name, "OK" if ok else
              f"MISMATCH shapes {got.shape}{list(got.columns)} vs "
              f"{exp.shape}{list(exp.columns)}", flush=True)
        if not ok:
            fails += 1
            print(got.head(), "\n", exp.head())
    except Exception as exc:  # a gate must report and continue
        fails += 1
        print(name, f"MISMATCH error: {exc}", flush=True)
sys.exit(1 if fails else 0)
