import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
import pandas as pd
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false")
         .config("spark.sql.session.timeZone","UTC").getOrCreate())
import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
qs, osql = e.queries(), e.oracle_sql()
ok = True
for name, fn in qs.items():
    s = canon(fn(spark, "/root/testdata/sf0.01").toPandas())
    if name not in osql:
        print(f"{name}: rows-only ({len(s)} rows)"); continue
    d = canon(con.execute(osql[name]).df())
    eq = s.equals(d)
    ok &= eq
    print(f"{name}: {len(s)} rows, equal={eq}")
    if not eq and len(s)==len(d): print(s.compare(d).head(3))
print("ALL EQUAL" if ok else "MISMATCH")
spark.stop()
