"""Simulate the driver: vanilla session, entry() smoke, queries vs oracle at sf0.01."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import __spark_entry__ as e

# vanilla session -- none of the engine's configs
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "schema:", df.schema.simpleString()[:120])

import duckdb
import pandas as pd

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
for name, fn in qs.items():
    spdf = fn(spark, sf).toPandas()
    if name not in os_:
        print(f"{name}: rows-only, {len(spdf)} rows")
        continue
    ddf = con.execute(os_[name]).fetchdf()
    s = spdf.reindex(sorted(spdf.columns), axis=1).sort_values(by=sorted(spdf.columns)).reset_index(drop=True)
    d = ddf.reindex(sorted(ddf.columns), axis=1).sort_values(by=sorted(ddf.columns)).reset_index(drop=True)
    match = s.shape == d.shape and all(
        (s[c].astype(str).values == d[c].astype(str).values).all() for c in s.columns
    )
    print(f"{name}: spark={len(s)} duck={len(d)} exact_match={match}")
