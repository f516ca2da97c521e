"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

Stricter than the driver: exact value equality (after both sides' declared
rounding), not just hash match — so any float-order divergence surfaces
here first.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from kafka_streams_example_spark.schemas import ALL_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):  # Spark-written table dir → glob the parts
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatches (empty == parity)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) != len(d):
        return problems
    for col in s.columns:
        sv, dv = s[col], d[col]
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                fa = float("nan") if a is None else float(a)
                fb = float("nan") if b is None else float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    problems.append(f"{col}[{i}]: spark={a!r} duck={b!r}")
                    break
            elif a != b and str(a) != str(b):
                problems.append(f"{col}[{i}]: spark={a!r} duck={b!r}")
                break
    return problems


def run_query_pair(spark, con, fn, sql: str, sf_dir: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(sql).fetchdf()
    return spark_pdf, duck_pdf
