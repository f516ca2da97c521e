"""Skew mitigation for hot keys.

First line of defense is AQE's skew-join splitting (enabled in
session.py), which handles sort-merge joins transparently. Salting covers
the cases AQE does not: skewed AGGREGATIONS (one giant group) and joins
where the skewed side feeds a non-SMJ plan.

``salted_agg`` is the two-phase pattern: partial aggregate on
(key, salt) — spreading one hot key over N reducers — then final combine
on key. Works for any algebraic aggregate (sum/count/min/max); averages
combine from (sum, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable(dt: T.DataType) -> bool:
    """xxhash64 rejects MapType (and anything nesting one) — Spark's hash
    expressions are undefined over unordered maps. Variant is likewise
    unhashable."""
    if isinstance(dt, T.MapType) or dt.typeName() == "variant":
        return False
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    return True


def with_salt(
    df: DataFrame,
    buckets: int = 16,
    col_name: str = "__salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic CONTENT-keyed row salt in [0, buckets): xxhash64 over
    ``salt_cols`` (default: every hashABLE column — MapType/Variant columns
    are skipped, since Spark's hash expressions reject them). Content
    hashing — not monotonically_increasing_id, not rand() — is the only
    salt that survives stage retries and repartitioning unchanged:
    partition-layout-derived ids change when Spark repacks splits, and a
    changed salt on retry double-counts rows in any non-idempotent
    downstream sink. Identical rows share a salt, which only matters if one
    exact row dominates; pass a unique key in ``salt_cols`` to spread those
    too (REQUIRED when every column is map-typed — there is nothing
    deterministic to hash, and we refuse to fall back to layout-dependent
    ids silently)."""
    if salt_cols is not None:
        cols = salt_cols
    else:
        cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
        if not cols:
            raise ValueError(
                "with_salt: no hashable columns (all map/variant-typed); "
                "pass salt_cols= with a hashable key column"
            )
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: sum/count per (keys, salt), then
    combine per keys. ``sum_cols`` maps input column → output alias; a
    row count lands in ``cnt``. Pass a cheap unique key in ``salt_cols``
    (e.g. the row's primary key) so the salt hash does not churn through
    wide payload columns."""
    salted = with_salt(df, buckets, salt_cols=salt_cols)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count("*").alias("__cnt"),
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("cnt"),
        *[F.sum(f"__s_{c}").alias(alias) for c, alias in sum_cols.items()],
    )


def salted_broadcastable_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join when ``small`` is modest but the key is hot on
    the big side: salt the big side's key, explode the small side × buckets,
    join on (key, salt). Prefer broadcast(small) when it fits; prefer AQE
    skew-join for SMJ; this is the fallback for the in-between."""
    # content-keyed salt (see with_salt): invariant under retries/repartition
    big_s = with_salt(big, buckets)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(small_s, [on, "__salt"]).drop("__salt")
