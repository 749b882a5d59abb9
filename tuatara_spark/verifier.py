"""Local replica of the driver's correctness harness: run every registry
query on Spark AND its DuckDB oracle on the same parquet tables; compare
order-insensitively (sort columns by name, sort rows, exact values)."""

from __future__ import annotations

import duckdb
import pandas as pd

from tuatara_spark.queries import REGISTRY

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import pandas.api.types as pt
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pt.is_integer_dtype(df[c].dtype):
            # integer WIDTH is not significant (int32 vs int64 hash alike),
            # but decimal128/float vs int IS (the round-1 HUGEINT miss) —
            # those stay object/float and fail the dtype check below.
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


def compare_query(spark, name: str, sf_dir: str) -> dict:
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return {"name": name, "mode": "rows_only", "rows": len(sdf),
                "match": True}
    con = _duck_connection(sf_dir)
    odf = con.sql(sql).df()
    con.close()
    a, b = _normalize(sdf), _normalize(odf)
    match = list(a.columns) == list(b.columns) and len(a) == len(b)
    detail = ""
    if match:
        try:
            # dtype-sensitive: the driver's value hash distinguishes e.g.
            # DuckDB HUGEINT (decimal128) from Spark BIGINT even when the
            # values agree — round-1 missed 3 queries by comparing loosely.
            pd.testing.assert_frame_equal(a, b, check_dtype=True,
                                          check_exact=True)
        except AssertionError as e:
            match = False
            detail = str(e).split("\n")[0:6]
    else:
        detail = f"shape spark={a.shape} duck={b.shape} cols {list(a.columns)} vs {list(b.columns)}"
    return {"name": name, "mode": "oracle", "rows": len(a), "match": match,
            "detail": detail}


def run_all(spark, sf_dir: str, names=None) -> list[dict]:
    names = names or list(REGISTRY)
    return [compare_query(spark, n, sf_dir) for n in names]
