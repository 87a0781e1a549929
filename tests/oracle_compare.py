"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row-count + column names + order-insensitive value comparison (columns sorted
by name, rows sorted by their full tuple, floats rounded to 6 significant
decimals before comparing)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from aws_glue_etl_sample_hist_spark.catalog import TABLES, table_path

FLOAT_DECIMALS = 6


def _norm_cell(v):
    """Canonicalize a cell, keeping the int-class/float-class distinction.

    The driver's canon hashes the pandas representation of each frame, so an
    oracle column fetched as float64 (e.g. DuckDB HUGEINT from SUM(BIGINT))
    never hash-matches a Spark int64 column even when every value is equal
    (6000.0 vs 6000) -- that is exactly how `text_repetition` stayed red for
    two rounds while passing the old value-only local compare. Tagging the
    numeric class here makes int-valued floats fail locally too. Decimals
    join the float class because pandas fetches DuckDB DECIMAL as float64."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, FLOAT_DECIMALS))
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def compare(spark_df, con, sql: str) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    report = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duckdb": sorted(d_cols),
        "rowcount_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
        "first_diff": None,
    }
    if report["rowcount_match"] and report["schema_match"]:
        a = _norm_rows(s_cols, s_rows)
        b = _norm_rows(d_cols, d_rows)
        report["values_match"] = a == b
        if not report["values_match"]:
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    report["first_diff"] = {"row": i, "spark": x, "duckdb": y}
                    break
    return report
