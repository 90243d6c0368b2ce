"""Local mirror of the driver's correctness gate: run each catalog
query on Spark AND its DuckDB oracle on the same parquet dir, then
compare row count, column names, and order-insensitive values
*exactly* (floats included — queries are required to round anything
float-unstable)."""

from __future__ import annotations

import math

import duckdb

from openaq_data_pipeline_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def normalize(df_pandas):
    """Sort columns by name, then rows by all values → list of tuples."""
    cols = sorted(df_pandas.columns)
    rows = []
    for rec in df_pandas[cols].itertuples(index=False, name=None):
        norm = []
        for v in rec:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                norm.append(round(v, 9))
            elif hasattr(v, "item"):  # numpy scalar
                item = v.item()
                norm.append(round(item, 9) if isinstance(item, float) else item)
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, oracle_pdf, max_diff_print: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems = []
    spark_pdf = spark_df.toPandas()
    s_cols, s_rows = normalize(spark_pdf)
    o_cols, o_rows = normalize(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sset, oset = set(s_rows), set(o_rows)
    only_s = list(sset - oset)[:max_diff_print]
    only_o = list(oset - sset)[:max_diff_print]
    if only_s or only_o:
        problems.append(f"value diff; spark-only={only_s} oracle-only={only_o}")
    return problems
