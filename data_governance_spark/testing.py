"""Test utilities: a DuckDB oracle harness mirroring the driver's
correctness gate (row-count + order-insensitive value comparison with
columns sorted by name)."""

from __future__ import annotations

import decimal
import math
import os
from datetime import date, datetime

import duckdb
from pyspark.sql import DataFrame

from data_governance_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v) -> str:
    """Engine-independent canonical string for a cell value."""
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    return cols, [tuple(r) for r in df.collect()]


def oracle_rows(
    con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


# Output types proven to survive the driver's value-hash on both
# engines (pandas/Arrow conversion collapses DuckDB DECIMAL and
# HUGEINT to float64 while Spark keeps Decimal/int64 — r01 showed every
# query with a DECIMAL or integer-sum output hash-mismatching even
# though the values were equal). Final projections must use only these.
_SAFE_DUCK_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN")


def _has_unsafe_type(dt) -> bool:
    """Recursively walk the DataType tree for decimal/timestamp/date —
    including inside array/map/struct, which hash-mismatch at the driver
    just the same (ADVICE r2). A type-tree walk, not a substring match on
    simpleString(), so a FIELD NAME containing 'date' can't false-positive
    (ADVICE r3)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.DecimalType, T.TimestampType, T.TimestampNTZType, T.DateType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_unsafe_type(dt.elementType)
    if isinstance(dt, T.MapType):
        return _has_unsafe_type(dt.keyType) or _has_unsafe_type(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_has_unsafe_type(f.dataType) for f in dt.fields)
    return False


def assert_safe_output_types(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str):
    bad_s = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if _has_unsafe_type(f.dataType)
    ]
    assert not bad_s, f"driver-unsafe Spark output types (cast to double/string): {bad_s}"
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad_o = [
        (name, typ)
        for name, typ, *_ in desc
        if not typ.upper().startswith(_SAFE_DUCK_TYPES)
    ]
    assert not bad_o, f"driver-unsafe oracle output types (cast in the SQL): {bad_o}"


def assert_matches_oracle(df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str):
    assert_safe_output_types(df, con, sql)
    s_cols, s_rows = spark_rows(df)
    o_cols, o_rows = oracle_rows(con, sql)
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    assert len(s_canon) == len(o_canon), (
        f"row count mismatch: spark={len(s_canon)} oracle={len(o_canon)}\n"
        f"spark sample: {s_canon[:5]}\noracle sample: {o_canon[:5]}"
    )
    if s_canon != o_canon:
        # hoist the sets — building them inside the comprehension made
        # the diff path O(n^2) set constructions (minutes at 100k rows)
        o_set, s_set = set(o_canon), set(s_canon)
        diff_s = [r for r in s_canon if r not in o_set][:5]
        diff_o = [r for r in o_canon if r not in s_set][:5]
        raise AssertionError(
            f"value mismatch\nonly-in-spark: {diff_s}\nonly-in-oracle: {diff_o}"
        )
