"""Local replica of the driver's correctness gate: run each registry query in
Spark AND its DuckDB oracle twin, compare row count, column names, and an
order-insensitive exact value comparison (stricter than a hash — shows diffs)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in idx], out


def flat_schema_problems(spark_df, name: str = "") -> list[str]:
    """Driver-fidelity shape check (r13 — VERDICT r12 item 2): the driver's
    correctness gate canonicalizes results with a pandas sort_values over
    every column, which raises ``TypeError: unhashable type: 'list'`` on
    array/map/struct cells. This harness used to tuple-ize lists
    (_norm_cell) and pass shapes the driver rejects — that lenience is how
    x5_bpe_gpt2_encode shipped red in r12. Any registry entry's output
    schema must therefore be FLAT: atomic types only at the top level."""
    from pyspark.sql import types as T

    atomic = (
        T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType, T.BooleanType, T.DateType,
        T.TimestampType, T.TimestampNTZType, T.DecimalType, T.BinaryType,
        T.NullType,
    )
    complexes = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if not isinstance(f.dataType, atomic)
    ]
    if complexes:
        return [
            f"{name}: driver-incompatible output shape — complex top-level "
            f"columns {complexes} (the driver's pandas canonicalizer cannot "
            f"sort list/struct/map cells; project to a flat column, e.g. "
            f"concat_ws or posexplode)"
        ]
    return []


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return list of mismatch descriptions (empty = parity)."""
    problems = flat_schema_problems(spark_df, name)
    if problems:
        return problems
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    # dtype parity (the driver checks schemas, not just values): compare the
    # pandas dtypes both engines produce for each column
    SPARK2PD = {"bigint": "int64", "int": "int32", "double": "float64", "boolean": "bool"}
    o_dtypes = {c: str(t) for c, t in con.execute(sql).df().dtypes.items()}
    for c, t in spark_df.dtypes:
        exp, got = SPARK2PD.get(t), o_dtypes.get(c)
        if exp and got and exp != got:
            problems.append(f"{name}: dtype of {c} differs spark={t}({exp}) oracle={got}")
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
    cols, s_norm = _norm_rows(s_cols, s_rows)
    _, o_norm = _norm_rows(o_cols, o_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"{name}: row {i} differs\n  spark : {dict(zip(cols, a))}\n  oracle: {dict(zip(cols, b))}")
    if n_bad > 3:
        problems.append(f"{name}: ... {n_bad} mismatched rows total")
    return problems
