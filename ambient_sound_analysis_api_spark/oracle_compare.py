"""Canonicalization shared by the local oracle gate (``scripts/check_oracle.py``).

The external driver compares Spark results (``collect()`` rows) against DuckDB
oracle results fetched **through pandas/Arrow** — so DuckDB dtype artifacts that
only appear on the pandas path (e.g. HUGEINT integer sums rendered as float64,
list cells as numpy arrays) are part of what the driver hashes.  Round 2 shipped
five hash-mismatches precisely because the local replica fetched via
``fetchall()`` (Python ints) while the driver went through pandas (float64).
This module pins the pandas path locally: ``fetch_duckdb`` routes every oracle
result through ``fetchdf()`` so any such artifact reproduces *before*
submission, and ``canon_value`` renders values exactly as the hash sees them.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import numpy as np


def canon_value(v) -> str:
    """Render one cell the way the value hash sees it.

    numpy scalars are unwrapped first (numpy 2.x ``repr`` would otherwise
    yield ``np.float64(3.0)``), so a DuckDB HUGEINT fetched as float64
    canonicalizes to ``'3.0'`` — visibly different from Spark's int64 ``'3'``.
    """
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def hash_rows(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canon_rows(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def fetch_spark_pandas(sdf) -> tuple[list[str], list[tuple]]:
    """Fetch a Spark DataFrame result the way the driver hashes it.

    The driver routes BOTH sides through pandas, not just DuckDB — proven by
    round-3's green ``catalog_build`` row: Spark's int-with-null ``delta_f``
    column only equals DuckDB's (``3.0``) after pandas upcasts both to
    float64. A ``collect()``-based local gate renders ``3`` vs ``3.0`` and
    flags a false mismatch (and, dually, NULL-vs-NaN in float columns that
    pandas collapses to NaN on both sides).
    """
    pdf = sdf.toPandas()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


def fetch_duckdb(con, sql: str) -> tuple[list[str], list[tuple]]:
    """Run ``sql`` on a DuckDB connection and fetch via pandas.

    This is deliberately NOT ``fetchall()``: the driver's canonicalizer goes
    through pandas, where DuckDB HUGEINT (the result type of any integer
    ``sum()``) downcasts to float64.  Fetching the same way makes the local
    gate fail on an uncast integer-sum oracle exactly like the driver does.
    """
    pdf = con.sql(sql).fetchdf()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows
