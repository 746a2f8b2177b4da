"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``ambient_sound_analysis_api_spark.registry``, which holds
every implemented operator from SURVEY.md §2 as a (Spark query, DuckDB
oracle) pair. See the registry module docstring for the hash-stability
conventions used to keep Spark and DuckDB results bit-identical.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ambient_sound_analysis_api_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """Matching ANSI SQL for DuckDB. Only the three deterministic
    Arrow-kernel queries (FFT/phash: golden-file-checked) and the
    count-min sketch (error-bounds-checked) omit SQL — every hash-family
    op has carried an exact oracle since the round-7 portable-md5
    re-keying."""
    return registry.oracle_sql()
