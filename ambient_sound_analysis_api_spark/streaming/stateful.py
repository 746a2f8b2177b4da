"""Custom stateful streaming operators via ``applyInPandasWithState``.

Built-in streaming constructs cover tumbling/session windows and
watermarked dedup; anything needing *arbitrary* per-key state (online
statistics, model-ish scoring, custom TTL logic) drops to
``applyInPandasWithState`` — Arrow-batched per group, state round-tripped
by the engine, parallel across the shuffle's key partitions.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Running (count, mean, M2) — Welford's online variance accumulator.
_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_us", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)


def _welford_update(n: int, mean: float, m2: float, x: float):
    n += 1
    d = x - mean
    mean += d / n
    m2 += d * (x - mean)
    return n, mean, m2


def flag_anomalies_stateful(
    stream: DataFrame,
    z_threshold: float = 3.0,
    min_obs: int = 10,
    key_col: str = "hydrophone",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Online anomaly flagging with per-key streaming state.

    Maintains Welford running mean/variance per key across micro-batches;
    emits rows whose |z-score| against the *pre-update* statistics exceeds
    ``z_threshold`` (once ``min_obs`` observations are banked). This is the
    operator shape Spark's built-ins cannot express: the aggregate state
    must update continuously AND each event must be scored against state —
    a per-key sequential fold, parallel across keys.

    Returns a streaming DataFrame ``(key, ts_us, value, zscore, n_seen)``
    in append mode. Rows within a micro-batch are processed in event-time
    order for deterministic folds.
    """

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out: list[dict[str, Any]] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col)
            for ts, x in zip(pdf[ts_col], pdf[value_col]):
                x = float(x)
                if n >= min_obs and m2 > 0:
                    std = (m2 / n) ** 0.5
                    z = (x - mean) / std if std > 0 else 0.0
                    if abs(z) >= z_threshold:
                        out.append(
                            {
                                "key": key[0],
                                "ts_us": int(pd.Timestamp(ts).value // 1000),
                                "value": x,
                                "zscore": z,
                                "n_seen": n,
                            }
                        )
                n, mean, m2 = _welford_update(n, mean, m2, x)
        state.update((n, mean, m2))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in _OUT_SCHEMA.fields])

    return (
        stream.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
