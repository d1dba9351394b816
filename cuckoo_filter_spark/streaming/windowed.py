"""Windowed streaming sketch aggregation — event-time tumbling windows
with watermark-based late-data handling, one mergeable sketch per
(window, group) held in GroupState.

Pattern (SURVEY.md §2.2 streaming row): because every sketch here is
mergeable, a streaming windowed aggregate is just "merge this batch's
partial into the window's state and emit the running estimate". Late
rows within the watermark merge into their window like any other row;
rows later than the watermark are dropped by Spark before reaching the
state function.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cuckoo_filter_spark.sketches.hll import HLLSketch


def windowed_distinct_count(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 12,
) -> DataFrame:
    """stream → (window_start, n_distinct_estimate) per tumbling window,
    updated each micro-batch; state = one HLL per window."""

    out_schema = "window_start timestamp, estimate double, updates bigint"
    state_schema = "blob binary, updates bigint"

    def agg_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, updates = state.get
            hll = HLLSketch.from_bytes(bytes(blob))
        else:
            hll, updates = HLLSketch(p=p), 0
        n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            hll.update(pdf[key_col].astype(str))
            n += len(pdf)
        updates += n
        state.update((bytearray(hll.to_bytes()), updates))
        yield pd.DataFrame(
            {
                "window_start": [key[0]],
                "estimate": [float(hll.estimate())],
                "updates": [updates],
            }
        )

    windowed = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("__w", F.window(F.col(ts_col), window))
        .withColumn("__ws", F.col("__w.start"))
        .drop("__w")
    )
    return windowed.groupBy("__ws").applyInPandasWithState(
        agg_fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
