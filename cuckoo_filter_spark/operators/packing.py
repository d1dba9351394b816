"""Greedy document packing: assign documents to fixed token-budget bins
for training-sequence construction.

The LLM-pipeline op this engine feeds: after dedup/filtering, documents
are concatenated into fixed-size context windows. The distributed-
friendly packing rule implemented here is **boundary-cut packing**:
within each key, documents are laid out in a deterministic order and a
document belongs to the bin where its FIRST token lands
(``bin = start_offset DIV budget``). Equivalent view: concatenate the
stream and cut every ``budget`` tokens without splitting documents —
a document straddling a cut extends its bin past the budget (bounded by
``budget + max_doc_tokens - 1`` tokens).

This is deliberately NOT sequential first-fit (close a bin when the
next document would overflow): first-fit is a running recurrence that
cannot be expressed as a prefix scan, so it serializes per key and is
not reproducible by a declarative oracle. Boundary-cut is a pure window
cumulative sum — ONE Exchange by key + one in-task sort, the same
100 TB shape as sessionize — and both engines (Spark and the DuckDB
oracle) recompute it bit-identically.

No referent in /root/reference (a filter kernel); SURVEY.md §2.2
relational-surface extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_greedy(df: DataFrame, key_col: str, token_col: str,
                budget: int, order_cols: tuple[str, ...],
                out_col: str = "bin_idx",
                offset_col: str = "start_offset") -> DataFrame:
    """Assign each row a 0-based ``out_col`` bin within its key.

    ``token_col`` must be a non-negative integral token count; rows
    with NULL/negative token counts raise at runtime via an ANSI-safe
    guard (a negative count would silently break the prefix-sum
    monotonicity and corrupt every later bin in the key). Rows with a
    NULL key are DROPPED, not raised — a NULL key has no bin sequence
    to join; pre-filter or fill upstream if those rows must survive
    (same exclusion rule as temporal.sessionize / asof_join).
    Zero-token rows are kept (they join the bin at their offset).
    ``order_cols`` must totally order rows within a key (e.g. a unique
    doc id) — determinism contract as in temporal.sessionize.
    ``offset_col`` carries the row's first-token offset within its key.

    Plan: one Exchange by ``key_col``, one in-task (external,
    spillable) sort, a running sum, and a pure projection — zero
    Python. A hot key serializes into one task; keys are typically
    (shard, language) or similar bounded-cardinality groupings, so
    pre-split a pathological key upstream if needed.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget!r}")
    if not order_cols:
        raise ValueError("order_cols must totally order rows per key")
    clash = [c for c in (out_col, offset_col, "__cum")
             if c in df.columns]
    if clash:
        raise ValueError(
            f"pack_greedy output/reserved columns present in input: {clash}")
    base = df.where(F.col(key_col).isNotNull())
    # fail loud on NULL/negative token counts: raise_error inside a
    # when() keeps the check JVM-side and codegen-friendly
    tok = F.col(token_col).cast("long")
    checked = F.when(
        tok.isNull() | (tok < 0),
        F.raise_error(F.concat(
            F.lit(f"pack_greedy: NULL or negative {token_col} at "
                  f"{key_col}="), F.col(key_col).cast("string"))),
    ).otherwise(tok)
    run = Window.partitionBy(key_col).orderBy(*order_cols) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        base.withColumn("__cum", F.sum(checked).over(run))
        .withColumn(offset_col, (F.col("__cum") - tok))
        .withColumn(out_col, F.expr(f"{offset_col} DIV {budget}L"))
        .drop("__cum")
    )


def pack_stats(df: DataFrame, key_col: str, token_col: str,
               budget: int, order_cols: tuple[str, ...]) -> DataFrame:
    """Per-bin aggregates: one row per (key, bin_idx) with ``n_docs``
    and ``sum_tokens`` (bigints). A bin's ``sum_tokens`` may exceed
    ``budget`` only via its last, straddling document (boundary-cut
    semantics — see module docstring)."""
    packed = pack_greedy(df, key_col, token_col, budget, order_cols)
    return (
        packed.groupBy(key_col, "bin_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("sum_tokens"),
        )
    )
