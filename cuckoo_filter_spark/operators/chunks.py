"""Overlapping token chunking — the embedding-prep reshape (RAG /
vector-index pipelines): each document explodes into fixed-size token
chunks with a configurable overlap, ready for an embedding UDF or the
similarity operators.

Chunk rule (deterministic, engine-portable):

* ``n <= k`` tokens → ONE chunk (the whole doc, possibly short).
* else chunks start at token ``i*stride`` (0-based; ``stride =
  k - overlap``), and the LAST chunk is **right-aligned** to the final
  ``k`` tokens — every chunk except a short single one has exactly
  ``k`` tokens, no token is dropped, and no chunk is a strict suffix
  duplicate of its predecessor.

Scale shape: the chunk array is built row-locally by a pure JVM
projection (``transform`` over a ``sequence`` of starts — the same
idiom as spans.token_windows_expr); the explode is map-side inside the
scan stage. Nothing shuffles until the caller aggregates or embeds.
``chunks_oracle_exprs`` emits the identical arithmetic as DuckDB SQL,
so the contract oracle recomputes chunk starts, counts, and text
byte-for-byte.

Reference scope note: linvon/cuckoo-filter has no text surface; grafted
LLM-pipeline scope, sibling of operators/spans.py (full-coverage
chunking here vs fixed-stride windowing there) and lines.py's
chunk_lines_expr (which reshapes for LINE dedup; this op emits ROWS
with provenance for embedding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cuckoo_filter_spark.functions.text import tokens_expr


def _check(k: int, overlap: int) -> int:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0 <= overlap < k):
        raise ValueError(f"overlap must be in [0, k), got {overlap} for k={k}")
    return k - overlap


def chunk_starts_expr(col, k: int, overlap: int = 0) -> Column:
    """Array of 0-based chunk start offsets (see module rule). Blank or
    NULL text → empty array."""
    stride = _check(k, overlap)
    toks = tokens_expr(col)
    n = F.size(toks)
    # n > k: ceil((n-k)/stride) + 1 starts, the last clamped to n-k
    n_extra = F.ceil((n - F.lit(k)).cast("double") / F.lit(stride)).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_extra),
        lambda i: F.least(i * F.lit(stride), n - F.lit(k)),
    )
    return (
        F.when(n == 0, F.array().cast("array<int>"))
        .when(n <= k, F.array(F.lit(0)))
        .otherwise(starts.cast("array<int>"))
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    overlap: int = 0,
    *,
    chunk_idx_col: str = "chunk_idx",
    chunk_col: str = "chunk_text",
    n_tokens_col: str = "chunk_tokens",
) -> DataFrame:
    """Explode each doc into ``(id_col, chunk_idx, chunk_text,
    chunk_tokens)`` rows per the module rule. Docs with no tokens emit
    no rows (join back on id when empties matter). Chunk text re-joins
    its tokens with single spaces (tokenization is whitespace-lossy by
    contract — same as every consumer of tokens_expr)."""
    stride = _check(k, overlap)
    for c in (chunk_idx_col, chunk_col, n_tokens_col):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists in input")
    out_names = (chunk_idx_col, chunk_col, n_tokens_col, "__start", "__toks")
    if id_col in out_names:
        raise ValueError(f"id_col {id_col!r} collides with output names")
    if chunk_idx_col in ("__start", "__toks") or \
            len({chunk_idx_col, chunk_col, n_tokens_col}) != 3:
        raise ValueError(
            "chunk output column names must be distinct and must not use "
            "the internal names '__start'/'__toks'")
    toks = tokens_expr(text_col)
    # starts derived from the PROJECTED token array (size-based), not by
    # re-splitting the text inside the Generate — tokens_expr's regex
    # split of the full document runs once per row in the scan stage
    with_toks = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    n_extra = F.ceil((n - F.lit(k)).cast("double") / F.lit(stride)).cast("int")
    starts = (
        F.when(n == 0, F.array().cast("array<int>"))
        .when(n <= k, F.array(F.lit(0)))
        .otherwise(F.transform(
            F.sequence(F.lit(0), n_extra),
            lambda i: F.least(i * F.lit(stride), n - F.lit(k)),
        ).cast("array<int>"))
    )
    out = with_toks.select(
        F.col(id_col), F.col("__toks"),
        F.posexplode(starts).alias(chunk_idx_col, "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, k)
    return out.select(
        id_col,
        chunk_idx_col,
        F.array_join(chunk, " ").alias(chunk_col),
        F.size(chunk).cast("bigint").alias(n_tokens_col),
    )


def chunks_oracle_exprs(text_sql: str, k: int, overlap: int = 0) -> dict[str, str]:
    """DuckDB spellings of the SAME rule from the one tokenization
    contract: ``starts`` (0-based list) and ``tokens`` (the token
    list) — embed ``starts`` in an ``unnest`` and slice ``tokens``
    with the 1-based inclusive ``w[start+1 : start+k]`` to rebuild
    chunk text/counts."""
    from cuckoo_filter_spark.functions.text import tokens_sql

    stride = _check(k, overlap)
    w = tokens_sql(text_sql)
    n = f"len({w})"
    starts = (
        f"CASE WHEN {n} = 0 THEN []::INT[] "
        f"WHEN {n} <= {k} THEN [0] "
        f"ELSE list_transform("
        f"range(0, CAST(ceil(({n} - {k}) / {stride}.0) AS INT) + 1), "
        f"i -> CAST(least(i * {stride}, {n} - {k}) AS INT)) END"
    )
    return {"starts": starts, "tokens": w}
