"""Exact-substring repetition detection — the "ExactSubstr" signal of
Lee et al. 2022 (Deduplicating Training Data Makes Language Models
Better), re-expressed Spark-first over token windows.

A span is a ``k``-token window of a document (window start positions
advance by ``stride``). A window is REPEATED when its exact token
sequence occurs at least ``min_count`` times anywhere in the corpus —
including a second occurrence inside the same document. Docs whose
repeated-window fraction is high are memorization hazards; the filter
composition drops them.

Shape at 100 TB — the text bodies never shuffle:

1. One slim map-side projection explodes each doc into
   ``(id, fingerprint(window))`` — 16 B/window with the default md5
   fingerprint. A partial-agg ``groupBy(fp)`` counts corpus-wide
   occurrences; only (fp, count) partials cross the network, and only
   the ``count >= min_count`` survivors (the repeated set) come back.
2. The repeated-fingerprint set broadcasts onto a second map-side
   explode; ONE partial-agg ``groupBy(id)`` emits
   ``(n_windows, n_repeated)`` per doc. Two Exchanges total, both
   partial-aggregated, neither carrying text.

Exactness: the default fingerprint is the full 128-bit md5 of the
space-joined window (collisions cryptographically negligible at any
corpus size); ``fingerprint=False`` groups by the window string itself
— byte-exact, at the cost of shuffling gram-string partials. The md5
spelling is engine-portable (``spans_oracle_exprs``), so the contract
oracle recomputes the SAME windows and the SAME repetition rule in
DuckDB.

Broadcast regime: the repeated-window set is assumed to fit executor
memory (it is bounded by true cross-corpus repetition, which curation
is there to make rare). ``broadcast_repeats=False`` degrades to a
shuffle join for pathological corpora.

Reference scope note: linvon/cuckoo-filter has no text surface; this is
grafted LLM-pipeline scope, sibling of operators/lines.py (whose
phase-1/phase-2 slim-explode shape this reuses at window granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cuckoo_filter_spark.functions.text import tokens_expr


def token_windows_expr(col, k: int, stride: int = 1) -> Column:
    """Array of space-joined ``k``-token windows starting at token
    positions ``0, stride, 2*stride, ...`` (all fully inside the doc).
    Docs with < k tokens → empty array. Pure JVM projection."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = tokens_expr(col)
    starts = F.sequence(F.lit(1), F.size(toks) - (k - 1), F.lit(stride))
    windows = F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.when(F.size(toks) >= k, windows).otherwise(
        F.array().cast("array<string>")
    )


def repeated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    stride: int = 1,
    min_count: int = 2,
    fingerprint: bool | str = True,
    broadcast_repeats: bool = True,
) -> DataFrame:
    """Per-doc repetition profile: ``(id_col, n_windows, n_repeated)``.

    ``n_windows`` is the doc's window count; ``n_repeated`` how many of
    them occur >= ``min_count`` times corpus-wide (every occurrence
    counts, including within one doc). Docs with < k tokens have no
    windows and are NOT emitted — join back on id when the zero rows
    matter (``filter_repeated_spans`` handles this for the drop
    composition).

    ``fingerprint=True`` (default) counts 128-bit md5 fingerprints —
    16 B/window on the wire, collisions cryptographically negligible;
    ``'xxhash64'`` counts JVM xxhash64 fingerprints — 8 B/window and
    no regex/md5 cost, at quantified collision odds (birthday bound
    ~n²/2⁶⁵: ≈3% chance of ONE colliding pair at 10⁹ distinct windows,
    which would merge two grams' counts — fine for a dedup SIGNAL,
    not for an exact report); ``False`` counts the window strings
    themselves (byte-exact, heavier shuffle).
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    if id_col in ("gram", "fp", "__rep"):
        raise ValueError(f"id_col {id_col!r} collides with internal names")
    if fingerprint not in (True, False, "xxhash64"):
        raise ValueError(
            f"fingerprint must be True (md5), 'xxhash64', or False "
            f"(group by window strings), got {fingerprint!r}")
    windows = token_windows_expr(text_col, k, stride)
    key = F.col("gram")
    if fingerprint == "xxhash64":
        key = F.xxhash64(key)
    elif fingerprint:
        key = F.unhex(F.md5(key))
    exploded = df.select(
        F.col(id_col), F.explode(windows).alias("gram")
    ).select(id_col, key.alias("fp"))

    repeats = (
        exploded.groupBy("fp").agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("fp", F.lit(1).alias("__rep"))
    )
    rhs = F.broadcast(repeats) if broadcast_repeats else repeats
    return (
        exploded.join(rhs, on="fp", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.count("__rep").alias("n_repeated"),
        )
    )


def filter_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_repeated_frac: float,
    broadcast_flagged: bool = True,
    **kwargs,
) -> DataFrame:
    """The drop composition: corpus minus docs whose repeated-window
    fraction EXCEEDS ``max_repeated_frac``. Docs with no windows
    (< k tokens) pass through — length policy belongs to the quality
    rules, not the dedup pass. One left_anti join against the flagged
    ids; text never shuffles. ``broadcast_flagged=False`` degrades the
    anti join to a shuffle join when the flagged-id set exceeds
    executor memory (a pathologically repetitive corpus), mirroring
    ``broadcast_repeats``."""
    if not (0.0 <= max_repeated_frac <= 1.0):
        raise ValueError(
            f"max_repeated_frac must be in [0, 1], got {max_repeated_frac}")
    stats = repeated_span_stats(df, id_col, text_col, **kwargs)
    flagged = stats.where(
        F.col("n_repeated") > max_repeated_frac * F.col("n_windows")
    ).select(id_col)
    rhs = F.broadcast(flagged) if broadcast_flagged else flagged
    return df.join(rhs, on=id_col, how="left_anti")


def spans_oracle_exprs(text_sql: str, k: int, stride: int = 1) -> dict[str, str]:
    """DuckDB spellings of the SAME window generation, from the one
    tokenization contract (``tokens_expr`` == :func:`~cuckoo_filter_
    spark.functions.text.tokens_sql`): ``windows`` (list expression) and
    ``gram_rows`` (an ``unnest``-ready FROM fragment is left to the
    caller — embed ``windows`` in ``unnest(...)``). Engine drift = hash
    mismatch, not silence."""
    from cuckoo_filter_spark.functions.text import tokens_sql

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    w = tokens_sql(text_sql)
    # range(start, stop, step) is stop-EXCLUSIVE; w[i:j] is INCLUSIVE.
    # Blank/whitespace-only text tokenizes to [] (boundary empties
    # filtered by the ONE emitter), so len(w) >= k gates it for any k.
    windows = (
        f"CASE WHEN len({w}) >= {k} THEN "
        f"list_transform(range(1, len({w}) - {k} + 2, {stride}), "
        f"i -> array_to_string({w}[i:i+{k - 1}], ' ')) "
        f"ELSE []::VARCHAR[] END"
    )
    return {"windows": windows}
