"""Global line-level exact deduplication (the C4-style "discard every
repeated occurrence of a line across the corpus" curation op) plus the
fixed-width token-chunk reshaping that turns unstructured token streams
into dedupable segments.

Shape at 100 TB — the text bodies never shuffle:

1. A slim map-side projection explodes each doc into
   ``(id, idx, xxhash64(line))`` — 16 B/line — and a partial-agg
   ``groupBy(fp)`` finds fingerprints seen more than once. Only those
   8-byte counts cross the network.
2. The (tiny) repeated-fingerprint set broadcasts back onto a second
   map-side explode; ONLY candidate duplicate lines carry their text
   onward. Keep-first is a partial-agg ``groupBy(line).agg(MIN(struct
   (id, idx)))`` — exact (keyed by the LINE BYTES, so 64-bit collisions
   cannot conflate distinct lines) AND hot-line-safe: a boilerplate
   line repeated 10⁹× map-side-combines to one row per task instead of
   funnelling every occurrence into a single-task sort (the
   ``Window.partitionBy(line)`` failure mode). Removals are the
   candidates anti-joined against the firsts on ``(line, id, idx)``.
3. Removed ``(id, [idx...])`` lists — small in the intended curation
   regime — broadcast back onto the ORIGINAL frame, and the rewrite is
   a pure JVM indexed-lambda filter over ``split(text)``. Docs with no
   removals pass through untouched, un-shuffled.
   ``broadcast_removed=False`` degrades that join to a shuffle join for
   C4-scale removal sets (a large fraction of all docs). The firsts
   anti-join is deliberately NOT broadcast-forced by default: firsts
   carries one row of LINE TEXT per distinct repeated line — unbounded
   at corpus scale — so AQE picks broadcast at runtime when the set is
   actually tiny and degrades to a shuffle join when it is not (same
   convention as policy.py's blocked-host join); the composite
   ``(line, id, idx)`` join key spreads hot lines across partitions, so
   the shuffle fallback stays skew-safe. ``broadcast_firsts=True``
   force-pins the broadcast for plan-stability-sensitive callers.

The double map-side explode (steps 1 and 2 both re-run the scan
projection) is the same deliberate re-read-vs-materialize trade
documented on ``cuckoo_anti_join``: re-reading pruned columnar parquet
beats materializing 10^12 exploded rows. The probe plan must therefore
be deterministic under re-execution (true for source/filter pipelines;
not for unseeded ``rand()`` inputs).

Reference: linvon/cuckoo-filter has no line-level surface; this is the
grafted LLM-pipeline scope (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.functions.text import tokens_expr


def chunk_lines_expr(col, tokens_per_chunk: int):
    """Reshape a whitespace token stream into '\\n'-joined fixed-width
    chunks (the dedup unit for corpora without natural line structure).
    Pure JVM; blank/NULL input → empty string. The last chunk keeps the
    remainder (< tokens_per_chunk tokens)."""
    if tokens_per_chunk < 1:
        raise ValueError(f"tokens_per_chunk must be >= 1, got {tokens_per_chunk}")
    toks = tokens_expr(col)
    k = tokens_per_chunk
    n_chunks = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.array_join(F.slice(toks, j * k + 1, k), " "),
    )
    return F.when(F.size(toks) > 0, F.array_join(chunks, "\n")).otherwise(F.lit(""))


def dedup_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    min_chars: int = 1,
    broadcast_removed: bool = True,
    broadcast_firsts: bool = False,
) -> DataFrame:
    """Keep-first global line dedup: among lines whose trimmed length is
    >= ``min_chars``, every distinct line string keeps ONLY its first
    occurrence ordered by ``(id_col, line index)``; later occurrences
    are removed from their documents. Sub-``min_chars`` (e.g. blank)
    lines are structural and always kept.

    Returns ``df`` with ``text_col`` rewritten (surviving lines
    re-joined with '\\n') plus an ``n_lines_removed`` column.

    ``sep`` is a Java REGEX (passed to ``split``). ``id_col`` must be
    unique per row and orderable — it defines "first".
    """
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    if id_col in ("idx", "line", "fp", "__first"):
        raise ValueError(f"id_col {id_col!r} collides with internal names")
    clash = [c for c in ("__removed_idxs", "n_lines_removed") if c in df.columns]
    if clash:
        raise ValueError(f"input column(s) {clash} collide with output names")

    exploded = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                                 sep, -1)).alias("idx", "line"),
        )
        .where(F.length(F.trim(F.col("line"))) >= min_chars)
    )
    with_fp = exploded.withColumn("fp", F.xxhash64("line"))

    # phase 1: repeated fingerprints — partial agg means only (fp, count)
    # partials shuffle; the >1 survivors are tiny.
    dup_fps = (
        with_fp.groupBy("fp").agg(F.count("*").alias("n")).where(F.col("n") > 1)
        .select("fp")
    )

    # phase 2: candidates carry text; exact keep-first via a PARTIAL-AGG
    # MIN(struct(id, idx)) keyed by the line BYTES (collision-proof, and
    # hot lines map-side-combine instead of single-task-sorting).
    cand = with_fp.join(F.broadcast(dup_fps), on="fp", how="left_semi")
    firsts = (
        cand.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__first"))
        .select(
            "line",
            F.col("__first").getField(id_col).alias(id_col),
            F.col("__first").getField("idx").alias("idx"),
        )
    )
    first_rhs = F.broadcast(firsts) if broadcast_firsts else firsts
    removed = (
        cand.join(first_rhs, on=["line", id_col, "idx"], how="left_anti")
        .groupBy(id_col)
        .agg(F.collect_list("idx").alias("__removed_idxs"))
    )

    rem_rhs = F.broadcast(removed) if broadcast_removed else removed
    out = df.join(rem_rhs, on=id_col, how="left")
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep, -1)
    kept = F.filter(
        lines, lambda x, i: ~F.array_contains(F.col("__removed_idxs"), i)
    )
    n_removed = F.coalesce(F.size("__removed_idxs"), F.lit(0)).cast("bigint")
    return (
        out.withColumn(
            text_col,
            F.when(F.col("__removed_idxs").isNull(), F.col(text_col)).otherwise(
                F.array_join(kept, "\n")
            ),
        )
        .withColumn("n_lines_removed", n_removed)
        .drop("__removed_idxs")
    )
