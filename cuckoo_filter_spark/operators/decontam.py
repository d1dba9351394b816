"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark corpus (the GPT-3/PaLM-style
13-gram collision rule), accelerated by the library's own cuckoo
filter.

Shape at 100 TB:

* The benchmark side is SMALL by construction (benchmarks are at most
  ~10^7 n-grams). Its distinct n-grams incur the only benchmark-side
  shuffle, and the cuckoo filter built over them broadcasts to every
  executor (~2.1 B/key at f=16: 10^7 grams ≈ 21 MB).
* The training side — the 10^12-doc corpus — NEVER shuffles raw text:
  n-gram expansion (pure JVM, functions.text.word_ngrams_expr) and the
  cuckoo membership probe both run map-side inside the scan stage.
  Only filter HITS (true collisions + the ~2b/2^f false-positive
  residue) leave the stage, so the exactness-restoring verify join and
  the per-doc aggregation touch a vanishing fraction of the corpus.
* Exactness: the cuckoo filter has no false negatives, so pruning never
  drops a real collision; the verify join against the (broadcast)
  distinct benchmark grams removes false positives. `exact=False`
  skips the verify and returns the approximate superset.

Reference: linvon/cuckoo-filter cuckoofilter.go:107-135 (Contain) is
the probe primitive; the decontamination composition is new surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.functions.text import word_ngrams_expr


def benchmark_ngrams(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus (one column,
    ``gram``). The only benchmark-side shuffle."""
    return (
        benchmark.select(F.explode(word_ngrams_expr(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str | None = None,
    n: int = 13,
    exact: bool = True,
    broadcast_verify: bool = True,
    build=None,
    materialize_bgrams: bool = True,
    **build_kwargs,
) -> DataFrame:
    """Per-doc contamination counts: ``(id_col, hit_grams)`` for every
    training doc sharing >= 1 word ``n``-gram with ``benchmark``.

    ``hit_grams`` counts DISTINCT contaminated n-grams per doc (a gram
    repeated within one doc counts once). Docs with zero hits are NOT
    emitted — at decontamination scale the clean set is the corpus; join
    the result back (left_anti on id) to drop contaminated docs.

    ``broadcast_verify`` hints the exact verify join to broadcast the
    benchmark gram set (the intended regime). Disable for benchmark
    sides beyond executor memory — the verify becomes a shuffle join of
    the (already filter-pruned, tiny) hit set instead.

    ``materialize_bgrams`` (default True) localCheckpoints the distinct
    benchmark-gram frame so the filter build and the exact verify join
    read ONE materialization instead of re-running the benchmark
    explode + distinct per consumer. Sound at any scale this operator
    targets: the benchmark side is small by construction (module
    docstring) — the verify join already BROADCASTS the same frame, so
    materializing it assumes nothing broadcast didn't. Pass False to
    keep the recompute-per-consumer plan.

    ``build`` / ``build_kwargs`` pass through to
    :func:`~cuckoo_filter_spark.operators.build.build_cuckoo_filter`
    (hash_fn, tags_per_bucket, bits_per_item, ...).
    """
    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import might_contain_udf

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    spark = train.sparkSession
    bench_col = bench_text_col or text_col
    bgrams = benchmark_ngrams(benchmark, bench_col, n)
    # only worth materializing when >1 consumer actually reads it;
    # lazy: the filter build's first job materializes it in-line
    if materialize_bgrams and exact and build is None:
        bgrams = bgrams.localCheckpoint(eager=False)
    if build is None:
        build = build_cuckoo_filter(bgrams, "gram", **build_kwargs)
    mc = might_contain_udf(spark, build)

    # slim projection: (id, distinct grams) -> explode -> probe. All
    # map-side; array_distinct implements the per-doc-distinct count
    # locally so no (doc, gram) dedupe shuffle is ever needed.
    tgrams = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams_expr(text_col, n))).alias("gram"),
    )
    hits = tgrams.where(mc(F.col("gram")))
    if exact:
        rhs = F.broadcast(bgrams) if broadcast_verify else bgrams
        hits = hits.join(rhs, on="gram", how="left_semi")
    return hits.groupBy(id_col).agg(F.count("*").alias("hit_grams"))


def drop_contaminated(
    train: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    min_hits: int = 1,
    broadcast_flagged: bool = True,
    **kwargs,
) -> DataFrame:
    """The filtering composition: training corpus minus docs with
    >= ``min_hits`` contaminated n-grams. One left_anti join against
    the (tiny) contaminated-id set — train text never shuffles.
    ``broadcast_flagged=False`` degrades to a shuffle anti join for a
    contaminated set beyond executor memory (only plausible when the
    "benchmark" side is itself corpus-scale), mirroring
    ``filter_repeated_spans``."""
    contaminated = decontaminate(train, id_col, text_col, benchmark, **kwargs)
    flagged = contaminated.where(F.col("hit_grams") >= min_hits).select(id_col)
    rhs = F.broadcast(flagged) if broadcast_flagged else flagged
    return train.join(rhs, on=id_col, how="left_anti")
