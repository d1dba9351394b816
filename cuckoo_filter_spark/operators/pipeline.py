"""Composite training-data curation pipeline — the end-to-end flow a
web-corpus preprocessing job runs, composed from the tested operators:

    quality filter → language filter → exact dedup (content hash)
    → near-dup removal (MinHash LSH, keep min-id representative)

Everything stays declarative DataFrame ops + the Arrow-batched signature
UDFs; each stage's row counts are returned as lineage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class CurationResult:
    df: DataFrame
    stats: dict = field(default_factory=dict)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    keep_langs: tuple = ("en", "de", "fr", "es", "zh"),
    near_dup_threshold: float = 0.85,
    cluster_transitive: bool = True,
    count_stages: bool = True,
) -> CurationResult:
    """Returns the curated corpus + per-stage row counts.

    Near-dup removal: pair list from MinHash-LSH + exact-Jaccard
    verification; with cluster_transitive=True (default) duplicate
    CHAINS (A~B, B~C) collapse to one representative per connected
    component (min id); otherwise per-pair min-id pruning."""
    from cuckoo_filter_spark.functions.text import lang_id_udf, quality_score_expr
    from cuckoo_filter_spark.operators.dedup import (
        dedup_by_content_hash,
        minhash_near_dup_pairs,
    )

    stats: dict = {}
    if count_stages:
        stats["input"] = df.count()

    scored = df.withColumn("__q", quality_score_expr(text_col))
    quality = scored.where(F.col("__q") >= min_quality).drop("__q")
    if count_stages:
        stats["after_quality"] = quality.count()

    lid = lang_id_udf()
    langed = quality.withColumn("__lang", lid(F.col(text_col)))
    kept = langed.where(F.col("__lang").isin(list(keep_langs))).drop("__lang")
    if count_stages:
        stats["after_lang"] = kept.count()

    exact = dedup_by_content_hash(kept, text_col, keep="min", id_col=id_col)
    if count_stages:
        stats["after_exact_dedup"] = exact.count()

    pairs = minhash_near_dup_pairs(exact, text_col, id_col,
                                   threshold=near_dup_threshold)
    if cluster_transitive:
        from cuckoo_filter_spark.operators.dedup import collapse_near_dup_clusters

        final = collapse_near_dup_clusters(exact, pairs.select("id_a", "id_b"),
                                           id_col=id_col)
    else:
        losers = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
        final = exact.join(losers, id_col, "left_anti")
    if count_stages:
        stats["after_near_dedup"] = final.count()
    return CurationResult(df=final, stats=stats)
