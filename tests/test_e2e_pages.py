"""End-to-end over the input_hint pages schema: synthesize →
byte-identical text extraction from html → curation → cuckoo dedup of
the next crawl batch. Ties every major operator to the (url, warc_ts,
html, text, lang) table the north_star names."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.text import token_count_expr
from cuckoo_filter_spark.operators.build import build_cuckoo_filter
from cuckoo_filter_spark.operators.query import might_contain_udf
from cuckoo_filter_spark.sources.pages import extract_text_series, synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, 4000, n_hosts=200, dup_rate=0.15, seed=42,
                     num_partitions=4)
    df.cache().count()
    return df


def test_extraction_invariant_through_spark(spark, pages):
    """html → text inversion, byte-identical, via a pandas UDF over the
    binary column (input_hint per-row invariant)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def extract(html: pd.Series) -> pd.Series:
        return extract_text_series(html)

    mism = pages.withColumn("__ex", extract(F.col("html"))).where(
        F.col("__ex") != F.col("text")
    )
    assert mism.count() == 0


def test_crawl_dedup_flow(spark, pages):
    """Crawl N built into a filter; crawl N+1 (50% overlap) deduped:
    definite-new urls bypass, candidates verified exactly."""
    crawl1 = pages.where(F.col("warc_ts") < "2025-01-01 00:33:20")  # first ~2000
    crawl2 = pages.where(F.col("warc_ts") >= "2025-01-01 00:16:40")  # overlap

    build = build_cuckoo_filter(crawl1, "url")
    mc = might_contain_udf(spark, build)
    flagged = crawl2.withColumn("__seen", mc(F.col("url")))
    definite_new = flagged.where(~F.col("__seen"))
    maybe_seen = flagged.where(F.col("__seen"))
    # exactness: definite_new must share no url with crawl1
    overlap = definite_new.join(crawl1.select("url").distinct(), "url", "left_semi")
    assert overlap.count() == 0
    # verification join restores exactness for the candidates
    seen_urls = crawl1.select("url").distinct()
    truly_new_candidates = maybe_seen.join(seen_urls, "url", "left_anti")
    total_new = definite_new.count() + truly_new_candidates.count()
    want_new = (
        crawl2.join(seen_urls, "url", "left_anti").count()
    )
    assert total_new == want_new


def test_pages_stats_pipeline(spark, pages):
    """Aggregate text stats over the pages schema (JVM expressions)."""
    stats = (
        pages.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(token_count_expr("text")).alias("tokens"))
        .collect()
    )
    langs = {r["lang"] for r in stats}
    assert langs == {"en", "zh", "de", "fr", "es"}
    assert sum(r["n"] for r in stats) == 4000
