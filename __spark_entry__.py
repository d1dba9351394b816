"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises an operator from SURVEY.md §2 and is
exactly reproducible by the ANSI SQL in ``oracle_sql()`` (the cuckoo
filter has no false negatives, so prune-then-verify patterns are exact).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_cuckoo_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋉ high-value orders via cuckoo pre-prune + exact verify."""
    from cuckoo_filter_spark.operators.query import cuckoo_semi_join

    li = _t(spark, sf_dir, "lineitem")
    hi = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    joined = cuckoo_semi_join(li, "l_orderkey", hi, "o_orderkey", exact=True)
    return (
        joined.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_cuckoo_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ▷ lineitem (orders with no lineitems): definite non-members
    bypass the join; filter hits verified with exact left_anti."""
    from cuckoo_filter_spark.operators.query import cuckoo_anti_join

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    no_items = cuckoo_anti_join(orders, "o_orderkey", li, "l_orderkey")
    return (
        no_items.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_totalprice"),
        )
        .orderBy("o_orderstatus")
    )


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count via key-partitioned AddUnique build: duplicates
    co-locate after repartition(key) so partition-local AddUnique is
    globally exact; per-partition stored counts sum to the answer."""
    from cuckoo_filter_spark.operators.build import build_cuckoo_filter

    ev = _t(spark, sf_dir, "events")
    build = build_cuckoo_filter(ev, "user_id", mode="unique_global", bits_per_item=16)
    n = sum(m["stored"] for m in build.metrics)
    return spark.createDataFrame([(n,)], "n_users bigint")


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup: new batch rows whose text is NOT in the
    seen corpus (cuckoo anti pattern, exact)."""
    from cuckoo_filter_spark.operators.query import cuckoo_anti_join

    docs = _t(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") < 250)
    new_docs = cuckoo_anti_join(docs, "text", seen, "text")
    return (
        new_docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_new")).orderBy("lang")
    )


def q_grouped_lang_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped per-lang filters (applyInPandas): one unique-insert filter
    per language; stored count = per-group distinct texts."""
    import pandas as pd

    from cuckoo_filter_spark.kernel.filter import CuckooKernel

    docs = _t(spark, sf_dir, "documents").select("lang", "text")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        kern = CuckooKernel.for_capacity(max(2 * len(pdf), 64), 4, 16)
        stored = int(kern.add_unique(pdf["text"]).sum())
        return pd.DataFrame({"lang": [pdf["lang"].iloc[0]], "n_distinct": [stored]})

    out = docs.groupBy("lang").applyInPandas(per_group, "lang string, n_distinct bigint")
    return out.orderBy("lang")


def q_delete_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete parity: build a filter over all order keys, batch-delete the
    finished ('F') orders, use the remaining filter to prune lineitem,
    then verify exactly against the remaining order set."""
    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import might_contain_udf

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    build = build_cuckoo_filter(orders, "o_orderkey", bits_per_item=16)
    kern = build.kernel()
    gone = [r["o_orderkey"] for r in orders.where(F.col("o_orderstatus") == "F")
            .select("o_orderkey").collect()]
    import numpy as np

    deleted = kern.delete(np.array(gone, dtype=np.int64))
    assert deleted.all()
    mc = might_contain_udf(spark, kern.to_bytes())
    pruned = li.where(mc(F.col("l_orderkey")))
    remaining = orders.where(F.col("o_orderstatus") != "F").select("o_orderkey")
    exact = pruned.join(remaining, pruned["l_orderkey"] == remaining["o_orderkey"],
                        "left_semi")
    return (
        exact.groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cuckoo_semi_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cuckoo_semi_join": q_cuckoo_semi_join,
        "cuckoo_anti_join": q_cuckoo_anti_join,
        "distinct_users": q_distinct_users,
        "incremental_dedup": q_incremental_dedup,
        "grouped_lang_distinct": q_grouped_lang_distinct,
        "delete_workload": q_delete_workload,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cuckoo_semi_join": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   SUM(l_extendedprice) AS sum_price,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "cuckoo_anti_join": """
            SELECT o_orderstatus,
                   COUNT(*) AS n_orders,
                   SUM(o_totalprice) AS sum_totalprice
            FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "distinct_users": "SELECT COUNT(DISTINCT user_id) AS n_users FROM events",
        "incremental_dedup": """
            SELECT lang, COUNT(*) AS n_new
            FROM documents
            WHERE text NOT IN (SELECT text FROM documents WHERE doc_id < 250)
            GROUP BY lang
            ORDER BY lang
        """,
        "grouped_lang_distinct": """
            SELECT lang, COUNT(DISTINCT text) AS n_distinct
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "delete_workload": """
            SELECT l_linestatus, COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_orderstatus <> 'F')
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
    }
