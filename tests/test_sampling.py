"""hash_split / hash_sample — deterministic, engine-portable splits.

Pins the module's three guarantees: determinism (repartitioning the
input does not move a single row), key-stability (duplicate rows of a
key agree; a grown corpus keeps old assignments), and engine
portability (split_case_sql run in DuckDB reproduces Spark's
assignment byte-for-byte). Plus fraction accuracy and validation.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.sampling import (
    hash_sample,
    hash_split,
    split_case_sql,
)

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(5000)] + [(None, "null key")],
        "doc_id bigint, text string")


def test_partition_invariance_and_null(spark, docs):
    a = {r["doc_id"]: r["split"]
         for r in hash_split(docs, "doc_id", SPLITS, seed="s").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs.repartition(7), "doc_id", SPLITS,
                             seed="s").collect()}
    assert a == b
    assert a[None] is None  # NULL key -> NULL split, caller decides


def test_fractions_and_exhaustive_disjoint(spark, docs):
    out = hash_split(docs, "doc_id", SPLITS).where(
        F.col("doc_id").isNotNull())
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(SPLITS)  # every split non-empty, no extras
    assert sum(counts.values()) == 5000  # a partition: disjoint + complete
    for name, f in SPLITS.items():
        assert counts[name] == pytest.approx(5000 * f, rel=0.15), counts


def test_key_stability_under_growth_and_duplicates(spark, docs):
    """The leakage guarantee: rows added later never move an existing
    key, and every duplicate row of a key agrees with it."""
    first = {r["doc_id"]: r["split"] for r in hash_split(
        docs.where(F.col("doc_id") < 1000), "doc_id", SPLITS).collect()}
    grown = docs.unionByName(docs.where(F.col("doc_id") < 50))  # dups too
    after = hash_split(grown, "doc_id", SPLITS)
    rows = (after.where(F.col("doc_id") < 1000)
            .dropDuplicates(["doc_id", "split"]).collect())
    assert len(rows) == 1000  # a disagreeing duplicate would survive
    assert {r["doc_id"]: r["split"] for r in rows} == first


def test_duckdb_reproduces_spark_assignment(spark, docs):
    """The portability contract: split_case_sql evaluated by DuckDB ==
    hash_split evaluated by Spark, row for row."""
    got = (hash_split(docs, "doc_id", SPLITS, seed="r5")
           .where(F.col("doc_id").isNotNull())
           .select("doc_id", "split").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", got[["doc_id"]])
    case = split_case_sql("doc_id", SPLITS, seed="r5")
    oracle = con.sql(
        f"SELECT doc_id, {case} AS split FROM docs ORDER BY doc_id"
    ).df()
    assert got.equals(oracle)


def test_hash_sample_is_subset_consistent_and_sized(spark, docs):
    kept = hash_sample(docs, "doc_id", 0.3, seed="z")
    n = kept.count()
    assert n == pytest.approx(5000 * 0.3, rel=0.15)
    assert kept.where(F.col("doc_id").isNull()).count() == 0
    # deterministic subset: sampling at a LARGER fraction with the same
    # seed is a superset (nested samples — grow a corpus sample without
    # reshuffling what's already processed)
    bigger = hash_sample(docs, "doc_id", 0.6, seed="z")
    assert kept.join(bigger, "doc_id", "left_anti").count() == 0


def test_validation(spark, docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="at least two"):
        hash_split(docs, "doc_id", {"a": 1.0})
    with pytest.raises(ValueError, match="not in"):
        hash_sample(docs, "doc_id", 0.0)
    with pytest.raises(ValueError, match="already exists"):
        hash_split(docs.withColumn("split", F.lit("x")), "doc_id", SPLITS)
    with pytest.raises(ValueError, match="hash resolution"):
        hash_split(docs, "doc_id", {"a": 1e-12, "b": 1 - 1e-12})
