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
    sample_expr,
    split_case_sql,
    stratified_sample_expr,
    weighted_sample_expr,
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


def test_stratified_matches_per_stratum_hash_sample(spark, docs):
    """Each stratum's kept set is EXACTLY hash_sample at that stratum's
    fraction (same key hash, same seed) — the consistency property that
    makes mixtures composable with plain samples. Unknown strata follow
    default_fraction."""
    strat = docs.withColumn(
        "src", F.when(F.col("doc_id") % 3 == 0, "a")
        .when(F.col("doc_id") % 3 == 1, "b").otherwise("c"))
    fracs = {"a": 0.2, "b": 0.7}
    kept = strat.where(stratified_sample_expr(
        "doc_id", "src", fracs, seed="m"))
    assert kept.where(F.col("src") == "c").count() == 0  # default 0
    for s, f in fracs.items():
        got = sorted(r["doc_id"] for r in
                     kept.where(F.col("src") == s).collect())
        want = sorted(r["doc_id"] for r in hash_sample(
            strat.where(F.col("src") == s), "doc_id", f, seed="m")
            .collect())
        assert got == want and len(got) > 0
    # default_fraction routes unknown strata through the same rule
    kept_d = strat.where(stratified_sample_expr(
        "doc_id", "src", fracs, seed="m", default_fraction=1.0))
    assert (kept_d.where(F.col("src") == "c").count()
            == strat.where((F.col("src") == "c")
                           & F.col("doc_id").isNotNull()).count())


def test_weighted_constant_equals_sample_expr_and_edges(spark, docs):
    """A constant fraction column reproduces sample_expr exactly;
    fraction >=1 keeps every non-NULL key, <=0 and NULL keep nothing;
    raising a row's fraction never evicts it (nested in the fraction)."""
    w = docs.withColumn("frac", F.lit(0.3))
    a = sorted(r["doc_id"] for r in w.where(
        weighted_sample_expr("doc_id", "frac", seed="z")).collect())
    b = sorted(r["doc_id"] for r in w.where(
        sample_expr("doc_id", 0.3, seed="z")).collect())
    assert a == b and 0 < len(a) < 5000
    edges = docs.withColumn(
        "frac", F.when(F.col("doc_id") % 4 == 0, F.lit(1.5))
        .when(F.col("doc_id") % 4 == 1, F.lit(0.0))
        .when(F.col("doc_id") % 4 == 2, F.lit(None).cast("double"))
        .otherwise(F.lit(0.5)))
    kept = edges.where(weighted_sample_expr("doc_id", "frac"))
    got = {r["doc_id"] % 4 for r in kept.collect()}
    assert 0 in got and 1 not in got and 2 not in got
    assert kept.where(F.col("doc_id") % 4 == 0).count() == 1250  # all
    # monotone: kept at frac stays kept at 2*frac
    low = docs.withColumn("frac", F.lit(0.2))
    high = docs.withColumn("frac", F.lit(0.4))
    kl = low.where(weighted_sample_expr("doc_id", "frac", seed="w"))
    kh = high.where(weighted_sample_expr("doc_id", "frac", seed="w"))
    assert kl.join(kh, "doc_id", "left_anti").count() == 0


def test_weighted_duckdb_parity(spark, docs):
    """The weighted boundary (lpad(hex(floor(frac*2^32)),8,'0')) is
    engine-portable: DuckDB's printf('%08x', ...) recomputes the exact
    keep decision for a data-derived fraction column."""
    w = (docs.where(F.col("doc_id").isNotNull())
         .withColumn("frac", (F.col("doc_id") % 100) / 100.0))
    got = (w.withColumn("keep", weighted_sample_expr("doc_id", "frac",
                                                     seed="q"))
           .select("doc_id", "keep").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("w", got[["doc_id"]])
    oracle = con.sql("""
        SELECT doc_id,
          CASE WHEN frac >= 1.0 THEN doc_id IS NOT NULL
               WHEN frac <= 0.0 THEN FALSE
               ELSE substr(md5(CAST(doc_id AS VARCHAR) || 'q'), 1, 8)
                    < printf('%08x', CAST(floor(frac * 4294967296.0) AS BIGINT))
          END AS keep
        FROM (SELECT doc_id, (doc_id % 100) / 100.0 AS frac FROM w)
        ORDER BY doc_id
    """).df()
    assert got.equals(oracle)


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
    with pytest.raises(ValueError, match="not in"):
        stratified_sample_expr("doc_id", "src", {"a": 0.0})
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_sample_expr("doc_id", "src", {"a": 0.5},
                               default_fraction=1.5)


def test_split_case_sql_runs_in_spark_sql(spark, docs):
    """The emitted CASE's portability contract is BOTH engines: it must
    evaluate in Spark SQL (bare VARCHAR used to fail DATATYPE_MISSING_
    SIZE) and reproduce hash_split row-for-row."""
    docs.createOrReplaceTempView("t_split_sql")
    case = split_case_sql("doc_id", SPLITS, seed="r5")
    got = {r["doc_id"]: r["s"] for r in spark.sql(
        f"SELECT doc_id, {case} AS s FROM t_split_sql").collect()}
    want = {r["doc_id"]: r["split"] for r in
            hash_split(docs, "doc_id", SPLITS, seed="r5").collect()}
    assert got == want


def test_saturated_cumulative_fraction_clamped(spark):
    """A cumulative fraction hitting 1.0 before the last split used to
    emit the 9-hex boundary '100000000', which string-compares BELOW
    most 8-char hashes — ~15/16 of keys landed in a split requested at
    3e-10."""
    from cuckoo_filter_spark.operators.sampling import split_boundaries

    assert split_boundaries([1.0, 3e-10]) == ["ffffffff"]
    df = spark.range(2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 1.0, "val": 3e-10}, seed="x")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("train", 0) >= 1999  # val keeps at most the
    # single 'ffffffff' hash sliver
