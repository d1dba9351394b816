"""Spark E2E: distributed build/merge/query (SURVEY.md §5.2)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.build import build_cuckoo_filter
from cuckoo_filter_spark.operators.query import (
    cuckoo_anti_join,
    cuckoo_semi_join,
    might_contain_udf,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_build_filter_membership(spark, docs):
    keys = docs.select(F.concat_ws("/", "source", "doc_id").alias("key"))
    build = build_cuckoo_filter(keys, "key", bits_per_item=16)
    kern = build.kernel()
    n = keys.count()
    assert kern.size() == n
    # no false negatives via Spark-side predicate
    mc = might_contain_udf(spark, build)
    hits = keys.where(mc(F.col("key"))).count()
    assert hits == n
    # lineage metrics present
    assert sum(m["rows"] for m in build.metrics) == n
    assert all(not m["victim_used"] for m in build.metrics)


def test_build_partitioning_invariance(spark, docs):
    """local build with 2 vs 8 partitions → identical membership answers."""
    keys = docs.select(F.concat_ws("/", "source", "doc_id").alias("key"))
    n = keys.count()
    b2 = build_cuckoo_filter(keys, "key", capacity=n, num_partitions=2)
    b8 = build_cuckoo_filter(keys, "key", capacity=n, num_partitions=8)
    k2, k8 = b2.kernel(), b8.kernel()
    assert k2.size() == k8.size() == n
    probes = [f"src{i}/{i*17}" for i in range(5000)]
    assert np.array_equal(k2.contain(probes), k8.contain(probes))


def test_build_unique_dedup(spark):
    pdf = spark.createDataFrame(
        [(f"url{i % 100}",) for i in range(1000)], "url string"
    )
    build = build_cuckoo_filter(pdf, "url", capacity=200, mode="unique_global")
    assert build.kernel().size() == 100
    assert sum(m["stored"] for m in build.metrics) == 100


def test_cuckoo_semi_join_exact_matches_spark_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 100000)
    got = cuckoo_semi_join(li, "l_orderkey", orders, "o_orderkey").orderBy(
        "l_orderkey", "l_linenumber"
    )
    want = li.join(
        orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_semi"
    ).orderBy("l_orderkey", "l_linenumber")
    assert got.collect() == want.collect()


def test_cuckoo_anti_join_exact_matches_spark_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").where(F.col("o_totalprice") > 100000)
    got = cuckoo_anti_join(li, "l_orderkey", orders, "o_orderkey")
    want = li.join(
        orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_anti"
    )
    assert got.count() == want.count()
    assert (
        got.orderBy("l_orderkey", "l_linenumber").collect()
        == want.orderBy("l_orderkey", "l_linenumber").collect()
    )


def test_semi_join_approximate_superset(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet").limit(100)
    approx = cuckoo_semi_join(li, "l_orderkey", orders, "o_orderkey", exact=False)
    exact = cuckoo_semi_join(li, "l_orderkey", orders, "o_orderkey", exact=True)
    a, e = approx.count(), exact.count()
    assert a >= e
    # f=16 → FP ~0.012%, superset should be tight
    assert a <= e * 1.01 + 10


def test_register_might_contain_sql(spark, docs):
    from cuckoo_filter_spark.operators.query import register_might_contain

    keys = docs.select(F.concat_ws("/", "source", "doc_id").alias("key"))
    build = build_cuckoo_filter(keys, "key")
    register_might_contain(spark, "cf_contains", build)
    keys.createOrReplaceTempView("keys_v")
    n = spark.sql("SELECT count(*) AS n FROM keys_v WHERE cf_contains(key)").collect()[0]["n"]
    assert n == keys.count()
    miss = spark.sql(
        "SELECT count(*) AS n FROM keys_v WHERE cf_contains(concat(key, '-absent'))"
    ).collect()[0]["n"]
    assert miss <= keys.count() * 0.01


def test_auto_shard_declared_capacity(spark):
    """A declared capacity above the threshold routes to the sharded
    build (no 8 B/key driver collect); probes and semi joins behave
    identically through the dispatching might_contain_udf."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import (
        cuckoo_semi_join,
        might_contain_udf,
    )
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    df = spark.range(20_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    build = build_cuckoo_filter(df, "key", capacity=20_000, auto_shard=5_000)
    assert isinstance(build, ShardedCuckooBuild)
    mc = might_contain_udf(spark, build)
    assert df.where(mc(F.col("key"))).count() == 20_000
    # end-to-end through the semi join with the router engaged
    probe = spark.range(40_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"))
    out = cuckoo_semi_join(probe, "key", df, "key", capacity=20_000,
                           auto_shard=5_000)
    assert out.count() == 20_000


def test_auto_shard_deferred_observed_count(spark):
    """With no capacity hint, the deferred-sizing path observes the key
    count from the partial metrics and re-shuffles the hash partials by
    shard — no second scan, driver never pulls pair blobs."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    df = spark.range(20_000).select(
        F.concat(F.lit("d"), F.col("id")).alias("key"))
    build = build_cuckoo_filter(df, "key", auto_shard=5_000)
    assert isinstance(build, ShardedCuckooBuild)
    # stored is fingerprint-deduped: a handful of canon-space collisions
    # below the raw key count is expected (membership is unaffected)
    assert 19_950 <= sum(m["stored"] for m in build.metrics) <= 20_000
    members = [r["key"] for r in df.collect()]
    assert build.contain(members).all()
    # below the threshold the classic single-blob build is returned
    small = df.limit(1000)
    b2 = build_cuckoo_filter(small, "key", auto_shard=5_000)
    assert not isinstance(b2, ShardedCuckooBuild)


def test_count_distinct_exact_no_blob_collect(spark, monkeypatch):
    """VERDICT r3 #1: the count-only path must never move pair blobs —
    exactly ONE driver collect, of ONE aggregated row, with no binary
    column anywhere in the collected schema."""
    from cuckoo_filter_spark.operators.build import count_distinct_exact

    df = spark.range(30_000).select(
        (F.col("id") % 7_001).cast("string").alias("key"))
    # null keys are excluded (COUNT(DISTINCT) semantics)
    df = df.unionAll(spark.sql("SELECT CAST(NULL AS STRING) AS key"))

    collected = []
    cls = type(df)  # the CONCRETE DataFrame class (pyspark.sql.classic),
    # not the abstract pyspark.sql.DataFrame — instances resolve collect
    # on their own class, so patching the base would spy on nothing
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        collected.append((len(rows), self.schema.simpleString()))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    n = count_distinct_exact(df, "key")
    assert n == 7_001
    assert len(collected) == 1, collected
    nrows, schema = collected[0]
    assert nrows == 1 and "binary" not in schema, collected


def test_auto_shard_respects_exclusions(spark):
    """explicit params / table partials never route."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    df = spark.range(12_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("key"))
    b = build_cuckoo_filter(df, "key", capacity=12_000,
                            partial_format="table", auto_shard=5_000)
    assert not isinstance(b, ShardedCuckooBuild)


def test_auto_shard_unique_global_routes(spark):
    """VERDICT r3 #1: unique_global now auto-shards like the other
    modes; the routed build keeps the EXACT raw-key distinct count
    (repartition(key) co-location + shard shuffle compose). Covers both
    routes: deferred-observed (no capacity) and declared capacity."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    # 24k rows, 8k distinct (each key 3x) — duplicates must not inflate
    df = spark.range(24_000).select(
        F.concat(F.lit("u"), (F.col("id") % 8_000)).alias("key"))

    # deferred-observed route (est = post-dedupe hash count = 8k > 5k)
    b = build_cuckoo_filter(df, "key", mode="unique_global", auto_shard=5_000)
    assert isinstance(b, ShardedCuckooBuild)
    assert b.distinct_keys == 8_000
    probe = b.contain(pd.Series([f"u{i}" for i in range(0, 8_000, 97)]))
    assert probe.all()  # no false negatives through the routed build

    # declared-capacity route: per-shard metrics carry exact counts
    b2 = build_cuckoo_filter(df, "key", mode="unique_global",
                             capacity=24_000, auto_shard=5_000)
    assert isinstance(b2, ShardedCuckooBuild)
    assert b2.distinct_keys == 8_000
    per_shard = [m["distinct_keys"] for m in b2.metrics]
    assert all(dk is not None for dk in per_shard) and sum(per_shard) == 8_000


def test_distinct_accum_nan_null_and_amortized():
    """NaN/None keys collapse (COUNT(DISTINCT) semantics) and the
    consolidation threshold grows with the base (amortized-linear)."""
    import numpy as np
    import pandas as pd

    from cuckoo_filter_spark.operators.build import DistinctAccum

    acc = DistinctAccum()
    acc.add(pd.Series([1.0, float("nan"), 2.0]))
    acc.add(pd.Series([float("nan"), 2.0, 3.0, None]))
    assert len(acc) == 3  # nulls/NaN dropped, not one-per-batch
    # amortized growth: after consolidation the next trigger needs a
    # buffer at least as large as the base
    consolidations = 0

    class Counting(DistinctAccum):
        _CONSOLIDATE_AT = 10

        def _consolidate(self):
            nonlocal consolidations
            if len(self._parts) > 1 or self._pending:
                consolidations += 1
            super()._consolidate()

    acc2 = Counting()
    for i in range(100):
        acc2.add(pd.Series(np.arange(i * 5, i * 5 + 5)))
    assert len(acc2) == 500
    assert consolidations < 15  # fixed threshold would consolidate ~98x


def test_register_might_contain_sharded(spark):
    """SQL registration works for a routed ShardedCuckooBuild."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import register_might_contain
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    df = spark.range(8_000).select(
        F.concat(F.lit("r"), F.col("id")).alias("key"))
    build = build_cuckoo_filter(df, "key", capacity=8_000, auto_shard=1_000)
    assert isinstance(build, ShardedCuckooBuild)
    df.createOrReplaceTempView("reg_keys")
    register_might_contain(spark, "cf_sharded", build)
    n = spark.sql("SELECT count(*) AS n FROM reg_keys "
                  "WHERE cf_sharded(key)").collect()[0]["n"]
    assert n == 8_000


def test_auto_shard_xxhash64_both_routes(spark):
    """The router composes with the JVM-hash fast path: declared
    capacity routes before the xxhash projection (sharded build hashes
    itself), and the deferred path re-shuffles PREHASHED partials; the
    dispatching probe answers with zero false negatives either way."""
    from pyspark.sql import functions as F

    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import might_contain_udf
    from cuckoo_filter_spark.operators.sharded import ShardedCuckooBuild

    df = spark.range(20_000).select(
        F.concat(F.lit("xx"), F.col("id")).alias("key"))
    for kwargs in ({"capacity": 20_000}, {}):  # declared / deferred
        build = build_cuckoo_filter(df, "key", auto_shard=5_000,
                                    hash_fn="xxhash64", **kwargs)
        assert isinstance(build, ShardedCuckooBuild)
        assert build.hash_fn == "xxhash64"
        mc = might_contain_udf(spark, build)
        assert df.where(mc(F.col("key"))).count() == 20_000
        absent = spark.range(5_000).select(
            F.concat(F.lit("absent"), F.col("id")).alias("key"))
        assert absent.where(mc(F.col("key"))).count() <= 50


def test_count_distinct_partition_default_scales(spark):
    """VERDICT r4 #3: the auto partition count must grow with the
    declared input size so no in-memory DistinctAccum exceeds
    ~KEYS_PER_COUNT_PARTITION raw keys (defaultParallelism partitions
    at 10^12 keys would hold ~10^10 keys each -> executor OOM)."""
    from cuckoo_filter_spark.operators.build import (
        KEYS_PER_COUNT_PARTITION,
        choose_count_partitions,
        count_distinct_exact,
    )

    # small / undeclared inputs keep the session default
    assert choose_count_partitions(32, None) == 32
    assert choose_count_partitions(32, 1_000_000) == 32
    # large declared inputs scale: ceil(est / per-partition budget)
    assert choose_count_partitions(32, 10**9) == -(-10**9 // KEYS_PER_COUNT_PARTITION)
    assert choose_count_partitions(32, 10**12) == 50_000
    assert choose_count_partitions(32, 10**12 + 1) == 50_001
    # the declared size changes partitioning, never the answer
    df = spark.range(9_000).select(
        (F.col("id") % 1_234).cast("string").alias("key"))
    assert count_distinct_exact(df, "key", est_rows=10**9) == 1_234


def test_nullable_bigint_keys_end_to_end(spark):
    """metro64 build over a nullable bigint key: no crash, no phantom
    '' member, NULL probe keys answer False, and the exact anti join
    returns the SQL-correct complement (the int/float fingerprint split
    used to create false negatives here)."""
    from cuckoo_filter_spark.operators.build import build_cuckoo_filter
    from cuckoo_filter_spark.operators.query import (
        cuckoo_anti_join,
        might_contain_udf,
    )

    seen = spark.createDataFrame(
        [(i,) for i in range(500)] + [(None,)], "k long")
    probe = spark.createDataFrame(
        [(i,) for i in range(400, 900)] + [(None,), (None,)], "k long")
    build = build_cuckoo_filter(seen, "k")
    assert build.metrics  # built without ValueError('null keys...')
    mc = might_contain_udf(spark, build)
    flags = {r["k"]: r["f"] for r in
             probe.select("k", mc(F.col("k")).alias("f")).collect()}
    assert flags[None] is False          # NULL probes answer False
    assert all(flags[i] for i in range(400, 500))  # no false negatives
    out = cuckoo_anti_join(probe, "k", seen, "k")
    got = sorted((r["k"] is None, r["k"]) for r in out.collect())
    # SQL NOT-IN-style complement here: rows 500..899 plus the NULL rows
    # (NULL is never a member; the exact left_anti keeps null-key rows)
    want = sorted([(False, i) for i in range(500, 900)]
                  + [(True, None), (True, None)])
    assert got == want
