"""Scale-sensitivity regression tests at sf0.1: both round-1 scale bugs
(multiset delete vs fingerprint collisions at 150k keys; minhash
candidate explosion on 5000 near-dup-rich docs) only manifested here."""

import duckdb
import pytest

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", ["delete_workload", "cuckoo_semi_join",
                                  "near_dup_pairs", "sharded_semi_join",
                                  "distinct_users", "grouped_lang_distinct",
                                  "grouped_incremental_dedup",
                                  "near_dup_clusters", "content_hash_dedup",
                                  "streaming_window_counts",
                                  "streaming_dedup_users"])
def test_scale_sensitive_queries_at_sf01(name, spark, duck01):
    df = em.queries()[name](spark, SF_DIR)
    got = sorted(tuple(r) for r in df.collect())
    res = duck01.execute(em.oracle_sql()[name])
    want = sorted(tuple(r) for r in res.fetchall())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) or isinstance(wv, float):
                assert abs(float(gv) - float(wv)) < 1e-6 * max(abs(float(wv)), 1.0)
            else:
                assert gv == wv, (name, g, w)
