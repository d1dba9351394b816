"""Similarity search: brute-force exact top-k vs numpy oracle; LSH
recall on the embeddings test table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.similarity import (
    add_hyperplane_bucket,
    brute_force_top_k,
    lsh_top_k,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _oracle_topk(ids, mat, qvec, k):
    qn = qvec / np.linalg.norm(qvec)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = mn @ qn
    order = np.lexsort((ids, -scores))
    return [(int(ids[j]), float(scores[j])) for j in order[: k + 1]]


def test_brute_force_matches_oracle(spark, emb, emb_np):
    ids, mat = emb_np
    queries = [(int(ids[i]), [float(x) for x in mat[i]]) for i in range(3)]
    got = brute_force_top_k(emb, "embedding", "vec_id", queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["score"], r["rank"]))
    for qid, qvec in queries:
        want = [x for x in _oracle_topk(ids, mat, np.array(qvec), 5) if x[0] != qid][:5]
        have = sorted(by_q[qid], key=lambda x: x[2])
        assert [h[0] for h in have] == [w[0] for w in want], (qid, have, want)
        for h, w in zip(have, want):
            assert abs(h[1] - w[1]) < 1e-9


def test_lsh_recall_on_clustered_vectors(spark):
    """LSH recall is only meaningful when true neighbors are actually
    close (the sf embeddings are near-random: top-10 cosine ≈ 0.2-0.5,
    where no LSH can do well). Plant clusters and measure recall there."""
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((20, 32))
    rows, truth = [], {}
    vid = 0
    for c, center in enumerate(centers):
        members = []
        for _ in range(10):
            v = center + rng.standard_normal(32) * 0.15
            rows.append((vid, [float(x) for x in v]))
            members.append(vid)
            vid += 1
        for m in members:
            truth[m] = set(members) - {m}
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(q, rows[q][1]) for q in (0, 10, 20, 30, 40)]
    approx = lsh_top_k(df, "embedding", "vec_id", queries, k=9, n_planes=10,
                       multiprobe_hamming=2).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(truth[q] & approx_sets.get(q, set())) / len(truth[q]) for q, _ in queries
    ]
    assert np.mean(recalls) >= 0.8, f"mean LSH recall {np.mean(recalls):.2f}"


def test_bucket_distribution(spark, emb):
    b = add_hyperplane_bucket(emb, "embedding", n_planes=8)
    counts = b.groupBy("bucket").count().collect()
    assert len(counts) > 10  # vectors spread across buckets


def _rand_vec_df(spark, n, dim, seed, id_offset=0, id_name="vec_id",
                 vec_name="embedding"):
    import pandas as pd

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(seed * 1000 + pid)
        for pdf in batches:
            ids = pdf["id"].to_numpy() + id_offset
            vecs = rng.standard_normal((len(ids), dim))
            yield pd.DataFrame({id_name: ids, vec_name: list(vecs)})

    return spark.range(0, n, numPartitions=4).mapInPandas(
        gen, f"{id_name} long, {vec_name} array<double>")


def test_brute_force_dataframe_queries_matches_list(spark):
    data = _rand_vec_df(spark, 500, 8, seed=21)
    qrows = data.where(F.col("vec_id") < 5).collect()
    qlist = [(int(r["vec_id"]) + 1000, [float(x) for x in r["embedding"]])
             for r in qrows]
    via_list = brute_force_top_k(data, "embedding", "vec_id", qlist, k=3)
    qdf = spark.createDataFrame(qlist, "query_id long, qvec array<double>")
    via_df = brute_force_top_k(data, "embedding", "vec_id", qdf, k=3)
    assert ([tuple(r) for r in via_list.collect()]
            == [tuple(r) for r in via_df.collect()])


def test_brute_force_dataframe_queries_cap(spark):
    import cuckoo_filter_spark.operators.similarity as sim

    data = _rand_vec_df(spark, 100, 4, seed=22)
    big_q = _rand_vec_df(spark, 200, 4, seed=23, id_name="query_id",
                         vec_name="qvec")
    old = sim.BRUTE_FORCE_MAX_QUERIES
    sim.BRUTE_FORCE_MAX_QUERIES = 100
    try:
        with pytest.raises(ValueError, match="ivf_top_k"):
            brute_force_top_k(data, "embedding", "vec_id", big_q, k=2)
    finally:
        sim.BRUTE_FORCE_MAX_QUERIES = old


def test_ivf_dataframe_queries_100k(spark):
    """The query-TABLE path (VERDICT #7): 10^5 query rows assigned to
    cells inside a pandas UDF, joined on cell — no driver collect of
    queries. Queries that are exact copies of data vectors must find
    their source as top-1 (identical cell assignment, cosine 1)."""
    from cuckoo_filter_spark.operators.similarity import ivf_top_k

    n_data, n_q, dim = 5_000, 100_000, 8
    data = _rand_vec_df(spark, n_data, dim, seed=31)
    # queries: cycle through data vectors, re-keyed
    import pandas as pd

    drows = data.collect()
    vecs = np.array([r["embedding"] for r in drows])
    ids = np.array([r["vec_id"] for r in drows])

    def genq(batches):
        for pdf in batches:
            j = pdf["id"].to_numpy() % n_data
            yield pd.DataFrame({
                "query_id": pdf["id"].to_numpy() + 1_000_000,
                "src_id": ids[j],
                "qvec": list(vecs[j]),
            })

    qdf = spark.range(0, n_q, numPartitions=8).mapInPandas(
        genq, "query_id long, src_id long, qvec array<double>")
    out = ivf_top_k(data, "embedding", "vec_id", qdf.select("query_id", "qvec"),
                    k=1, n_cells=64, nprobe=1)
    top1 = out.where(F.col("rank") == 1).select("query_id", "neighbor_id")
    j = top1.join(qdf.select("query_id", "src_id"), "query_id")
    n_match = j.where(F.col("neighbor_id") == F.col("src_id")).count()
    assert n_match == n_q, f"{n_match}/{n_q} top-1 self-matches"


def test_lsh_dataframe_queries_matches_list(spark):
    from cuckoo_filter_spark.operators.similarity import lsh_top_k

    data = _rand_vec_df(spark, 2_000, 8, seed=41)
    qrows = data.where(F.col("vec_id") < 10).collect()
    qlist = [(int(r["vec_id"]) + 5000, [float(x) for x in r["embedding"]])
             for r in qrows]
    via_list = lsh_top_k(data, "embedding", "vec_id", qlist, k=3,
                         n_planes=10, multiprobe_hamming=1)
    qdf = spark.createDataFrame(qlist, "query_id long, qvec array<double>")
    via_df = lsh_top_k(data, "embedding", "vec_id", qdf, k=3,
                       n_planes=10, multiprobe_hamming=1)
    assert ([tuple(r) for r in via_list.collect()]
            == [tuple(r) for r in via_df.collect()])


def test_zero_norm_vectors_survive_ansi(spark):
    """Spark 4 runs ANSI mode by default: an all-zeros embedding
    (common padding / missing-vector value) in the corpus or as the
    query must not kill ivf/lsh_top_k with DIVIDE_BY_ZERO — it scores
    0.0 (clamped norm) and never outranks a real neighbor."""
    import numpy as np

    from cuckoo_filter_spark.operators.similarity import ivf_top_k, lsh_top_k

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(40)]
    rows.append((99, [0.0] * 8))  # zero vector in the corpus
    df = spark.createDataFrame(rows, "id long, vec array<float>")

    out = ivf_top_k(df, "vec", "id", queries=[(0, rows[0][1])], k=5,
                    n_cells=4, nprobe=4).collect()
    assert len(out) == 5 and all(r["neighbor_id"] != 99 or r["score"] == 0.0
                                 for r in out)
    out = lsh_top_k(df, "vec", "id", queries=[(0, rows[0][1])], k=5,
                    n_planes=4, multiprobe_hamming=4).collect()
    assert len(out) > 0
    # zero vector as the QUERY: every score is exactly 0.0
    outq = ivf_top_k(df, "vec", "id", queries=[(7, [0.0] * 8)], k=3,
                     n_cells=4, nprobe=4).collect()
    assert outq and all(abs(r["score"]) < 1e-9 for r in outq)


def test_brute_force_empty_queries(spark):
    """Zero queries is a legitimate input (a query table that filters to
    nothing) — expect an empty typed result, not a numpy axis error."""
    from cuckoo_filter_spark.operators.similarity import brute_force_top_k

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "id long, vec array<float>")
    out = brute_force_top_k(df, "vec", "id", queries=[])
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    assert out.count() == 0


def test_null_vectors_dropped_all_paths(spark):
    """A NULL embedding (missing vector) in the corpus or the query
    table must be DROPPED, not crash _as_matrix / the dimension probe
    with an opaque numpy error — the same exclusion contract as
    embedding_near_dup_pairs (ADVICE r4). Results must equal the
    null-free corpus' results on every path."""
    from cuckoo_filter_spark.operators.similarity import ivf_top_k

    rng = np.random.default_rng(3)
    base = [(i, rng.standard_normal(8).tolist()) for i in range(60)]
    clean = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    with_nulls = clean.unionByName(spark.createDataFrame(
        [(1000, None), (1001, None)], "vec_id long, embedding array<double>"))
    queries = [(0, base[0][1]), (7, base[7][1])]
    qdf_nulls = spark.createDataFrame(
        queries + [(99, None)], "query_id long, qvec array<double>")

    for fn, kw in [
        (brute_force_top_k, {}),
        (ivf_top_k, {"n_cells": 4, "nprobe": 4}),
        (lsh_top_k, {"n_planes": 6, "multiprobe_hamming": 2}),
    ]:
        want = {(r["query_id"], r["neighbor_id"], r["rank"])
                for r in fn(clean, "embedding", "vec_id", queries,
                            k=3, **kw).collect()}
        got_corpus = {(r["query_id"], r["neighbor_id"], r["rank"])
                      for r in fn(with_nulls, "embedding", "vec_id",
                                  queries, k=3, **kw).collect()}
        assert got_corpus == want, fn.__name__
        got_q = {(r["query_id"], r["neighbor_id"], r["rank"])
                 for r in fn(with_nulls, "embedding", "vec_id",
                             qdf_nulls, k=3, **kw).collect()}
        assert got_q == want, fn.__name__  # null query dropped


def test_metric_validated_and_lsh_empty_queries(spark):
    from cuckoo_filter_spark.operators.similarity import (
        brute_force_top_k,
        lsh_top_k,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="metric"):
        brute_force_top_k(df, "embedding", "vec_id", [(0, [1.0, 0.0])],
                          metric="euclidean")
    assert lsh_top_k(df, "embedding", "vec_id", []).count() == 0


def test_exclude_self_opt_out_in_ivf(spark):
    """Query ids UNRELATED to doc ids: exclude_self=False must keep the
    doc whose id numerically equals the query id."""
    from cuckoo_filter_spark.operators.similarity import ivf_top_k

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>")
    out = ivf_top_k(df, "embedding", "vec_id", [(1, [1.0, 0.0])],
                    k=3, n_cells=1, nprobe=1, exclude_self=False)
    got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert got[0] == 1  # the numerically-colliding doc IS the best match
    out2 = ivf_top_k(df, "embedding", "vec_id", [(1, [1.0, 0.0])],
                     k=3, n_cells=1, nprobe=1)  # default excludes
    assert 1 not in [r["neighbor_id"] for r in out2.collect()]
