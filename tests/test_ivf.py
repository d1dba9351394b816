"""IVF ANN: recall on planted clusters (scale-path index)."""

import numpy as np

from cuckoo_filter_spark.operators.similarity import ivf_top_k


def test_ivf_recall_on_clusters(spark):
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((15, 24))
    rows, truth = [], {}
    vid = 0
    for center in centers:
        members = []
        for _ in range(12):
            v = center + rng.standard_normal(24) * 0.1
            rows.append((vid, [float(x) for x in v]))
            members.append(vid)
            vid += 1
        for m in members:
            truth[m] = set(members) - {m}
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [(q, rows[q][1]) for q in (0, 12, 24, 60, 120)]
    got = ivf_top_k(df, "embedding", "vec_id", queries, k=11,
                    n_cells=15, nprobe=3).collect()
    sets = {}
    for r in got:
        sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(truth[q] & sets.get(q, set())) / len(truth[q]) for q, _ in queries]
    assert np.mean(recalls) >= 0.85, f"IVF recall {np.mean(recalls):.2f}"


def test_ivf_auto_cells_rule():
    """VERDICT r3 #5: n_cells scales ~√n instead of a fixed 64 — at 10⁹
    vectors a fixed 64 left 10⁷-vector cells."""
    from cuckoo_filter_spark.operators.similarity import choose_ivf_cells

    assert choose_ivf_cells(100) == 16            # floor
    assert choose_ivf_cells(1_000_000) == 1000    # √n regime
    assert choose_ivf_cells(10**9) == 4096        # driver-training cap
    assert choose_ivf_cells(10**9, max_cells=65_536) == 31623  # override
    # monotone non-decreasing across the regime boundaries
    prev = 0
    for n in (1, 10**3, 10**5, 10**7, 10**9):
        c = choose_ivf_cells(n)
        assert c >= prev
        prev = c


def test_ivf_auto_sizing_end_to_end(spark):
    """Auto path: n_cells=None picks choose_ivf_cells(n) and results at
    nprobe ≥ n_cells are exhaustive (match brute force)."""
    from cuckoo_filter_spark.operators.similarity import (
        brute_force_top_k,
        build_ivf_index,
        choose_ivf_cells,
        ivf_top_k,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(12)])
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, centers = build_ivf_index(df, "embedding", "vec_id",
                                 approx_count=400)
    assert len(centers) == choose_ivf_cells(400) == 20
    queries = [(q, rows[q][1]) for q in (0, 7, 333)]
    got = ivf_top_k(df, "embedding", "vec_id", queries, k=5,
                    nprobe=10**6, approx_count=400).collect()
    want = brute_force_top_k(df, "embedding", "vec_id", queries,
                             k=5).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in got] == \
        [(r["query_id"], r["neighbor_id"]) for r in want]


def test_ivf_sampling_unbiased_on_cluster_sorted_input(spark):
    """Adversarial order: input sorted by cluster. A limit() sample reads
    only the first partitions (one cluster) and degenerates the
    centroids; the stratified priority sample must cover every cluster."""
    from cuckoo_filter_spark.operators.similarity import _sample_vectors

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 16)) * 5
    rows = []
    vid = 0
    for center in centers:
        for _ in range(1500):
            v = center + rng.standard_normal(16) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df = df.coalesce(4)  # big cluster-contiguous partitions
    sample = _sample_vectors(df, "embedding", 512, seed=11)
    assert 256 <= len(sample) <= 600
    d = ((sample[:, None, :] - np.asarray(centers)[None]) ** 2).sum(axis=2)
    assert len(set(d.argmin(axis=1).tolist())) == 6, "sample missed clusters"
