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
