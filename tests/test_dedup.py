"""Dedup suite: minhash-LSH, simhash, exact jaccard, content-hash dedup,
embedding near-dup — verified against brute-force oracles on a synthetic
dup-rich corpus."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.dedup import (
    batch_shingle_hashes,
    dedup_by_content_hash,
    dedup_exact,
    minhash_near_dup_pairs,
    minhash_signatures,
    simhash_near_dup_pairs,
    simhash_signatures,
)

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
         "xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def _corpus(rng, n_base=40, n_words=60):
    """Base docs + exact dups + near dups (few-word edits) + unrelated."""
    docs = {}
    for i in range(n_base):
        docs[i] = " ".join(rng.choice(WORDS, size=n_words))
    # exact dups: 100+i duplicates i for i < 10
    for i in range(10):
        docs[100 + i] = docs[i]
    # near dups: 200+i = doc i with 3 words changed
    for i in range(10, 20):
        words = docs[i].split()
        for j in range(3):
            words[int(rng.integers(0, len(words)))] = "REPL" + str(j)
        docs[200 + i] = " ".join(words)
    return docs


@pytest.fixture(scope="module")
def corpus():
    return _corpus(np.random.default_rng(11))


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )


def _true_jaccard(a: str, b: str, k=5):
    ha, offa = batch_shingle_hashes(pd.Series([a]), k)
    hb, offb = batch_shingle_hashes(pd.Series([b]), k)
    sa, sb = set(ha.tolist()), set(hb.tolist())
    return len(sa & sb) / max(len(sa | sb), 1)


def test_shingles_match_naive():
    """Windowing semantics (offsets; equal windows → equal hashes across
    docs and positions; distinct windows don't collide here). The hash
    itself is the internal rolling poly+fmix — not a parity surface."""
    texts = pd.Series(["hello world", "abc", "", "aaaaa", "xxabczz"])
    hashes, off = batch_shingle_hashes(texts, k=3)
    assert np.diff(off).tolist() == [9, 1, 0, 3, 5]
    by_window: dict = {}
    for i, t in enumerate(texts):
        b = t.encode()
        got = hashes[off[i]: off[i + 1]].tolist()
        for j, h in enumerate(got):
            w = bytes(b[j: j + 3])
            assert by_window.setdefault(w, h) == h, (i, w)
    # 'abc' hashes identically standalone and embedded in 'xxabczz'
    assert len(by_window) == len(set(by_window.values())), "collision"
    # 'aaaaa' → one distinct window value repeated 3×
    assert len(set(hashes[off[3]: off[4]].tolist())) == 1


def test_minhash_signature_similarity_tracks_jaccard(corpus):
    texts = pd.Series([corpus[10], corpus[210], corpus[0]])
    sig = minhash_signatures(texts, n_perms=128)
    sim_near = (sig[0] == sig[1]).mean()
    sim_far = (sig[0] == sig[2]).mean()
    true_near = _true_jaccard(corpus[10], corpus[210])
    true_far = _true_jaccard(corpus[10], corpus[0])
    assert abs(sim_near - true_near) < 0.15
    assert abs(sim_far - true_far) < 0.15
    assert sim_near > sim_far


def test_minhash_lsh_finds_dups(spark, corpus_df, corpus):
    pairs = minhash_near_dup_pairs(
        corpus_df, "text", "doc_id", threshold=0.5, n_perms=64, bands=16
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # every exact dup pair must be found with jaccard 1.0
    for i in range(10):
        assert (i, 100 + i) in found, f"missed exact dup {i}"
    # near dups (3 edits in 60 words → jaccard well above 0.5)
    near_expected = {(i, 200 + i) for i in range(10, 20)
                     if _true_jaccard(corpus[i], corpus[200 + i]) >= 0.55}
    missed = near_expected - found
    assert len(missed) <= 1, f"missed near dups {missed}"
    # no false pairs between unrelated base docs
    for a, b in found:
        if a < 40 and b < 40:
            assert _true_jaccard(corpus[a], corpus[b]) >= 0.5


def test_simhash_near_dups(spark, corpus_df, corpus):
    sigs = simhash_signatures(pd.Series([corpus[0], corpus[100], corpus[1]]))
    assert sigs[0] == sigs[1]  # identical docs → identical simhash
    assert sigs[0] != sigs[2]
    pairs = simhash_near_dup_pairs(corpus_df, "text", "doc_id", max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(10):
        assert (i, 100 + i) in found
    for r in pairs:
        assert r["hamming"] <= 3


def test_dedup_exact_and_content_hash(spark, corpus_df, corpus):
    n_unique_texts = len(set(corpus.values()))
    assert dedup_exact(corpus_df, ["text"]).count() == n_unique_texts
    deduped = dedup_by_content_hash(corpus_df, "text", keep="min")
    assert deduped.count() == n_unique_texts
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    for i in range(10):
        assert i in kept and (100 + i) not in kept  # min-id representative


def test_embedding_near_dup(spark, rng):
    from cuckoo_filter_spark.operators.dedup import embedding_near_dup_pairs

    local = np.random.default_rng(3)
    base = local.standard_normal((30, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # near-dups: 100+i = tiny perturbation of i for i<5
    for i in range(5):
        v = base[i] + local.standard_normal(16) * 0.01
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.99,
                                     n_planes=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    hit = sum((i, 100 + i) in found for i in range(5))
    assert hit >= 4, f"LSH recall too low: {found}"
    for r in pairs:
        assert r["cosine"] >= 0.99


def test_embedding_near_dup_empty_input(spark):
    """ADVICE r3: empty corpus must return an empty typed frame, not
    die with a TypeError from first() returning None."""
    from cuckoo_filter_spark.operators.dedup import embedding_near_dup_pairs

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(df, "embedding", "vec_id",
                                     threshold=0.95, approx_count=0)
    assert pairs.count() == 0
    assert [f.name for f in pairs.schema.fields] == ["id_a", "id_b", "cosine"]
    assert pairs.schema["id_a"].dataType.simpleString() == "bigint"


def test_connected_components_chain(spark):
    from cuckoo_filter_spark.operators.dedup import (
        collapse_near_dup_clusters,
        connected_components,
    )

    # chain 1-2-3-4, pair (10,11), singleton edge-less docs absent from pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in collapse_near_dup_clusters(docs, pairs).collect()}
    assert kept == {1, 10, 99}


def test_connected_components_long_chain(spark):
    """A 300-hop dup chain: plain min-label needs 300 rounds; pointer
    jumping must close it within the default max_iters=12 (~log2 n)."""
    from cuckoo_filter_spark.operators.dedup import connected_components

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    comp = connected_components(pairs)
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_connected_components_truncation_raises(spark):
    from cuckoo_filter_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)


def test_content_hash_dedup_verify_restores_collisions(spark, monkeypatch):
    """Fingerprint collisions must never silently merge distinct texts:
    force every row onto ONE fingerprint and check the byte-verify pass
    restores exactly one representative per distinct text."""
    import cuckoo_filter_spark.functions.text as textmod
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def const_fp(texts: pd.Series) -> pd.Series:
        return pd.Series([42] * len(texts), dtype="int64")

    monkeypatch.setattr(textmod, "doc_fingerprint_udf", lambda: const_fp)
    from cuckoo_filter_spark.operators.dedup import dedup_by_content_hash

    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "bb"), (4, "bb"), (5, "cc")],
        "doc_id long, text string")
    kept = dedup_by_content_hash(df, "text", keep="min")
    got = sorted((r["doc_id"], r["text"]) for r in kept.collect())
    assert got == [(1, "aa"), (3, "bb"), (5, "cc")]
    # unverified mode shows why the verify pass exists
    merged = dedup_by_content_hash(df, "text", keep="min", verify=False)
    assert merged.count() == 1


def test_choose_embedding_lsh_scales_with_n():
    """Auto-sizing must grow planes with log2(n) so mean bucket size
    stays bounded (a fixed plane count goes quadratic at 10^9)."""
    from cuckoo_filter_spark.operators.dedup import choose_embedding_lsh

    for n in (10_000, 10**6, 10**9, 10**12):
        p, t = choose_embedding_lsh(n, 0.95)
        assert 8 <= p <= 32 and 1 <= t <= 16
        if p < 32:  # below the clamp the mean bucket is bounded
            assert n / (1 << p) <= 64 + 1e-9, (n, p)
    p6, _ = choose_embedding_lsh(10**6, 0.95)
    p12, _ = choose_embedding_lsh(10**12, 0.95)
    assert p12 > p6
    # near-exact threshold: identical vectors collide in every table
    p, t = choose_embedding_lsh(10**6, 0.999)
    assert p >= 14


def test_embedding_near_dup_million_planted(spark):
    """Planted-cluster recall at 10^6 vectors with bounded candidate
    volume: 100 planted near-identical pairs (cosine >= 0.9999) among
    10^6 random dim-16 vectors must all surface, and the verified
    output must contain nothing else (random dim-16 pairs never reach
    cosine 0.999)."""
    import pandas as pd

    from cuckoo_filter_spark.operators.dedup import embedding_near_dup_pairs

    n, dim, planted = 1_000_000, 16, 100

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.default_rng(1000 + pid)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = rng.standard_normal((len(ids), dim))
            out_ids = [ids]
            out_vecs = [vecs]
            low = ids < planted
            if low.any():
                pert = vecs[low] + rng.standard_normal(
                    (int(low.sum()), dim)) * 1e-3
                out_ids.append(ids[low] + 10_000_000)
                out_vecs.append(pert)
            yield pd.DataFrame({
                "vec_id": np.concatenate(out_ids),
                "embedding": list(np.concatenate(out_vecs)),
            })

    base = spark.range(0, n, numPartitions=8)
    df = base.mapInPandas(gen, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(
        df, "embedding", "vec_id", threshold=0.999,
        n_planes=20, n_tables=4, approx_count=n + planted,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted_found = sum((i, i + 10_000_000) in found for i in range(planted))
    assert planted_found == planted, f"recall {planted_found}/{planted}"
    assert len(found) == planted, f"unexpected extra pairs: {len(found)}"


def test_embedding_near_dup_bucket_cap_warns(spark):
    """A hot bucket (many identical vectors) past bucket_cap drops
    memberships VISIBLY (warnings.warn), never silently."""
    import warnings

    from cuckoo_filter_spark.operators.dedup import embedding_near_dup_pairs

    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(50)]
    rows += [(100 + i, [float(x) for x in np.random.default_rng(5).standard_normal(4)])
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pairs = embedding_near_dup_pairs(
            df, "embedding", "vec_id", threshold=0.99,
            n_planes=8, n_tables=2, bucket_cap=5).collect()
        assert any("bucket_cap" in str(x.message) for x in w)
    # capped: only pairs among the 5 survivors per (table, bucket)
    assert 0 < len(pairs) <= 2 * 10  # << C(50,2)


def test_embedding_dedup_null_first_row_not_empty(spark):
    """ADVICE r4: a null vector in row 1 must not make a populated
    corpus read as empty (silent zero pairs); null-vector rows simply
    can't pair."""
    from cuckoo_filter_spark.operators.dedup import embedding_near_dup_pairs

    vecs = [[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    rows = [(0, None)] + [(i + 1, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id bigint, vec array<double>").coalesce(1)
    pairs = embedding_near_dup_pairs(df, "vec", "id", threshold=0.99,
                                     n_planes=4, n_tables=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(0 in p for p in got)
    # genuinely empty (all nulls) still returns a typed empty frame
    empty = spark.createDataFrame([(0, None), (1, None)],
                                  "id bigint, vec array<double>")
    assert embedding_near_dup_pairs(empty, "vec", "id", threshold=0.99,
                                    n_planes=4, n_tables=4).count() == 0


def test_zero_shingle_docs_excluded_from_near_dup(spark):
    """Texts shorter than k bytes have no shingle support: they must not
    pair with each other (previously ALL short docs shared every band /
    every simhash block — jaccard 1.0 for texts sharing nothing, and
    O(m^2) candidate pairs at corpus scale). Byte-identical short docs
    are exact-dedup's job, not LSH's."""
    from cuckoo_filter_spark.operators.dedup import (
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )

    long_a = "the quick brown fox jumps over the lazy dog " * 5
    rows = ([(0, "abc"), (1, "xyz"), (2, ""), (3, None)]
            + [(10 + i, "") for i in range(20)]          # empty flood
            + [(100, long_a), (101, long_a)])            # real dup pair
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = minhash_near_dup_pairs(df, "text", "doc_id", threshold=0.8).collect()
    assert {(r["id_a"], r["id_b"]) for r in mh} == {(100, 101)}
    sh = simhash_near_dup_pairs(df, "text", "doc_id", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in sh} == {(100, 101)}


def test_content_hash_null_vs_empty_not_merged(spark):
    """doc_fingerprint fillna('')s, so NULL text shares ''\'s
    fingerprint BY CONSTRUCTION — the verify step must restore the
    NULL-text row (plain != evaluated NULL and silently merged it)."""
    from cuckoo_filter_spark.operators.dedup import dedup_by_content_hash

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x"), (4, "x")],
        "doc_id long, text string")
    kept = {r["doc_id"] for r in
            dedup_by_content_hash(df, "text", id_col="doc_id").collect()}
    assert kept == {1, 2, 3}  # NULL-text row survives; x deduped


def test_content_hash_keep_validated(spark):
    from cuckoo_filter_spark.operators.dedup import dedup_by_content_hash

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="keep must be"):
        dedup_by_content_hash(df, "text", keep="first", id_col="doc_id")


def test_simhash_max_hamming_zero(spark):
    """max_hamming=0 => one 64-bit block; the (1<<64)-1 mask literal
    overflowed LongType before."""
    from cuckoo_filter_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different text about something else entirely")],
        "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in simhash_near_dup_pairs(
        df, "text", "doc_id", max_hamming=0).collect()}
    assert (1, 2) in pairs


def test_minhash_string_ids(spark):
    from cuckoo_filter_spark.operators.dedup import minhash_near_dup_pairs

    df = spark.createDataFrame(
        [("u1", "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
         ("u2", "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
         ("u3", "totally unrelated words here and there everywhere")],
        "url string, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_near_dup_pairs(
        df, "text", "url", threshold=0.9).collect()}
    assert ("u1", "u2") in pairs
