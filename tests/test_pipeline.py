"""Composite curation pipeline: stagewise behavior on a corpus with
planted junk, off-language docs, exact dups, and near dups."""

import numpy as np
import pytest

from cuckoo_filter_spark.operators.pipeline import curate_corpus

WORDS = ("the and for with this that from can would there their will about "
         "more other time people alpha beta gamma delta epsilon zeta").split()


@pytest.fixture(scope="module")
def corpus_df(spark):
    rng = np.random.default_rng(4)
    rows = []
    # 30 good english-ish docs
    for i in range(30):
        rows.append((i, " ".join(rng.choice(WORDS, size=80))))
    # junk: too short / pure punctuation
    rows.append((100, "x"))
    rows.append((101, "!!! ??? *** ###"))
    # exact dup of doc 0
    rows.append((200, rows[0][1]))
    # near dup of doc 1 (2 words changed)
    words = rows[1][1].split()
    words[3], words[10] = "changed", "words"
    rows.append((201, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages(spark, corpus_df):
    res = curate_corpus(corpus_df, min_quality=0.3, near_dup_threshold=0.8)
    s = res.stats
    assert s["input"] == 34
    assert s["after_quality"] <= 32  # junk dropped
    assert s["after_lang"] <= s["after_quality"]
    assert s["after_exact_dedup"] == s["after_lang"] - 1  # doc 200 collapsed
    assert s["after_near_dedup"] == s["after_exact_dedup"] - 1  # doc 201 removed
    kept = {r["doc_id"] for r in res.df.select("doc_id").collect()}
    assert 0 in kept and 200 not in kept
    assert 1 in kept and 201 not in kept
    assert 100 not in kept and 101 not in kept
