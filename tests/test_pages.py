"""Synthetic pages source: determinism + byte-identical html↔text
inversion (FIXTURES.md F1, input_hint invariant)."""

import pandas as pd
import pytest

from cuckoo_filter_spark.sources.pages import (
    _gen_batch,
    extract_text,
    extract_text_series,
    synth_pages,
    wrap_html,
)

import numpy as np


def test_wrap_extract_inversion_basic():
    for text in ["", "hello world", "a\nb\nc", "x & y < z > w", "&amp; already",
                 "tag <p> inside", "trailing space \n next"]:
        html = wrap_html("host0.example.com", text)
        assert extract_text(html) == text


def test_gen_batch_deterministic_and_invertible():
    rows = np.arange(0, 500, dtype=np.int64)
    a = _gen_batch(rows, 100, 0.1, 42)
    b = _gen_batch(rows, 100, 0.1, 42)
    pd.testing.assert_frame_equal(a, b)
    # partition-split invariance: generating [0,250) and [250,500) separately
    c = pd.concat(
        [_gen_batch(rows[:250], 100, 0.1, 42), _gen_batch(rows[250:], 100, 0.1, 42)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(a, c)
    # inversion invariant, byte-identical
    got = extract_text_series(a["html"])
    assert (got == a["text"]).all()
    # some rows should be empty text, some multi-paragraph
    assert (a["text"] == "").any()
    assert a["text"].str.contains("\n").any()


def test_gen_batch_skew_and_dups():
    rows = np.arange(0, 5000, dtype=np.int64)
    a = _gen_batch(rows, 1000, 0.1, 42)
    hosts = a["url"].str.extract(r"https://(host\d+)\.")[0]
    counts = hosts.value_counts()
    # Zipf skew: top host much hotter than median
    assert counts.iloc[0] > 10 * counts.median()
    # ~10% dup urls
    dup_frac = 1 - a["url"].nunique() / len(a)
    assert 0.04 < dup_frac < 0.2


def test_synth_pages_spark_matches_local(spark):
    df = synth_pages(spark, 300, n_hosts=50, seed=42, num_partitions=4)
    got = df.toPandas().sort_values("url", ignore_index=True)
    want = _gen_batch(np.arange(300, dtype=np.int64), 50, 0.1, 42).sort_values(
        "url", ignore_index=True
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["text"]) == list(want["text"])
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in want["html"]]


def test_urls_only_generator_matches_pages_urls():
    """_gen_urls (vectorized scaling path) and _gen_batch (pages table)
    must spell the SAME url for the same (rowid, seed) — the urls-only
    path used decimal row ids until r5 while pages used base36, so a
    filter built from one fixture silently missed the other's urls."""
    import numpy as np

    from cuckoo_filter_spark.sources.pages import _b36_vec, _gen_batch, _gen_urls

    rowids = np.arange(0, 5000, dtype=np.int64)
    a = _gen_urls(rowids, n_hosts=100, dup_rate=0.1, seed=42)["url"]
    b = _gen_batch(rowids, n_hosts=100, dup_rate=0.1, seed=42)["url"]
    assert list(a) == list(b)
    # base36 encoder parity with numpy's reference implementation
    vals = np.array([0, 1, 35, 36, 12345, 10**12, 2**40 + 7], dtype=np.int64)
    got = _b36_vec(vals)
    want = [np.base_repr(int(v), 36).lower() for v in vals]
    assert list(got) == want
