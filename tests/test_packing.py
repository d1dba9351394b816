"""pack_greedy / pack_stats: boundary-cut token packing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.packing import pack_greedy, pack_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, doc_id long, toks long")


def test_pack_boundary_cut_semantics(spark):
    # budget 10; offsets: 0,4,8,15,20 -> bins 0,0,0,1,2
    rows = [("a", 1, 4), ("a", 2, 4), ("a", 3, 7), ("a", 4, 5), ("a", 5, 3)]
    out = pack_greedy(_df(spark, rows), "k", "toks", 10,
                      order_cols=("doc_id",)).toPandas()
    got = dict(zip(out.doc_id, out.bin_idx))
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
    off = dict(zip(out.doc_id, out.start_offset))
    assert off == {1: 0, 2: 4, 3: 8, 4: 15, 5: 20}


def test_pack_zero_token_and_oversized_doc(spark):
    rows = [("a", 1, 0), ("a", 2, 25), ("a", 3, 0), ("a", 4, 2)]
    out = pack_greedy(_df(spark, rows), "k", "toks", 10,
                      order_cols=("doc_id",)).toPandas()
    got = dict(zip(out.doc_id, out.bin_idx))
    # doc 2 (25 toks) starts at 0, doc 3 starts at offset 25 -> bin 2
    assert got == {1: 0, 2: 0, 3: 2, 4: 2}


def test_pack_matches_pandas_recomputation(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "k": rng.choice(["en", "de", "fr"], 600),
        "doc_id": np.arange(600),
        "toks": rng.integers(0, 900, 600),
    })
    budget = 2000
    out = pack_greedy(
        spark.createDataFrame(pdf, "k string, doc_id long, toks long"),
        "k", "toks", budget, order_cols=("doc_id",)).toPandas()
    got = dict(zip(out.doc_id, out.bin_idx))
    expect = {}
    for k, g in pdf.sort_values("doc_id").groupby("k"):
        cum = 0
        for _, r in g.iterrows():
            expect[r.doc_id] = cum // budget
            cum += r.toks
    assert got == expect
    # bins never exceed budget + max straddler - 1
    st = pack_stats(
        spark.createDataFrame(pdf, "k string, doc_id long, toks long"),
        "k", "toks", budget, order_cols=("doc_id",)).toPandas()
    assert (st.sum_tokens < budget + 900).all()
    assert int(st.n_docs.sum()) == 600


def test_pack_validation(spark):
    df = _df(spark, [("a", 1, 4)])
    with pytest.raises(ValueError, match="budget"):
        pack_greedy(df, "k", "toks", 0, order_cols=("doc_id",))
    with pytest.raises(ValueError, match="order_cols"):
        pack_greedy(df, "k", "toks", 10, order_cols=())
    with pytest.raises(ValueError, match="reserved"):
        pack_greedy(df.withColumn("bin_idx", F.lit(1)), "k", "toks", 10,
                    order_cols=("doc_id",))


def test_pack_negative_tokens_raise_at_runtime(spark):
    df = _df(spark, [("a", 1, 4), ("a", 2, -1)])
    out = pack_greedy(df, "k", "toks", 10, order_cols=("doc_id",))
    with pytest.raises(Exception, match="pack_greedy"):
        out.collect()


def test_pack_plan_single_exchange_no_python(spark):
    df = _df(spark, [("a", 1, 4), ("b", 2, 5)])
    plan = pack_greedy(df, "k", "toks", 10, order_cols=("doc_id",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
