"""Gopher-style document quality rules — pure JVM expressions.

Rule-based quality filtering (Rae et al. 2021 "Scaling Language Models:
Gopher", §A1.1; also the C4 heuristics) keeps a document only when ALL
of a set of cheap signals pass. Every rule here is a whole-stage-codegen
Spark expression built on the pinned-parity features in
functions/text.py, and every rule is recomputable in ANSI/DuckDB SQL —
that is the oracle contract (see the ``gopher_quality`` driver query).

Adaptations from the paper, documented: symbol ratio is punctuation
chars / chars (the corpus-portable spelling of "symbol-to-word ratio"),
and the stop-word rule counts DISTINCT stopwords present (boolean
``rlike`` per word — overlap-free, so Java and RE2 cannot diverge on
match counting).

Scale shape: per-row projection inside the scan stage; zero shuffle,
zero Python at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from cuckoo_filter_spark.functions.text import quality_features

# distinct-stopword presence list (Gopher uses a similar small list);
# \b is ASCII word boundary in BOTH Java regex and RE2 — parity-safe
STOPWORD_RULE_WORDS = ("the", "and", "of", "to", "in", "is", "for", "that")


def stopword_hits_expr(col) -> Column:
    """Number of DISTINCT ``STOPWORD_RULE_WORDS`` present (0..8)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.coalesce(c, F.lit("")))
    return sum(
        low.rlike(rf"\b{w}\b").cast("int") for w in STOPWORD_RULE_WORDS
    ).cast("bigint")


def gopher_rules(
    col,
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.10,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """Per-rule PASS booleans + the conjunction.

    Returns ``{'ok_tokens', 'ok_word_len', 'ok_symbols', 'ok_stopwords',
    'keep'}``. Thresholds default to the Gopher paper's; tune per
    corpus (the driver contract query pins corpus-specific values so
    every rule fires both ways at sf0.01)."""
    c = F.col(col) if isinstance(col, str) else col
    # NULL text must mean keep=False, not keep=NULL (a filter predicate
    # would silently drop NULL three-valued logic either way, but the
    # per-rule booleans are emitted as columns and must stay boolean)
    c = F.coalesce(c, F.lit(""))
    f = quality_features(c)
    n_tokens = f["n_tokens"]
    ok_tokens = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    ok_word_len = (
        (f["mean_word_len"] >= min_mean_word_len)
        & (f["mean_word_len"] <= max_mean_word_len)
    )
    ok_symbols = f["punct_ratio"] <= max_symbol_ratio
    ok_stopwords = stopword_hits_expr(c) >= min_stopword_hits
    return {
        "ok_tokens": ok_tokens,
        "ok_word_len": ok_word_len,
        "ok_symbols": ok_symbols,
        "ok_stopwords": ok_stopwords,
        "keep": ok_tokens & ok_word_len & ok_symbols & ok_stopwords,
    }


def gopher_keep_expr(col, **thresholds) -> Column:
    """The single keep/drop predicate (conjunction of all rules)."""
    return gopher_rules(col, **thresholds)["keep"]
