"""Text analysis for training-data pipelines (lang-ID, quality scoring,
token counting, document fingerprinting).

Design rule: anything expressible as Spark SQL expressions stays
JVM-side (whole-stage codegen, pushdown-friendly); only the n-gram
language model and the rolling-hash fingerprint use Arrow-batched
numpy/pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

from cuckoo_filter_spark.hashing import metro64_batch

# ---------------------------------------------------------------------------
# token counting — pure Spark expressions (and the BPE-ish regex variant)
# ---------------------------------------------------------------------------


def token_count_expr(col: str | Column) -> Column:
    """Whitespace token count, JVM-side. Empty/blank/NULL → 0 (NULL used
    to propagate NULL here while tokens_expr said 0 — same rule now)."""
    return F.size(tokens_expr(col)).cast("bigint")


def bpe_ish_token_count_expr(col: str | Column) -> Column:
    """BPE-ish token count: words + digits + punctuation runs as separate
    tokens (regexp-based approximation of a byte-pair tokenizer's
    pre-tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    # count matches of word-ish / digit / punct tokens by splitting on
    # boundaries: each token is [A-Za-z]+ | [0-9] | single non-space symbol
    tokens = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"), 0)
    return F.size(tokens).cast("bigint")


# ---------------------------------------------------------------------------
# quality scoring — pure Spark expressions
# ---------------------------------------------------------------------------

# exactly the 16 words stopword_ratio counts (the list USED to carry 15
# more entries a [:16] slice silently ignored — extending it changed
# nothing; keep list and usage in lockstep)
_STOPWORDS = (
    "the a of and to in is for on with this that from by at as".split()
)


def quality_features(col: str | Column) -> dict[str, Column]:
    """Cheap quality signals, all JVM-side: length, token count, mean word
    length, punctuation ratio, stopword ratio, uppercase ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tokens = token_count_expr(c).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_tokens = F.greatest(n_tokens, F.lit(1.0))
    # "symbol" = not a letter/digit/underscore/whitespace IN ANY SCRIPT:
    # bare \w is ASCII-only in BOTH Java regex and RE2, so [^\w\s] would
    # count every CJK/Cyrillic/accented character as a symbol and the
    # Gopher symbol-ratio rule would drop whole languages. \p{L}/\p{N}
    # are supported identically by both dialects (parity-safe).
    n_punct = n_chars - F.length(
        F.regexp_replace(c, r"[^\p{L}\p{N}_\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    lowered = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    # lookahead keeps the trailing whitespace UNCONSUMED so adjacent
    # repeats all count (' the the ' is 2 hits, not 1 — split on
    # '\sthe\s' eats the boundary space the next occurrence needs)
    n_stop = sum(
        (
            F.size(F.split(lowered, rf"\s{w}(?=\s)")) - 1
        ).cast("double")
        for w in _STOPWORDS
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "mean_word_len": (n_chars - n_tokens + 1) / safe_tokens,
        "punct_ratio": n_punct / safe_chars,
        "upper_ratio": n_upper / safe_chars,
        "stopword_ratio": n_stop / safe_tokens,
    }


def quality_score_expr(col: str | Column) -> Column:
    """Composite [0,1] quality score from the features (heuristic:
    mid-length docs with some stopwords and low punctuation score high)."""
    f = quality_features(col)
    len_score = F.least(f["n_chars"].cast("double") / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    # penalty terms only count once the doc has some substance, so
    # trivially short docs don't ride on "no punctuation" alone
    substance = F.least(f["n_chars"].cast("double") / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - f["punct_ratio"] * 5.0, F.lit(0.0))
    return (0.4 * len_score + 0.3 * stop_score + 0.3 * punct_penalty * substance).alias(
        "quality"
    )


# ---------------------------------------------------------------------------
# language ID — character n-gram heuristic (Arrow-batched)
# ---------------------------------------------------------------------------

# tiny per-language profiles: distinctive character trigrams / chars.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", "ing ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", "sch", " das ", "ich "],
    "fr": [" le ", " la ", " les ", " est ", " une ", " des ", "é"],
    "es": [" el ", " la ", " los ", " es ", " una ", "ción", "ñ"],
    "zh": [],  # handled by CJK codepoint ratio
}


def lang_id_udf():
    """Returns a pandas UDF text → predicted lang code ('en','de','fr',
    'es','zh','unknown'). CJK codepoint ratio decides zh; otherwise the
    max marker-hit-rate language wins; ties/no-signal → 'unknown'."""

    @pandas_udf("string")
    def lang_id(texts: pd.Series) -> pd.Series:
        t = texts.fillna("")
        lowered = t.str.lower()
        n = t.str.len().clip(lower=1)
        cjk = t.str.count(r"[一-鿿]") / n
        scores = {}
        for lang, markers in _LANG_MARKERS.items():
            if not markers:
                continue
            s = None
            for m in markers:
                if m.isalpha():
                    pat = m
                elif m.endswith(" "):
                    # trailing boundary as lookahead: non-overlapping
                    # counting would otherwise eat the space the NEXT
                    # adjacent occurrence needs (' the the ' = 2, not 1)
                    pat = m[:-1].replace(" ", r"\s") + r"(?=\s)"
                else:
                    pat = m.replace(" ", r"\s")
                c = lowered.str.count(pat)
                s = c if s is None else s + c
            scores[lang] = s / n * 100.0
        sdf = pd.DataFrame(scores)
        best = sdf.idxmax(axis=1)
        best_score = sdf.max(axis=1)
        out = best.where(best_score > 0.05, "unknown")
        out = out.mask(cjk > 0.2, "zh")
        return out

    return lang_id


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def doc_fingerprint_udf():
    """64-bit content fingerprint: metro64 over the WHOLE document text
    — byte-exact content identity (two docs share a fingerprint iff the
    bytes match, modulo 64-bit collisions that dedup_by_content_hash
    verifies away). Deliberately NOT a winnowed/shingled similarity
    sketch: near-dup robustness lives in minhash/simhash/embedding LSH
    (operators.dedup); this is the exact-dedup primitive.
    Returns bigint (signed view of the uint64)."""

    @pandas_udf("long")
    def fingerprint(texts: pd.Series) -> pd.Series:
        t = texts.fillna("")
        h = metro64_batch(t)
        return pd.Series(h.astype(np.int64))

    return fingerprint


# ---------------------------------------------------------------------------
# word n-grams + repetition signals (Gopher/C4-style quality filters)
# ---------------------------------------------------------------------------


def tokens_expr(col: str | Column) -> Column:
    """Whitespace tokenization, JVM-side: split on ``\\s+`` and drop the
    boundary empties. Blank/NULL → empty array.

    The boundary filter is load-bearing: ``F.trim`` strips only ASCII
    0x20, so the previous ``split(trim(text))`` emitted a phantom ``''``
    token for text with leading/trailing NON-SPACE whitespace
    (``'hello\\n'`` counted 2 tokens ``['hello', '']`` — the common case
    for any real newline-terminated corpus), inflating every downstream
    token count/budget/window. Splitting on ``\\s+`` can only produce
    empties at the two boundaries, so filtering ``''`` is exactly a
    full-whitespace trim — and it matches python ``str.split()`` (the
    rule the Arrow-UDF consumers use). DuckDB spelling:
    :func:`tokens_sql` (the oracle-parity contract for every consumer).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.coalesce(c, F.lit("")), r"\s+", -1),
        lambda t: t != F.lit(""),
    )


def tokens_sql(text_sql: str) -> str:
    """The DuckDB spelling of :func:`tokens_expr` — ONE emitter for the
    tokenization contract; every oracle embeds this so engine drift is a
    hash mismatch, not silence."""
    return (f"list_filter(string_split_regex(coalesce({text_sql}, ''), "
            f"'\\s+'), t -> t <> '')")


def token_count_sql(text_sql: str) -> str:
    """DuckDB spelling of :func:`token_count_expr`."""
    return f"len({tokens_sql(text_sql)})"


def word_ngrams_expr(col: str | Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams, pure JVM (whole-stage
    codegen; no shuffle, no Python). Docs with < n tokens → empty array.

    This is the decontamination / repetition unit: at 100 TB the n-gram
    expansion happens map-side inside the scan stage — only downstream
    consumers decide what (if anything) shuffles."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = tokens_expr(col)
    # sequence(1, size-n+1) DESCENDS when size < n (Spark default step
    # -1), so gate on size >= n explicitly.
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(col: str | Column, line_sep: str = "\n") -> dict[str, Column]:
    """Line-level repetition signals (Gopher-style), all JVM-side:

    * ``n_lines`` / ``n_dup_lines`` — non-blank lines, and how many are
      repeats of an earlier identical line within the doc.
    * ``dup_line_frac`` — ``n_dup_lines / n_lines`` (0.0 when no lines).
    * ``dup_line_char_frac`` — fraction of non-blank-line characters
      sitting in repeated copies (chars beyond each line's first
      occurrence).

    ``line_sep`` is a Java REGEX (the operators/lines.py ``sep``
    contract) — escape metacharacters for literal separators
    (``line_sep='.'`` splits on EVERY character, not on periods).

    Per-doc map-side expressions — zero shuffle at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(F.coalesce(c, F.lit("")), F.lit(line_sep), -1)
    lines = F.filter(raw, lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    distinct_lines = F.array_distinct(lines)
    n_distinct = F.size(distinct_lines)
    chars_total = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    chars_distinct = F.aggregate(
        distinct_lines, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    safe_lines = F.greatest(n_lines.cast("double"), F.lit(1.0))
    safe_chars = F.greatest(chars_total.cast("double"), F.lit(1.0))
    return {
        "n_lines": n_lines.cast("bigint"),
        "n_dup_lines": (n_lines - n_distinct).cast("bigint"),
        "dup_line_frac": (n_lines - n_distinct).cast("double") / safe_lines,
        "dup_line_char_frac": (chars_total - chars_distinct).cast("double") / safe_chars,
    }


def top_ngram_count_udf(n: int):
    """Pandas UDF text → occurrence count of the doc's most frequent
    word ``n``-gram (0 when the doc has < n tokens). The Gopher
    "fraction of tokens in the top n-gram" numerator.

    Deliberately a per-doc Arrow-batched UDF, NOT an explode+groupBy:
    counting a doc's own n-grams is embarrassingly parallel map-side
    work; exploding 10^12 docs' grams through a (doc_id, gram) shuffle
    just to count within each doc would move ~n× the corpus through the
    network for a result each task already holds locally."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    @pandas_udf("long")
    def top_ngram_count(texts: pd.Series) -> pd.Series:
        from collections import Counter

        out = np.zeros(len(texts), dtype=np.int64)
        for j, s in enumerate(texts.fillna("")):
            toks = s.split()
            if len(toks) < n:
                continue
            counts = Counter(zip(*(toks[i:] for i in range(n))))
            out[j] = counts.most_common(1)[0][1]
        return pd.Series(out)

    return top_ngram_count


def shingle_hashes(texts: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Per-doc arrays of k-gram (character shingle) hashes, vectorized:
    one metro64 pass over all shingles of the batch."""
    t = texts.fillna("").astype(str)
    # build the flat shingle bytes with numpy stride tricks over the
    # concatenated utf-8 buffer of each doc
    out: list[np.ndarray] = []
    all_shingles: list[np.ndarray] = []
    bounds = []
    flat_parts = []
    for s in t:
        b = s.encode("utf-8")
        m = max(len(b) - k + 1, 0)
        bounds.append(m)
        if m:
            arr = np.frombuffer(b, dtype=np.uint8)
            sh = np.lib.stride_tricks.sliding_window_view(arr, k)
            flat_parts.append(sh.reshape(-1))
    if flat_parts:
        flat = np.concatenate(flat_parts)
        total = sum(bounds)
        lens_arr = np.full(total, k, dtype=np.int64)
        from cuckoo_filter_spark.hashing import metro64_flat

        hashes = metro64_flat(flat, lens_arr)
    else:
        hashes = np.zeros(0, dtype=np.uint64)
    off = 0
    for m in bounds:
        out.append(hashes[off : off + m])
        off += m
    return out
