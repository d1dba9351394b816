"""PII detection / redaction — pure JVM regex expressions.

Training-data pipelines scrub personally identifiable information
(emails, phone numbers, IP addresses) before anything ships to a
training mix. Everything here is a composition of ``regexp_count`` /
``regexp_replace`` over patterns restricted to the **common subset of
Java regex and RE2** (no lookaround, no backreferences, ASCII ``\\b`` /
``\\d`` / ``\\w``), so the exact same pattern strings drive both the
Spark plan and the DuckDB oracle — dialect parity is the tested
contract, not an accident.

Scale shape: per-row projections only. At 100 TB the scrub runs inside
the scan stage under whole-stage codegen — zero shuffle, zero Python.
(Reference scope note: linvon/cuckoo-filter has no text surface; this
module is part of the grafted LLM-pipeline scope, same tier as
functions/text.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Ordered dict: redaction applies in THIS order (email first so an
# address's local part is consumed before the phone/ip patterns can see
# its digits; phone before ipv4 is irrelevant — dashes vs dots — but the
# order is part of the determinism contract).
PII_PATTERNS: dict[str, str] = {
    # local@host.tld — TLD must be alphabetic, so "user@1.2.3.4" does
    # NOT match (the embedded ipv4 then matches the ipv4 rule instead)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-ish dashed phone: 2-3 digit country/area prefix then
    # 3-3-4 groups (the crawl-frequent spelling; extend per corpus)
    "phone": r"\b\d{2,3}-\d{3}-\d{3}-\d{4}\b",
    # dotted-quad IPv4 (no octet-range check — scrubbing favors recall;
    # \b keeps it from firing inside longer digit runs)
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

REDACTION_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _kinds(kinds) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    # materialize FIRST: a generator argument would be exhausted by the
    # validation comprehension and list(kinds) would then be [] — every
    # pii function would silently no-op (redact nothing, count nothing)
    kinds = list(kinds)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; known: {list(PII_PATTERNS)}")
    return kinds


def pii_count_exprs(col, kinds=None) -> dict[str, Column]:
    """``{kind: match count}`` columns (bigint, NULL text → 0)."""
    c = F.coalesce(_col(col), F.lit(""))
    return {
        k: F.regexp_count(c, F.lit(PII_PATTERNS[k])).cast("bigint")
        for k in _kinds(kinds)
    }


def has_pii_expr(col, kinds=None) -> Column:
    """Boolean: any PII pattern matches (the drop-the-doc predicate)."""
    c = F.coalesce(_col(col), F.lit(""))
    out = F.lit(False)
    for k in _kinds(kinds):
        out = out | c.rlike(PII_PATTERNS[k])
    return out


def redact_pii(col, kinds=None) -> Column:
    """Replace every PII match with its ``REDACTION_TOKENS`` token, in
    the fixed ``PII_PATTERNS`` order. NULL text stays NULL (a scrub
    never invents content)."""
    c = _col(col)
    out = c
    for k in _kinds(kinds):
        out = F.regexp_replace(out, PII_PATTERNS[k], REDACTION_TOKENS[k])
    return out


def pii_oracle_exprs(text_sql: str, kinds=None) -> dict[str, str]:
    """The DuckDB-SQL spellings of the SAME patterns, for oracle
    recompute: ``{kind: count_sql}`` plus ``__redacted__`` (the chained
    redaction expression) —
    keeps the contract query and its oracle generated from one source
    of truth (pattern drift between engines becomes a test failure,
    not a silent divergence)."""

    def esc(p: str) -> str:
        # DuckDB standard single-quoted literals treat backslash as a
        # LITERAL character (no doubling!) — only quotes need escaping.
        return p.replace("'", "''")

    out = {
        # coalesce: pii_count_exprs treats NULL text as 0 matches, so
        # the oracle must too (len(regexp_extract_all(NULL)) is NULL)
        k: (
            f"len(regexp_extract_all(coalesce({text_sql}, ''), "
            f"'{esc(PII_PATTERNS[k])}'))"
        )
        for k in _kinds(kinds)
    }
    red = text_sql
    for k in _kinds(kinds):
        red = (
            f"regexp_replace({red}, '{esc(PII_PATTERNS[k])}', "
            f"'{REDACTION_TOKENS[k]}', 'g')"
        )
    out["__redacted__"] = red
    return out
