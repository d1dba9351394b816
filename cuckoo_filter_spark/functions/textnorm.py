"""Text normalization + boilerplate-line removal — pure JVM expressions.

Crawl text reaches a training mix only after cheap canonicalization:
control characters stripped, exotic Unicode spaces folded, whitespace
runs collapsed, and boilerplate lines (cookie banners, copyright
footers, bare nav stubs) dropped. Everything here is a composition of
``regexp_replace`` / ``split`` / ``filter`` / ``array_join`` over
patterns restricted to the **Java-regex ∩ RE2 subset** (same contract
as functions/pii.py: no lookaround, no backreferences; Unicode escapes
spelled ``\\x{hhhh}``, valid in both dialects), so the exact same
pattern strings drive the Spark plan and the DuckDB oracle.

Scale shape: per-row projections inside the scan stage under
whole-stage codegen — zero shuffle, zero Python at any corpus size.
The line filter is a bounded JVM higher-order function (``filter`` over
the doc's own lines), never an explode — line counts stay inside the
row. (Reference scope note: linvon/cuckoo-filter has no text surface;
this module is grafted LLM-pipeline scope, sibling of functions/text.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Control chars to DELETE (keep \t \n \r — structure the line filter and
# whitespace collapse handle); DEL included.
CONTROL_CHARS_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

# Unicode spaces folded to a plain ASCII space BEFORE collapsing runs:
# NBSP, ogham, en/em/figure/thin/hair spaces, zero-width + BOM, line/par
# separators, narrow NBSP, math space, ideographic space.
UNICODE_SPACES_PATTERN = (
    r"[\x{00A0}\x{1680}\x{2000}-\x{200B}\x{2028}\x{2029}"
    r"\x{202F}\x{205F}\x{3000}\x{FEFF}]"
)

# A line is boilerplate when it matches ANY of these (case-insensitive
# via (?i) — supported by both dialects). Deliberately small + literal:
# corpus-specific lists are passed by the caller. The gap between the
# anchor words is spelled [^\n]* and NOT '.*': bare '.' is OUTSIDE the
# Java∩RE2 subset — Java '.' excludes \r, \x{0085}, \x{2028},
# \x{2029} while
# RE2 '.' excludes only \n, so a stray-\r line ('cookies\rconsent')
# would match in DuckDB but not in Spark. [^\n] is identical in both.
BOILERPLATE_LINE_PATTERNS: tuple[str, ...] = (
    r"(?i)\bcookies?\b[^\n]*\b(consent|policy|accept|use|uses|using)\b",
    r"(?i)\b(consent|policy|accept|use|uses|using)\b[^\n]*\bcookies?\b",
    r"(?i)^\s*copyright\b|^\s*\x{00A9}",
    r"(?i)\ball rights reserved\b",
    r"(?i)^\s*(home|about( us)?|contact( us)?|privacy policy|"
    r"terms of (use|service))\s*$",
    r"(?i)^\s*(share|tweet|pin it|subscribe( now)?|sign (in|up)|"
    r"log ?in)\s*$",
)


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_control_chars(col) -> Column:
    """Delete C0 controls (except tab/newline/CR) and DEL."""
    return F.regexp_replace(_col(col), CONTROL_CHARS_PATTERN, "")


def fold_unicode_spaces(col) -> Column:
    """Fold exotic Unicode spaces / zero-widths to ASCII space."""
    return F.regexp_replace(_col(col), UNICODE_SPACES_PATTERN, " ")


def collapse_whitespace(col) -> Column:
    """Collapse every whitespace run (incl. newlines) to one space and
    trim — the LINE-DESTROYING final step; run line-level logic first."""
    return F.trim(F.regexp_replace(_col(col), r"\s+", " "))


def _hit_expr(line: Column, patterns: tuple[str, ...]) -> Column:
    """ONE definition of "this line is boilerplate" — the stripper and
    the audit counter both use it (negated vs not), so they can never
    drift apart."""
    hit = F.lit(False)
    for p in patterns:
        hit = hit | line.rlike(p)
    return hit


def _check_patterns(patterns) -> None:
    if not patterns:
        raise ValueError("patterns must be non-empty (pass "
                         "BOILERPLATE_LINE_PATTERNS or your own list)")


def strip_boilerplate_lines(
    col,
    patterns: tuple[str, ...] = BOILERPLATE_LINE_PATTERNS,
) -> Column:
    """Drop every line matching any pattern; surviving lines re-join
    with ``\\n``. Bounded per-row array logic (JVM ``filter``), never an
    explode. NULL text stays NULL."""
    _check_patterns(patterns)
    lines = F.split(_col(col), r"\n")
    return F.array_join(
        F.filter(lines, lambda x: ~_hit_expr(x, patterns)), "\n")


def boilerplate_lines_removed(
    col,
    patterns: tuple[str, ...] = BOILERPLATE_LINE_PATTERNS,
) -> Column:
    """How many lines :func:`strip_boilerplate_lines` would drop
    (bigint; NULL text -> NULL) — the audit counter."""
    _check_patterns(patterns)
    lines = F.split(_col(col), r"\n")
    return F.size(
        F.filter(lines, lambda x: _hit_expr(x, patterns))).cast("bigint")


def normalize_text(col, *, lowercase: bool = False) -> Column:
    """The canonical one-liner: strip controls -> fold Unicode spaces
    -> collapse whitespace (-> optional lowercase). Line structure does
    NOT survive (collapse eats newlines); compose with
    :func:`strip_boilerplate_lines` FIRST when lines matter. NULL stays
    NULL."""
    out = collapse_whitespace(fold_unicode_spaces(strip_control_chars(col)))
    return F.lower(out) if lowercase else out


def textnorm_oracle_exprs(
    text_sql: str,
    patterns: tuple[str, ...] = BOILERPLATE_LINE_PATTERNS,
) -> dict[str, str]:
    """DuckDB spellings of the SAME transformations, generated from the
    one set of pattern constants (drift = test failure, not silent
    divergence): ``normalized`` (full :func:`normalize_text` chain),
    ``stripped`` (:func:`strip_boilerplate_lines`) and ``n_removed``."""

    def esc(p: str) -> str:
        # DuckDB single-quoted literals keep backslashes literal — only
        # quotes need escaping (same contract as pii_oracle_exprs).
        return p.replace("'", "''")

    ctrl = f"regexp_replace({text_sql}, '{esc(CONTROL_CHARS_PATTERN)}', '', 'g')"
    fold = f"regexp_replace({ctrl}, '{esc(UNICODE_SPACES_PATTERN)}', ' ', 'g')"
    norm = f"trim(regexp_replace({fold}, '\\s+', ' ', 'g'))"
    any_hit = " OR ".join(
        f"regexp_matches(x, '{esc(p)}')" for p in patterns)
    lines = f"string_split({text_sql}, chr(10))"
    stripped = (f"array_to_string(list_filter({lines}, "
                f"x -> NOT ({any_hit})), chr(10))")
    n_removed = f"len(list_filter({lines}, x -> {any_hit}))"
    return {"normalized": norm, "stripped": stripped, "n_removed": n_removed}
