"""Text normalization + boilerplate removal: hand-checked semantics on
adversarial rows, plus cross-engine parity — the SAME pattern strings
recomputed in DuckDB must agree row-for-row (the driver-oracle
property)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.textnorm import (
    BOILERPLATE_LINE_PATTERNS,
    boilerplate_lines_removed,
    collapse_whitespace,
    normalize_text,
    strip_boilerplate_lines,
    strip_control_chars,
    textnorm_oracle_exprs,
)

ROWS = [
    (0, "plain text stays untouched"),
    (1, "tabs\tand\nnewlines   and  runs"),
    (2, "ctrl\x00chars\x07are\x1fgone but tab\tstays"),
    (3, "nbsp\u00a0thin\u2009ideo\u3000zero\u200bwidth"),
    (4, "  trimmed  edges  "),
    (5, ""),
    (6, None),
    (7, "UPPER Case MiXed"),
    (8, "real content line\nWe use cookies to improve your experience\n"
        "more content\nCopyright 2024 Example Corp\nAll Rights Reserved\n"
        "Home\nShare\nfinal line"),
    (9, "© 2023 Someone\nnotcopyrighted text\nSign in\nkeep me"),
    (10, "cookies are delicious baked goods"),  # no consent verb: kept
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def test_normalize_semantics(df):
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text("text").alias("n")).collect()}
    assert got[0] == "plain text stays untouched"
    assert got[1] == "tabs and newlines and runs"
    assert got[2] == "ctrlcharsaregone but tab stays"
    assert got[3] == "nbsp thin ideo zero width"
    assert got[4] == "trimmed edges"
    assert got[5] == "" and got[6] is None
    lowered = df.where("id = 7").select(
        normalize_text("text", lowercase=True)).first()[0]
    assert lowered == "upper case mixed"


def test_strip_control_keeps_structure(df):
    got = df.where("id = 2").select(strip_control_chars("text")).first()[0]
    assert got == "ctrlcharsaregone but tab\tstays"


def test_boilerplate_removal(df):
    out = {r["id"]: (r["s"], r["n"]) for r in df.select(
        "id",
        strip_boilerplate_lines("text").alias("s"),
        boilerplate_lines_removed("text").alias("n")).collect()}
    assert out[8][0] == "real content line\nmore content\nfinal line"
    assert out[8][1] == 5
    assert out[9][0] == "notcopyrighted text\nkeep me"
    assert out[9][1] == 2
    # cookie mention without a consent-ish verb is NOT boilerplate
    assert out[10] == ("cookies are delicious baked goods", 0)
    assert out[0][1] == 0
    assert out[6] == (None, None)  # NULL stays NULL


def test_empty_patterns_raise(df):
    with pytest.raises(ValueError, match="non-empty"):
        strip_boilerplate_lines("text", ())
    with pytest.raises(ValueError, match="non-empty"):
        boilerplate_lines_removed("text", ())


def test_duckdb_parity(df):
    """textnorm_oracle_exprs reproduces normalize_text AND the line
    filter row-for-row from the same pattern constants."""
    got = df.select(
        "id",
        normalize_text("text").alias("normalized"),
        strip_boilerplate_lines("text").alias("stripped"),
        boilerplate_lines_removed("text").alias("n_removed"),
    ).orderBy("id").toPandas()
    o = textnorm_oracle_exprs("text")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=["id", "text"]))
    want = con.execute(
        f"SELECT id, {o['normalized']} AS normalized, "
        f"{o['stripped']} AS stripped, {o['n_removed']} AS n_removed "
        "FROM t ORDER BY id").df()

    def norm(series):
        return [x if pd.notna(x) else None for x in series]

    for c in ["normalized", "stripped", "n_removed"]:
        assert norm(got[c]) == norm(want[c]), c


def test_carriage_return_line_parity(spark):
    """Bare '.' is outside the Java∩RE2 subset (Java '.' excludes \\r,
    RE2 '.' does not) — the cookie patterns spell the gap [^\\n], so a
    stray-CR line must be dropped identically by BOTH engines."""
    rows = [(0, "we use cookies\rto give consent\nkeep this line"),
            (1, "plain line\nanother")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["s"], r["n"]) for r in df.select(
        "id",
        strip_boilerplate_lines("text").alias("s"),
        boilerplate_lines_removed("text").alias("n")).collect()}
    assert got[0] == ("keep this line", 1)
    assert got[1][1] == 0
    o = textnorm_oracle_exprs("text")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
    want = {i: (st, n) for i, st, n in con.execute(
        f"SELECT id, {o['stripped']}, {o['n_removed']} FROM t ORDER BY id"
    ).fetchall()}
    assert {k: (v[0], int(v[1])) for k, v in want.items()} == got
