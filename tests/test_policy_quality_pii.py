"""PII scrub, domain blocklist policy, and Gopher quality rules.

Each suite pins (a) hand-checked semantics on adversarial rows and
(b) cross-engine parity: the SAME pattern strings / rules recomputed in
DuckDB must agree row-for-row with the Spark plan — the property the
driver-contract oracles rely on.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.pii import (
    PII_PATTERNS,
    has_pii_expr,
    pii_count_exprs,
    pii_oracle_exprs,
    redact_pii,
)
from cuckoo_filter_spark.functions.quality import (
    gopher_rules,
    stopword_hits_expr,
)
from cuckoo_filter_spark.operators.policy import (
    MAX_LITERAL_BLOCKLIST,
    blocked_host_expr,
    blocklist_filter,
    host_suffixes_expr,
)

# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

PII_ROWS = [
    (0, "mail me at john.doe+spam@sub.Example.COM thanks"),
    (1, "two: a@b.io and c_d%e@x-y.org!"),
    (2, "call 25-989-741-2988 or 555-123-456-7890 now"),
    (3, "server at 10.0.255.3, backup 192.168.1.1."),
    (4, "user@1.2.3.4 is not an email but holds an ip"),
    (5, "no pii here, just 1234-5 and a.b"),
    (6, ""),
    (7, None),
    (8, "edge 999.999.999.999 and v1.2.3.4000 digits"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_ROWS, "id long, text string")


def test_pii_counts_and_flags(pii_df):
    exprs = pii_count_exprs("text")
    rows = {
        r["id"]: r
        for r in pii_df.select(
            "id", *[v.alias(k) for k, v in exprs.items()],
            has_pii_expr("text").alias("flag"),
        ).collect()
    }
    assert (rows[0]["email"], rows[0]["phone"], rows[0]["ipv4"]) == (1, 0, 0)
    assert rows[1]["email"] == 2
    assert rows[2]["phone"] == 2
    assert rows[3]["ipv4"] == 2
    # TLD must be alphabetic: user@1.2.3.4 is ipv4, not email
    assert (rows[4]["email"], rows[4]["ipv4"]) == (0, 1)
    assert not rows[5]["flag"] and not rows[6]["flag"] and not rows[7]["flag"]
    # \b keeps ipv4 out of longer digit runs: v1.2.3.4000 has no
    # 1-3-digit final octet at a boundary; 999.999.999.999 matches (no
    # range check, recall-first)
    assert rows[8]["ipv4"] == 1
    assert rows[0]["flag"] and rows[2]["flag"] and rows[3]["flag"]


def test_pii_redaction_complete(pii_df):
    red = pii_df.select("id", redact_pii("text").alias("r"))
    # no pattern survives its own redaction
    residual = red.where(
        sum(F.coalesce(F.regexp_count("r", F.lit(p)), F.lit(0))
            for p in PII_PATTERNS.values()) > 0)
    assert residual.count() == 0
    got = {r["id"]: r["r"] for r in red.collect()}
    assert got[0] == "mail me at <EMAIL> thanks"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[4] == "user@<IP> is not an email but holds an ip"
    assert got[7] is None  # NULL stays NULL


def test_pii_duckdb_parity(pii_df):
    """Same pattern strings, both engines, row-for-row equality —
    counts AND redacted text."""
    exprs = pii_count_exprs("text")
    spark_pdf = (
        pii_df.select("id", *[v.alias(k) for k, v in exprs.items()],
                      redact_pii("text").alias("redacted"))
        .orderBy("id").toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(PII_ROWS, columns=["id", "text"]))
    o = pii_oracle_exprs("text")
    duck = con.execute(
        f"SELECT id, {o['email']} AS email, {o['phone']} AS phone, "
        f"{o['ipv4']} AS ipv4, {o['__redacted__']} AS redacted "
        "FROM t ORDER BY id"
    ).df()
    for c in ["email", "phone", "ipv4"]:
        assert list(spark_pdf[c]) == list(duck[c]), c
    assert [x if pd.notna(x) else None for x in spark_pdf["redacted"]] == [
        x if pd.notna(x) else None for x in duck["redacted"]]


def test_pii_generator_kinds_not_silently_exhausted(pii_df):
    """A generator `kinds` argument must behave exactly like a list —
    the old validation comprehension exhausted it and every pii
    function silently no-opped."""
    from cuckoo_filter_spark.functions.pii import redact_pii as _red

    got = pii_df.select(
        "id", _red("text", kinds=(k for k in ["email"])).alias("r")
    ).collect()
    rows = {r["id"]: r["r"] for r in got}
    assert rows[0] == "mail me at <EMAIL> thanks"  # email redacted
    assert "25-989-741-2988" in rows[2]  # phone kind NOT requested


def test_pii_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown PII kinds"):
        pii_count_exprs("text", kinds=["email", "ssn"])


# ---------------------------------------------------------------------------
# blocklist policy
# ---------------------------------------------------------------------------

PAGES = [
    (0, "https://a.b.example.com/x"),       # subdomain of blocked
    (1, "https://example.com/y"),           # exactly blocked
    (2, "https://notexample.com/z"),        # label boundary: NOT blocked
    (3, "https://www.tracker.net/p?q=1"),   # blocked (www is a subdomain)
    (4, "https://safe.org/ok"),             # kept
    (5, "not a url at all"),                # unparseable → kept
    (6, None),                              # NULL → kept
    (7, "https://deep.x.y.tracker.net/"),   # deep subdomain blocked
]
BLOCK = ["Example.COM", "www.tracker.net", " ", ""]


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "id long, url string")


def test_host_suffixes(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("com",), ("",), (None,)], "h string")
    got = [r[0] for r in df.select(host_suffixes_expr("h")).collect()]
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert got[1] == ["com"]
    assert got[2] == [] and got[3] == []


def test_blocklist_literal_path(pages_df):
    kept = blocklist_filter(pages_df, "url", BLOCK)
    assert sorted(r["id"] for r in kept.collect()) == [2, 4, 5, 6]
    blocked = blocklist_filter(pages_df, "url", BLOCK, keep_blocked=True)
    assert sorted(r["id"] for r in blocked.collect()) == [0, 1, 3, 7]
    # schema untouched
    assert kept.columns == pages_df.columns


def test_blocklist_dataframe_path_matches_literal(spark, pages_df):
    bl = spark.createDataFrame(
        [("Example.COM",), ("WWW.tracker.net.",), ("",)], "domain string")
    kept = blocklist_filter(pages_df, "url", bl)
    assert sorted(r["id"] for r in kept.collect()) == [2, 4, 5, 6]
    blocked = blocklist_filter(pages_df, "url", bl, keep_blocked=True)
    assert sorted(r["id"] for r in blocked.collect()) == [0, 1, 3, 7]
    assert kept.columns == pages_df.columns


def test_blocklist_guards(pages_df):
    big = [f"d{i}.com" for i in range(MAX_LITERAL_BLOCKLIST + 1)]
    with pytest.raises(ValueError, match="literal blocklist"):
        blocked_host_expr(F.lit("x.com"), big)
    with pytest.raises(TypeError, match="blocklist must be"):
        blocklist_filter(pages_df, "url", 42)
    # empty blocklist keeps everything
    assert blocklist_filter(pages_df, "url", []).count() == len(PAGES)


def test_blocklist_internal_name_collisions_raise(spark, pages_df):
    bl = spark.createDataFrame([("example.com",)], "domain string")
    with pytest.raises(ValueError, match="__host"):
        blocklist_filter(pages_df.withColumn("__host", F.lit("x")), "url", bl)
    with pytest.raises(ValueError, match="__suf"):
        blocklist_filter(pages_df.withColumn("__suf", F.lit("x")), "url", bl)
    # an unrelated '__dom' column in the blocklist is harmless: the
    # internal select-with-alias produces a single-column frame
    ok = blocklist_filter(
        pages_df, "url", bl.withColumn("__dom", F.lit("x")))
    assert sorted(r["id"] for r in ok.collect()) == \
        sorted(r["id"] for r in blocklist_filter(pages_df, "url", bl).collect())
    # naming the blocklist column itself '__dom' is fine too
    ok2 = blocklist_filter(
        pages_df, "url",
        bl.withColumnRenamed("domain", "__dom"), domain_col="__dom")
    assert ok2.columns == pages_df.columns


# ---------------------------------------------------------------------------
# gopher quality rules
# ---------------------------------------------------------------------------

GOOD = ("the quick brown fox jumps over the lazy dog and runs to the "
        "river in the morning for fun that is all " * 3)
QUALITY_ROWS = [
    (0, GOOD),                                      # passes everything
    (1, "short doc the and of to"),                 # fails min_tokens
    (2, GOOD + " !!! ??? *** $$$ %%% " * 30),        # fails symbol ratio
    (3, ("pneumonoultramicroscopic " * 40).strip()),  # fails word len + stopwords
    (4, ""),                                        # fails tokens
    (5, None),                                      # NULL → keep False
]
TH = dict(min_tokens=30, max_tokens=100_000, min_mean_word_len=3.0,
          max_mean_word_len=10.0, max_symbol_ratio=0.05, min_stopword_hits=2)


@pytest.fixture(scope="module")
def quality_df(spark):
    return spark.createDataFrame(QUALITY_ROWS, "id long, text string")


def test_gopher_rules_semantics(quality_df):
    rules = gopher_rules("text", **TH)
    rows = {r["id"]: r for r in quality_df.select(
        "id", *[v.alias(k) for k, v in rules.items()]).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False and rows[1]["ok_tokens"] is False
    assert rows[2]["keep"] is False and rows[2]["ok_symbols"] is False
    assert rows[3]["ok_word_len"] is False and rows[3]["ok_stopwords"] is False
    # empty/NULL: keep is a real False, never NULL
    assert rows[4]["keep"] is False and rows[5]["keep"] is False


def test_stopword_hits(spark):
    df = spark.createDataFrame(
        [("The THE the and of",), ("neither word",), (None,)], "t string")
    got = [r[0] for r in df.select(stopword_hits_expr("t")).collect()]
    assert got == [3, 0, 0]  # distinct presence, case-folded, not counts


def test_gopher_duckdb_parity(quality_df):
    """Every rule recomputed in DuckDB SQL (the oracle spelling) agrees
    with the Spark expressions row-for-row."""
    rules = gopher_rules("text", **TH)
    spark_pdf = quality_df.select(
        "id", *[v.alias(k) for k, v in rules.items()]).orderBy("id").toPandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(QUALITY_ROWS, columns=["id", "text"]))
    stop_sql = " + ".join(
        f"CASE WHEN regexp_matches(lower(coalesce(text,'')), '\\b{w}\\b') "
        "THEN 1 ELSE 0 END"
        for w in ("the", "and", "of", "to", "in", "is", "for", "that"))
    duck = con.execute(f"""
        WITH f AS (
          SELECT id, coalesce(text, '') AS tx FROM t),
        feat AS (
          SELECT id,
            len(list_filter(string_split_regex(coalesce(tx, ''),
                '\\s+'), t -> t <> '')) AS n_tokens,
            length(tx) AS n_chars,
            length(tx) - length(regexp_replace(tx,'[^\\p{{L}}\\p{{N}}_\\s]','','g')) AS n_punct,
            {stop_sql.replace('text', 'tx')} AS stop_hits
          FROM f)
        SELECT id,
          n_tokens >= {TH['min_tokens']} AND n_tokens <= {TH['max_tokens']}
            AS ok_tokens,
          (n_chars - n_tokens + 1.0)/greatest(n_tokens,1)
              BETWEEN {TH['min_mean_word_len']} AND {TH['max_mean_word_len']}
            AS ok_word_len,
          n_punct*1.0/greatest(n_chars,1) <= {TH['max_symbol_ratio']}
            AS ok_symbols,
          stop_hits >= {TH['min_stopword_hits']} AS ok_stopwords
        FROM feat ORDER BY id""").df()
    for c in ["ok_tokens", "ok_word_len", "ok_symbols", "ok_stopwords"]:
        assert list(spark_pdf[c]) == list(duck[c]), c
