"""Domain/host policy filtering — blocklist pruning for crawl corpora.

A web-corpus pipeline's first pass drops every page whose host falls
under a blocked registrable domain (adult/spam/malware lists — UT1
style). "Falls under" is subdomain-aware: blocking ``example.com``
also blocks ``a.b.example.com``, but NOT ``notexample.com`` (label
boundary, not substring).

Two execution shapes, both shuffle-free on the pages side:

* **literal blocklist** (list/tuple, ≤ ``MAX_LITERAL_BLOCKLIST``
  entries): the host's dot-suffixes are generated map-side (≤ #labels
  per host, a bounded JVM ``transform``) and tested with
  ``arrays_overlap`` against one literal array — a pure projection,
  zero joins, zero Exchange, whole-stage codegen.
* **DataFrame blocklist** (beyond-literal scale, e.g. millions of UT1
  domains): the slim ``(row id, suffix)`` explode broadcast-semi-joins
  the blocklist, and the surviving/blocked ids broadcast back onto the
  pages — page BODIES never shuffle; only ids and ≤ #labels×ids of
  suffix strings move, and both joins are broadcast by construction.

(Reference scope note: linvon/cuckoo-filter has no URL surface; this is
part of the grafted crawl-pipeline scope, sibling of functions/web.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cuckoo_filter_spark.functions.web import host_of

# a literal IN-array beyond this is plan bloat; route via DataFrame
MAX_LITERAL_BLOCKLIST = 10_000


def normalize_domain(d) -> Column:
    """Blocklist-entry normalization: lowercase, strip one leading
    ``www.`` and any leading/trailing dots."""
    c = F.col(d) if isinstance(d, str) else d
    low = F.lower(F.trim(c))
    return F.regexp_replace(F.regexp_replace(low, r"^(www\.)", ""),
                            r"^\.+|\.+$", "")


def host_suffixes_expr(host) -> Column:
    """All label-boundary suffixes of a host, JVM-side:
    ``a.b.example.com → [a.b.example.com, b.example.com, example.com,
    com]``. NULL/empty host → empty array. Bounded by the label count
    (crawl hosts: ≤ ~6), so the expansion is a constant-factor
    projection — never a shuffle."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(F.coalesce(h, F.lit("")), r"\.")
    n = F.size(labels)
    suf = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    return F.when(F.length(F.coalesce(h, F.lit(""))) > 0, suf).otherwise(
        F.array().cast("array<string>")
    )


def blocked_host_expr(host, blocklist: list[str] | tuple[str, ...]) -> Column:
    """Boolean: host falls under any blocked domain (literal path)."""
    if len(blocklist) > MAX_LITERAL_BLOCKLIST:
        raise ValueError(
            f"literal blocklist has {len(blocklist)} entries > "
            f"{MAX_LITERAL_BLOCKLIST}; pass it as a DataFrame to "
            "blocklist_filter instead (broadcast-join path)")
    norm = sorted({d.strip().lower().lstrip(".").rstrip(".")
                   for d in blocklist if d and d.strip()})
    norm = [d[4:] if d.startswith("www.") else d for d in norm]
    if not norm:
        return F.lit(False)
    lit = F.array(*[F.lit(d) for d in norm])
    # coalesce: arrays_overlap is three-valued around NULLs; a filter
    # predicate must be strictly boolean (NULL would silently drop)
    return F.coalesce(F.arrays_overlap(host_suffixes_expr(host), lit),
                      F.lit(False))


def blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocklist,
    *,
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or, with ``keep_blocked=True``, keep only) the rows whose
    URL host falls under a blocked domain.

    ``blocklist`` is either a list/tuple of domain strings (literal
    zero-join path) or a DataFrame with ``domain_col`` (broadcast-join
    path for large lists). Unparseable URLs have a NULL host and are
    never blocked (policy: a dirty URL column must not silently lose
    rows — drop them explicitly upstream if desired)."""
    host = host_of(F.col(url_col))
    if isinstance(blocklist, (list, tuple, set, frozenset)):
        hit = blocked_host_expr(host, tuple(blocklist))
        return df.where(hit if keep_blocked else ~hit)

    if not isinstance(blocklist, DataFrame):
        raise TypeError(
            f"blocklist must be a list/tuple or DataFrame, got "
            f"{type(blocklist).__name__}")
    clash = [c for c in ("__host", "__suf") if c in df.columns]
    if clash:
        raise ValueError(
            f"input column(s) {clash} collide with blocklist_filter's "
            "internal names")
    # no blocklist-side '__dom' guard: the select-with-alias below
    # produces a single-column frame, so an unrelated '__dom' column in
    # the blocklist never becomes ambiguous
    dom = (blocklist.select(normalize_domain(domain_col).alias("__dom"))
           .where(F.length("__dom") > 0).dropDuplicates())
    with_host = df.withColumn("__host", host)
    # slim explode: only (host) suffixes leave the row — and only into a
    # broadcast hash join, so the pages side still has no Exchange
    suffixed = with_host.select(
        "__host", F.explode(host_suffixes_expr(F.col("__host"))).alias("__suf")
    ).dropDuplicates(["__host", "__suf"])
    blocked_hosts = (
        suffixed.join(F.broadcast(dom), suffixed["__suf"] == dom["__dom"],
                      "left_semi")
        .select("__host").dropDuplicates()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    # blocked-host set = DISTINCT corpus hosts under blocked domains —
    # normally tiny (broadcast; AQE picks that up from runtime size).
    # Deliberately NOT F.broadcast-forced: a pathological blocklist
    # covering 10^8 subdomain hosts must degrade to a shuffle join, not
    # OOM the driver.
    out = with_host.join(blocked_hosts, "__host", how)
    return out.drop("__host")
