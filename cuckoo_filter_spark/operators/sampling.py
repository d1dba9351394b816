"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need train/val/test splits that are:

* **deterministic** — a re-run (or a retried task on a shuffle-lost
  partition) assigns every row identically; no ``rand()``, no
  ``monotonically_increasing_id``, no dependence on partitioning;
* **key-stable** — every row of a key lands in the same split, and a
  key KEEPS its split as the corpus grows: when yesterday's test
  document reappears in tomorrow's crawl it stays test, so incremental
  re-trains never leak eval data into train;
* **engine-portable** — the assignment rule is plain ANSI SQL (an md5
  hex-prefix compare), so any other engine touching the corpus (a
  DuckDB oracle, a feature store, a downstream Trino job) recomputes
  the SAME split without sharing code. :func:`split_case_sql` emits
  that SQL; it runs unchanged in Spark SQL and DuckDB.

Mechanism: ``h = substr(md5(cast(key as string) || seed), 1, 8)`` — a
uniform 32-bit value as fixed-width lowercase hex, compared AS A STRING
against precomputed cumulative-fraction boundary literals (fixed-width
hex order == numeric order). The whole operator is a pure projection:
JVM-side, whole-stage-codegen'd, zero shuffle, zero Python — at 100 TB
it rides the scan for free. This mirrors how the reference derives all
placement from one hash of the key (cuckoofilter.go:60-78,
singletable.go:60-74) rather than from any mutable state.

NULL keys: :func:`hash_split` assigns them a NULL split (the caller
decides their fate — dropping them silently into one split would skew
it); :func:`hash_sample` drops them, matching SQL WHERE semantics where
a NULL comparison never passes the filter.

Key types: the rule hashes ``CAST(key AS STRING)``, so the
cross-engine portability contract is guaranteed for string and
integral keys (identical canonical text in every engine). Float,
decimal, and timestamp keys render engine-dependent text — within
Spark the assignment is still deterministic, but don't expect another
engine to reproduce it; hash a stable string form of such keys
instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPACE = 1 << 32  # 8 hex chars


def split_boundaries(fractions: list[float]) -> list[str]:
    """Cumulative upper boundaries as 8-char lowercase hex literals,
    one per fraction except the last (which is the CASE's ELSE — no
    rounding gap at the top of the space). Clamped to the 8-hex-char
    space: a cumulative fraction reaching 1.0 within the validation
    tolerance before the LAST split would otherwise format as the
    9-char '100000000', which string-compares BELOW most 8-char hashes
    and misroutes ~15/16 of keys into the saturated split's successors
    (the sliver splits after it keep only the single 'ffffffff' hash —
    their requested fractions were below the space's resolution
    anyway)."""
    bounds, cum = [], 0.0
    for f in fractions[:-1]:
        cum += f
        bounds.append(format(min(int(cum * _SPACE), _SPACE - 1), "08x"))
    return bounds


def _validate_fractions(named: list[tuple[str, float]]) -> None:
    for name, f in named:
        if not (0.0 < f <= 1.0):
            raise ValueError(f"split {name!r} fraction {f} not in (0, 1]")
        if f < 1.0 / _SPACE:
            raise ValueError(
                f"split {name!r} fraction {f} is below hash resolution "
                f"(2^-32); it would never be assigned")
    total = sum(f for _, f in named)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"split fractions must sum to 1 (got {total}); make the "
            f"remainder an explicit split")


def _hex_prefix(key_col: str, seed: str) -> Column:
    s = F.col(key_col).cast("string")
    if seed:
        s = F.concat(s, F.lit(seed))
    return F.substring(F.md5(s.cast("binary")), 1, 8)


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label by hashing
    ``key_col`` — see module docstring for the three guarantees.

    ``splits`` maps label -> fraction (must sum to 1; dict order
    defines the hash-space layout, so keep it stable across runs —
    CHANGING the order or the seed reassigns everything). Returns
    ``df`` plus ``split_col``; NULL keys get a NULL label.
    """
    named = list(splits.items())
    if len(named) < 2:
        raise ValueError("hash_split needs at least two splits "
                         "(use hash_sample for a single keep-fraction)")
    _validate_fractions(named)
    if split_col in df.columns:
        raise ValueError(
            f"split_col {split_col!r} already exists in the DataFrame")

    h = _hex_prefix(key_col, seed)
    expr = F.when(F.col(key_col).isNull(), F.lit(None).cast("string"))
    for (name, _), bound in zip(named, split_boundaries(
            [f for _, f in named])):
        expr = expr.when(h < bound, F.lit(name))
    expr = expr.otherwise(F.lit(named[-1][0]))
    return df.withColumn(split_col, expr)


def sample_expr(key_col: str, fraction: float, seed: str = "") -> Column:
    """Boolean membership column for the deterministic per-key sample —
    the predicate :func:`hash_sample` filters on, exposed so callers can
    carry the flag as a projection instead of materializing the filtered
    frame (the scale-correct phrasing when the flag feeds further
    logic). NULL keys yield NULL (SQL comparison semantics)."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction {fraction} not in (0, 1]")
    if fraction == 1.0:
        return F.col(key_col).isNotNull()
    bound = format(int(fraction * _SPACE), "08x")
    return _hex_prefix(key_col, seed) < F.lit(bound)


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of keys (every row of a kept
    key is kept — a per-KEY Bernoulli sample, not per-row, so sampled
    corpora keep documents whole). Re-runs, retries, and future runs
    over a grown corpus keep the same keys. NULL keys are dropped."""
    return df.where(sample_expr(key_col, fraction, seed))


def stratified_sample_expr(
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "",
    default_fraction: float = 0.0,
) -> Column:
    """Per-stratum keep predicate — the mixture-weighting primitive for
    training corpora (sample each lang/source at its own rate to hit a
    target mixture). Same hash, different boundary per stratum, so it
    stays a pure projection AND keeps the per-key guarantees: a key's
    fate changes only if its stratum's fraction does, and samples stay
    nested per stratum as fractions grow. Strata not listed get
    ``default_fraction`` (0 = drop, the explicit-mixture default).
    NULL keys / NULL strata at a 0 fraction yield NULL/False — both
    fail a WHERE."""
    for name, f in fractions.items():
        if not (0.0 < f <= 1.0):
            raise ValueError(f"stratum {name!r} fraction {f} not in (0, 1]")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(
            f"default_fraction {default_fraction} not in [0, 1]")
    h = _hex_prefix(key_col, seed)

    def keep(f: float) -> Column:
        if f == 0.0:
            return F.lit(False)
        if f == 1.0:
            return F.col(key_col).isNotNull()
        return h < F.lit(format(int(f * _SPACE), "08x"))

    expr = None
    for name, f in fractions.items():
        cond = F.col(strata_col) == F.lit(name)
        expr = F.when(cond, keep(f)) if expr is None else expr.when(
            cond, keep(f))
    if expr is None:
        return keep(default_fraction)
    return expr.otherwise(keep(default_fraction))


def weighted_sample_expr(
    key_col: str,
    fraction_col: str,
    seed: str = "",
) -> Column:
    """Keep predicate with a PER-ROW probability column (e.g. a quality
    score mapped to [0, 1]): row kept iff hash < its own boundary —
    quality-weighted corpus downsampling as a pure projection. Still
    key-deterministic: identical (key, fraction) rows always agree, and
    raising a row's fraction can only add it (nested in the fraction).
    Fractions ≥1 always keep (non-NULL keys), ≤0 never; NULL fraction
    or NULL key yields NULL (dropped by WHERE). The boundary is
    ``lpad(hex(floor(fraction * 2^32)), 8, '0')`` — recompute it in any
    engine with printf('%08x', ...) for the same portability contract
    split_case_sql gives fixed splits."""
    frac = F.col(fraction_col)
    bound = F.lpad(
        F.lower(F.hex(F.floor(frac * F.lit(float(_SPACE))).cast("bigint"))),
        8, "0")
    return (
        F.when(frac >= 1.0, F.col(key_col).isNotNull())
        .when(frac <= 0.0, F.lit(False))
        .otherwise(_hex_prefix(key_col, seed) < bound)
    )


def split_case_sql(key_expr: str, splits: dict[str, float],
                   seed: str = "") -> str:
    """The ANSI-SQL CASE expression computing the IDENTICAL assignment
    :func:`hash_split` makes — runs unchanged in Spark SQL and DuckDB.
    Embed it in any engine's query to reproduce the split without this
    library (the portability contract the module docstring promises)."""
    named = list(splits.items())
    _validate_fractions(named)
    for text in (seed, *(n for n, _ in named)):
        if "'" in text:
            raise ValueError(
                f"{text!r} contains a single quote — it would corrupt "
                f"the emitted SQL literal")
    # STRING, not VARCHAR: Spark SQL rejects bare VARCHAR (requires a
    # length), while STRING is a built-in VARCHAR alias in DuckDB —
    # STRING is the spelling that actually "runs unchanged in both"
    key = f"CAST({key_expr} AS STRING)"
    if seed:
        key = f"{key} || '{seed}'"
    h = f"substr(md5({key}), 1, 8)"
    whens = "\n".join(
        f"    WHEN {h} < '{b}' THEN '{name}'"
        for (name, _), b in zip(
            named, split_boundaries([f for _, f in named])))
    return (f"CASE WHEN {key_expr} IS NULL THEN NULL\n"
            f"{whens}\n"
            f"    ELSE '{named[-1][0]}' END")
