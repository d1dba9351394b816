"""Deterministic global shuffle — stable training-data ordering + shards.

Before a corpus ships to a trainer it gets one last global shuffle
(decorrelate adjacent crawl pages / sources) and is written as N
balanced shards. Doing that with ``rand()`` or ``repartitionByRange``
is wrong at scale: ``rand()`` reassigns on every task retry (a shuffle-
lost partition re-rolls its rows — the written corpus is then NOT the
corpus any downstream audit recomputes), and range partitioning samples
its boundaries (nondeterministic, unreproducible). This module derives
BOTH the shard and the within-shard order from ``md5(key || seed)``:

* **order key** (:func:`shuffle_order_expr`) — the full 32-hex md5
  digest; fixed-width hex compares as a string exactly like the
  128-bit integer, in every engine.
* **shard id** (:func:`shard_id_expr`) — the first 8 hex chars as a
  uniform 32-bit value ``v``, bucketed equal-width:
  ``(v * num_shards) >> 32``. Balanced in expectation (uniform hash),
  deterministic, and a pure whole-stage-codegen projection — zero
  joins, zero Exchange, zero Python (same contract as
  operators/sampling.py, whose md5 hex-prefix idiom this extends; the
  reference likewise derives all placement from one hash of the key,
  cuckoofilter.go:60-78).

Scale shape: :func:`assign_shards` rides the scan for free at 100 TB.
The writer path (:func:`shuffle_within_shards`) is ONE Exchange on the
shard id plus a per-partition sort — exactly the minimum any global
shuffle must pay — and every byte of it is retry-deterministic: a
re-executed task reproduces its partition bit-for-bit. Write the result
with ``partitionBy(shard_col)`` for file-per-shard output.

Ordering contract: rows are ordered by (order key, key); rows sharing
a key stay adjacent but are mutually unordered — pass a unique key
(e.g. doc_id) when total order matters. Key-type portability matches
sampling.py: string/integral keys reproduce cross-engine; NULL keys get
shard/order NULL (callers decide their fate explicitly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPACE_BITS = 32  # 8 hex chars — same space as operators/sampling.py


def _keyed(key_col: str, seed: str) -> Column:
    s = F.col(key_col).cast("string")
    if seed:
        s = F.concat(s, F.lit(seed))
    return s


def shuffle_order_expr(key_col: str, seed: str = "") -> Column:
    """Full 32-hex md5 order key (fixed-width hex: string order ==
    numeric order). NULL key -> NULL."""
    return F.md5(_keyed(key_col, seed).cast("binary"))


def shard_id_expr(key_col: str, num_shards: int, seed: str = "") -> Column:
    """Equal-width shard bucket of the hash prefix: ``(v * n) >> 32``
    with ``v`` uniform in [0, 2^32). Deterministic, balanced in
    expectation, pure projection. NULL key -> NULL."""
    if not (1 <= num_shards <= (1 << 31)):
        raise ValueError(f"num_shards {num_shards} not in [1, 2^31]")
    v = F.conv(
        F.substring(shuffle_order_expr(key_col, seed), 1, 8), 16, 10
    ).cast("bigint")
    return F.shiftright(v * F.lit(num_shards), _SPACE_BITS).cast("int")


def assign_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    seed: str = "",
    *,
    shard_col: str = "shard",
    order_col: str | None = None,
) -> DataFrame:
    """Add the deterministic shard id (and, optionally, the order key)
    as projected columns — zero Exchange; the decide-where-everything-
    goes half of the shuffle, free at any scale."""
    for c in (shard_col, order_col):
        if c is not None and c in df.columns:
            raise ValueError(f"column {c!r} already exists in the DataFrame")
    out = df.withColumn(shard_col, shard_id_expr(key_col, num_shards, seed))
    if order_col is not None:
        out = out.withColumn(order_col, shuffle_order_expr(key_col, seed))
    return out


def shuffle_within_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    seed: str = "",
    *,
    shard_col: str = "shard",
) -> DataFrame:
    """The writer path: assign shards, move each shard to one place
    (ONE hash Exchange on the shard id — the minimum any global shuffle
    pays), and sort (shard, order key, key) within partitions so each
    shard's rows are contiguous and in their final deterministic order.
    Follow with ``.write.partitionBy(shard_col)`` for file-per-shard.
    """
    okey = "__shuffle_okey"
    out = assign_shards(df, key_col, num_shards, seed,
                        shard_col=shard_col, order_col=okey)
    return (
        out.repartition(num_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, okey, key_col)
        .drop(okey)
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int,
    seed: str = "",
    *,
    shard_col: str = "shard",
    mode: str = "error",
) -> dict:
    """The sink composition: run the writer path and persist it as
    parquet partitioned by the shard id (``path/shard=N/...``, one
    task per shard ⇒ one file per shard at typical sizes), then verify
    the write by re-reading: returns a manifest dict
    ``{'num_shards', 'seed', 'key_col', 'rows_written', 'shards':
    {shard: n_rows}}``. The verification scan is the cheap kind (count
    per partition directory — column-pruned to nothing but the
    partition value).

    Determinism contract carries through the files: a re-executed
    writer task reproduces its shard byte-for-bit (every value is a
    pure function of the key and seed), so speculative execution or
    task retries cannot fork the corpus. Any engine can re-derive the
    placement from ``shuffle_sql(key, num_shards, seed)``.

    ``mode`` passes through to the DataFrameWriter (``'error'`` by
    default — a corpus snapshot should never be silently clobbered;
    pass ``'overwrite'`` deliberately).

    NULL keys fail LOUD before any file commits: ``assign_shards``
    gives them shard NULL (a caller-visible column — callers decide),
    but a PERSISTED corpus with rows hidden in a
    ``__HIVE_DEFAULT_PARTITION__`` directory and a manifest crash after
    the data is already on disk is the worst of both; the check is a
    zero-scan projection guard (``raise_error`` inside the write plan),
    so the job aborts in the write stage and the staged files are never
    committed.
    """
    checked = df.withColumn(
        key_col,
        F.when(
            F.col(key_col).isNull(),
            F.raise_error(F.lit(
                f"write_shuffled_shards: NULL {key_col!r} key — NULL keys "
                "have no deterministic shard; filter or fill them "
                "explicitly before writing")),
        ).otherwise(F.col(key_col)),
    )
    out = shuffle_within_shards(checked, key_col, num_shards, seed,
                                shard_col=shard_col)
    out.write.mode(mode).partitionBy(shard_col).parquet(path)
    back = df.sparkSession.read.parquet(path)
    counts = {int(r[shard_col]): int(r["n"])
              for r in back.groupBy(shard_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    return {
        "num_shards": num_shards,
        "seed": seed,
        "key_col": key_col,
        "rows_written": sum(counts.values()),
        "shards": counts,
    }


def shuffle_sql(key_expr: str, num_shards: int, seed: str = "") -> dict[str, str]:
    """The ANSI/DuckDB spellings of the IDENTICAL order key and shard
    id (``{'order': ..., 'shard': ...}``) — any engine touching the
    corpus recomputes the same shuffle without this library; the driver
    oracle embeds these verbatim, so engine drift is a hash mismatch,
    not a silent divergence. (Spark uses ``conv(hex, 16, 10)``; DuckDB
    spells that ``CAST('0x' || hex AS BIGINT)`` — same value.)"""
    if not (1 <= num_shards <= (1 << 31)):
        raise ValueError(f"num_shards {num_shards} not in [1, 2^31]")
    if "'" in seed:
        raise ValueError(
            f"seed {seed!r} contains a single quote — it would corrupt "
            f"the emitted SQL literal")
    key = f"CAST({key_expr} AS VARCHAR)"
    if seed:
        key = f"{key} || '{seed}'"
    order = f"md5({key})"
    shard = (f"CAST((CAST('0x' || substr({order}, 1, 8) AS BIGINT) "
             f"* {num_shards}) >> {_SPACE_BITS} AS INT)")
    return {"order": order, "shard": shard}
