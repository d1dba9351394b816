"""Per-group cuckoo filters and exact grouped distinct counts.

The naive "one applyInPandas task per group" funnels a whole group's
rows through a single task — at web scale one language can be tens of
TB. Both operators here are two-phase instead:

* phase 1 — ``repartition(group, key)`` co-locates identical
  (group, key) pairs, then a ``mapInPandas`` pass dedupes on the RAW
  key per (partition, group) and emits tiny partial rows. Because
  duplicates are co-located, partial distinct counts sum to the exact
  global per-group distinct count — no group ever sits in one task.
* phase 2 — a per-group combine of the partials. For counting this is
  a plain JVM ``groupBy(group).sum`` (bytes per group ≈ 8·P). For
  filter building the combine receives 8 bytes per distinct key of the
  group (the deduped 64-bit hashes), sizes a reference-layout kernel
  for exactly that group's cardinality, and runs the kick loop once.

Scale note: the filter combine is inherently one task per group
(a single filter is one blob); it is bounded by 8 B × group distinct
count, fine to ~10⁸ distinct per group. Beyond that, build per-group
*sharded* filters (operators.sharded) with a composite shard key.

Reference parity: each per-group blob is a §1.5-layout filter
(cuckoofilter.go:216-266 Encode), so merge/delete/probe semantics apply
per group.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.kernel.filter import CuckooKernel, CuckooProbe
from cuckoo_filter_spark.operators.build import (
    DEFAULT_HEADROOM,
    DistinctAccum,
    hashes_of,
)
from cuckoo_filter_spark.params import TABLE_SINGLE, CuckooParams


def _group_field_ddl(df: DataFrame, group_col: str) -> str:
    return f"{group_col} {df.schema[group_col].dataType.simpleString()}"


def _partial_emitter(group_col: str, key_col: str, with_hashes: bool,
                     hash_fn: str = "metro64"):
    """Vectorized per-(partition, group) raw-key dedupe: per-batch pandas
    drop_duplicates on (group, key) + periodic consolidation — no Python
    sets, no per-row object churn. COUNT(DISTINCT) null semantics: null
    keys are excluded (null groups are kept — SQL groups by NULL)."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # shared amortized consolidation policy (build.DistinctAccum);
        # dropna=False — null GROUPS are legal (SQL groups by NULL),
        # null KEYS are filtered per batch below
        acc = DistinctAccum(dropna=False)
        # count-only path: groups whose keys are ALL null must still
        # appear (SQL: COUNT(DISTINCT k) = 0 for them) — track every
        # group seen, not just those contributing non-null keys. The
        # filter-build path intentionally skips them (no keys -> no
        # filter; probes of that group return False).
        gacc = DistinctAccum(dropna=False) if not with_hashes else None
        for pdf in batches:
            u = pdf[[group_col, key_col]]
            acc.add(u[u[key_col].notna()])
            if gacc is not None:
                gacc.add(u[[group_col]].drop_duplicates())
        alldf = acc.consolidated()
        groups, ns, blobs = [], [], []
        if len(alldf) == 0:
            # empty consolidation has no columns — normalize so the
            # group-by below (and dtype probing) still work
            alldf = pd.DataFrame({group_col: [], key_col: []})
        for g, sub in alldf.groupby(group_col, dropna=False, sort=False):
            groups.append(g)
            ns.append(len(sub))
            if with_hashes:
                keys = sub[key_col].reset_index(drop=True)
                blobs.append(hashes_of(keys, hash_fn).astype("<u8").tobytes())
        if gacc is not None:
            gdf = gacc.consolidated()
            seen = (gdf[group_col] if len(gdf)
                    else pd.Series([], dtype=object))
            have = pd.Series(groups, dtype=seen.dtype if len(seen) else None)
            for g in seen[~seen.isin(have)]:
                groups.append(g)
                ns.append(0)
        out = {group_col: groups, "n": ns}
        if with_hashes:
            out["blob"] = blobs
        yield pd.DataFrame(out)

    return emit


def grouped_distinct_count(
    df: DataFrame,
    group_col: str,
    key_col: str,
    num_partitions: int | None = None,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT key) with no per-group task funnel.

    One shuffle of (group, key) rows + one tiny shuffle of partial
    counts; the only per-group work is summing P integers (JVM-side).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sel = df.select(group_col, key_col).repartition(n, F.col(group_col),
                                                   F.col(key_col))
    schema = f"{_group_field_ddl(df, group_col)}, n bigint"
    partials = sel.mapInPandas(
        _partial_emitter(group_col, key_col, with_hashes=False), schema)
    return partials.groupBy(group_col).agg(F.sum("n").alias(out_col))


GROUPED_BUILD_METRICS = (
    "n_distinct bigint, stored bigint, load_factor double, hash_fn string, "
    "blob binary"
)


def build_grouped_filters(
    df: DataFrame,
    group_col: str,
    key_col: str,
    tags_per_bucket: int = 4,
    bits_per_item: int = 16,
    table_type: int = TABLE_SINGLE,
    headroom: float = DEFAULT_HEADROOM,
    num_partitions: int | None = None,
    hash_fn: str = "metro64",
) -> DataFrame:
    """One reference-layout cuckoo membership filter PER GROUP, built
    distributed: the scan/dedupe/hash work is partition-parallel; only
    8 B per distinct key reaches each group's combiner, which sizes the
    kernel for exactly that group's cardinality.

    Returns a DataFrame (group, n_distinct, stored, load_factor, blob);
    ``n_distinct`` is the exact raw-key distinct count, ``stored`` the
    fingerprint-deduped slot count actually in the filter.
    """
    if hash_fn not in ("metro64", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    inner_hash = hash_fn
    sel = df.select(group_col, key_col)
    if hash_fn == "xxhash64":
        # drop null keys BEFORE hashing: F.xxhash64(NULL) = seed 42 (a
        # non-null bigint) would slip past the emitter's notna() filter,
        # inflating n_distinct ("the exact raw-key distinct count") and
        # storing a phantom fingerprint
        sel = sel.where(F.col(key_col).isNotNull()).select(
            group_col, F.xxhash64(key_col).alias(key_col))
        inner_hash = "__prehashed__"
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sel = sel.repartition(n, F.col(group_col), F.col(key_col))
    gddl = _group_field_ddl(df, group_col)
    partials = sel.mapInPandas(
        _partial_emitter(group_col, key_col, with_hashes=True, hash_fn=inner_hash),
        f"{gddl}, n bigint, blob binary",
    )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        n_distinct = int(pdf["n"].sum())
        h = (np.concatenate(
            [np.frombuffer(bytes(b), dtype="<u8") for b in pdf["blob"]])
            if len(pdf) else np.zeros(0, dtype=np.uint64))
        params = CuckooParams.for_capacity(
            max(int(n_distinct * headroom), 64), tags_per_bucket,
            bits_per_item, table_type)
        kern = CuckooKernel(params)
        idx, tag = params.split(h)
        stored = kern.insert_pairs(idx, tag, dedupe=True)
        return pd.DataFrame({
            group_col: [pdf[group_col].iloc[0]],
            "n_distinct": [n_distinct],
            "stored": [stored],
            "load_factor": [kern.load_factor()],
            "hash_fn": [hash_fn],
            "blob": [kern.to_bytes()],
        })

    return partials.groupBy(group_col).applyInPandas(
        combine, f"{gddl}, {GROUPED_BUILD_METRICS}")


# grouped_anti_join(via='auto') switches from the broadcast probe to the
# cogroup probe above this many groups: past a few thousand groups the
# driver dict + broadcast of every blob stops being "small" (MBs × 10^3),
# while the cogroup path's extra probe shuffle amortizes.
AUTO_COGROUP_GROUPS = 2048

_GROUP_KERNEL_CACHE: dict = {}


def grouped_might_contain_udf(spark, filters: DataFrame | dict):
    """Broadcast probe over per-group filters: ``f(group_col, key_col)
    -> boolean Column``. The filters frame (one small blob row per
    group) is collected + broadcast; probes route to their group's
    kernel inside an Arrow-batched pandas UDF. Keys whose group has no
    filter return False (nothing was inserted for that group).

    Bound: this path materializes EVERY group's blob in a driver dict
    and broadcasts the lot — right for modest group spaces (per-lang
    filters: dozens of groups, MBs total). At 10^5+ groups × MB-scale
    blobs the dict and the broadcast both blow up; use
    :func:`grouped_might_contain_join` there (cogroup by group, no
    driver materialization, no broadcast).

    metro64 probes only: the filters frame records the build hash_fn
    and any non-metro64 build is rejected here (probing an xxhash64
    build with metro64 fingerprints would silently answer False for
    everything). Dict inputs are assumed metro64."""
    if isinstance(filters, DataFrame):
        cols = filters.columns
        gcol = cols[0]
        sel = [gcol, "blob"] + (["hash_fn"] if "hash_fn" in cols else [])
        rows = filters.select(*sel).collect()
        bad = {r["hash_fn"] for r in rows
               if "hash_fn" in cols and r["hash_fn"] != "metro64"}
        if bad:
            raise ValueError(
                f"grouped filters built with {sorted(bad)}; the grouped "
                f"probe hashes with metro64 and would miss every member")
        blobs = {r[0]: bytes(r["blob"]) for r in rows}
        if len(blobs) != len(rows):
            # same guard as the cogroup probe: dict construction would
            # keep ONE blob per group and silently drop the other
            # filters' memberships (false negatives)
            raise ValueError(
                f"grouped filters frame has {len(rows)} blob rows but "
                f"only {len(blobs)} distinct groups — duplicate rows "
                f"per group (were two builds unioned?)")
    else:
        blobs = {g: bytes(b) for g, b in filters.items()}
    bcast = spark.sparkContext.broadcast(blobs)
    bid = bcast._jbroadcast.id()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def probe(groups: pd.Series, keys: pd.Series) -> pd.Series:
        out = np.zeros(len(keys), dtype=bool)
        codes, uniques = pd.factorize(groups, use_na_sentinel=True)
        for ci, g in enumerate(uniques):
            blob = bcast.value.get(g)
            if blob is None:
                continue
            ck = (bid, g)
            kern = _GROUP_KERNEL_CACHE.get(ck)
            if kern is None:
                if len(_GROUP_KERNEL_CACHE) > 256:
                    _GROUP_KERNEL_CACHE.clear()
                kern = CuckooProbe(blob)
                _GROUP_KERNEL_CACHE[ck] = kern
            mask = codes == ci
            out[mask] = kern.contain(keys[mask])
        return pd.Series(out)

    def might_contain(group_col, key_col):
        g = F.col(group_col) if isinstance(group_col, str) else group_col
        k = F.col(key_col) if isinstance(key_col, str) else key_col
        return probe(g, k)

    return might_contain


def grouped_might_contain_join(
    probe: DataFrame,
    group_col: str,
    key_col: str,
    filters: DataFrame,
    flag_col: str = "might_contain",
    salt: int | None = None,
) -> DataFrame:
    """Beyond-broadcast grouped probe: cogroup the probe rows with the
    per-group blob rows BY GROUP, so each task loads exactly ONE group's
    kernel — no driver dict of all blobs, no broadcast. The probe path
    for high-cardinality group spaces (10^5+ groups), where
    grouped_might_contain_udf's collect+broadcast blows up; same shape
    as sharded.sharded_might_contain_join with the group as the routing
    key. One shuffle of the probe rows; blob rows shuffle once (tiny).

    salt: groups are NOT uniform the way shards are — one hot group
    (e.g. lang='en' at 30% of a corpus) funnels through one task. With
    ``salt=R`` each blob row is replicated R ways and probe rows route
    to (group, hash(key) % R), bounding the funnel to 1/R of the group
    per task at the cost of shuffling R copies of each blob.

    Returns probe columns + boolean ``flag_col``. Keys whose group has
    no filter row get False — including NULL-group rows: a NULL group
    equals nothing under SQL IN/EXISTS semantics, and the broadcast
    probe (factorize NA sentinel) already answers False there, so the
    NULL-group blob rows are excluded from the cogroup rather than
    letting Spark's groupBy pair the two NULL groups and silently
    diverge from the broadcast path. Supports both recorded hash_fns
    (xxhash64 probes pre-hash JVM-side, exactly like the sharded
    join)."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    cols = probe.columns
    # build a FRESH StructType: StructType.add mutates in place, so
    # probe.schema.add(...) would plant a phantom flag column in the
    # caller's DataFrame's cached schema
    out_schema = StructType(list(probe.schema.fields)
                            + [StructField(flag_col, BooleanType())])

    fns = ([r["hash_fn"] for r in
            filters.select("hash_fn").distinct().collect()]
           if "hash_fn" in filters.columns else ["metro64"])
    if len(fns) > 1:
        raise ValueError(f"filters frame mixes hash_fns {sorted(fns)}")
    hash_fn = fns[0] if fns else "metro64"

    gcol = filters.columns[0]
    # NULL-group parity with the broadcast probe (see docstring): the
    # NULL group's blob never participates, so NULL-group probe rows
    # cogroup against an empty right side and flag False
    blobs = filters.select(F.col(gcol).alias(group_col), "blob").where(
        F.col(group_col).isNotNull())
    probe_k = probe
    if hash_fn == "xxhash64":
        probe_k = probe_k.withColumn("__h", F.xxhash64(F.col(key_col)))
    group_keys = [group_col]
    if salt is not None:
        if salt <= 0:
            raise ValueError("salt must be a positive replication count")
        # deterministic per-key salt so identical keys still co-route;
        # blob rows replicate across every salt value
        probe_k = probe_k.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt)).cast("int"))
        blobs = blobs.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        group_keys = [group_col, "__salt"]

    def probe_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(columns=cols + [flag_col])
        out = left[cols].copy()
        if len(right) == 0:
            out[flag_col] = False
            return out
        if len(right) > 1:
            # ADVICE r4: probing only blob row 0 would silently drop
            # the other filters' memberships (false negatives) — e.g.
            # an accidental union of two builds' filter frames
            raise ValueError(
                f"grouped_might_contain_join: {len(right)} blob rows "
                f"for one (group[, salt]) — the filters frame must "
                f"carry exactly one row per group (were two builds "
                f"unioned?)")
        kern = CuckooProbe(bytes(right["blob"].iloc[0]))
        if hash_fn == "xxhash64":
            h = left["__h"].to_numpy(dtype="int64").view(np.uint64)
            idx, tag = kern.params.split(h)
            out[flag_col] = kern.contain_hashed(idx, tag)
        else:
            out[flag_col] = kern.contain(left[key_col])
        return out

    return (
        probe_k.groupBy(*group_keys)
        .cogroup(blobs.groupBy(*group_keys))
        .applyInPandas(probe_group, out_schema)
    )


def grouped_anti_join(
    probe: DataFrame,
    group_col: str,
    key_col: str,
    seen: DataFrame,
    filters: DataFrame | None = None,
    via: str = "broadcast",
    **build_kwargs,
) -> DataFrame:
    """Exact per-group anti join (rows of ``probe`` whose (group, key)
    does NOT appear in ``seen``), cuckoo-accelerated: definite
    non-members of their group's filter bypass the verification join;
    only maybe-members are checked with an exact left_anti on
    (group, key). The per-group incremental-dedup pattern.

    via='broadcast' (default) probes through the collected+broadcast
    blob dict — right for modest group counts; via='cogroup' routes
    probe rows to blob rows by group (grouped_might_contain_join) so
    high-cardinality group spaces never materialize all blobs on the
    driver; via='auto' counts the (small) filters frame and picks
    cogroup above AUTO_COGROUP_GROUPS groups."""
    if via not in ("broadcast", "cogroup", "auto"):
        raise ValueError(f"unknown via {via!r}")
    if build_kwargs.get("hash_fn", "metro64") != "metro64":
        # the cogroup probe handles xxhash64 (JVM-side pre-hash, checked
        # against the filters frame's recorded hash_fn); the BROADCAST
        # probe is metro64-only, so xxhash64 routes to cogroup and an
        # explicit via='broadcast' fails loud
        if via == "broadcast":
            raise ValueError(
                "grouped_anti_join via='broadcast' probes with metro64; "
                "use via='cogroup' (or 'auto') for an xxhash64 grouped "
                "build")
        via = "cogroup"
    built_here = filters is None
    if built_here:
        # materialize the internally-built filters ONCE (one tiny row
        # per group): every route has multiple consumers of this frame —
        # auto's routing count, the cogroup probe's hash_fn check + the
        # two union branches below — and each would otherwise re-execute
        # the full two-phase grouped build.
        filters = build_grouped_filters(
            seen, group_col, key_col, **build_kwargs).localCheckpoint()
    if not built_here:
        # caller-passed frame: still materialize before the multiple
        # consumers (auto's routing count, the cogroup probe's hash_fn
        # collect, and the two union branches) — one tiny row per group,
        # so the checkpoint is cheap on EVERY route, and a caller's
        # expensive upstream build plan never re-executes
        filters = filters.localCheckpoint()
    if via == "auto":
        # one tiny agg over the one-row-per-group filters frame; limit()
        # bounds the job at the threshold instead of a full count
        over = filters.limit(AUTO_COGROUP_GROUPS + 1).count()
        via = "cogroup" if over > AUTO_COGROUP_GROUPS else "broadcast"
    if via == "cogroup":
        flagged = grouped_might_contain_join(
            probe, group_col, key_col, filters, flag_col="__maybe")
        # the cogroup probe is a full shuffle + Python pass over every
        # probe row, and the flagged frame feeds BOTH union branches
        # below — materialize it once instead of running the probe
        # twice (the cuckoo_anti_join double-scan trade is deliberate
        # for cheap scan-stage probes; a cogroup pass is not cheap)
        flagged = flagged.localCheckpoint()
    else:
        mc = grouped_might_contain_udf(probe.sparkSession, filters)
        flagged = probe.withColumn("__maybe", mc(group_col, key_col))
    definite_out = flagged.where(~F.col("__maybe")).drop("__maybe")
    maybe = flagged.where(F.col("__maybe")).drop("__maybe")
    rhs = seen.select(group_col, key_col).dropDuplicates([group_col, key_col])
    verified_out = maybe.join(rhs, on=[group_col, key_col], how="left_anti")
    return definite_out.unionByName(verified_out)
