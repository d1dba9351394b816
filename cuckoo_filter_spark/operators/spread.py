"""Scale-adaptive input spreading for compute-heavy map-side stages.

Local/bench parquet inputs are often ONE file with ONE row group —
Spark cannot split such a scan, so every map-side stage downstream of
it (fingerprint hashing, regex projections, n-gram explodes, signature
UDFs) runs in a SINGLE task no matter how many cores the session has.
At production scale the same tables arrive as thousands of files and
the scan parallelizes naturally, so an unconditional ``repartition``
would add a full corpus shuffle exactly where the 100 TB plan must not
have one (optimization guide §2.4: remove shuffles outright; the
map-side shapes pinned in PLANS.md exist to keep text bodies out of
Exchanges).

``spread_small_input`` resolves the tension scale-adaptively (guide
§2.5: derive partitioning from the input, never from a constant tuned
to one cluster size): the frame is round-robin repartitioned to the
session parallelism ONLY when

* the optimizer's size estimate says the WHOLE input is trivially
  small (``max_bytes``, default 512 MiB — one sub-second local
  shuffle), AND
* it arrives in fewer partitions than the session has slots (the
  single-row-group regime).

Above the bound — any real corpus — the function returns ``df``
unchanged: zero added Exchange, the plan identical to never calling
it. Round-robin repartition is retry-deterministic (Spark sorts before
round-robin partitioning, SPARK-23207), so double-consumer plans
(cuckoo_anti_join's bypass/verify split, dedup's multi-branch reads)
stay consistent across re-executions.

``materialize=True`` additionally ``localCheckpoint``s the spread
frame — for inputs consumed by many branches (planted batches feeding
three near-dup algorithms) where recomputing the scan per branch costs
more than holding the (by construction tiny) frame in block storage.
It only applies when the spread fired: at scale the
re-read-pruned-parquet-vs-materialize trade keeps favoring the re-read
(the cuckoo_anti_join contract), and this helper never changes that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Inputs whose optimizer size estimate exceeds this are NEVER touched.
DEFAULT_SPREAD_MAX_BYTES = 512 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """The optimizer's size estimate for ``df`` (bytes), or None when
    unavailable. Driver-side only — no job runs."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return None


def spread_small_input(
    df: DataFrame,
    max_bytes: int = DEFAULT_SPREAD_MAX_BYTES,
    target: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Round-robin repartition ``df`` to the session parallelism when it
    is provably tiny AND under-partitioned; exact no-op otherwise.

    See the module docstring for the policy. Results are unchanged for
    any partitioning-independent computation (all library operators are
    — aggregations, joins, per-row projections/UDFs, hash builds with
    global dedupe); callers with partition-SENSITIVE estimators (e.g.
    t-digest ordering effects) should not spread their inputs.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    est = plan_size_bytes(df)
    if est is None or est > max_bytes:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    out = df.repartition(target)
    if materialize:
        # lazy: the checkpoint materializes inside the first consuming
        # action (all consumers share the checkpointed RDD — the input
        # is still computed exactly once) instead of a blocking pre-job
        out = out.localCheckpoint(eager=False)
    return out
