"""Budget-capped selection — "take the best documents per group until
a token budget is spent".

Trainer mixes are specified as per-language / per-source token quotas
("20 B tokens of lang=en from source=web, ranked by quality"). This
operator is the declarative core: within each group, order rows by a
caller-supplied TOTAL order and keep the prefix whose running amount
fits the budget.

Spark shape: ONE hash Exchange on the group columns + one in-partition
sort feeds a running-``SUM`` window and a codegen filter — the same
single-shuffle discipline as operators/packing.py (whose prefix-sum
idiom this reuses for selection instead of bin assignment). No Python,
no second shuffle, and the running sum is ANSI SQL
(``SUM() OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)``),
so the oracle recomputes the exact rule.

Policies for the straddling row (the first row that would overflow):

* ``'strict'`` (default) — keep a row only if the budget still covers
  it entirely; the selected amount never exceeds the budget.
* ``'straddle'`` — additionally keep the first overflowing row, so
  every non-empty group with a POSITIVE budget selects at least one
  row (the "never emit an empty quota" choice). With a zero budget
  the straddle clause never fires; only zero-COST rows (which spend
  nothing) are kept, under either policy.

The order MUST be total (break ties — e.g. append a unique id column):
with ties, "the prefix" is not well-defined and retries could select a
different subset.

Scale bound (same recurrence as operators/packing.py): the running sum
needs a TOTAL order per group, so each group lands in ONE task — the
window sorts the whole group in a single (spillable) partition. Fine
for per-(lang, source) quotas (thousands of groups); a GLOBAL "20 B
tokens of en" budget at 100 TB would single-task-sort ~10¹¹ rows.
Mitigation: the opt-in ``prepass_on`` two-pass threshold pre-pass —
pass 1 approx-quantile-buckets the leading order column per group
(partial-agg, parallel), pass 2 sums amounts per (group, bucket)
(partial-agg, parallel) and finds the bucket where the running total
passes the budget; only rows at or below that boundary reach the exact
window, so the single-task sort touches ~budget-sized data instead of
the whole group. The pre-pass is a PREFIX-CLOSED SUPERSET filter
(proof in ``_budget_prepass``), so the selection is bit-identical —
the oracle predicate is unchanged.

Pre-pass regime: FEW, HUGE groups (a global budget, a handful of
per-language quotas) — exactly the case where the one-task bound
bites. Its boundary/threshold frames hold one row per group
(``prepass_buckets``-1 doubles each) and are broadcast, so a
many-small-groups workload (per-host quotas over 10⁸ hosts) should
NOT enable the pre-pass: each group is already tiny there, the exact
window is already parallel across groups, and the broadcast would be
the new bottleneck.

Reference scope note: linvon/cuckoo-filter has no selection surface;
grafted LLM-pipeline scope, sibling of operators/sampling.py (which
handles the RATE-based mixture; this is the QUOTA-based one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_POLICIES = ("strict", "straddle")


def _budget_prepass(
    df: DataFrame,
    group_cols,
    prepass_on: str,
    checked_amount: Column,
    budget,
    n_buckets: int,
) -> DataFrame:
    """Prefix-closed superset filter ahead of the exact window.

    Correctness (why the selection is unchanged): let ``R_b`` be the
    running bucket-sum of amounts over buckets ``0..b`` and ``cut =
    min{b : R_b > budget}`` (STRICTLY greater — ``>=`` would wrongly
    clip all-zero-amount groups under a zero budget). Any selected row
    ``r`` — strict or straddle — has inclusive running sum
    ``run(r) <= budget`` or exclusive prefix ``< budget``, and every
    row of buckets before ``b(r)`` precedes ``r`` in order, so
    ``R_{b(r)-1} <= budget`` ⇒ ``b(r) <= cut``. Keeping buckets
    ``<= cut`` (i.e. rows with leading key <= the cut boundary value)
    therefore keeps every selectable row; dropped rows were never
    reachable. The kept set is prefix-closed because the leading order
    key is ascending.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    gc = list(group_cols)
    ok = F.col(prepass_on)
    # NULL leading keys sort FIRST under Spark ASC — they'd sit at the
    # selection front yet fail the threshold comparison; fail loud.
    df = df.withColumn(
        prepass_on,
        F.when(ok.isNull(), F.raise_error(F.lit(
            f"take_until_budget: NULL {prepass_on!r} with prepass_on — "
            "NULL order keys sort ahead of every threshold"))
        ).otherwise(ok))
    bounds = df.groupBy(*gc).agg(
        F.percentile_approx(prepass_on, qs, 10_000).alias("__qb"))
    bkt = F.size(F.filter(F.col("__qb"), lambda q: q < F.col(prepass_on)))
    # __qb is CARRIED through the aggregations rather than re-joined from
    # `bounds`: percentile_approx's reduce-side merge is fetch-order-
    # sensitive, so a second evaluation of `bounds` (plan branch reuse is
    # not guaranteed, and retries recompute) could yield a slightly
    # different boundary array than the one that bucketed the rows —
    # cut index and threshold value MUST come from the same array or the
    # superset proof above does not hold.
    sums = (
        df.join(F.broadcast(bounds), on=gc)
        .groupBy(*gc, bkt.alias("__bkt"))
        .agg(F.sum(checked_amount).alias("__s"),
             F.first("__qb").alias("__qb"))
    )
    wcum = (
        Window.partitionBy(*gc).orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = (
        sums.withColumn("__cum", F.sum("__s").over(wcum))
        .where(F.col("__cum") > budget)
        .groupBy(*gc).agg(F.min("__bkt").alias("__cut"),
                          F.first("__qb").alias("__qb"))
    )
    # boundary VALUE = element cut+1 (1-based) of the B-1 boundaries;
    # cut >= B-1 (or no crossing) -> no threshold -> group keeps all
    thr = (
        cut.where(F.col("__cut") < len(qs))
        .select(*gc, F.element_at(
            "__qb", F.col("__cut").cast("int") + 1).alias("__thr"))
    )
    return (
        df.join(F.broadcast(thr), on=gc, how="left")
        .where(F.col("__thr").isNull() | (F.col(prepass_on) <= F.col("__thr")))
        .drop("__thr")
    )


def take_until_budget(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    order_by: list[Column | str] | tuple,
    amount_col: str,
    budget,
    policy: str = "strict",
    running_col: str | None = None,
    prepass_on: str | None = None,
    prepass_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` selected per group, in ``order_by`` order, until
    ``budget`` of ``amount_col`` is spent (see module doc for the
    straddle policy). ``budget`` is a number or a Column (e.g. a
    per-group quota joined in upstream). NULL or negative amounts
    raise at runtime — a negative amount silently refunds budget to
    every later row; a NULL poisons the running sum.

    ``running_col`` optionally emits the inclusive running amount.

    ``prepass_on`` enables the two-pass threshold pre-pass for huge
    groups (module doc "Scale bound"): it must NAME the leading
    ``order_by`` column (a string, ascending, numeric, non-NULL —
    negate a score upstream for "best first"), and ``budget`` must be
    a scalar. Two extra column-pruned scans buy a window input of
    ~budget-sized prefixes instead of whole groups; output is
    bit-identical (superset proof on :func:`_budget_prepass`).
    """
    if policy not in _POLICIES:
        raise ValueError(f"policy {policy!r} not in {_POLICIES}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use a constant "
                         "literal column for a global budget)")
    if not order_by:
        raise ValueError("order_by must be non-empty and a TOTAL order")
    for c in ("__run", "__qb", "__bkt", "__thr"):
        if c in df.columns:
            raise ValueError(f"input column {c!r} collides with an "
                             "internal name")
    if running_col is not None and running_col in df.columns:
        raise ValueError(f"running_col {running_col!r} already exists")
    amount = F.col(amount_col)
    checked = F.when(
        amount.isNull() | (amount < 0),
        F.raise_error(F.concat(
            F.lit(f"take_until_budget: NULL/negative {amount_col}: "),
            F.coalesce(amount.cast("string"), F.lit("NULL")))),
    ).otherwise(amount)
    b = budget if isinstance(budget, Column) else F.lit(budget)
    if prepass_on is not None:
        if isinstance(budget, Column):
            raise ValueError("prepass_on requires a scalar budget (the "
                             "bucket cutoff is resolved per group against "
                             "one number)")
        if not isinstance(order_by[0], str) or order_by[0] != prepass_on:
            raise ValueError(
                f"prepass_on {prepass_on!r} must equal order_by[0], given "
                "as a column NAME (got "
                f"{order_by[0] if isinstance(order_by[0], str) else type(order_by[0]).__name__!r})"
                " — the pre-pass is only prefix-closed over the ASCENDING "
                "leading order column")
        if prepass_buckets < 2:
            raise ValueError(
                f"prepass_buckets must be >= 2, got {prepass_buckets}")
        df = _budget_prepass(df, group_cols, prepass_on, checked, budget,
                             prepass_buckets)

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("__run", F.sum(checked).over(w))
    run = F.col("__run")
    keep = run <= b
    if policy == "straddle":
        # (run - amount) is the exclusive prefix: the first overflowing
        # row is the one whose prefix still fit strictly below budget.
        # (With a zero budget this clause never fires — prefix < 0 is
        # impossible — so only zero-COST rows survive, via run <= b.)
        keep = keep | ((run - checked) < b)
    out = out.where(keep)
    if running_col is not None:
        out = out.withColumnRenamed("__run", running_col)
    else:
        out = out.drop("__run")
    return out


def budget_oracle_sql(
    group_cols_sql: str,
    order_by_sql: str,
    amount_sql: str,
    budget_sql: str,
    policy: str = "strict",
) -> str:
    """The ANSI spelling of the SAME keep predicate — one boolean
    expression (the running-``SUM`` window is embedded inside it, so
    the whole rule comes from this one emitter). Use in ``QUALIFY``,
    or in a ``WHERE`` over a subquery when the dialect lacks QUALIFY.
    """
    if policy not in _POLICIES:
        raise ValueError(f"policy {policy!r} not in {_POLICIES}")
    run = (f"SUM({amount_sql}) OVER (PARTITION BY {group_cols_sql} "
           f"ORDER BY {order_by_sql} ROWS UNBOUNDED PRECEDING)")
    if policy == "strict":
        return f"({run}) <= ({budget_sql})"
    return (f"(({run}) <= ({budget_sql}) "
            f"OR (({run}) - ({amount_sql})) < ({budget_sql}))")
