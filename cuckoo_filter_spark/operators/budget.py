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

Reference scope note: linvon/cuckoo-filter has no selection surface;
grafted LLM-pipeline scope, sibling of operators/sampling.py (which
handles the RATE-based mixture; this is the QUOTA-based one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_POLICIES = ("strict", "straddle")


def take_until_budget(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    order_by: list[Column | str] | tuple,
    amount_col: str,
    budget,
    policy: str = "strict",
    running_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` selected per group, in ``order_by`` order, until
    ``budget`` of ``amount_col`` is spent (see module doc for the
    straddle policy). ``budget`` is a number or a Column (e.g. a
    per-group quota joined in upstream). NULL or negative amounts
    raise at runtime — a negative amount silently refunds budget to
    every later row; a NULL poisons the running sum.

    ``running_col`` optionally emits the inclusive running amount.
    """
    if policy not in _POLICIES:
        raise ValueError(f"policy {policy!r} not in {_POLICIES}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use a constant "
                         "literal column for a global budget)")
    if not order_by:
        raise ValueError("order_by must be non-empty and a TOTAL order")
    if "__run" in df.columns:
        raise ValueError("input column '__run' collides with the internal "
                         "running-sum name")
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
