"""Generic OLAP surface over corpus tables: exact group percentiles,
pivoted categorical counts, rollup aggregates.

All three are pure Catalyst expressions — no UDFs, no collects beyond
what the aggregate itself returns — and each has a matching ANSI-SQL
oracle in ``__spark_entry__``. Scale shape: every function is a single
hash aggregate (percentile is one agg with a sort-based merge inside
the percentile buffer; pivot folds into conditional aggregates over the
pinned value list; rollup expands to grouping sets and still ships one
exchange with map-side partials).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group percentiles with linear interpolation
    (rank = p * (n - 1); the same definition as ANSI ``quantile_cont``):
    one row per group, one ``p<NN>`` column per requested percentile,
    rounded to 4 places for cross-engine reproducibility.

    Exact percentile is a sort-within-group aggregate — fine for
    bounded group cardinality x bounded group size; for 100 TB raw-row
    groups prefer ``approx_percentile`` (same call shape, sketch-based,
    no per-group sort) and accept the error bound.
    """
    arr = "array(" + ", ".join(f"{p!r}D" for p in percentiles) + ")"
    pct = F.expr(f"percentile({value_col}, {arr})")
    names = [f"p{int(round(p * 100))}" for p in percentiles]
    if len(set(names)) != len(names):
        # e.g. 0.5 and 0.501 both rounding to p50 — fail loudly instead
        # of silently emitting duplicate column names (ADVICE r5)
        raise ValueError(
            f"percentiles {list(percentiles)} produce colliding column "
            f"names {names}; use values that differ at integer percent"
        )
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(pct.alias("_pcts"))
    return agg.select(
        "grp",
        *[
            F.round(F.element_at("_pcts", i + 1), 4).alias(name)
            for i, name in enumerate(names)
        ],
    )


def pivot_counts(
    df: DataFrame, group_col: str, pivot_col: str, values: Sequence[str]
) -> DataFrame:
    """Categorical counts pivoted to columns: one row per group, one
    LongType column per entry of ``values`` (missing combinations are
    0). The value list is PINNED by the caller — never inferred — so
    the output schema is stable and the plan skips Spark's
    distinct-values pre-scan (one aggregate instead of two jobs).
    """
    out = df.groupBy(F.col(group_col).alias("grp")).pivot(pivot_col, list(values)).count()
    return out.select(
        "grp", *[F.coalesce(F.col(v), F.lit(0)).cast("long").alias(v) for v in values]
    )


def rollup_counts(
    df: DataFrame, cols: Sequence[str], value_col: str
) -> DataFrame:
    """Hierarchical totals via ROLLUP over ``cols``: per-combination
    row count and sum(``value_col``), plus subtotal and grand-total
    rows. Rolled-up dimensions surface as the literal ``'ALL'`` (the
    oracle coalesces identically) and ``lvl`` carries the standard
    grouping bitmask (0 = leaf, 2^k - 1 = grand total).

    ``lvl`` is the ONLY authoritative subtotal discriminator: a genuine
    NULL (or literal 'ALL') value in a dimension column produces leaf
    rows whose dimension text matches subtotal rows — consumers that
    group or filter by the dimension strings alone can double-count;
    filter on ``lvl`` first (ADVICE r5).
    """
    gcols = [F.col(c) for c in cols]
    out = df.rollup(*gcols).agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count("*").alias("n_rows"),
        F.sum(value_col).cast("long").alias(f"sum_{value_col}"),
    )
    return out.select(
        *[F.coalesce(F.col(c), F.lit("ALL")).alias(c) for c in cols],
        "lvl",
        "n_rows",
        f"sum_{value_col}",
    )
