"""Check fan-out: elements -> long-format issues in one codegen'd pass.

The reference loops checks × entries in Python (reference
category.py:20-31). Here each category compiles to ONE projected
array-of-structs literal [(check_id, hit)] that is filtered and exploded
— a single scan over the elements regardless of rule count, no Python,
no shuffle. Output is the long-format issues DataFrame
(doc: SURVEY.md §1.2 "never a Python dict"):

    issues(check_id, category, priority, critical, has_post, <element cols>)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_addr_bot_spark.checks.model import CategorySpec
from osm_addr_bot_spark.checks.registry import all_categories
from osm_addr_bot_spark.checks.selectors import selector_expr


def _category_hits(cat: CategorySpec):
    """Array<struct<check_id, priority, critical, has_post, hit>> expr."""
    tags = F.col("tags")
    entries = []
    for c in cat.checks:
        cond = selector_expr(tags, c.selectors, c.partial_selectors)
        if c.pre_expr is not None:
            # null-safe: a null pre-expr result means "no hit"
            cond = cond & F.coalesce(c.pre_expr(tags), F.lit(False))
        entries.append(
            F.struct(
                F.lit(c.identifier).alias("check_id"),
                F.lit(c.priority).alias("priority"),
                F.lit(c.critical).alias("critical"),
                F.lit(c.post_stage is not None).alias("has_post"),
                F.lit(c.post_stage).alias("post_stage"),
                cond.alias("hit"),
            )
        )
    return F.array(*entries)


def fan_out_checks(
    elements: DataFrame,
    categories: tuple[CategorySpec, ...] | None = None,
    fidelity: bool = False,
) -> DataFrame:
    """All categories' checks over the elements, one pass per category,
    unioned into the long format. Category selectors pre-filter
    (reference category.py:22-23) before per-check evaluation."""
    if categories is None:
        categories = all_categories(fidelity)

    parts = []
    for cat in categories:
        df = elements
        if cat.selectors:
            df = df.filter(selector_expr(F.col("tags"), cat.selectors, cat.partial_selectors))
        hits = _category_hits(cat)
        part = (
            df.withColumn("c", F.explode(F.filter(hits, lambda x: x["hit"])))
            .withColumn("category", F.lit(cat.identifier))
            .withColumn("min_changesets", F.lit(cat.min_changesets))
            .select(
                "category",
                "min_changesets",
                F.col("c.check_id").alias("check_id"),
                F.col("c.priority").alias("priority"),
                F.col("c.critical").alias("critical"),
                F.col("c.has_post").alias("has_post"),
                F.col("c.post_stage").alias("post_stage"),
                *[f for f in elements.columns],
            )
        )
        parts.append(part)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
