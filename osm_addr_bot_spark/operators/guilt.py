"""J5 — historical guilt check: did this changeset actually edit the
offending tags?

Internalizes the reference's ``is_editing_tags`` (overpass.py:384-421):
for every issue element, compare its tags against the pre-changeset
snapshot (as of timestamp-1):

  * element absent from the snapshot  => it was created => the WHOLE
    changeset is guilty (quirk Q6, overpass.py:402-404)
  * tags_diff = set(new.items()) - set(old.items()) — i.e. keys whose
    value is new or changed (overpass.py:411)
  * the diff matches the category's selectors (partial) when the
    category has selectors, else the issue's check's selectors
    (overpass.py:414-419)
  * guilt is per (category, changeset): any guilty element convicts it

Divergence note (documented): the reference picks ONE check per element
via a dict that later inserts overwrite (overpass.py:387-392) when the
category has no selectors; this engine evaluates each (check, element)
row — a deterministic superset. Same verdicts whenever an element is
claimed by a single check per category (always true in the fixtures).

Spark mapping: snapshot scan S2 as an equi-join on
(element_type, element_id) against the `elements_history` table filtered
to the as-of interval (Iceberg time travel at scale), the map diff as a
native `map_filter`, selectors as compiled exprs, per-changeset verdict
as a bool_or aggregate broadcast back — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_addr_bot_spark.checks.registry import all_categories
from osm_addr_bot_spark.checks.selectors import selector_expr


def _diff_selector_expr(diff: Column, fidelity: bool = False) -> Column:
    """Partial selector match on the diff map, per the reference's
    category-else-check rule."""
    cats = all_categories(fidelity)
    cat_expr = F.lit(False)
    for cat in cats:
        if cat.selectors:
            cat_expr = F.when(
                F.col("category") == cat.identifier,
                selector_expr(diff, cat.selectors, partial=True),
            ).otherwise(cat_expr)
    check_expr = F.lit(False)
    for cat in cats:
        if cat.selectors:
            continue
        for c in cat.checks:
            check_expr = F.when(
                F.col("check_id") == c.identifier,
                selector_expr(diff, c.selectors, partial=True),
            ).otherwise(check_expr)
    has_cat_selectors = F.col("category").isin(
        *[cat.identifier for cat in cats if cat.selectors]
    )
    return F.when(has_cat_selectors, cat_expr).otherwise(check_expr)


def guilty_changesets(
    issues: DataFrame, elements_history: DataFrame, fidelity: bool = False
) -> DataFrame:
    """(category, changeset_id, guilty) for every changeset with issues."""
    hist = elements_history.select(
        F.col("element_type"),
        F.col("element_id"),
        F.col("valid_from"),
        F.col("valid_to"),
        F.col("tags").alias("old_tags"),
    )
    iss = issues.select(
        "category", "check_id", "changeset_id", "element_type", "element_id", "timestamp", "tags"
    ).alias("i")
    hist = hist.alias("h")
    asof = F.col("i.timestamp") - 1
    # as-of predicate inside the LEFT join: an element whose history
    # rows all miss the interval keeps its issue row with null old_tags
    # (=> created => guilty), matching the reference's missing-snapshot
    # semantics rather than silently vanishing
    joined = iss.join(
        hist,
        (F.col("i.element_type") == F.col("h.element_type"))
        & (F.col("i.element_id") == F.col("h.element_id"))
        & (F.col("h.valid_from") <= asof)
        & (asof < F.col("h.valid_to")),
        "left",
    ).select("i.*", "h.old_tags")
    created = F.col("old_tags").isNull()
    diff = F.map_filter(
        F.col("tags"),
        lambda k, v: ~v.eqNullSafe(F.element_at(F.col("old_tags"), k)),
    )
    row_guilty = F.when(created, F.lit(True)).otherwise(_diff_selector_expr(diff, fidelity))
    return (
        joined.withColumn("_g", row_guilty)
        .groupBy("category", "changeset_id")
        .agg(F.max(F.col("_g")).alias("guilty"))
    )


def filter_guilty(
    issues: DataFrame, elements_history: DataFrame, fidelity: bool = False
) -> DataFrame:
    """Keep only issues of guilty changesets (reference main.py:221-223:
    'Not guilty' changesets are skipped entirely).

    Single-pass form: per-row verdicts are window-aggregated over
    (category, changeset_id) on the already-joined rows — one shuffle
    instead of aggregate + semi join."""
    from pyspark.sql import Window

    hist = elements_history.select(
        "element_type", "element_id", "valid_from", "valid_to", F.col("tags").alias("old_tags")
    ).alias("h")
    iss = issues.alias("i")
    asof = F.col("i.timestamp") - 1
    joined = iss.join(
        hist,
        (F.col("i.element_type") == F.col("h.element_type"))
        & (F.col("i.element_id") == F.col("h.element_id"))
        & (F.col("h.valid_from") <= asof)
        & (asof < F.col("h.valid_to")),
        "left",
    ).select("i.*", "h.old_tags")
    created = F.col("old_tags").isNull()
    diff = F.map_filter(
        F.col("tags"), lambda k, v: ~v.eqNullSafe(F.element_at(F.col("old_tags"), k))
    )
    row_guilty = F.when(created, F.lit(True)).otherwise(_diff_selector_expr(diff, fidelity))
    w = Window.partitionBy("category", "changeset_id")
    return (
        joined.withColumn("_g", row_guilty)
        .withColumn("_guilty", F.max("_g").over(w))
        .filter(F.col("_guilty"))
        .drop("_g", "_guilty", "old_tags")
    )
