"""Declarative check/category model (Spark-side).

Mirrors the reference's frozen dataclasses (reference check.py:14-23,
category.py:10-18) but a check's predicate is a builder producing a
native Column expression over the tags map instead of a Python
``pre_fn`` — the whole rule set evaluates in one codegen'd pass.
Spatial refinements (the reference's ``post_fn``) are identified by a
stage name resolved by the pipeline (operators/duplicates.py etc.).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column


@dataclass(frozen=True)
class CheckSpec:
    identifier: str
    critical: bool
    desc: str
    extra: str | None
    docs: str | None
    priority: int = 50
    selectors: tuple[str, ...] = ()
    partial_selectors: bool = False
    # tags Column -> Column[bool]; None = selector-only check
    pre_expr: Callable[[Column], Column] | None = None
    # spatial stage name ('duplicates' | 'place_not_in_area' |
    # 'place_mistype' | 'street_names') or None
    post_stage: str | None = None


@dataclass(frozen=True)
class CategorySpec:
    identifier: str
    min_changesets: int
    header_critical: str
    header: str
    docs: str | None
    checks: tuple[CheckSpec, ...]
    selectors: tuple[str, ...] = ()
    partial_selectors: bool = False
