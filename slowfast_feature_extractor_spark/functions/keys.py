"""Key parsing/construction and rating predicates — pure Column
expressions (never UDFs), so Catalyst folds and pushes them.

Mirrors the reference's id plumbing:
- ``parse_video_id_umera`` splits ``patient_X_task_Y_camZ_seg_N`` into
  typed fields (reference/just_test_v1.py:454-493) → :func:`parse_key`;
- key formatting (reference/just_test_v1.py:1561-1562) →
  :func:`construct_key`;
- two-rater agreement ``get_valid_rating``
  (reference/just_test_v1.py:1338-1372) → :func:`rater_agreement`;
- the label remap ``{1:0, 2:1, 3:2}`` (reference/just_test_v1.py:51) →
  :func:`label_remap`.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def rater_agreement(t1: Column, t2: Column) -> Column:
    """t1==t2 → t1; exactly one present → that one; else null
    (the reference's 'no_match')."""
    return (
        F.when(t1.isNotNull() & t2.isNotNull() & (t1 == t2), t1)
        .when(t1.isNotNull() & t2.isNull(), t1)
        .when(t1.isNull() & t2.isNotNull(), t2)
        .otherwise(F.lit(None))
    )


def rater_status(t1: Column, t2: Column) -> Column:
    """Tri-state companion to :func:`rater_agreement`, preserving the
    reference's ``'no_match'`` sentinel distinguishably
    (reference/just_test_v1.py:1338-1372 returns the string 'no_match'
    when both raters are present but disagree): 'match' (agree),
    'single' (exactly one rater), 'no_match' (present but disagree),
    'missing' (neither). The typed rating stays in the
    :func:`rater_agreement` column; this column says WHY it is null."""
    return (
        F.when(t1.isNotNull() & t2.isNotNull() & (t1 == t2), F.lit("match"))
        .when(t1.isNotNull() & t2.isNotNull(), F.lit("no_match"))
        .when(t1.isNotNull() | t2.isNotNull(), F.lit("single"))
        .otherwise(F.lit("missing"))
    )


def label_remap(col: Column, mapping: Mapping[int, int]) -> Column:
    expr = F.lit(None)
    first = True
    for src, dst in mapping.items():
        cond = col == F.lit(src)
        expr = F.when(cond, F.lit(dst)) if first else expr.when(cond, F.lit(dst))
        first = False
    return expr


def parse_key(col: Column, pattern: str, groups: Sequence[tuple[str, int, str]]) -> list[Column]:
    """regexp_extract each (alias, group_idx, cast_type) from ``col``."""
    out = []
    for alias, idx, cast_type in groups:
        c = F.regexp_extract(col, pattern, idx)
        if cast_type:
            c = c.cast(cast_type)
        out.append(c.alias(alias))
    return out


def construct_key(fmt: str, *cols: Column) -> Column:
    return F.format_string(fmt, *cols)
