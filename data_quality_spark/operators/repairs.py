"""Repair transforms (J3): the reference's critical-issue fixer re-expressed
as pure DataFrame→DataFrame transformations.

The reference mutates the database in place row by row
(``/root/reference/fix_critical_issues.py``); on Spark the same three fixes
are declarative transforms — the caller writes the repaired relation to the
next medallion layer instead of UPDATE-ing bronze:

- ``synthesize_missing_isrcs``   ← ``fix_critical_issues.py:20-40``
  (NULL isrc → ``USRC24{id:05d}``, the reference's generator format);
- ``repair_orphans_with_placeholders`` ← ``fix_critical_issues.py:43-97``
  (each distinct missing parent id gets a placeholder parent row,
  ``Unknown Artist {id}`` style — INSERT OR IGNORE ≈ distinct + union);
- ``dedup_isrc_values``          ← ``fix_critical_issues.py:100-131``
  (per duplicate-ISRC group keep the first id's value, rewrite the others'
  last two digits with the occurrence index).

Scale shape: no collects, no loops.  The orphan repair's only shuffles are
the distinct over orphan ids (keys only, not rows) and whatever join
strategy AQE picks for the anti-join; the ISRC dedup shuffles once on the
isrc key for the ranking window — at 10^12 rows each duplicate group is
tiny, so the window sort is per-key local work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "synthesize_missing_isrcs",
    "repair_orphans_with_placeholders",
    "dedup_isrc_values",
]


def synthesize_missing_isrcs(
    df: DataFrame, id_col: str = "id", isrc_col: str = "isrc"
) -> DataFrame:
    """Fill NULL ISRCs with the reference's generated format
    ``USRC24%05d`` (fix_critical_issues.py:33-36)."""
    return df.withColumn(
        isrc_col,
        F.coalesce(
            F.col(isrc_col), F.format_string("USRC24%05d", F.col(id_col))
        ),
    )


def repair_orphans_with_placeholders(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    parent_id_col: str,
    parent_name_col: str,
    name_prefix: str = "Unknown Artist ",
    extra_defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Return the parent table augmented with one placeholder row per
    distinct orphaned fk value (fix_critical_issues.py:50-70's
    ``INSERT OR IGNORE``): after the repair the child has zero orphans.

    Extra parent columns beyond (id, name) default to NULL on placeholder
    rows.  The reference's INSERT also pins ``country='Unknown'``
    (fix_critical_issues.py:68-70) — pass
    ``extra_defaults={"country": "Unknown"}`` to reproduce that exactly;
    any column not listed stays NULL (ADVICE r2).
    """
    orphan_ids = (
        child.select(F.col(fk_col).alias(parent_id_col))
        .filter(F.col(parent_id_col).isNotNull())
        .join(
            parent.select(parent_id_col).dropDuplicates(),
            parent_id_col,
            "left_anti",
        )
        .dropDuplicates()
    )
    cols = [
        F.col(parent_id_col),
        F.concat(
            F.lit(name_prefix), F.col(parent_id_col).cast("string")
        ).alias(parent_name_col),
    ]
    for name, value in (extra_defaults or {}).items():
        cols.append(F.lit(value).alias(name))
    placeholders = orphan_ids.select(*cols)
    return parent.unionByName(placeholders, allowMissingColumns=True)


def dedup_isrc_values(
    df: DataFrame, id_col: str = "id", isrc_col: str = "isrc"
) -> DataFrame:
    """Make duplicate ISRCs unique, reference-style: within each non-null
    duplicate group (ordered by id, the reference's GROUP_CONCAT order) the
    first row keeps the original value and the i-th gets its last two
    digits replaced by ``%02d`` of i (fix_critical_issues.py:117-127)."""
    w = Window.partitionBy(F.col(isrc_col)).orderBy(F.col(id_col))
    rn = F.row_number().over(w)
    return (
        df.withColumn("__rn", F.when(F.col(isrc_col).isNotNull(), rn))
        .withColumn(
            isrc_col,
            F.when(
                F.col(isrc_col).isNull() | (F.col("__rn") == 1),
                F.col(isrc_col),
            ).otherwise(
                F.concat(
                    F.expr(
                        f"substring({isrc_col}, 1, length({isrc_col}) - 2)"
                    ),
                    F.format_string("%02d", F.col("__rn") - 1),
                )
            ),
        )
        .drop("__rn")
    )
