"""Slowly-changing-dimension Type 2 maintenance.

The reference's dimension handling is SCD Type 1: ``merge_song`` patches a
NULL ``apple_music_url`` in place and history is lost
(``etl_pipeline.py:649-697``). Its fact table, by contrast, IS history —
one row per (date, platform, rank). This operator supplies the standard
middle ground for dimensions whose attribute changes must stay queryable:
each key carries versioned rows with ``[valid_from, valid_to)`` intervals
and an open current version (``valid_to IS NULL``).

Semantics of one batch apply (snapshot ``updates`` observed at
``batch_date``):

- key in both, attributes differ → close the open row at ``batch_date``
  and append a new open version;
- key in both, attributes equal  → keep the open row untouched (no
  version churn on no-op loads — idempotency);
- key only in updates            → brand-new open version;
- key only in current            → untouched (SCD2 does not delete;
  expiring absent keys is a policy choice layered on top).

Closed historical rows pass through unconditionally.

Scale notes (100 TB): one shuffle on the dimension key for the full-outer
join between the OPEN slice and the batch; closed history is filtered out
before the join (never shuffled — at 1000 executors history dwarfs the
open slice) and unioned back untouched. The attribute comparison is a
null-safe struct equality — one codegen expression, no per-column joins.
A batch ≪ dimension AQE-downgrades the join to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: list[str],
    attrs: list[str],
    batch_date,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one snapshot batch to an SCD2 dimension table.

    ``current`` has columns ``key + attrs + [valid_from, valid_to]``
    (``valid_to`` NULL = open row); ``updates`` has ``key + attrs``.
    Returns the complete new state of the dimension.
    """
    d = F.lit(str(batch_date)).cast("date")
    closed = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    cur_attrs = F.struct(*[F.col(f"cur.{a}") for a in attrs])
    upd_attrs = F.struct(*[F.col(f"upd.{a}") for a in attrs])

    # Row-presence markers: attribute columns may legitimately be NULL, so
    # side presence in the full-outer join is detected via injected
    # non-null markers, never via attr IS NOT NULL.
    upd_marked = updates.withColumn("_upd_marker", F.lit(1))
    cur_marked = open_rows.withColumn("_cur_marker", F.lit(1))
    j = cur_marked.alias("cur").join(
        upd_marked.alias("upd"), on=key, how="full_outer"
    )
    has_cur = F.col("cur._cur_marker").isNotNull()
    has_upd = F.col("upd._upd_marker").isNotNull()
    # eqNullSafe on the attr structs: NULL attribute values compare equal
    # to NULL (a NULL->NULL "change" must not spawn a version)
    same = cur_attrs.eqNullSafe(upd_attrs)

    # Single pass over the join: each output rule becomes a conditional
    # struct variant; a joined key can emit up to two rows (close + new
    # version), produced by exploding the non-null variants. Three
    # filter+union branches (the naive form) would re-evaluate the whole
    # join — and at scale re-scan the open slice — three times.
    null_date = F.lit(None).cast("date")
    keep_v = F.struct(
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        null_date.alias(valid_to),
    )
    close_v = F.struct(
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        d.alias(valid_to),
    )
    new_v = F.struct(
        *[F.col(f"upd.{a}").alias(a) for a in attrs],
        d.alias(valid_from),
        null_date.alias(valid_to),
    )
    variants = F.array(
        F.when(has_cur & (~has_upd | same), keep_v),
        F.when(has_cur & has_upd & ~same, close_v),
        F.when(has_upd & (~has_cur | ~same), new_v),
    )
    exploded = j.select(
        *key,
        F.explode(F.filter(variants, lambda v: v.isNotNull())).alias("_r"),
    )
    return (
        closed.select(*key, *attrs, valid_from, valid_to)
        .unionByName(
            exploded.select(
                *key,
                *[F.col(f"_r.{a}").alias(a) for a in attrs],
                F.col(f"_r.{valid_from}").alias(valid_from),
                F.col(f"_r.{valid_to}").alias(valid_to),
            )
        )
    )
