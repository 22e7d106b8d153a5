"""J2/J3 — update-only merge (MERGE INTO ... WHEN MATCHED THEN UPDATE).

Reference: ``timesheet_transform.py:105-138`` — for each target sheet
row whose (surname, date) matches an aggregated source row, overwrite
COMMESSA and ORE in place; unmatched target rows stay untouched;
unmatched *source* rows are discarded ("we don't create new rows",
``timesheet_transform_v3.py:105``). When multiple source rows hit one
target key the reference re-aggregates them (``:129-134``) — here the
source is pre-aggregated *before* the join (J3), which avoids the
row-explosion pandas had to patch after the fact.

Spark restatement: target ⟕ updates on the key + per-column
``coalesce(update, target)``. Exactly Delta Lake's
``whenMatchedUpdate`` with no ``whenNotMatchedInsert``; on plain
parquet the caller rewrites (``sources.writers.merge_update_write``).

Scale note: this is a plain equi-join — AQE picks broadcast when the
update set is small (the common case: updates ≪ target), else a
shuffle join co-partitioned on the merge key.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_update(
    target: DataFrame,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
) -> DataFrame:
    """Return the target with ``update_cols`` overwritten from
    ``updates`` on matching ``on`` keys; target cardinality preserved.

    ``updates`` must be unique per key (pre-aggregate — J3); a NULL in
    an update column keeps the target value (matched-overwrite is
    defined for non-NULL update values, mirroring the reference which
    always writes concrete aggregated values).
    """
    missing = [c for c in [*on, *update_cols] if c not in updates.columns]
    if missing:
        raise ValueError(f"merge_update: updates missing columns {missing}")

    u = updates.select(
        *[F.col(c).alias(f"__upd_{c}") for c in on],
        *[F.col(c).alias(f"__upd_{c}") for c in update_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [target[k].eqNullSafe(F.col(f"__upd_{k}")) for k in on],
    )
    joined = target.join(u, cond, "left")
    out = [
        F.coalesce(F.col(f"__upd_{c}"), target[c]).alias(c)
        if c in update_cols
        else target[c]
        for c in target.columns
    ]
    return joined.select(*out)


def merge_full(
    target: DataFrame,
    updates: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
    insert: bool = False,
    delete_unmatched_target: bool = False,
    evolve_schema: bool = False,
) -> DataFrame:
    """The general MERGE INTO clause surface over plain DataFrames:

    * WHEN MATCHED THEN UPDATE — always: matched target rows get
      ``update_cols`` overwritten (NULL update values keep the target
      value, as in ``merge_update``);
    * WHEN NOT MATCHED THEN INSERT — with ``insert=True``: update rows
      matching no target row are appended, carrying their ``on`` keys
      and ``update_cols``; every other target column is NULL (the
      standard column-subset INSERT clause);
    * WHEN NOT MATCHED BY SOURCE THEN DELETE — with
      ``delete_unmatched_target=True``: target rows matching no update
      row are dropped.

    With both flags False this degrades to exactly ``merge_update``
    (the reference's update-only S5 contract); the flags are the
    upgrade path a general engine needs (Delta's ``whenNotMatched...``
    clauses). ``updates`` must be unique per key (pre-aggregate — J3).

    ``evolve_schema=True`` is Delta's ``withSchemaEvolution()``: any
    ``update_cols`` entry the target LACKS is added to the output
    schema — matched (and inserted) rows take the update value,
    unmatched target rows get NULL. Without the flag, unknown update
    columns raise (a typo'd column name should fail loudly, not
    silently widen the table).

    Plan shape: ONE equi-join on the merge keys, and the WEAKEST join
    type the requested clauses need — ``left`` for update-only (AQE
    can broadcast the small update side, the 100 TB common case),
    ``inner`` for update+delete, ``full_outer`` only when INSERT
    requires keeping unmatched source rows (outer joins on the
    preserved side cannot broadcast, so the stronger type is paid only
    when its rows are actually wanted). Clause decisions are row-local
    predicates on the join's presence indicators; no second pass, no
    anti-join, no union of clause outputs.
    """
    missing = [c for c in [*on, *update_cols] if c not in updates.columns]
    if missing:
        raise ValueError(f"merge_full: updates missing columns {missing}")
    new_cols = [c for c in update_cols if c not in target.columns]
    if new_cols and not evolve_schema:
        raise ValueError(
            f"merge_full: update_cols not in target: {new_cols} "
            "(pass evolve_schema=True to add them)"
        )

    t = target.withColumn("__t", F.lit(True))
    u = updates.select(
        *[F.col(c).alias(f"__upd_{c}") for c in [*on, *update_cols]],
        F.lit(True).alias("__u"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [t[k].eqNullSafe(F.col(f"__upd_{k}")) for k in on],
    )
    join_type = {
        (False, False): "left",
        (False, True): "inner",
        (True, False): "full_outer",
        (True, True): "right_outer",
    }[(insert, delete_unmatched_target)]
    joined = t.join(u, cond, join_type)
    tp = F.col("__t").isNotNull()  # a target row exists on this key
    up = F.col("__u").isNotNull()  # an update row exists on this key

    def out_col(c: str):
        if c in update_cols:
            # matched → overwrite (NULL keeps target); insert-only
            # rows have no target value, coalesce covers both.
            return F.coalesce(F.col(f"__upd_{c}"), t[c]).alias(c)
        if c in on:
            return F.coalesce(t[c], F.col(f"__upd_{c}")).alias(c)
        return t[c]  # NULL on insert-only rows

    keep = (tp & up) | (tp & F.lit(not delete_unmatched_target)) | (
        up & F.lit(insert)
    )
    out = [out_col(c) for c in target.columns]
    # schema evolution: brand-new columns ride in from the update side
    # (NULL wherever no update row matched)
    out += [F.col(f"__upd_{c}").alias(c) for c in new_cols]
    return joined.filter(keep).select(*out)


def latest_changes(
    changes: DataFrame, on: Sequence[str], seq_col: str
) -> DataFrame:
    """SEQUENCE BY: collapse a CDC feed to the LATEST change per key
    (highest ``seq_col``; ties broken arbitrarily are a feed bug — a
    real CDC source's sequence is unique per key). One ranked window
    partitioned by the key: a single shuffle on the same key the apply
    join uses, so at 100 TB the two stages share their partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(*on).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    on: Sequence[str],
    update_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    may_insert: bool = True,
) -> DataFrame:
    """APPLY CHANGES INTO: play a deduplicated CDC feed onto a target.

    Each change row carries an operation in ``op_col``: ``delete_op``
    removes the matched target row (a delete for a key the target
    lacks is a no-op); every other op is an UPSERT — matched rows get
    ``update_cols`` overwritten, unmatched change rows are inserted
    (non-key, non-update columns NULL). ``changes`` must hold ONE row
    per key — run ``latest_changes`` first (the sequence_by step).

    Plan shape: ONE equi-join; all three outcomes are row-local
    predicates on the presence indicators and the op value — no
    anti-join, no union of clause outputs, no second pass over the
    target. Inserts force a FULL OUTER join (unmatched change rows
    must survive), which cannot broadcast; when the caller knows the
    feed carries no new keys (a delete/update-only CDC topic), pass
    ``may_insert=False`` to drop to a LEFT join — at 100 TB the small
    feed then broadcasts and the target never shuffles. With
    ``may_insert=False`` an unmatched non-delete change row is
    silently discarded (the update-only merge contract).
    """
    missing = [c for c in [*on, *update_cols, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_changes: changes missing columns {missing}")

    t = target.withColumn("__t", F.lit(True))
    u = changes.select(
        *[F.col(c).alias(f"__upd_{c}") for c in [*on, *update_cols]],
        F.col(op_col).alias("__op"),
        F.lit(True).alias("__u"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [t[k].eqNullSafe(F.col(f"__upd_{k}")) for k in on],
    )
    joined = t.join(u, cond, "full_outer" if may_insert else "left")
    tp = F.col("__t").isNotNull()
    up = F.col("__u").isNotNull()
    # NULL-safe op test: a malformed change row with op IS NULL must
    # act as an UPSERT (the non-delete default), not silently delete —
    # a plain `!= delete_op` is NULL for NULL ops and filter() drops
    # NULL, which would turn the malformed row into a delete.
    keep = (tp & ~up) | (up & ~F.col("__op").eqNullSafe(F.lit(delete_op)))

    def out_col(c: str):
        if c in update_cols:
            return F.coalesce(F.col(f"__upd_{c}"), t[c]).alias(c)
        if c in on:
            return F.coalesce(t[c], F.col(f"__upd_{c}")).alias(c)
        return t[c]

    return joined.filter(keep).select(*[out_col(c) for c in target.columns])


def incremental_agg_merge(
    old_agg: DataFrame,
    delta_agg: DataFrame,
    keys: Sequence[str],
    add_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental aggregate maintenance: combine a stored aggregate
    table with the aggregate of a new delta partition WITHOUT
    recomputing history — ``agg(full) == merge(agg(old), agg(delta))``
    for any algebraic aggregate.

    ``add_cols`` combine by addition (counts, sums, sum-of-squares —
    anything with a group homomorphism onto +); ``min_cols``/
    ``max_cols`` by least/greatest. Averages and variances are
    DERIVED from stored sums downstream, never merged directly (the
    mean of means is wrong under unequal group sizes — store the
    power sums, divide at read time; same rule the moment-statistics
    queries follow).

    Plan shape: full-outer join on the aggregate keys — both sides are
    AGGREGATE-sized (one row per group), so at 100 TB this moves the
    rollup, never the fact; the nightly delta pass is the only scan of
    new data. This is the batch analogue of the streaming
    foreachBatch merge sink, and commits well through
    ``sources.snapshots`` for an auditable aggregate history.
    """
    o = old_agg.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in [*add_cols, *min_cols, *max_cols]],
    )
    d = delta_agg.select(
        *keys,
        *[F.col(c).alias(f"__d_{c}") for c in [*add_cols, *min_cols, *max_cols]],
    )

    def comb(c: str, how: str) -> Column:
        a, b = F.col(f"__o_{c}"), F.col(f"__d_{c}")
        if how == "add":
            merged = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif how == "min":
            merged = F.least(F.coalesce(a, b), F.coalesce(b, a))
        else:
            merged = F.greatest(F.coalesce(a, b), F.coalesce(b, a))
        return merged.alias(c)

    return o.join(d, list(keys), "full_outer").select(
        *keys,
        *[comb(c, "add") for c in add_cols],
        *[comb(c, "min") for c in min_cols],
        *[comb(c, "max") for c in max_cols],
    )
