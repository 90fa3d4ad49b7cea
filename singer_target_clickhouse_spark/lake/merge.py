"""Merge / delete operators over the lake — the reference's category-D ops
(``SURVEY.md §2 D1-D7``) re-expressed as bucket-pruned DataFrame plans.

Scale notes (the 100 TB story):

- every operator prunes to the buckets its keys touch before reading the
  target, so cost scales with batch size, not table size;
- the latest-wins dedup is a ``max_by`` hash aggregate per bucket-restricted
  union: partial aggregation collapses hot keys **map-side**, so a hot
  (repo, path) receiving millions of updates in one batch reduces to one row
  per input partition before the exchange — no single task ever sees the
  full hot-key row set. This is the skew defense (an explicit salted
  two-phase reduce is unnecessary because partial agg IS the salted phase,
  with salt = input partition).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .catalog import LakeCatalog, TableSnapshot


def latest_wins(df: DataFrame, pk: list[str], ver_col: str = "_ver") -> DataFrame:
    """ReplacingMergeTree collapse: keep the max-`_ver` row per key
    (reference engine semantics, ``jsonSchemaTranslator.ts:36`` +
    ``OPTIMIZE FINAL`` at ``StreamProcessor.ts:108``). Ties cannot occur
    because `_ver` is unique per record (derived from the source offset).

    Plan shape: ``groupBy(pk).agg(max_by(struct(<non-key cols>), _ver))``
    instead of a per-key ``row_number()`` window. The window form re-shuffles
    every row by pk and sorts inside each partition — a hot key lands on one
    task. ``max_by`` is a declarative aggregate with partial (map-side)
    combine: each input partition emits at most one candidate row per key,
    so the exchange carries O(keys), not O(rows), and skew disappears."""
    others = [c for c in df.columns if c not in pk]
    packed = df.groupBy(*pk).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(ver_col)).alias("__top")
    )
    return packed.select(*pk, *[F.col("__top").getField(c).alias(c) for c in others])


def merge_upsert(
    catalog: LakeCatalog,
    name: str,
    batch: DataFrame,
    snap: Optional[TableSnapshot] = None,
    tombstone_col: Optional[str] = None,
    touched: Optional[list[int]] = None,
    broadcast_keys: bool = False,
) -> TableSnapshot:
    """MERGE INTO … WHEN MATCHED AND s._ver > t._ver THEN UPDATE/DELETE, as
    union + window over the touched buckets only.

    The batch must carry the full table schema (pks, simple cols, `_ver`),
    plus optionally a boolean ``tombstone_col``: DELETED_RECORD events enter
    the same versioned merge as tombstone rows, so a delete at offset k kills
    exactly the versions below k and a later re-insert survives — strictly
    ordered CDC semantics (the reference applies buffered DELETEs at commit
    time, which can drop a re-insert landing in the same commit window;
    replay convergence per BASELINE.json requires the ordered form).

    ``broadcast_keys=True`` (round-6, the engine enables it when the batch's
    row count is known and bounded) switches the cross-set dedup from a
    full aggregate over target ∪ batch to:

        latest_wins(batch)  ∪  (target ANTI-JOIN broadcast(batch pk set))

    which is value-identical because every batch ``_ver`` strictly exceeds
    every target ``_ver`` for this table: versions derive from the source
    offset (``_ver = run_seq_base + _seq + 1``), the replay gate drops
    ``_seq <= last_applied_seq`` before the merge, and a new run re-bases to
    ``run_seq_base + last_applied_seq + 2`` — above everything committed
    (``engine._run_base``). So for any key present in the batch the
    max-``_ver`` row over target ∪ batch IS the max-``_ver`` row of the
    batch alone, and keys absent from the batch keep their target row
    untouched. The plan effect (guide §2.3/§2.4): the touched target
    buckets no longer flow through a pk Exchange + aggregate — they stream
    scan → broadcast anti-join → the (unavoidable) bucket-layout exchange
    of the write, so the lake crosses one shuffle per batch instead of two
    and the aggregate's input shrinks from O(lake + batch) to O(batch).
    The anti-join key set is key columns only — the classic broadcast-less
    -than-the-plan trick (guide §8) — and joins null-safely so null pks
    group exactly like the aggregate did. Correctness of both paths is
    pinned by a parity test (tests/test_lake.py).

    Returns the updated (uncommitted) snapshot.
    """
    snap = snap or catalog.snapshot(name)
    assert snap.engine == "replacing", f"{name} is not a replacing table"
    cols = [f.name for f in snap.spark_schema.fields]
    sel = cols + ([tombstone_col] if tombstone_col else [])
    batch = batch.select(*sel)
    if touched is None:
        touched = catalog.touched_buckets(batch, snap)
    if not touched:
        return snap
    target = catalog.read(name, buckets=touched, snap=snap)
    if broadcast_keys:
        latest = latest_wins(batch, snap.pk, "_ver")
        keys = batch.select(*snap.pk).dropDuplicates().select(
            *[F.col(c).alias(f"__k_{c}") for c in snap.pk]
        )
        cond = F.lit(True)
        for c in snap.pk:
            cond = cond & target[c].eqNullSafe(F.col(f"__k_{c}"))
        kept = target.join(F.broadcast(keys), cond, "left_anti")
        if tombstone_col:
            latest = latest.where(~F.col(tombstone_col)).drop(tombstone_col)
        return catalog.overwrite_buckets(name, kept.unionByName(latest), touched, snap)
    if tombstone_col:
        target = target.withColumn(tombstone_col, F.lit(False))
    # No explicit salting needed: latest_wins is a max_by hash aggregate whose
    # partial (map-side) combine already collapses hot keys per input
    # partition before the shuffle. (An explicit salted write was measured
    # and reverted in round 4: it amplified files-per-commit w-fold and
    # regressed end-to-end replay; the former ``skew_salt`` knob is removed.)
    merged = latest_wins(target.unionByName(batch), snap.pk, "_ver")
    if tombstone_col:
        merged = merged.where(~F.col(tombstone_col)).drop(tombstone_col)
    return catalog.overwrite_buckets(name, merged, touched, snap)


def append_rows(
    catalog: LakeCatalog,
    name: str,
    batch: DataFrame,
    snap: Optional[TableSnapshot] = None,
) -> TableSnapshot:
    """Plain-MergeTree ingestion: append files, no dedup (children + no-PK
    roots; reference ``RecordProcessor.ts:166``)."""
    snap = snap or catalog.snapshot(name)
    cols = [f.name for f in snap.spark_schema.fields]
    return catalog.append(name, batch.select(*cols), snap)


def delete_by_keys(
    catalog: LakeCatalog,
    name: str,
    keys: DataFrame,
    snap: Optional[TableSnapshot] = None,
) -> TableSnapshot:
    """Hard delete by PK (reference D4, ``DeletedRecordProcessor.ts:24-58``):
    anti-join the touched buckets against the key set."""
    snap = snap or catalog.snapshot(name)
    if not snap.pk:
        raise ValueError(f"cannot push deleted record to table {name} without pk")
    keys = keys.select(*snap.pk).distinct()
    touched = catalog.touched_buckets(keys, snap)
    if not touched:
        return snap
    target = catalog.read(name, buckets=touched, snap=snap)
    kept = target.join(F.broadcast(keys), on=snap.pk, how="left_anti")
    return catalog.overwrite_buckets(name, kept, touched, snap)


def delete_where(
    catalog: LakeCatalog,
    name: str,
    condition,
    snap: Optional[TableSnapshot] = None,
) -> TableSnapshot:
    """DELETE WHERE <condition> (reference D5 cleaning-column wipe,
    ``StreamProcessor.ts:121-146``). Not key-pruned — the predicate may touch
    any bucket — so this rewrites the full table; the engine bounds how often
    it runs (once per new cleaning value per run, like the reference)."""
    snap = snap or catalog.snapshot(name)
    target = catalog.read(name, snap=snap)
    return catalog.overwrite_all(name, target.where(~condition), snap)


def orphan_delete(
    catalog: LakeCatalog,
    child_name: str,
    root_df: DataFrame,
    root_pk: list[str],
    child_root_cols: list[str],
    buckets: Optional[list[int]] = None,
    snap: Optional[TableSnapshot] = None,
) -> TableSnapshot:
    """Child-orphan delete (reference D3, ``StreamProcessor.ts:148-169``):
    drop child rows whose (root-key…, _root_ver) has no surviving root row.

    Children are bucketed on their ``_root_*`` columns with the same hash as
    the root's PK bucketing, so when ``buckets`` (the root buckets touched
    this batch) is given, only those child buckets are read and rewritten and
    ``root_df`` can be pre-restricted to the same buckets by the caller.
    """
    snap = snap or catalog.snapshot(child_name)
    child = catalog.read(child_name, buckets=buckets, snap=snap)
    surviving = root_df.select(
        *[F.col(p).alias(c) for p, c in zip(root_pk, child_root_cols)],
        F.col("_ver").alias("_root_ver"),
    )
    kept = child.join(surviving, on=child_root_cols + ["_root_ver"], how="left_semi")
    if buckets is not None:
        return catalog.overwrite_buckets(child_name, kept, buckets, snap)
    return catalog.overwrite_all(child_name, kept, snap)


class PKIntegrityError(RuntimeError):
    pass


def assert_pk_integrity(catalog: LakeCatalog, name: str, keys: Optional[list[str]] = None) -> None:
    """Post-merge duplicate-key assertion (reference D7,
    ``StreamProcessor.ts:176-193``, the ``neighbor()`` trick ≙ group-count).
    ``keys`` defaults to the table's full key set (reference asserts on all
    pkMappings: root + parent + current + level)."""
    snap = catalog.snapshot(name)
    keys = keys or snap.pk or snap.order_by
    if not keys:
        return
    dup = (
        catalog.read(name, snap=snap)
        .groupBy(*keys)
        .count()
        .where(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise PKIntegrityError(f"Duplicate key on table {name}, data: {dup[0].asDict()}")
