"""End-to-end CDC engine tests against the reference's own integration
fixtures (``/root/reference/tests/data/*.jsonl``), asserting the golden
outcomes of ``tests/processStream.spec.ts``: final row sets, dedup, deletes,
cleaning column, schema evolution, retirement, replay convergence."""

import hashlib
import json

import pytest

from singer_target_clickhouse_spark.config import Config
from singer_target_clickhouse_spark.engine import RecordBeforeSchemaError, SingerEngine
from singer_target_clickhouse_spark.schema.translator import PKConsistencyError

DATA = "/root/reference/tests/data"


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def engine(spark, lake, **over) -> SingerEngine:
    cfg = Config(lake_root=lake, n_buckets=4, **over)
    return SingerEngine(spark, cfg)


def rows(e: SingerEngine, table: str, *cols):
    df = e.catalog.read(table)
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())


def table_hash(e: SingerEngine, table: str) -> str:
    """Deterministic content hash of a table (column-name-sorted, row-sorted).
    Version columns are excluded: like the reference, a re-run assigns fresh
    versions — only business content must converge."""
    df = e.catalog.read(table)
    df = df.select(*sorted(c for c in df.columns if c not in ("_ver", "_root_ver")))
    payload = sorted(json.dumps(r, default=str) for r in (list(t) for t in df.collect()))
    return hashlib.sha256("\n".join(payload).encode()).hexdigest()


# --------------------------------------------------------------------- basics

def test_tiny_then_delete(spark, lake):
    # processStream.spec.ts:562-573
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_tiny.jsonl")
    assert rows(e1, "tickets", "id") == [(1,), (2,), (3,)]
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_tiny_with_delete.jsonl")
    assert rows(e2, "tickets", "id") == [(1,), (3,)]


def test_multi_pk_delete(spark, lake):
    # processStream.spec.ts:575-589
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_vanilla_with_pks.jsonl")
    assert rows(e1, "users", "id", "name") == [(1, "bill"), (2, "bill"), (3, "jack"), (4, "joe")]
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_vanilla_with_pks_and_deletion.jsonl")
    assert rows(e2, "users", "id", "name") == [(1, "bill"), (2, "bill"), (4, "joe")]


def test_short_insert_and_reorder_idempotence(spark, lake):
    # processStream.spec.ts:300-306 + 352-360
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_short.jsonl")
    got = rows(e1, "tickets", "brand_id")
    df = e1.catalog.read("tickets").where("assignee_id = 11").select("brand_id")
    assert [tuple(r) for r in df.collect()] == [(22,)]
    h1 = table_hash(e1, "tickets")

    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_short_reordered.jsonl")
    df = e2.catalog.read("tickets").where("assignee_id = 11").select("brand_id")
    assert [tuple(r) for r in df.collect()] == [(22,)]


def test_replay_convergence_content_hash(spark, lake):
    # processStream.spec.ts:364-402 (re-run => no duplicates), sha256 form
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_short.jsonl")
    hashes1 = {t: table_hash(e1, t) for t in e1.catalog.list_tables()}
    counts1 = {t: e1.catalog.row_count(t) for t in e1.catalog.list_tables()}

    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_short.jsonl")
    hashes2 = {t: table_hash(e2, t) for t in e2.catalog.list_tables()}
    counts2 = {t: e2.catalog.row_count(t) for t in e2.catalog.list_tables()}
    assert counts1 == counts2
    assert hashes1 == hashes2


def test_nested_object_flatten(spark, lake):
    # processStream.spec.ts:356-362
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_nested_object.jsonl")
    assert rows(e, "tickets", "follower_ids__name") == [("jack",)]


def test_nested_array_in_row(spark, lake):
    # processStream.spec.ts:91-106: format:"nested" array stays in-row
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_schema_with_array.jsonl")
    got = rows(e, "query_log", "databases")
    assert got == [(["kento", "nanami"],)]


def test_all_pk_children(spark, lake):
    # processStream.spec.ts:529-560 (record with all_key_properties)
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_short_with_all_pk.jsonl")
    assert e.catalog.row_count("tickets") == 1
    assert e.catalog.row_count("tickets__follower_ids") == 2
    cols = [f.name for f in e.catalog.snapshot("tickets__follower_ids").spark_schema.fields]
    assert cols[:3] == ["_root_id", "_parent_id", "_level_0_index"]


def test_scalar_array_child_rows(spark, lake):
    # stream_with_array: 5 roles over 4 users (spec 440-452)
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_vanilla.jsonl")
    assert e.catalog.row_count("users") == 4
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_with_array.jsonl")
    assert e2.catalog.row_count("users__roles") == 5


# ------------------------------------------------------------------ evolution

def test_new_pks_throw(spark, lake):
    # processStream.spec.ts:456-463
    engine(spark, lake).run_file(f"{DATA}/stream_vanilla_with_pks.jsonl")
    with pytest.raises(PKConsistencyError):
        engine(spark, lake).run_file(f"{DATA}/stream_vanilla_with_new_pks.jsonl")


def test_removed_pks_throw(spark, lake):
    # processStream.spec.ts:465-472
    engine(spark, lake).run_file(f"{DATA}/stream_vanilla_with_pks.jsonl")
    with pytest.raises(PKConsistencyError):
        engine(spark, lake).run_file(f"{DATA}/stream_vanilla_with_removed_pks.jsonl")


def test_clean_first_allows_new_pks(spark, lake):
    # processStream.spec.ts:474-484
    engine(spark, lake).run_file(f"{DATA}/stream_vanilla_with_pks.jsonl")
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_vanilla_with_new_pks_and_clean_first.jsonl")
    assert e.catalog.row_count("users") == 4


def test_schema_twice_is_noop(spark, lake):
    # processStream.spec.ts:126-132. NB the reference asserts 22 on
    # output.split("\n").length, which includes a trailing empty string —
    # the actual table count is 21 (its retirement test filters Boolean and
    # asserts 21).
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_1.jsonl")
    tables = e1.catalog.list_tables()
    assert len(tables) == 21
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_1.jsonl")
    assert e2.catalog.list_tables() == tables


def test_column_evolution_add_modify_drop(spark, lake):
    # processStream.spec.ts:135-173: stream_1 -> stream_1_modified
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_1.jsonl")
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_1_modified.jsonl")
    # changed schema applied without error; table count unchanged
    assert len(e2.catalog.list_tables()) == 21


# ------------------------------------------------------------ cleaning column

def test_cleaning_column_standard(spark, lake):
    # processStream.spec.ts:486-505
    engine(spark, lake).run_file(f"{DATA}/stream_vanilla.jsonl")
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_cleaningColumn.jsonl")
    assert e.catalog.row_count("users") == 5
    bill = e.catalog.read("users").where("name = 'bill'").select("id").collect()
    assert [r["id"] for r in bill] == [7]


def test_cleaning_column_in_pk(spark, lake):
    # processStream.spec.ts:507-527
    e1 = engine(spark, lake)
    e1.run_file(f"{DATA}/stream_cleaningColumn_pk.jsonl")
    assert rows(e1, "users", "id", "name") == [(5, "bob"), (7, "bill"), (8, "bill"), (9, "helen")]
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_cleaningColumn_pk_2.jsonl")
    assert rows(e2, "users", "id", "name") == [(5, "bob"), (9, "helen"), (10, "bill")]


# ------------------------------------------------------------------ retirement

def test_active_streams_retirement(spark, lake):
    # processStream.spec.ts:192-258
    engine(spark, lake).run_file(f"{DATA}/stream_1.jsonl")
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_1_inactive.jsonl")
    tables = e.catalog.list_tables()
    assert len(tables) == 21  # tickets dropped (1 table), 21 remain incl. renames
    for t in tables:
        if "ticket_audits" in t:
            assert not t.startswith("_dropped_")
        else:
            assert t.startswith("_dropped_"), t
    # idempotent: second pass doesn't double-prefix
    e2 = engine(spark, lake)
    e2.run_file(f"{DATA}/stream_1_inactive.jsonl")
    for t in e2.catalog.list_tables():
        assert not t.startswith("_dropped__dropped_"), t
    # archived tables are respected
    victim = next(t for t in e2.catalog.list_tables() if t.startswith("_dropped_ticket_metrics"))
    e2.catalog.rename_table(victim, victim.replace("_dropped_", "_archived_", 1))
    e3 = engine(spark, lake)
    e3.run_file(f"{DATA}/stream_1_inactive.jsonl")
    archived = [t for t in e3.catalog.list_tables() if t.startswith("_archived_")]
    assert archived and all("_dropped_" not in t for t in archived)


def test_extra_active_tables(spark, lake):
    # processStream.spec.ts:246-258
    engine(spark, lake, extra_active_tables=["tickets"]).run_file(f"{DATA}/stream_1.jsonl")
    e = engine(spark, lake, extra_active_tables=["tickets"])
    e.run_file(f"{DATA}/stream_1_inactive.jsonl")
    for t in e.catalog.list_tables():
        if "ticket_audits" in t or t.startswith("tickets"):
            assert not t.startswith("_dropped_"), t
        else:
            assert t.startswith("_dropped_"), t


# ----------------------------------------------------------------- state/misc

def test_state_written(spark, lake):
    # processStream.spec.ts:56-66: last state wins
    e = engine(spark, lake)
    e.run_file(f"{DATA}/stream_with_state.jsonl")
    assert e.read_state() == {"bookmarks": {}, "currently_syncing": None}


def test_record_before_schema_throws(spark, lake, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"type": "RECORD", "stream": "nope", "record": {"id": 1}}\n')
    with pytest.raises(RecordBeforeSchemaError):
        engine(spark, lake).run_file(str(p))


def test_upsert_latest_wins_across_runs(spark, lake, tmp_path):
    p1 = tmp_path / "a.jsonl"
    p1.write_text(
        '{"type": "SCHEMA", "stream": "t", "schema": {"type": "object", "properties": '
        '{"id": {"type": "integer"}, "v": {"type": ["null", "string"]}}}, "key_properties": ["id"]}\n'
        '{"type": "RECORD", "stream": "t", "record": {"id": 1, "v": "old"}}\n'
        '{"type": "RECORD", "stream": "t", "record": {"id": 2, "v": "keep"}}\n'
    )
    p2 = tmp_path / "b.jsonl"
    p2.write_text(
        '{"type": "SCHEMA", "stream": "t", "schema": {"type": "object", "properties": '
        '{"id": {"type": "integer"}, "v": {"type": ["null", "string"]}}}, "key_properties": ["id"]}\n'
        '{"type": "RECORD", "stream": "t", "record": {"id": 1, "v": "new"}}\n'
    )
    engine(spark, lake).run_file(str(p1))
    e = engine(spark, lake)
    e.run_file(str(p2))
    assert rows(e, "t", "id", "v") == [(1, "new"), (2, "keep")]
    # versions strictly increased across runs
    vers = dict(rows(e, "t", "id", "_ver"))
    assert vers[1] > vers[2]
