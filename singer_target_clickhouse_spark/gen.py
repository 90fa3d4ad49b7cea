"""Deterministic synthetic Singer change-event generator.

Emits the BASELINE.json workload: a JSONL stream of SCHEMA / RECORD /
DELETED_RECORD / STATE messages over the source-code repo table
``(repo, path, commit, lang, content)`` keyed on ``(repo, path)``.

Scale design: events are synthesized **distributed** — a ``spark.range``
with every column a deterministic function of the event index (seeded
hashes), then ``to_json`` — so generating 10^10 events is an O(n/cores)
map with no driver materialization. Repo popularity is skewed (a few hot
repos receive a large share of updates) to exercise the engine's skew
defense — the map-side ``max_by`` partial combine in the merge (an explicit
salted repartition was measured and reverted in round 4).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

REPO_STREAM = "repo_files"

REPO_SCHEMA_MESSAGE = {
    "type": "SCHEMA",
    "stream": REPO_STREAM,
    "schema": {
        "type": "object",
        "properties": {
            "repo": {"type": "string"},
            "path": {"type": "string"},
            "commit": {"type": "string"},
            "lang": {"type": ["null", "string"]},
            "content": {"type": ["null", "string"]},
        },
    },
    "key_properties": ["repo", "path"],
}

_LANGS = ["py", "ts", "go", "rs", "java", "c", "md", "sql"]


def change_events_df(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    paths_per_repo: int = 1000,
    delete_every: int = 97,
    hot_repo_share: int = 4,
    seed: int = 42,
    content_len: int = 64,
) -> DataFrame:
    """DataFrame (value string, _seq long) of Singer messages.

    Key skew: event i lands on repo ``hash(i) % n_repos`` except every
    ``hot_repo_share``-th event, which lands on one of 3 hot repos — at
    n_repos=100 that gives the hot repos ~25x the median update rate.
    Updates: the (repo, path) key space is much smaller than n_events, so
    keys receive many versions; latest (highest seq) must win.
    """
    df = spark.range(0, n_events, 1)
    h = F.abs(F.xxhash64(F.col("id") + F.lit(seed)))
    hot = (F.col("id") % hot_repo_share) == 0
    repo_idx = F.when(hot, h % 3).otherwise(h % n_repos)
    path_idx = F.abs(F.xxhash64(F.col("id") * 31 + F.lit(seed))) % paths_per_repo
    lang = F.element_at(F.array(*[F.lit(l) for l in _LANGS]), (path_idx % len(_LANGS) + 1).cast("int"))
    commit = F.md5(F.concat_ws("-", F.lit("c"), F.col("id").cast("string"), F.lit(seed)))
    content = F.repeat(
        F.concat(F.lit("line-"), F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit("content")))),
        max(1, content_len // 37),
    )
    record = F.to_json(
        F.struct(
            F.concat(F.lit("repo_"), repo_idx.cast("string")).alias("repo"),
            F.concat(
                F.lit("src/dir_"), (path_idx % 50).cast("string"),
                F.lit("/file_"), path_idx.cast("string"), F.lit("."), lang,
            ).alias("path"),
            commit.alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
        )
    )
    is_delete = (F.col("id") % delete_every == 0) & (F.col("id") > 0)
    delete_record = F.to_json(
        F.struct(
            F.concat(F.lit("repo_"), repo_idx.cast("string")).alias("repo"),
            F.concat(
                F.lit("src/dir_"), (path_idx % 50).cast("string"),
                F.lit("/file_"), path_idx.cast("string"), F.lit("."), lang,
            ).alias("path"),
        )
    )
    value = F.when(
        is_delete,
        F.concat(
            F.lit('{"type": "DELETED_RECORD", "stream": "' + REPO_STREAM + '", "record": '),
            delete_record,
            F.lit("}"),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"type": "RECORD", "stream": "' + REPO_STREAM + '", "record": '),
            record,
            F.lit("}"),
        )
    )
    # _seq 0 is the SCHEMA message; events start at 1.
    events = df.select(value.alias("value"), (F.col("id") + 1).alias("_seq"))
    schema_line = spark.createDataFrame(
        [(json.dumps(REPO_SCHEMA_MESSAGE), 0)], "value string, _seq long"
    )
    return schema_line.unionByName(events)


def write_jsonl(df: DataFrame, out_dir: str, n_files: int = 8, with_offsets: bool = False) -> str:
    """Materialize the message stream as text files (a file-backed change
    log; the streaming driver tails the directory).

    ``with_offsets=True`` prefixes every line with ``<seq>\\t`` — a change
    log that carries its own durable offsets (like a binlog position or
    Kafka offset), which lets the streaming driver recover ``_seq``
    JVM-side instead of zipWithIndex'ing rows through Python.
    """
    os.makedirs(out_dir, exist_ok=True)
    out = (
        # contiguous seq ranges per file, in-file order = seq order, and
        # part-file numbering follows the range order — so a directory
        # listing replays the log in offset order
        df.repartitionByRange(n_files, F.col("_seq"))
        .sortWithinPartitions("_seq")
    )
    value = (
        F.concat(F.col("_seq").cast("string"), F.lit("\t"), F.col("value"))
        if with_offsets
        else F.col("value")
    )
    out.select(value.alias("value")).write.mode("overwrite").text(out_dir)
    # FileStreamSource orders new files by modification time; stamp strictly
    # increasing mtimes in part order so micro-batches replay the log in
    # offset order (all parts otherwise share one mtime and the order is
    # undefined, which would scramble seqs across batches).
    parts = sorted(f for f in os.listdir(out_dir) if f.startswith("part-"))
    base = int(os.path.getmtime(os.path.join(out_dir, parts[0]))) if parts else 0
    for i, p in enumerate(parts):
        os.utime(os.path.join(out_dir, p), (base + i, base + i))
    return out_dir
