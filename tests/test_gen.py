"""Generator + full-pipeline oracle test: replaying the synthetic change log
must converge to exactly "latest record per (repo, path), minus keys whose
latest event is a delete" — computed independently from the raw log."""

import json

from pyspark.sql import Window, functions as F

from singer_target_clickhouse_spark.config import Config
from singer_target_clickhouse_spark.engine import SingerEngine
from singer_target_clickhouse_spark.gen import REPO_STREAM, change_events_df, write_jsonl


def expected_final_state(spark, events):
    """Oracle: per key, keep the highest-seq event; drop if it's a delete."""
    parsed = events.select(
        F.get_json_object("value", "$.type").alias("t"),
        F.get_json_object("value", "$.record.repo").alias("repo"),
        F.get_json_object("value", "$.record.path").alias("path"),
        F.get_json_object("value", "$.record.commit").alias("commit"),
        "_seq",
    ).where(F.col("t").isin("RECORD", "DELETED_RECORD"))
    w = Window.partitionBy("repo", "path").orderBy(F.col("_seq").desc())
    last = parsed.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    return {
        (r["repo"], r["path"]): r["commit"]
        for r in last.where(F.col("t") == "RECORD").collect()
    }


def test_generated_stream_determinism(spark):
    a = change_events_df(spark, 500).collect()
    b = change_events_df(spark, 500).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert json.loads(a[0]["value"])["type"] in ("SCHEMA", "RECORD", "DELETED_RECORD")


def test_pipeline_matches_oracle(spark, tmp_path):
    n = 2000
    events = change_events_df(spark, n, n_repos=20, paths_per_repo=50)
    log_dir = write_jsonl(events, str(tmp_path / "log"), n_files=4)

    cfg = Config(lake_root=str(tmp_path / "lake"), n_buckets=8)
    eng = SingerEngine(spark, cfg)
    # apply in two batches to exercise cross-batch versioning
    lines = events.orderBy("_seq")
    eng.apply_lines(lines.where(F.col("_seq") < n // 2))
    eng.apply_lines(lines.where(F.col("_seq") >= n // 2))
    eng.finalize()

    got = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.catalog.read(REPO_STREAM).select("repo", "path", "commit").collect()
    }
    want = expected_final_state(spark, events)
    assert got == want
