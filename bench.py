"""Benchmark harness (driver contract).

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "extra": {...}}``.

The flagship metric is the CDC replay: a deterministic Singer change stream
(1 event per lineitem row at the given sf) applied through the engine into a
fresh lake across 4 micro-batches, reported both as seconds and as
events/sec in ``extra``.

Env knobs:
- ``SPARK_GRAFT_SF_DIR``  data directory (default /root/testdata/sf0.1)
- ``SPARK_GRAFT_CPUS``    local[] parallelism (default 32)
- ``STCS_BENCH_ONLY``     comma-separated subset of query names (used by
  tools/bench_scaling.py to isolate cdc_replay at two core counts)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stcs-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def bench_cdc_replay(spark, sf_dir: str, n_batches: int = 4):
    """events/sec applied: generate -> shred -> merge -> converged lake."""
    from pyspark.sql import functions as F

    from singer_target_clickhouse_spark.config import Config
    from singer_target_clickhouse_spark.engine import SingerEngine
    from singer_target_clickhouse_spark.gen import REPO_STREAM, change_events_df

    n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    lake = tempfile.mkdtemp(prefix="stcs_bench_lake_")
    cfg = Config(lake_root=lake, n_buckets=32)
    eng = SingerEngine(spark, cfg)
    events = change_events_df(spark, n, n_repos=200, paths_per_repo=2000).cache()
    events.count()  # materialize generation outside the timed window

    t0 = time.time()
    step = (n + 1 + n_batches - 1) // n_batches
    for b in range(n_batches):
        lo, hi = b * step, min((b + 1) * step, n + 1)
        eng.apply_lines(events.where((F.col("_seq") >= lo) & (F.col("_seq") < hi)))
    eng.finalize()
    elapsed = time.time() - t0
    rows = eng.catalog.row_count(REPO_STREAM)
    events.unpersist()
    return elapsed, {"events": n + 1, "events_per_sec": round((n + 1) / elapsed, 1), "final_rows": rows}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(filter(None, os.environ.get("STCS_BENCH_ONLY", "").split(",")))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = build_spark(cpus)
    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    extra: dict[str, object] = {"cpus": cpus}

    def run(name, fn):
        if only and name not in only:
            return
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 2)

    # flagship: CDC replay
    if not only or "cdc_replay" in only:
        elapsed, info = bench_cdc_replay(spark, sf_dir)
        timings["cdc_replay"] = round(elapsed, 2)
        extra.update(info)

    qs = entrymod.queries()
    for name in [
        "cdc_latest_wins", "q1_pricing_summary", "q3_shipping_priority",
        "q5_revenue_by_nation", "window_top_orders", "text_profile",
        "dedup_exact", "dedup_minhash_lsh", "dedup_token_jaccard",
        "dedup_simhash", "ann_cosine_topk", "dedup_embedding_cosine",
        "text_wordcount_top",
    ]:
        run(name, lambda n=name: qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 2)
    print(json.dumps({
        "metric": "cdc replay + query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
