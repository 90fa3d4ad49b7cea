"""Iceberg-backend seam tests.

The probe path runs everywhere; the end-to-end cycle needs the Iceberg
runtime jars + a configured catalog, which this sandbox does not ship, so it
is skipped unless ``iceberg_available`` — it documents exactly how the
production deployment exercises the MERGE INTO path the emulation mirrors.
"""

import pytest
from pyspark.sql import functions as F

from singer_target_clickhouse_spark.lake.iceberg import IcebergCatalog, iceberg_available


def test_probe_false_without_jars(spark):
    # this sandbox has no iceberg extensions: the probe must say so (and the
    # engine then uses the emulated LakeCatalog)
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="not configured"):
        IcebergCatalog(spark)


@pytest.mark.skipif(
    "not iceberg_available(__import__('pyspark').sql.SparkSession.getActiveSession() "
    "or __import__('pyspark').sql.SparkSession.builder.getOrCreate())",
    reason="iceberg runtime jars + catalog conf not present",
)
def test_iceberg_merge_cycle(spark, tmp_path):
    """Full CDC merge cycle on real Iceberg: create bucketed table, versioned
    MERGE with tombstones, replay no-op, orphan delete, widen column."""
    from pyspark.sql import types as T

    from singer_target_clickhouse_spark.lake.merge import latest_wins

    cat = IcebergCatalog(spark)
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("_ver", T.LongType()),
        ]
    )
    cat.drop_table("files")
    cat.create_table("files", schema, pk=["repo", "path"], bucket_by=["repo", "path"], n_buckets=8)

    batch = spark.createDataFrame(
        [
            ("r1", "a.py", "c1", 1, False),
            ("r1", "a.py", "c2", 2, False),
            ("r2", "b.py", "c3", 3, False),
            ("r2", "b.py", None, 4, True),  # tombstone
        ],
        "repo string, path string, commit string, _ver long, __ts boolean",
    )
    collapsed = latest_wins(batch, ["repo", "path"])
    cat.merge_upsert("files", collapsed, pk=["repo", "path"], tombstone_col="__ts")
    rows = {(r["repo"], r["path"]): r["commit"] for r in cat.read("files").collect()}
    assert rows == {("r1", "a.py"): "c2"}

    # replay: identical versions are no-ops (s._ver > t._ver guard)
    cat.merge_upsert("files", collapsed, pk=["repo", "path"], tombstone_col="__ts")
    assert cat.read("files").count() == 1

    # schema widen is metadata-only
    cat.add_column("files", "size", T.IntegerType())
    cat.widen_column("files", "size", T.LongType())
    assert dict(cat.read("files").dtypes)["size"] == "bigint"
    cat.drop_table("files")
