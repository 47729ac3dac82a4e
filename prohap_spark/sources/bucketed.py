"""Bucketed table layout (SURVEY §7.1.7: 'bucketed writes on
transcript_id'): pre-shuffle the big fact tables once at write time so
every later join/aggregation on the bucket key is exchange-free.

At 100 TB this converts the per-query shuffle of the variant×transcript
fact (the hottest key in the pipeline) into a one-time layout cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previous session may have left the managed location behind
    # without a catalog entry — overwrite can't see it and errors with
    # LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:") or warehouse.startswith("/"):
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(warehouse).path or warehouse
        shutil.rmtree(f"{loc}/{table_name.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
