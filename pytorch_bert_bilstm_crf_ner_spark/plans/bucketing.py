"""Bucketed co-located joins: pre-shuffle once, join shuffle-free forever.

At 100 TB the mention and transcript tables are joined on ``conv_id``
again and again (adjacency text fetch, per-conversation analytics,
incremental reprocessing).  Writing both ``bucketBy(conv_id)`` with the
same bucket count makes every subsequent equi-join on conv_id a zero-
Exchange sort-merge join over co-located buckets — the one-time bucketed
write replaces a shuffle per downstream job.  (Iceberg's bucket partition
transform plays the same role on a real lakehouse.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("conv_id",),
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[DataFrame, bool]:
    """Join two same-bucketed tables; returns (df, no-Exchange?) so callers
    and tests can assert the co-location actually took effect."""
    joined = spark.table(left_table).join(spark.table(right_table), on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, "Exchange" not in plan
