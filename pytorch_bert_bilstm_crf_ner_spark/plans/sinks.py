"""Graph-table sink: partitioned Iceberg when a catalog is configured,
parquet otherwise.

The north-star deployment writes `(subj, pred, obj)` triples into
partitioned Iceberg tables (`write.format("iceberg")` / `writeTo(...)
.partitionedBy(...)`); this sandbox has no Iceberg runtime on the
classpath, so ``fmt="auto"`` probes for it and falls back to
directory-partitioned parquet with identical partitioning semantics
(partition pruning on ``pred`` works the same way in both)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_graph_table(
    df: DataFrame,
    target: str,
    partition_by: tuple[str, ...] = ("pred",),
    fmt: str = "auto",
    mode: str = "overwrite",
) -> str:
    """Returns the format actually used ('iceberg' or 'parquet')."""
    if fmt in ("auto", "iceberg"):
        try:
            writer = df.writeTo(target).using("iceberg")
            for col in partition_by:
                writer = writer.partitionedBy(df[col])
            writer.createOrReplace()
            return "iceberg"
        except Exception:
            if fmt == "iceberg":
                raise
    (
        df.write.mode(mode)
        .partitionBy(*partition_by)
        .parquet(target)
    )
    return "parquet"
