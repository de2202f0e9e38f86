"""Entity dictionary as a small Spark DataFrame — the broadcast side of the
linking join (reference analog: per-type entity inventories,
`data/cner/aug_data/*.txt` built by `data_augment/aug.py:31-59`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.entities import ENTITY_DICT_ROWS

ENTITY_DICT_SCHEMA = StructType(
    [
        StructField("entity_id", LongType(), False),
        StructField("alias", StringType(), False),
        StructField("type", StringType(), False),
        StructField("canonical_name", StringType(), False),
    ]
)


def entity_dict_df(spark: SparkSession, rows=ENTITY_DICT_ROWS) -> DataFrame:
    return spark.createDataFrame(list(rows), ENTITY_DICT_SCHEMA)


def entity_dict_values_sql(rows=ENTITY_DICT_ROWS, alias: str = "d") -> str:
    """Inline VALUES relation (aliased) for the DuckDB oracle twin."""
    vals = ", ".join(
        f"({eid}, '{a}', '{etype}', '{name}')" for eid, a, etype, name in rows
    )
    return f"(VALUES {vals}) AS {alias}(entity_id, alias, type, canonical_name)"
