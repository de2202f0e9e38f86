"""Reference-corpus scans (SURVEY.md §2.1 S1-S4): every raw format the
reference's per-corpus ``process.py`` scripts normalize is readable here as
a DataFrame in the common mid_data shape
``(doc_id long, text string, labels array<struct<span_id,type,start,end,mention>>)``
so a user of the reference can point the engine at their existing corpora.

- S1 BMES char files (`data/cner/raw_data/*.char.bmes`): wholetext read ->
  Arrow-batched parse with the bit-exact `core/bmes.py` port.  Files are
  the parallelism unit (a 100 TB corpus is many files; one file parses
  streamed within a task).
- S2 JSON-lines with entity_list (`data/weibo|msra/raw_data/*.txt`):
  `spark.read.json` with explicit schema -> pure column transforms
  (no python), mirroring `data/weibo/raw_data/process.py:4-45`.
- S3 gdcq aspect/opinion CSV (`data/gdcq/raw_data/Train_merge.csv`):
  `spark.read.csv(header=True)`.
- S4 mid_data JSON (`preprocess.py:41-45`): multiLine JSON array; the
  heterogeneous label arrays are cast into the typed struct.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LABEL_STRUCT = StructType(
    [
        StructField("span_id", StringType(), False),
        StructField("type", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),  # exclusive
        StructField("mention", StringType(), False),
    ]
)
MID_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("labels", ArrayType(LABEL_STRUCT), False),
    ]
)


def read_bmes(spark: SparkSession, path: str) -> DataFrame:
    """S1: BMES char files -> mid_data-shaped DataFrame.  doc_id is the
    sentence index within its file (file order preserved)."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.bmes import parse_bmes_lines

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, (text, labels) in enumerate(
                    parse_bmes_lines(r["value"].splitlines())
                ):
                    rows.append(
                        {
                            "doc_id": i,
                            "text": text,
                            "labels": [
                                {
                                    "span_id": sid,
                                    "type": t,
                                    "start": s,
                                    "end": e,
                                    "mention": m,
                                }
                                for sid, t, s, e, m in labels
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "text", "labels"])

    return raw.mapInPandas(parse, MID_SCHEMA).filter(F.length("text") > 0)


_ENTITY_LIST_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField(
            "entity_list",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "entity_index",
                            StructType(
                                [
                                    StructField("begin", LongType()),
                                    StructField("end", LongType()),
                                ]
                            ),
                        ),
                        StructField("entity_type", StringType()),
                        StructField("entity", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_jsonlines_entities(spark: SparkSession, path: str) -> DataFrame:
    """S2: weibo/msra-style JSON lines -> mid_data shape, mirroring
    `data/weibo/raw_data/process.py:4-45` (empty texts dropped, labels
    numbered T0.. in entity_list order) with pure column expressions."""
    df = (
        spark.read.schema(_ENTITY_LIST_SCHEMA)
        .json(path)
        .filter(F.length("text") > 0)
    )
    labels = F.transform(
        F.coalesce("entity_list", F.array()),
        lambda e, j: F.struct(
            F.concat(F.lit("T"), j.cast("string")).alias("span_id"),
            e["entity_type"].alias("type"),
            e["entity_index"]["begin"].cast("int").alias("start"),
            e["entity_index"]["end"].cast("int").alias("end"),
            e["entity"].alias("mention"),
        ),
    )
    # doc_id: unique but not line-sequential (monotonically_increasing_id
    # is partition-local — a global row_number would force one partition,
    # which is wrong at corpus scale; join downstream on text/keys instead)
    return df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        "text",
        labels.alias("labels"),
    )


def read_gdcq_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: gdcq aspect/opinion CSV (`data/gdcq/raw_data/process.py`)."""
    return spark.read.csv(path, header=True, inferSchema=False)


def read_mid_data(spark: SparkSession, path: str) -> DataFrame:
    """S4: mid_data JSON array -> typed mid_data DataFrame.  The raw label
    rows are heterogeneous JSON arrays (["T0","NAME",0,2,"高勇"]) which
    Spark reads as array<string>; cast into the struct here."""
    raw = spark.read.option("multiLine", True).json(path)
    labels = F.transform(
        F.coalesce("labels", F.array()),
        lambda lab: F.struct(
            F.element_at(lab, 1).alias("span_id"),
            F.element_at(lab, 2).alias("type"),
            F.element_at(lab, 3).cast("int").alias("start"),
            F.element_at(lab, 4).cast("int").alias("end"),
            F.element_at(lab, 5).alias("mention"),
        ),
    )
    return raw.select(
        F.col("id").cast("long").alias("doc_id"), "text", labels.alias("labels")
    )


def gold_mentions(mid: DataFrame) -> DataFrame:
    """mid_data -> flat golden span table (the callback_info analog,
    `preprocess.py:81-89`): (doc_id, mention, start, type)."""
    return mid.select(
        "doc_id", F.explode("labels").alias("lab")
    ).select(
        "doc_id",
        F.col("lab.mention").alias("mention"),
        F.col("lab.start").alias("start"),
        F.col("lab.type").alias("type"),
    )
