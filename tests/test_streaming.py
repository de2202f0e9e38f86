"""Structured Streaming ingest: incremental tagging with exactly-once file
processing (checkpoint resume — the streaming twin of the batch lineage)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "input": str(tmp_path / "in"),
        "output": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    return d


def _write_batch(spark, input_dir, conv_prefix, n):
    from pytorch_bert_bilstm_crf_ner_spark.streaming.ingest import (
        TRANSCRIPTS_SCHEMA,
    )
    import datetime

    rows = [
        (
            f"{conv_prefix}_{i}",
            0,
            "user",
            "run a table scan then hash join now",
            None,
            datetime.datetime(2024, 1, 1),
        )
        for i in range(n)
    ]
    spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def test_incremental_stream(spark, dirs):
    from pytorch_bert_bilstm_crf_ner_spark.streaming.ingest import stream_mentions

    _write_batch(spark, dirs["input"], "convA", 5)
    q = stream_mentions(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    q.awaitTermination(120)
    first = spark.read.parquet(dirs["output"])
    n1 = first.count()
    assert n1 == 5 * 2  # 2 mentions per turn (table scan, hash join)
    batch_ids_1 = {r["batch_id"] for r in first.select("batch_id").distinct().collect()}

    # new files arrive; re-run drains ONLY the new ones (checkpoint)
    _write_batch(spark, dirs["input"], "convB", 3)
    q2 = stream_mentions(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    q2.awaitTermination(120)
    out = spark.read.parquet(dirs["output"])
    assert out.count() == (5 + 3) * 2
    assert out.filter("conv_id like 'convB%'").count() == 6
    # convA rows were not reprocessed (their batch ids unchanged)
    assert {
        r["batch_id"]
        for r in out.filter("conv_id like 'convA%'").select("batch_id").distinct().collect()
    } == batch_ids_1
