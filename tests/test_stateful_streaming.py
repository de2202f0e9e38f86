"""applyInPandasWithState incremental co-occurrence: pairs emitted on
first observability, per-conversation state restored across restarts."""

from __future__ import annotations


def _write(spark, path, rows):
    from pytorch_bert_bilstm_crf_ner_spark.streaming.stateful import (
        MENTION_STREAM_SCHEMA,
    )

    spark.createDataFrame(rows, MENTION_STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_cooccurrence_with_restart(spark, tmp_path):
    from pytorch_bert_bilstm_crf_ner_spark.streaming.stateful import (
        stream_cooccurrence,
    )

    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: conv A sees entities 1 (turn 0) and 2 (turn 1)
    _write(spark, inp, [("A", 0, 0, 1), ("A", 1, 0, 2)])
    q = stream_cooccurrence(spark, inp, outp, ckpt)
    q.awaitTermination(120)
    first = {tuple(r) for r in spark.read.parquet(outp).collect()}
    assert first == {("A", 1, 2, 0)}

    # restart with a new file: entity 3 arrives at turn 2 -> pairs with the
    # RESTORED seen-set {1, 2}, not with itself twice, and old pairs are
    # not re-emitted
    _write(spark, inp, [("A", 2, 0, 3), ("B", 0, 0, 7), ("B", 0, 5, 8)])
    q2 = stream_cooccurrence(spark, inp, outp, ckpt)
    q2.awaitTermination(120)
    allpairs = {tuple(r) for r in spark.read.parquet(outp).collect()}
    assert allpairs == {
        ("A", 1, 2, 0),
        ("A", 1, 3, 0),
        ("A", 2, 3, 1),
        ("B", 7, 8, 0),   # same turn: earlier start -> later start
    }
