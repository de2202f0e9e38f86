"""Plan-shape regression tests: lock in the physical-plan properties the
100 TB story depends on, so a refactor can't silently reintroduce a
duplicated model-forward UDF, a shuffled dictionary join, or a quadratic
cross product.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tagging_has_exactly_one_arrow_eval(spark):
    """The model forward must appear ONCE in the plan — plain explode()
    over a UDF column makes Catalyst duplicate the ArrowEvalPython node
    into a generator pre-filter (see operators/tagging.py)."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.tagging import (
        extract_mentions,
    )
    from pytorch_bert_bilstm_crf_ner_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    plan = _plan(extract_mentions(transcripts_from_documents(spark, SF_DIR)))
    assert plan.count("ArrowEvalPython") == 1, plan


def test_dictionary_join_is_broadcast(spark):
    """The entity-dictionary linking join must be a BroadcastHashJoin —
    shuffling the mention table against a dictionary-sized build side is
    the classic scale mistake."""
    from pytorch_bert_bilstm_crf_ner_spark.plans.queries import SPARK_QUERIES

    plan = _plan(SPARK_QUERIES["dict_mentions"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.parametrize(
    "name",
    sorted(
        __import__(
            "pytorch_bert_bilstm_crf_ner_spark.plans.queries",
            fromlist=["SPARK_QUERIES"],
        ).SPARK_QUERIES.keys()
    ),
)
def test_no_cartesian_product_in_registered_plans(spark, name):
    """No registered query may plan a CartesianProduct — the quadratic
    baselines (brute-force cosine) are test oracles, not registered plans.
    BroadcastNestedLoopJoin against an explicitly broadcast-sized side
    (cosine_topk's query set) is allowed; an unbounded cartesian is not."""
    from pytorch_bert_bilstm_crf_ner_spark.plans.queries import SPARK_QUERIES

    df = SPARK_QUERIES[name](spark, SF_DIR)
    assert "CartesianProduct" not in _plan(df), name


def test_simhash_is_map_only(spark):
    """simhash is a single row-local fold (see simhash_expr): the plan
    must contain NO Exchange and NO Generate — a refactor reintroducing
    the grouped collect (1x corpus shuffle) or the words x bit-positions
    explosion (48x corpus shuffle) fails here.  Map-only also keeps the
    expression legal on streaming DataFrames."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(simhash(docs))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_minhash_signatures_is_map_only(spark):
    """minhash_signatures computes each of the K signature columns as a
    row-local array_min(transform(...)) over the in-row shingle array —
    no explode, no shuffle (the old explode + K-aggregate groupBy was
    measured 15x slower and its Exchange reappearing here would flag a
    regression)."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(minhash_signatures(docs))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
