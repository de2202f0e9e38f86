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


def test_simhash_shuffles_only_precombined_votes(spark):
    """simhash (round-6 form) is words-explode + ONE hash aggregation of
    packed word hashes: the partial (map-side) combine must keep shuffle
    volume at docs x (bits+1) pre-combined longs — pinned as at most two
    Exchanges here (tests/test_r6_kernels.py pins exactly one).  The
    row-local HOF fold (simhash_expr) is NOT the batch plan: interpreted
    lambdas lost to codegen under forced-evaluation timing."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(simhash(docs))
    assert plan.count("Exchange") <= 2, plan
    assert "HashAggregate" in plan, plan


def test_simhash_expr_is_projection_only(spark):
    """The streaming fingerprint (simhash_expr) must stay a pure
    projection — no Exchange, no Generate — or it stops being legal
    upstream of the stateful near-dup matcher."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import simhash_expr

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(docs.select("doc_id", simhash_expr("text").alias("s")))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_minhash_signatures_single_combined_shuffle(spark):
    """minhash_signatures is one groupBy with K min-aggregates: the
    map-side combine reduces the shuffle to docs x K minima — pinned as
    exactly one Exchange."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(minhash_signatures(docs))
    assert plan.count("Exchange") == 1, plan
    # string minima use sort-based aggregation; the property that matters
    # is the map-side partial combine before the exchange
    assert "partial_min" in plan, plan
