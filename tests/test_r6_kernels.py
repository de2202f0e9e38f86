"""Round-6 optimization guards: the Arrow numpy kernels that replaced
JVM fold expressions must stay BIT-IDENTICAL to the sequential
((0.0 + x0) + x1) + ... double fold (the contract the DuckDB twins rely
on), and the simhash rewrite must keep its single-Exchange plan."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _fold_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


def test_lsh_buckets_kernel_matches_sequential_fold(spark):
    """Every bucket id from the Arrow kernel equals the one computed from
    python sequential-fold dots over the same md5 planes (the pre-rewrite
    JVM formulation) — pins the per-dim accumulation order."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.ann import lsh_buckets
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import (
        md5_plane_rows,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    dim = len(next(iter(rows.values())))
    planes = md5_plane_rows(dim, n_planes=4, n_tables=3, seed=7)
    got = {
        (r["vec_id"], r["table_id"]): r["bucket"]
        for r in lsh_buckets(emb, dim=dim, n_planes=4, n_tables=3,
                             plane_rows=planes).collect()
    }
    expected: dict = {}
    for (t, p, plane) in planes:
        for vid, vec in rows.items():
            if _fold_dot(vec, plane) > 0:
                key = (vid, t)
                expected[key] = expected.get(key, 0) + (1 << p)
    for vid in rows:
        for t in range(3):
            assert got[(vid, t)] == expected.get((vid, t), 0), (vid, t)


def test_pair_cosine_parts_matches_sequential_fold(spark):
    """dot/norms from the Arrow kernel equal the sequential double fold
    bit-for-bit (==, not approx)."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.ann import (
        pair_cosine_parts,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(32)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    ids = sorted(rows)[:10]
    dim = len(rows[ids[0]])
    pairs = spark.createDataFrame(
        [
            (a, b, rows[a], rows[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
        ],
        "vec_a BIGINT, vec_b BIGINT, emb_a ARRAY<FLOAT>, emb_b ARRAY<FLOAT>",
    )
    for r in pair_cosine_parts(pairs, dim).collect():
        a, b = rows[r["vec_a"]], rows[r["vec_b"]]
        assert r["dot"] == _fold_dot(a, b)
        assert r["norm_a"] == math.sqrt(_fold_dot(a, a))
        assert r["norm_b"] == math.sqrt(_fold_dot(b, b))


def test_ivf_assignment_matches_fold_argmax(spark):
    """Kernel assignment == argmax of sequential-fold cosine scores with
    the (max score, lowest centroid_id) tie rule."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.ann import (
        _assign_to_centroid,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(48)
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    dim = len(next(iter(rows.values())))
    cents = [
        [((int(hashlib.md5(f"{c}|{d}".encode()).hexdigest()[:8], 16)
           / 4294967295) * 2 - 1) for d in range(dim)]
        for c in range(4)
    ]
    got = {r["vec_id"]: r["centroid_id"]
           for r in _assign_to_centroid(emb, cents).collect()}
    for vid, vec in rows.items():
        ne = math.sqrt(_fold_dot(vec, vec))
        best_i, best_s = 0, None
        for i, c in enumerate(cents):
            nc = math.sqrt(_fold_dot(c, c))
            s = _fold_dot(vec, c) / (ne * nc)
            if best_s is None or s > best_s:
                best_i, best_s = i, s
        assert got[vid] == best_i, vid


def test_simhash_plans_single_exchange(spark):
    """The round-6 packed-word-hash simhash is ONE aggregation: exactly
    one Exchange (was <= 2 for the old two-aggregation form)."""
    from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = simhash(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
