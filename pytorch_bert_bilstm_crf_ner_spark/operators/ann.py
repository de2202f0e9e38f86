"""Similarity search over the ``embeddings`` table (array<float> column).

- :func:`cosine_topk` — brute-force cosine top-k, the exactness baseline:
  broadcast the (small) query set, JVM-side ``zip_with``/``aggregate`` dot
  products, per-query ``row_number`` window for the top-k.  Has an exact
  DuckDB twin.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane (sign) LSH.
  Hyperplanes are seeded numpy, shipped as a broadcast-joined literal
  table; bucket = md5 of the sign bits, candidates = bucket equi-join
  (multi-probe over H tables), exact re-rank inside buckets.  At 100 TB
  the bucket join replaces the quadratic cross join; recall is tunable
  via (n_planes, n_tables).  No SQL twin (seeded-hyperplane generation
  isn't ANSI SQL) — covered by a pytest recall check vs the brute-force
  baseline.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _with_norm(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("embedding").alias(f"{prefix}_emb"),
        F.sqrt(_dot("embedding", "embedding")).alias(f"{prefix}_norm"),
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids:
    (query_id, neighbor_id, cos_sim, rank)."""
    q = _with_norm(embeddings.filter(F.col("vec_id") < n_queries), "q")
    c = _with_norm(embeddings, "c")
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cos_sim",
            F.round(_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 4),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def cosine_topk_sql(n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.embedding, c.embedding)
               / (sqrt(list_dot_product(q.embedding, q.embedding))
                  * sqrt(list_dot_product(c.embedding, c.embedding))), 4) AS cos_sim
  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
"""


def lsh_buckets(embeddings: DataFrame, dim: int = 64, n_planes: int = 8,
                n_tables: int = 4, seed: int = 7) -> DataFrame:
    """(vec_id, table_id, bucket): sign-LSH bucket per hash table."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(float)
    spark = embeddings.sparkSession
    plane_rows = [
        (int(t), int(p), [float(x) for x in planes[t, p]])
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    planes_df = spark.createDataFrame(
        plane_rows, "table_id INT, plane_id INT, plane ARRAY<DOUBLE>"
    )
    signed = (
        embeddings.select("vec_id", "embedding")
        .join(F.broadcast(planes_df))
        .withColumn("bit", (_dot("embedding", "plane") > 0).cast("int"))
    )
    return (
        signed.groupBy("vec_id", "table_id")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("plane_id", "bit"))
                        ),
                        lambda s: s["bit"].cast("string"),
                    ),
                )
            ).alias("bucket")
        )
    )


def lsh_cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                    dim: int = 64, n_planes: int = 8, n_tables: int = 4,
                    seed: int = 7) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table,
    exact cosine re-rank within candidates."""
    buckets = lsh_buckets(embeddings, dim, n_planes, n_tables, seed)
    qb = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "table_id", "bucket"
    )
    cand = (
        buckets.join(qb, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
        .distinct()
    )
    q = _with_norm(embeddings, "q").withColumnRenamed("q_id", "qq_id")
    c = _with_norm(embeddings, "c").withColumnRenamed("c_id", "cc_id")
    scored = (
        cand.join(q, cand.q_id == q.qq_id)
        .join(c, cand.c_id == c.cc_id)
        .withColumn(
            "cos_sim",
            F.round(_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 4),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )
