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
         ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 4) AS cos_sim
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
                n_tables: int = 4, seed: int = 7,
                plane_rows: list[tuple[int, int, list[float]]] | None = None,
                ) -> DataFrame:
    """(vec_id, table_id, bucket): sign-LSH bucket per hash table.

    ``plane_rows`` swaps in externally generated hyperplanes (e.g. the
    md5-derived, SQL-regenerable `dedup.md5_plane_rows`); default is the
    seeded-numpy Gaussian family whose twin inlines literals
    (:func:`lsh_cosine_topk_sql`)."""
    if plane_rows is None:
        rng = np.random.RandomState(seed)
        planes = rng.normal(size=(n_tables, n_planes, dim)).astype(float)
        plane_rows = [
            (int(t), int(p), [float(x) for x in planes[t, p]])
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    spark = embeddings.sparkSession
    planes_df = spark.createDataFrame(
        plane_rows, "table_id INT, plane_id INT, plane ARRAY<DOUBLE>"
    )
    signed = (
        embeddings.select("vec_id", "embedding")
        .join(F.broadcast(planes_df))
        .withColumn("bit", (_dot("embedding", "plane") > 0).cast("int"))
    )
    # bucket = the sign bits packed into one bigint (sum of bit << plane) —
    # a plain map-side-combinable SUM, no per-group array sort / string
    # hash; injective in the bit vector, so bucket equality is unchanged
    return (
        signed.groupBy("vec_id", "table_id")
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(bit AS BIGINT), plane_id)")
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


# --------------------------------------------------------------------- #
# IVF (inverted-file) ANN: k-means coarse quantizer -> per-centroid
# buckets -> nprobe-bucket candidate search with exact re-rank.

def kmeans_centroids(embeddings: DataFrame, k: int = 16, max_iter: int = 5,
                     seed: int = 7) -> list[list[float]]:
    """Lloyd's k-means over the embedding column with pure DataFrame ops.

    The per-iteration state (k x dim centroids) is driver-sized by
    definition, so each round collects it and re-broadcasts it as a
    literal table — the classic Spark k-means shape: assignment is a
    broadcast join + min_by, the update is one posexplode + hash
    aggregation.  Deterministic: init picks the k lowest xxhash64(vec_id)
    rows (a seeded pseudo-random sample stable at any partitioning).
    """
    init = (
        embeddings.select(
            "vec_id", "embedding", F.xxhash64("vec_id", F.lit(seed)).alias("h")
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    spark = embeddings.sparkSession
    for _ in range(max_iter):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "centroid_id INT, centroid ARRAY<DOUBLE>",
        )
        assigned = _assign_to_centroid(embeddings, cdf)
        new_rows = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("val"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "val"))),
                    lambda s: s["val"],
                ).alias("centroid")
            )
            .collect()
        )
        by_id = {r["centroid_id"]: [float(x) for x in r["centroid"]] for r in new_rows}
        # empty clusters keep their previous centroid
        centroids = [by_id.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def _assign_to_centroid(embeddings: DataFrame, centroids_df: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid_id): nearest centroid by dot product
    over L2-normalized vectors == cosine assignment."""
    scored = (
        embeddings.select("vec_id", "embedding")
        .join(F.broadcast(centroids_df))
        .withColumn(
            "score",
            _dot("embedding", "centroid")
            / (F.sqrt(_dot("embedding", "embedding"))
               * F.sqrt(_dot("centroid", "centroid"))),
        )
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by("centroid_id", F.struct("score", (-F.col("centroid_id")).alias("tie"))).alias("centroid_id"),
            F.first("embedding").alias("embedding"),
        )
    )


def ivf_train_centroids(vec_ids, vectors, k: int = 8, max_iter: int = 3,
                        seed: int = 7,
                        max_train_rows: int = 65536) -> list[list[float]]:
    """Driver-side numpy Lloyd training for the IVF coarse quantizer.

    The FAISS convention: the quantizer trains on a bounded driver-held
    sample, then the full corpus is ASSIGNED distributedly.  Everything
    here is deterministic and engine-independent — rows are processed in
    vec_id order, the init (and the over-cap subsample) picks the k rows
    with the smallest md5(vec_id|seed), ties in assignment break to the
    lowest centroid_id — so the returned centroids can be inlined as
    LITERALS into both the Spark plan and the DuckDB twin (the
    `lsh_cosine_topk_sql` precedent), removing iterative float drift from
    the cross-engine comparison entirely.  For quantizers too big to
    train driver-side, use the distributed :func:`kmeans_centroids`."""
    import hashlib

    ids = [int(i) for i in vec_ids]
    order = sorted(range(len(ids)), key=lambda j: ids[j])
    v = np.asarray(vectors, dtype=np.float64)[order]
    ids = [ids[j] for j in order]

    def h(vid: int) -> str:
        return hashlib.md5(f"{vid}|{seed}".encode()).hexdigest()

    if len(ids) > max_train_rows:
        keep = sorted(range(len(ids)), key=lambda j: h(ids[j]))[:max_train_rows]
        keep.sort()
        v = v[keep]
        ids = [ids[j] for j in keep]
    init_idx = sorted(range(len(ids)), key=lambda j: h(ids[j]))[:k]
    cents = v[init_idx].copy()

    def _scores(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # NOT a @ b.T: BLAS reduction order varies with thread count, and
        # these centroids must be bit-reproducible across processes (the
        # Spark plan and the DuckDB twin inline them independently).  A
        # sequential loop over dims is threading-independent.
        out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
        for d in range(a.shape[1]):
            out += np.outer(a[:, d], b[:, d])
        return out

    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    for _ in range(max_iter):
        cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = np.argmax(_scores(vn, cn), axis=1)  # ties -> lowest id
        for ci in range(len(cents)):
            members = v[assign == ci]
            if len(members):
                cents[ci] = members.mean(axis=0)
    return [[float(x) for x in c] for c in cents]


def ivf_cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                    n_centroids: int = 8, nprobe: int = 3,
                    max_iter: int = 3, seed: int = 7,
                    centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN: bucket every vector by its nearest k-means centroid; for
    each query, search only the ``nprobe`` nearest buckets, exact cosine
    re-rank inside.  The 100 TB shape: the bucket assignment is one
    broadcast join (centroids are driver-sized), the candidate join is an
    equi-join on centroid_id — no quadratic stage anywhere.  Recall is
    tuned by (n_centroids, nprobe); pytest pins it against the brute-force
    cosine_topk.

    ``centroids`` supplies a pre-trained quantizer (e.g.
    :func:`ivf_train_centroids`) — the hash-twin route, since the same
    literals feed :func:`ivf_cosine_topk_sql`; omitted, the quantizer is
    trained in-Spark with :func:`kmeans_centroids` (rows-only)."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids, max_iter, seed)
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    )
    assigned = _assign_to_centroid(embeddings, cdf)

    # nprobe nearest centroids per query vector
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    q_scored = (
        queries.select("vec_id", "embedding")
        .join(F.broadcast(cdf))
        .withColumn(
            "score",
            _dot("embedding", "centroid")
            / (F.sqrt(_dot("embedding", "embedding"))
               * F.sqrt(_dot("centroid", "centroid"))),
        )
    )
    wq = Window.partitionBy("vec_id").orderBy(
        F.col("score").desc(), F.col("centroid_id").asc()
    )
    q_buckets = (
        q_scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select(F.col("vec_id").alias("q_id"), "centroid_id")
    )

    cand = (
        q_buckets.join(assigned.select("vec_id", "centroid_id"), "centroid_id")
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


def ivf_cosine_topk_sql(centroids: list[list[float]], n_queries: int = 10,
                        k: int = 5, nprobe: int = 3) -> str:
    """DuckDB twin of :func:`ivf_cosine_topk` given the SAME pre-trained
    centroid literals the Spark plan broadcasts (`ivf_train_centroids`).
    Assignment/probe scores are sequential double dot products from
    identical literals on both engines, so they are bit-identical and the
    argmax / nprobe ranking (score DESC, centroid_id ASC) picks the same
    buckets; the re-rank cosine is rounded to 4 like the Spark column."""
    rows = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}])"
        for i, c in enumerate(centroids)
    )
    return f"""
WITH cents(centroid_id, centroid) AS (VALUES
    {rows}
),
cscore AS (
  SELECT e.vec_id, ct.centroid_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(ct.centroid AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(ct.centroid AS DOUBLE[]), CAST(ct.centroid AS DOUBLE[])))) AS score
  FROM embeddings e CROSS JOIN cents ct
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY score DESC, centroid_id) AS rn
    FROM cscore) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS q_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY score DESC, centroid_id) AS rn
    FROM cscore WHERE vec_id < {n_queries}) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT qp.q_id, a.vec_id AS c_id
  FROM assigned a JOIN qprobe qp ON qp.centroid_id = a.centroid_id
  WHERE a.vec_id <> qp.q_id
),
scored AS (
  SELECT cand.q_id AS query_id, cand.c_id AS neighbor_id,
         ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 4)
           AS cos_sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.q_id
  JOIN embeddings c ON c.vec_id = cand.c_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id)
             AS rank
      FROM scored)
WHERE rank <= {k}
"""


def lsh_cosine_topk_sql(n_queries: int = 10, k: int = 5, dim: int = 64,
                        n_planes: int = 8, n_tables: int = 4,
                        seed: int = 7) -> str:
    """DuckDB twin of :func:`lsh_cosine_topk`: the seeded hyperplanes are
    generated HERE with the same numpy call and inlined as literal arrays,
    so both engines hash identical planes.  Sign bits compare a double
    dot product against 0 on both sides; the re-rank cosine is rounded to
    4 before ordering/filtering exactly like the Spark column."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype(float)
    rows = ",\n    ".join(
        f"({t}, {p}, [{', '.join(repr(float(x)) for x in planes[t, p])}])"
        for t in range(n_tables)
        for p in range(n_planes)
    )
    return f"""
WITH planes(table_id, plane_id, plane) AS (VALUES
    {rows}
),
sb AS (
  SELECT e.vec_id, p.table_id, p.plane_id,
         CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(p.plane AS DOUBLE[])) > 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN planes p
),
buckets AS (
  SELECT vec_id, table_id,
         SUM(CAST(bit AS BIGINT) << plane_id) AS bucket
  FROM sb GROUP BY vec_id, table_id
),
qb AS (
  SELECT vec_id AS q_id, table_id, bucket FROM buckets
  WHERE vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT qb.q_id, b.vec_id AS c_id
  FROM buckets b JOIN qb ON qb.table_id = b.table_id
                        AND qb.bucket = b.bucket
  WHERE b.vec_id <> qb.q_id
),
scored AS (
  SELECT cand.q_id AS query_id, cand.c_id AS neighbor_id,
         ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 4)
           AS cos_sim
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.q_id
  JOIN embeddings c ON c.vec_id = cand.c_id
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id)
             AS rank
      FROM scored)
WHERE rank <= {k}
"""
