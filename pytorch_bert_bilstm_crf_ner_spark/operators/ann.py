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


def _dot_lit(col: str, vec) -> F.Column:
    """Codegen'd dot product of an array column against a PYTHON-LITERAL
    vector: the unrolled sum ``((0.0 + c[0]*v0) + c[1]*v1) + ...`` is the
    exact same chain of IEEE double ops as :func:`_dot`'s interpreted fold
    (same order, same leading 0.0 seed; `D` literals parse to the same
    doubles repr round-trips), so results are bit-identical — but
    whole-stage-codegen'd instead of per-element lambda interpretation
    (guide §4.1: interpreted HOFs lose ~3x+ to codegen).  Built as ONE
    ``F.expr`` string: building the tree Column-by-Column costs a py4j
    round trip per node (~seconds for a 64-term sum)."""
    terms = " + ".join(
        f"CAST(`{col}`[{d}] AS DOUBLE) * {float(v)!r}D"
        for d, v in enumerate(vec)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE) + {terms}")


def _dot_cols(a: str, b: str, dim: int | None) -> F.Column:
    """Dot product of two array columns; with ``dim`` known the sum is
    unrolled element-wise (codegen, bit-identical order to the fold),
    else it falls back to the interpreted HOF fold."""
    if dim is None:
        return _dot(a, b)
    terms = " + ".join(
        f"CAST(`{a}`[{d}] AS DOUBLE) * CAST(`{b}`[{d}] AS DOUBLE)"
        for d in range(dim)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE) + {terms}")


def _with_norm(df: DataFrame, prefix: str, dim: int | None = None) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(f"{prefix}_id"),
        F.col("embedding").alias(f"{prefix}_emb"),
        F.sqrt(_dot_cols("embedding", "embedding", dim)).alias(f"{prefix}_norm"),
    )


def _flat2d(col, n: int, dim: int) -> np.ndarray:
    """pyarrow list<float> column -> (n, dim) float64 (exact widening)."""
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(n, dim)


def _int64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def pair_cosine_parts(pairs: DataFrame, dim: int) -> DataFrame:
    """(vec_a, vec_b, emb_a, emb_b) -> (vec_a, vec_b, dot, norm_a, norm_b)
    via ONE Arrow-batched numpy stage (guide §4.2) — the exact-cosine
    re-verify's heavy arithmetic, vectorized across the batch.

    Bit-exactness contract: ``dot``/norm sums accumulate in float64 ONE
    DIMENSION AT A TIME in index order (each ``+=`` is a single IEEE
    double add per element) — exactly the JVM fold's
    ((0.0 + x0) + x1) + ... chain; ``np.sqrt`` is the same IEEE sqrt as
    Spark's SQRT.  The division, ROUND and threshold comparison stay
    SPARK-SIDE in the callers, so every emitted float is produced by the
    identical engine ops as before (and as the DuckDB twins).

    Why not a JVM expression: an unrolled 64-term sum is evaluated
    interpreted (no codegen at this size) ~3x slower than even the HOF
    fold, and the optimizer duplicates it into join conditions; an opaque
    kernel is evaluated exactly once and is immune to both (measured in
    OPTIMIZATION_r06.md)."""

    def parts(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            A = _flat2d(batch.column("emb_a"), n, dim)
            B = _flat2d(batch.column("emb_b"), n, dim)
            dot = np.zeros(n, dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            nb = np.zeros(n, dtype=np.float64)
            for d in range(dim):
                dot += A[:, d] * B[:, d]
                na += A[:, d] * A[:, d]
                nb += B[:, d] * B[:, d]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(_int64(batch.column("vec_a"))),
                    pa.array(_int64(batch.column("vec_b"))),
                    pa.array(dot),
                    pa.array(np.sqrt(na)),
                    pa.array(np.sqrt(nb)),
                ],
                names=["vec_a", "vec_b", "dot", "norm_a", "norm_b"],
            )

    return pairs.select("vec_a", "vec_b", "emb_a", "emb_b").mapInArrow(
        parts,
        "vec_a BIGINT, vec_b BIGINT, dot DOUBLE, norm_a DOUBLE, norm_b DOUBLE",
    )


def _rerank_candidates(cand: DataFrame, embeddings: DataFrame, dim: int,
                       a_key: str = "q_id", b_key: str = "c_id") -> DataFrame:
    """Attach embeddings to (a_key, b_key) candidate pairs and compute the
    exact-cosine parts with :func:`pair_cosine_parts`; returns
    (a_key, b_key, cos_sim) with cos_sim = round(dot/(na*nb), 4) computed
    Spark-side (bit-identical to the old per-pair fold)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    pairs = (
        cand.select(F.col(a_key).alias("vec_a"), F.col(b_key).alias("vec_b"))
        .join(a, "vec_a")
        .join(b, "vec_b")
    )
    return pair_cosine_parts(pairs, dim).select(
        F.col("vec_a").alias(a_key),
        F.col("vec_b").alias(b_key),
        F.round(
            F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 4
        ).alias("cos_sim"),
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                dim: int | None = None) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vec_ids:
    (query_id, neighbor_id, cos_sim, rank).  Pass ``dim`` (e.g. from
    parquet footer metadata) to route the per-pair dot products through
    the Arrow numpy kernel (bit-identical values, see
    :func:`pair_cosine_parts`); without it the interpreted-fold path is
    kept (dim-agnostic)."""
    if dim is not None:
        q = embeddings.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
        )
        c = embeddings.select(
            F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
        )
        pairs = c.join(F.broadcast(q), F.col("vec_a") != F.col("vec_b"))
        scored = pair_cosine_parts(pairs, dim).select(
            F.col("vec_a").alias("q_id"),
            F.col("vec_b").alias("c_id"),
            F.round(
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 4
            ).alias("cos_sim"),
        )
    else:
        q = _with_norm(embeddings.filter(F.col("vec_id") < n_queries), "q")
        c = _with_norm(embeddings, "c")
        scored = (
            c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
            .withColumn(
                "cos_sim",
                F.round(
                    _dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")),
                    4,
                ),
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
    # Round-6 rewrite: ONE Arrow-batched numpy stage replaces the former
    # broadcast-plane join + interpreted HOF dot + groupBy-sum (guide
    # §4.2/§8.3: hand whole batches to vectorized native code; §2.4: the
    # per-(vec, table) aggregation Exchange is gone — buckets are computed
    # row-locally).  Bit-exactness contract with the SQL twins: the dot
    # products accumulate in float64 ONE DIMENSION AT A TIME in index
    # order (`acc += emb[:, d] * P[d, :]` — each += is a single IEEE
    # double add per element), which is exactly the old fold's
    # ((0.0 + e0*p0) + e1*p1) + ... chain, so every sign bit — and hence
    # every bucket id — is unchanged.  NO matmul here: BLAS reduction
    # order varies with threading/kernel (the ivf_train_centroids
    # precedent) and would break cross-engine sign equality.
    order = sorted(range(len(plane_rows)),
                   key=lambda i: (plane_rows[i][0], plane_rows[i][1]))
    P = np.array([plane_rows[i][2] for i in order], dtype=np.float64).T
    t_ids = [int(plane_rows[i][0]) for i in order]
    shifts = np.array([int(plane_rows[i][1]) for i in order], dtype=np.int64)
    tables = sorted(set(t_ids))
    t_index = np.array([tables.index(t) for t in t_ids], dtype=np.int64)
    n_dim, n_tab = P.shape[0], len(tables)
    table_arr = np.array(tables, dtype=np.int32)

    def buckets(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vec_id = batch.column("vec_id").to_numpy(zero_copy_only=False)
            emb = batch.column("embedding")
            flat = emb.flatten().to_numpy(zero_copy_only=False)
            emb64 = flat.astype(np.float64).reshape(n, n_dim)
            acc = np.zeros((n, P.shape[1]), dtype=np.float64)
            for d in range(n_dim):
                acc += emb64[:, d : d + 1] * P[d : d + 1, :]
            contrib = (acc > 0).astype(np.int64) << shifts[None, :]
            out = np.zeros((n, n_tab), dtype=np.int64)
            for k in range(P.shape[1]):
                out[:, t_index[k]] += contrib[:, k]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(vec_id.astype(np.int64), n_tab)),
                    pa.array(np.tile(table_arr, n)),
                    pa.array(out.reshape(-1)),
                ],
                names=["vec_id", "table_id", "bucket"],
            )

    return embeddings.select("vec_id", "embedding").mapInArrow(
        buckets, "vec_id BIGINT, table_id INT, bucket BIGINT"
    )


def lsh_cosine_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                    dim: int = 64, n_planes: int = 8, n_tables: int = 4,
                    seed: int = 7) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table,
    exact cosine re-rank within candidates."""
    buckets = lsh_buckets(embeddings, dim, n_planes, n_tables, seed)
    # the query side is <= n_queries x n_tables rows by construction:
    # broadcast it so the corpus bucket side is never shuffled
    qb = buckets.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), "table_id", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
        .distinct()
    )
    scored = _rerank_candidates(cand, embeddings, dim)
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
    for _ in range(max_iter):
        assigned = _assign_to_centroid(embeddings, centroids)
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


def _lit_norm(vec) -> float:
    """Driver-side L2 norm with the EXACT fold order Spark's
    ``sqrt(_dot(v, v))`` would use on the same literal array (leading 0.0,
    left-assoc double adds, IEEE sqrt) — so a python-precomputed constant
    can replace the per-row recomputation bit-identically."""
    import math

    s = 0.0
    for v in vec:
        s = s + float(v) * float(v)
    return math.sqrt(s)


def _centroid_scores(centroids: list[list[float]]) -> list[F.Column]:
    """Per-centroid cosine score columns over the ``embedding`` column —
    one codegen projection against literal centroids (norms precomputed
    driver-side, same IEEE ops as the old per-row sqrt-of-fold)."""
    dim = len(centroids[0])
    norm_e = F.sqrt(_dot_cols("embedding", "embedding", dim))
    return [
        _dot_lit("embedding", c) / (norm_e * F.lit(_lit_norm(c)))
        for c in centroids
    ]


def _assign_to_centroid(embeddings: DataFrame,
                        centroids: list[list[float]]) -> DataFrame:
    """(vec_id, centroid_id, embedding): nearest centroid by dot product
    over L2-normalized vectors == cosine assignment.

    Round-6 rewrite: the centroids are driver-held literals by
    construction (k x dim), so assignment is ONE Arrow-batched numpy
    stage instead of a broadcast join + groupBy ``max_by`` (which
    shuffled every row).  Bit-exactness: per-dim fixed-order float64
    accumulation == the old fold (see pair_cosine_parts' contract); the
    score division order matches (dot / (norm_e * norm_c)); np.argmax
    takes the FIRST maximal index == the old (max score, lowest
    centroid_id) tie rule."""
    dim = len(centroids[0])
    C = np.array(centroids, dtype=np.float64).T          # (dim, k)
    norm_c = np.array([_lit_norm(c) for c in centroids], dtype=np.float64)
    emb_type = embeddings.schema["embedding"].dataType.simpleString()

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            E = _flat2d(batch.column("embedding"), n, dim)
            acc = np.zeros((n, C.shape[1]), dtype=np.float64)
            ne = np.zeros(n, dtype=np.float64)
            for d in range(dim):
                acc += E[:, d : d + 1] * C[d : d + 1, :]
                ne += E[:, d] * E[:, d]
            score = acc / (np.sqrt(ne)[:, None] * norm_c[None, :])
            best = np.argmax(score, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(_int64(batch.column("vec_id"))),
                    pa.array(best),
                    batch.column("embedding"),
                ],
                names=["vec_id", "centroid_id", "embedding"],
            )

    return embeddings.select("vec_id", "embedding").mapInArrow(
        assign, f"vec_id BIGINT, centroid_id INT, embedding {emb_type}"
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
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_centroids, max_iter, seed)
    dim = len(centroids[0])
    assigned = _assign_to_centroid(embeddings, centroids)

    # nprobe nearest centroids per query vector — round-6: a row-local
    # array_sort over literal-centroid score structs replaces the former
    # broadcast-join + window row_number (one Exchange + sort gone).
    # (-score asc, centroid_id asc) sorts exactly like the old
    # (score desc, centroid_id asc) ranking: negation is IEEE-exact.
    probe_structs = [
        F.struct((-score).alias("neg_score"),
                 F.lit(i).cast("int").alias("centroid_id"))
        for i, score in enumerate(_centroid_scores(centroids))
    ]
    q_buckets = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.slice(F.array_sort(F.array(*probe_structs)), 1, nprobe)
            ).alias("p"),
        )
        .select("q_id", F.col("p.centroid_id").alias("centroid_id"))
    )

    # q_buckets is <= n_queries x nprobe rows: broadcast it so the
    # full-corpus assignment side is never shuffled by the 8-key
    # centroid_id (a guaranteed-skew shuffle key).  No distinct: IVF
    # assigns every vector to EXACTLY ONE centroid and the nprobe ids per
    # query are distinct by construction, so a (q, c) pair can only arise
    # once — the dedup Exchange was a no-op (round-6; LSH keeps its
    # distinct, where multi-table collisions are real).
    cand = (
        assigned.select("vec_id", "centroid_id")
        .join(F.broadcast(q_buckets), "centroid_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"))
    )
    scored = _rerank_candidates(cand, embeddings, dim)
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
