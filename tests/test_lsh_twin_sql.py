"""The drift-proof embedding-near-dup twin (round-3 VERDICT #2): the
DuckDB SQL regenerates the md5-derived hyperplanes and the
COUNT(*)-derived n_planes itself, so the candidate set matches the Spark
plan at ANY scale factor / threshold by construction — no literal frozen
at twin-generation time."""

from __future__ import annotations

import duckdb
import pytest

from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import (
    auto_n_planes,
    embedding_neardup_lsh_sql,
    embedding_neardup_pairs,
    md5_plane_rows,
    neardup_clusters,
    neardup_clusters_sql,
)


def test_sql_planes_bit_equal_python_planes():
    rows = md5_plane_rows(dim=5, n_planes=4, n_tables=3, seed=7)
    con = duckdb.connect()
    got = con.execute("""
        SELECT t.range, p.range,
               list_transform(range(0, 5), d ->
                 (CAST(('0x' || substr(md5('7|' || t.range || '|'
                                       || p.range || '|' || d), 1, 8))
                       AS BIGINT) / 4294967295e0) * 2 - 1)
        FROM range(0, 3) t, range(0, 4) p
        ORDER BY 1, 2
    """).fetchall()
    want = sorted((t, p, vals) for t, p, vals in rows)
    assert [(t, p, list(v)) for t, p, v in got] == [
        (t, p, v) for t, p, v in want
    ]  # bit-exact doubles, no tolerance


def test_sql_n_planes_formula_matches_python():
    con = duckdb.connect()
    for n in [0, 1, 59, 60, 61, 119, 120, 121, 479, 480, 500, 5000,
              60 * 2**10, 60 * 2**10 - 1, 60 * 2**10 + 1, 10**9]:
        got = con.execute(
            f"""SELECT CASE WHEN {n} > 60
                     THEN GREATEST(3, LENGTH(printf('%b', {n} // 60)) - 1)
                     ELSE 3 END"""
        ).fetchone()[0]
        assert got == auto_n_planes(n), n


@pytest.mark.parametrize("sf_dir,threshold", [
    ("/root/testdata/sf0.001", 0.3),
    ("/root/testdata/sf0.01", 0.3),
    ("/root/testdata/sf0.01", 0.5),
])
def test_lsh_twin_matches_spark_any_sf(spark, sf_dir, threshold):
    """Different scale factors -> different COUNT(*) -> different
    n_planes, yet the twin stays hash-equal with NOTHING regenerated —
    the any-sf-by-construction property.  threshold 0.3 yields non-empty
    results at both SFs."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in embedding_neardup_pairs(emb, threshold).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(embedding_neardup_lsh_sql(threshold)).fetchall())
    )
    assert got == want
    if sf_dir.endswith("sf0.01") and threshold == 0.3:
        assert len(got) >= 3  # non-trivial: the arithmetic is load-bearing

    cgot = sorted(
        tuple(r) for r in neardup_clusters(emb, threshold).collect()
    )
    cwant = sorted(
        map(tuple, con.execute(neardup_clusters_sql(threshold)).fetchall())
    )
    assert cgot == cwant
