"""Entity canonicalization: connected components over the alias-sharing
graph, as iterative DataFrame min-label propagation (A7 per SURVEY.md
§2.6; the reference's only analog is exact-string dedupe, `scripts/
server.py:60-72` / `data_augment/aug.py:55-56` — component grouping is the
north_star upgrade).

Implementation notes for scale: plain min-label propagation converges in
O(graph diameter) rounds; alias-sharing graphs are unions of stars
(diameter <= 2 per shared alias, chains only when an entity shares several
aliases), so a small ``max_iter`` suffices.  Each round is one shuffle on
``id``; ``localCheckpoint`` truncates lineage so plans don't grow.  For
adversarial long-chain graphs swap in large-star/small-star (same DataFrame
primitives, O(log n) rounds) — the loop structure below is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 25,
    materialize: str = "local_checkpoint",
) -> DataFrame:
    """edges(src bigint, dst bigint), undirected -> (id, component) with
    component = min id reachable.  ``vertices(id)`` adds isolated nodes.

    ``materialize`` picks how per-round frames are pinned so the loop
    doesn't re-execute the upstream edge pipeline every iteration:

    - ``"local_checkpoint"`` (default): LAZY ``localCheckpoint`` —
      truncates lineage (plans stay flat over rounds) and materializes on
      first use, not at construction.  Checkpoint blocks live on executor
      local storage and are NOT fault-tolerant: an executor loss mid-run
      fails the job, which must rerun from the last pipeline checkpoint.
      Right for interactive / bounded runs.
    - ``"persist"``: ``MEMORY_AND_DISK`` persist, superseded rounds
      unpersisted.  Lineage is kept, so executor failure recomputes
      instead of failing — the long-multi-round / 100 TB setting, at the
      cost of plans growing with round count (bounded by ``max_iter``).
    """
    if materialize not in ("local_checkpoint", "persist"):
        raise ValueError(f"materialize: {materialize!r}")

    def _pin(df: DataFrame) -> DataFrame:
        if materialize == "persist":
            from pyspark.storagelevel import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df.localCheckpoint(eager=False)

    # materialize the symmetric edge list ONCE: the loop below scans it
    # every iteration, and without this the ENTIRE upstream edge pipeline
    # (e.g. an LSH near-dup candidate search) would re-execute per round
    sym = _pin(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    verts = sym.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        verts = verts.union(vertices.select(F.col("id"))).distinct()
    comp = _pin(verts.withColumn("component", F.col("id")))

    for _ in range(max_iter):
        # neighbor's current label flows along each edge
        msgs = sym.join(comp, sym.b == comp.id, "inner").select(
            F.col("a").alias("id"), "component"
        )
        new_comp = _pin(
            comp.select("id", "component")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        if materialize == "persist":
            comp.unpersist()
        comp = new_comp
        if changed == 0:
            break
    return comp


def canonical_entities(entity_dict: DataFrame, max_iter: int = 25,
                       driver_side_threshold: int = 1_000_000) -> DataFrame:
    """entity_dict -> (entity_id, canonical_id, canonical_name): entities
    sharing an (alias, type) key are merged; canonical_name is the name of
    the component's min entity_id.

    The dictionary is broadcast-sized by definition in this pipeline, so
    below ``driver_side_threshold`` rows the components are computed with
    driver-side union-find (one collect of (entity_id, alias, type) — no
    iterative shuffles); the distributed min-label-propagation loop is the
    path for genuinely large alias graphs."""
    rows = entity_dict.select("entity_id", "alias", "type").limit(
        driver_side_threshold + 1
    ).collect()
    if len(rows) <= driver_side_threshold:
        # one collect, no iterative shuffles
        from collections import defaultdict

        from ..core.entities import connected_components_py

        by_alias: dict[tuple[str, str], list[int]] = defaultdict(list)
        for r in rows:
            by_alias[(r["alias"], r["type"])].append(r["entity_id"])
        edge_rows = []
        for ids_ in by_alias.values():
            ids_ = sorted(set(ids_))
            edge_rows.extend((ids_[0], other) for other in ids_[1:])
        ids = sorted({r["entity_id"] for r in rows})
        cmap = connected_components_py(ids, edge_rows)
        comp = entity_dict.sparkSession.createDataFrame(
            [(i, c) for i, c in cmap.items()], "id BIGINT, component BIGINT"
        )
    else:
        edges = (
            entity_dict.groupBy("alias", "type")
            .agg(
                F.min("entity_id").alias("src"),
                F.collect_set("entity_id").alias("ids"),
            )
            .select("src", F.explode("ids").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        verts = entity_dict.select(F.col("entity_id").alias("id")).distinct()
        comp = connected_components(edges, verts, max_iter)
    # min canonical_name per id: deterministic (and identical to the
    # recursive-CTE DuckDB twin) even if an entity_id ever carried two
    # distinct canonical_name spellings in the dictionary
    names = (
        entity_dict.groupBy(F.col("entity_id").alias("canonical_id"))
        .agg(F.min("canonical_name").alias("canon_name"))
    )
    return (
        comp.withColumnRenamed("id", "entity_id")
        .withColumnRenamed("component", "canonical_id")
        .join(F.broadcast(names), "canonical_id")
        .select("entity_id", "canonical_id", F.col("canon_name").alias("canonical_name"))
    )


def canonicalize_mentions(linked: DataFrame, canon: DataFrame) -> DataFrame:
    """Linked mentions -> canonical mentions, deduping rows that collapse
    to the same (conv, turn, start, mention, canonical_id) — exactly the
    oracle's `core/oracle.py::canonicalize` semantics."""
    return (
        linked.drop("canonical_name")
        .join(F.broadcast(canon), "entity_id")
        .select(
            "conv_id", "turn_idx", "mention", "start", "type",
            "canonical_id", "canonical_name",
        )
        .dropDuplicates(["conv_id", "turn_idx", "start", "mention", "canonical_id"])
    )
