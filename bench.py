"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Timing uses the noop write sink so every column (including pandas-UDF
outputs) is fully evaluated without driver collection or disk I/O.

The flagship pages pipeline runs over a deterministic synthetic pages
table sized to the SF tier (generated once into .bench_data/ and
reused). Set SPARK_GRAFT_SCALING=1 to also run the N-vs-4N parallelism
scaling probe (slow; normally run via tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F


def _time_noop(df, max_runs: int = 5) -> float:
    """Steady-state noop-sink execution time (adaptive best-of-N).

    Single-shot timings on a shared box swing 2-6x: JVM JIT warm-up
    (short queries execute their whole-stage-codegen loops interpreted
    until C2 catches up — measured 430 CPU-sec interpreted vs ~10
    compiled for the minhash verify stage), GC pauses, page-cache
    state, and host CPU steal. A long-lived cluster runs these loops
    compiled billions of times, so steady state is the honest number:
    rerun while the time is still improving by >15%, min of all runs,
    capped at ``max_runs``.

    ``SPARK_GRAFT_SINGLE_SHOT=1`` forces one run per query (the
    BENCH_r01 protocol) — used to decompose cross-round deltas into
    methodology vs code on identical binaries (ADVICE r2)."""
    if os.environ.get("SPARK_GRAFT_SINGLE_SHOT"):
        max_runs = 1
    best = float("inf")
    for i in range(max_runs):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t = time.time() - t0
        still_warming = t < best * 0.85
        best = min(best, t)
        if i >= 1 and not still_warming:
            break
    return round(best, 3)


def _pages_dir(sf: float) -> str:
    """Generate (once) the synthetic pages table for this SF tier.

    Sizing: ~600k pages rows at SF=1 ⇒ n_urls ≈ 57k·sf (≈10.5
    snapshots/url)."""
    from med_doi_feature_extraction_spark.sources.pages import write_pages_parquet

    out = Path(__file__).resolve().parent / ".bench_data" / f"sf{sf}"
    marker = out / "_DONE"
    if not marker.exists():
        n_urls = max(200, int(57_000 * sf))
        write_pages_parquet(str(out), n_urls=n_urls, seed=42)
        marker.write_text("ok")
    return str(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    import __spark_entry__ as entrymod
    from med_doi_feature_extraction_spark.pipeline import FeatureConfig, page_features
    from med_doi_feature_extraction_spark.session import get_spark
    from tools.scaling_bench import _membw_probe

    # machine-state evidence rides every recorded suite (VERDICT r3
    # task 2): BENCH_r03 caught a contended window only because
    # untouched code "slowed" 4.28× — a pre/post single-thread memcpy
    # bandwidth bracket turns that from forensics into a recorded
    # field. Compare pre/post within a run and across rounds: a slow
    # suite WITH depressed bandwidth is co-tenant load, not a plan
    # regression.
    membw_pre = _membw_probe()

    spark = get_spark("bench")

    headline = [
        "sessionize", "lag_delta", "ffill", "rolling_time", "session_agg",
        "asof_join", "asof_join_sorted", "tpch_q1", "broadcast_join_agg",
        "topk_per_group", "exact_dedup", "minhash_neardup", "simhash_pairs",
        "cosine_topk", "lsh_topk", "quality_gate", "lang_id",
        "decontam", "tfidf_topk", "paragraph_dedup",
        "interval_join", "resample", "sketch_stats",
        "seq_pack", "bloom_prune_join",
        # r4 fourth-session additions
        "asof_nearest", "boilerplate", "doc_chunks", "postings",
        "incremental_neardup",
        # r4 fifth-session additions (sketch family + quality kernels)
        "hll_registers", "cms_join_size", "sampled_quantiles",
        "encoding_quality", "deflate_quality",
        # r4 sixth-session additions (link graph surface)
        "extract_links", "anchor_stats",
        # r4 seventh-session additions (data-selection surface)
        "dsir_weights", "dsir_select", "token_mixture",
        "script_profile", "c4_filters", "gopher_rules", "interleave",
        "token_ids", "pack_ids", "blocklist", "corpus_card", "hll_overlap",
        # r4 eighth-session additions (retrieval + model-gate surface)
        "nb_classify", "bm25", "sq_topk", "sq_rerank", "warc_roundtrip",
        # r4 ninth-session additions (clustering + mining + robust gates)
        "kmeans", "kmeans_balance", "semantic_decontam",
        "hard_negatives", "robust_outliers", "phash_pairs", "change_rate",
        "audio_pairs", "hybrid_rrf", "tpch_q3", "quality_topfrac",
        "crawl_priority", "score_prop", "trending", "fd_check", "fk_check",
        # r4 tenth-session additions (snapshot-history feature surface)
        "snapshot_drift", "drift_summary", "funnel_audit",
        "funnel_summary", "pmi", "feature_matrix", "cdc_dedup", "hits",
        "leakage_audit", "logreg_gate", "temp_sample",
        # r5 additions (real JPEG codec end-to-end)
        "jpeg_roundtrip",
        # r5 second-session additions (prose-shape + drift surface)
        "readability", "psi_drift", "ks_drift", "chi2_tokens",
        "column_entropy", "pearson_matrix", "cramers_assoc",
        "mannwhitney_drift", "cohens_kappa", "bootstrap_ci",
        "cls_report", "calibration_bins", "roc_auc", "concentration",
        "trend", "psi_by_lang", "theils_u",
        # r5 final-session additions (web-hygiene + alignment surface)
        "ccalign_pairs", "url_lang_profile", "hreflang_pairs",
        "trap_features", "tracking_strip", "param_census",
        "head_meta", "soft404", "canonical_groups", "markup_stats",
        "reciprocal_links", "link_reciprocity", "outlink_profile",
        "anchor_expansion", "subdomain_census", "sitemap_entries",
        "sitemap_stats", "wilson_rollup", "web_admission",
        "web_admission_summary", "robots_rules", "robots_directives",
        # r5 fifth-session additions (graph/extraction/IR/LM surface)
        "trustrank", "label_communities", "text_blocks", "main_content",
        "zipf_fit", "politeness", "mirrors", "phrase_search",
        "kn_score", "headings_outline", "template_census",
        "structured_data",
        # r5 fifth-session additions, part 2 (temporal/layout/REP)
        "bowtie", "sitemap_coverage", "link_churn",
        "canonical_chains", "robots_wildcards", "surt_keys",
        "host_report", "weighted_quantiles", "ess", "lang_confusion",
        "pagerank_weighted",
    ]
    qs = entrymod.queries()
    # untimed warm-up: start EVERY Python UDF worker (one task per
    # core — a 1-row warm-up would warm a single worker and leave the
    # other 31 to pay the numpy/pandas import inside the first timed
    # pandas-UDF query) + ship the package zip once, so per-query
    # timings measure steady-state operator cost (on a long-lived
    # cluster the workers are reused), not one-time session bring-up.
    # Same treatment for every query.
    from med_doi_feature_extraction_spark.operators.dedup import with_minhash

    n_workers = spark.sparkContext.defaultParallelism
    warm = spark.range(n_workers * 4).repartition(n_workers).selectExpr(
        "cast(id as string) as id", "concat('warm up text ', id) as text"
    )
    with_minhash(warm, "text").write.mode("overwrite").format("noop").save()

    # The dedup/ANN contract queries materialize a parquet seam at
    # plan-construction time so DuckDB can oracle their downstream
    # halves (r3) — timing those would exclude the signature kernels.
    # The bench keeps measuring the END-TO-END operators (same work as
    # BENCH_r01/r02) by building them directly:
    from med_doi_feature_extraction_spark.operators import dedup, similarity

    def _docs(s):
        return s.read.parquet(f"{sf_dir}/documents.parquet")

    def _emb(s):
        return s.read.parquet(f"{sf_dir}/embeddings.parquet")

    direct = {
        "minhash_neardup": lambda s, d: dedup.minhash_dedup(
            _docs(s), "doc_id", "text", threshold=0.5
        ),
        "simhash_pairs": lambda s, d: dedup.simhash_candidates(
            _docs(s), "doc_id", "text", max_hamming=8
        ),
        "incremental_neardup": lambda s, d: dedup.incremental_minhash_dedup(
            _docs(s).filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0),
            _docs(s).filter(F.pmod(F.xxhash64("doc_id"), F.lit(5)) != 0),
            "doc_id", "text", threshold=0.5,
        ),
        "lsh_topk": lambda s, d: similarity.lsh_topk(
            _emb(s), _emb(s).filter(F.col("vec_id") < 8), k=5
        ),
        # sketch_stats' contract query writes an oracle seam + joins an
        # exact-verification side; the production operator is the
        # one-scan approx_stats — time that.
        "sketch_stats": lambda s, d: __import__(
            "med_doi_feature_extraction_spark.operators.sketches",
            fromlist=["approx_stats"],
        ).approx_stats(
            s.read.parquet(f"{d}/events.parquet"),
            ["event_type"], "user_id", "value",
        ),
    }

    timings: dict[str, float] = {}
    for name in headline:
        build = direct.get(name, qs[name])
        timings[name] = _time_noop(build(spark, sf_dir))

    # flagship pages pipeline (the north-star workload): html→text UDF,
    # regex features, window stack, as-of join, parquet write.
    pdir = _pages_dir(sf)
    pages = spark.read.parquet(f"{pdir}/pages.parquet")
    dim = spark.read.parquet(f"{pdir}/dim_snapshots.parquet")
    n_pages = pages.count()
    feats = page_features(pages, dim=dim, cfg=FeatureConfig(run_id="bench"))
    t_pages = _time_noop(feats)
    timings["pages_pipeline"] = t_pages

    # production-layout variant: extract ONCE, materialize bucketed by
    # url (catalog.save_bucketed / Iceberg bucket transform), then run
    # the window/as-of stack off the bucketed scan with zero window
    # exchanges. The bucketed extract write is untimed setup — at
    # 10^12 docs it is the one-time ingest pass. (Bucketing the RAW
    # table and keeping the UDF in-plan does NOT help: the pandas-UDF
    # node drops partitioning — measured no faster than default.)
    from med_doi_feature_extraction_spark.pipeline import (
        extract_stage,
        features_from_extracted,
    )
    from med_doi_feature_extraction_spark.sources.catalog import Catalog

    # one-time migration: a bench_extract_bucketed dir written by a
    # pre-write-intent-marker bench run has no marker, so save_bucketed
    # (correctly) refuses to clear it. THIS table name in THIS repo's
    # own warehouse is bench-owned by construction — safe to clear.
    import shutil

    stale = Path(__file__).resolve().parent / "spark-warehouse" / "bench_extract_bucketed"
    marker_dir = stale.parent / "_engine_tables" / "default.bench_extract_bucketed"
    if stale.exists() and not marker_dir.exists():
        shutil.rmtree(stale)

    Catalog(spark).save_bucketed(
        extract_stage(pages).drop("text"),
        "bench_extract_bucketed", 32, ["url"], sort_cols=["url", "warc_ts"],
    )
    feats_b = features_from_extracted(
        spark.table("bench_extract_bucketed"), dim=dim,
        cfg=FeatureConfig(run_id="bench"), pre_partitioned=True,
    )
    timings["windows_asof_bucketed"] = _time_noop(feats_b)

    result = {
        "metric": "headline_suite_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pages_rows": n_pages,
        "pages_docs_per_sec": round(n_pages / t_pages, 1),
        "membw_gbps_pre": membw_pre,
        "membw_gbps_post": _membw_probe(),
    }

    if os.environ.get("SPARK_GRAFT_SCALING"):
        from tools.scaling_bench import run_scaling

        spark.stop()
        result["scaling"] = run_scaling(pdir)
        print(json.dumps(result))
        return

    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
