#!/usr/bin/env python
"""Scale-up study: build a deterministic 10x replica of sf0.1 and time
representative catalog queries at both scales (methodology + results:
SCALING.md).

The replica preserves join structure (orderkey/custkey/user_id remapped
as k*10+rep so every FK still matches) and turns each document into a
10-member NEAR-dup family (one-token suffix per replica) so dedup ops
see a realistic candidate load.  No RNG anywhere — rebuilds are
bit-stable.

Usage: python scale_study.py [--base /root/testdata/sf0.1]
                             [--out /tmp/scale10] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from waddleml_spark import catalog  # noqa: E402
from waddleml_spark.session import get_spark  # noqa: E402

QUERIES = [
    "tpch_q1",
    "revenue_by_priority",
    "flagship_leaderboard",
    "sessionize_users",
    "asof_purchase_click",
    "exact_dedup_docs",
    "minhash_lsh_candidates",
    "simhash32_band_pairs",
    "jaccard_verify_lsh",
    "cosine_topk_q0",
    "top3_orders_per_cust",
    "hypertable_rollup_day",
    "contamination_by_source",
    "sequence_packing_report",
    "embedding_neardup_pairs",
    # round-5 additions: oracle-exact LSH candidates + rule/passage reports
    "minhash32_band_pairs",
    # round-8 additions: exact n-gram overlap pairs (substring-dedup
    # signal), doc-in-doc containment pairs (asymmetric quotation
    # signal), and the per-source keyword-lift report
    "ngram_overlap_pairs",
    "doc_containment_pairs",
    "salient_terms_by_source",
    "winnowing32_overlap_pairs",
    "self_repetition_report",
    # round-7 addition: the sketch-accuracy audit (est vs exact Jaccard)
    "minhash_estimate_audit",
    "gopher_quality_report",
    "passage_dedup_report",
    "leakage_safe_split",
    "corpus_pipeline_report",
    # Python-kernel ops (Arrow-batch mapInPandas + banded joins / MLlib):
    # CPU-bound linear in docs — expect time_ratio ≈ factor at 10x, far
    # past the shuffle-bound queries above; see SCALING.md §Python-kernel
    "media_phash_neardup",
    "audio_fp_neardup",
    "learned_filter_report",
    "pq_ann_report",
    "bloom_decontamination_report",
    "cms_heavy_hitters_report",
    "weighted_sample_report",
    # round-8: rows the 100× table carried from ad-hoc --queries runs,
    # folded into the default set so one full run IS the whole table
    "trigram_novelty_by_source",
    "temperature_mix_report",
    "bpe_encode_report",
    "perplexity_buckets_by_lang",
]


def build_replica(spark, base: str, out: str, factor: int) -> None:
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")

    def scaled(name: str, remap: dict[str, bool], parts: int, text_family=False):
        df = spark.read.parquet(f"{base}/{name}.parquet").select("*", rep)
        for col in remap:
            df = df.withColumn(col, F.col(col) * factor + F.col("rep"))
        if text_family:
            df = df.withColumn(
                "text",
                F.when(F.col("rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" variant"), F.col("rep").cast("string"))
                ),
            )
        df.drop("rep").repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    scaled("lineitem", {"l_orderkey": True}, 32)
    scaled("orders", {"o_orderkey": True, "o_custkey": True}, 16)
    scaled("customer", {"c_custkey": True}, 4)
    scaled("events", {"event_id": True, "user_id": True}, 16)
    scaled("documents", {"doc_id": True}, 16, text_family=True)
    scaled("embeddings", {"vec_id": True}, 8)
    for name in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{base}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in QUERIES:  # warm: codegen + JIT
        force(catalog.QUERIES[name](spark, sf_dir))
    for _ in range(2):
        for name in QUERIES:
            t0 = time.perf_counter()
            force(catalog.QUERIES[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            out[name] = min(out.get(name, dt), dt)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--skip-build",
        action="store_true",
        help="reuse an existing replica at --out (re-time only)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of QUERIES to time (default: all)",
    )
    args = ap.parse_args()
    if args.queries:
        subset = args.queries.split(",")
        unknown = set(subset) - set(catalog.QUERIES)
        if unknown:
            ap.error(f"unknown queries: {sorted(unknown)}")
        QUERIES[:] = subset

    spark = get_spark(app_name="scale-study", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_build:
        build_replica(spark, args.base, args.out, args.factor)
    small = time_queries(spark, args.base)
    big = time_queries(spark, args.out)
    rows = {
        name: {
            "base_s": round(small[name], 3),
            "scaled_s": round(big[name], 3),
            "time_ratio": round(big[name] / small[name], 2),
        }
        for name in QUERIES
    }
    print(json.dumps({"factor": args.factor, "queries": rows}, indent=2))


if __name__ == "__main__":
    main()
