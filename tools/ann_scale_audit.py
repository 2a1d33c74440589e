#!/usr/bin/env python
"""ANN serving-stack recall audit at scale — PQ / IVF / IVF-PQ recall@10
vs brute-force cosine ground truth, at the base scale AND the 10×
replica, so compression-vs-recall is a MEASURED row in SCALING.md, not
a unit test (round-5 verdict item).

Usage:
    python tools/ann_scale_audit.py                       # sf0.1 + /tmp/scale10
    python tools/ann_scale_audit.py --dirs /root/testdata/sf0.1
    # (build /tmp/scale10 first with scale_study.py if absent)

Prints one JSON object: per scale, per query vector, recall@10 of
  - ivf_p{1,2,4}:    IVF exact scoring inside n_probe probed cells
  - pq_adc:          full-corpus ADC over PQ codes (16× compressed)
  - pq_rerank:       ADC top-4k exact-reranked
  - ivfpq_p4_rerank: the full stack — probe 4/16 cells, ADC inside,
                     exact rerank of the top 4k
plus the PQ compression ratio.  The 10× replica's 10-member near-dup
vector families give the index real cluster structure (the base
synthetic embeddings are near-uniform — the hardest ANN case — so base
recall is modest by design; the MONOTONE probe→recall curve and the
rerank gain are the tuning signals).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from waddleml_spark.llmops import similarity  # noqa: E402
from waddleml_spark.session import get_spark, read_table  # noqa: E402


def audit_dir(spark, sf_dir: str, qids=(0, 1, 2), k: int = 10) -> dict:
    emb = read_table(spark, sf_dir, "embeddings")
    # crisp driver-side parameter-lookup guards (repo rule): .head()
    # returns None on an empty table, which otherwise surfaces as an
    # opaque 'NoneType is not subscriptable'
    head = emb.select("embedding").head()
    if head is None:
        raise ValueError(f"ann_scale_audit: embeddings table at {sf_dir!r} is empty")
    dim = len(head[0])
    m, n_codes = 8, 16
    model, with_cells = similarity.ivf_index(emb, id_col="vec_id")
    cb = similarity.pq_train(emb, m_subspaces=m, n_codes=n_codes, id_col="vec_id")
    codes = similarity.pq_encode(
        with_cells, cb, keep_cols=("ivf_cell",)
    ).persist()
    out: dict = {"dim": dim, "compression_x": round(4.0 * dim / (m + 8), 1)}
    rows = []
    for qid in qids:
        qrow = emb.filter(F.col("vec_id") == qid).select("embedding").head()
        if qrow is None:
            raise ValueError(
                f"ann_scale_audit: query vector vec_id={qid} not found in {sf_dir!r}"
            )
        q = [float(x) for x in qrow[0]]
        cand_e = emb.filter(F.col("vec_id") != qid)
        cand_cells = with_cells.filter(F.col("vec_id") != qid)
        cand_codes = codes.filter(F.col("vec_id") != qid)
        exact = {r.vec_id for r in similarity.cosine_topk(cand_e, q, k=k).collect()}

        def rec(ids):
            return round(len(ids & exact) / float(k), 2)

        row = {"qid": qid}
        for p in (1, 2, 4):
            got = {r.vec_id for r in
                   similarity.ivf_topk(cand_cells, model, q, k=k, n_probe=p).collect()}
            row[f"ivf_p{p}"] = rec(got)
        row["pq_adc"] = rec({r.vec_id for r in
                             similarity.pq_topk(cand_codes, cb, q, k=k).collect()})
        row["pq_rerank"] = rec({r.vec_id for r in similarity.pq_topk(
            cand_codes, cb, q, k=k, rerank=4 * k, corpus=cand_e).collect()})
        row["ivfpq_p4_rerank"] = rec({r.vec_id for r in similarity.ivfpq_topk(
            cand_codes, model, cb, q, k=k, n_probe=4,
            rerank=4 * k, corpus=cand_e).collect()})
        rows.append(row)
    codes.unpersist()
    out["queries"] = rows
    out["min_ivfpq_p4_rerank"] = min(r["ivfpq_p4_rerank"] for r in rows)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs", default="/root/testdata/sf0.1,/tmp/scale10",
        help="comma-separated table dirs to audit",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="ann-scale-audit", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for d in args.dirs.split(","):
        if not (Path(d) / "embeddings.parquet").exists():
            print(f"ann_scale_audit: skipping {d} (no embeddings.parquet; "
                  "build the replica with scale_study.py)", file=sys.stderr)
            continue
        report[d] = audit_dir(spark, d)
    print(json.dumps(report, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
