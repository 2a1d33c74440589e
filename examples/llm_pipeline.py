"""LLM-data-pipeline walkthrough over the driver fixtures: quality gating →
exact dedup → near-dup candidates → verification → similarity search.

Run: PYTHONPATH=/root/repo python examples/llm_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

from waddleml_spark.llmops import dedup, similarity, textstats
from waddleml_spark.session import get_spark, read_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark(app_name="llm-pipeline")
spark.sparkContext.setLogLevel("ERROR")

docs = read_table(spark, sf_dir, "documents")
emb = read_table(spark, sf_dir, "embeddings")

# 1. quality gating: drop short/degenerate docs (pushed predicates)
scored = textstats.quality_features(docs)
kept = scored.filter((F.col("q_words") >= 10) & (F.col("q_avg_word_len") < 12))
print(f"quality gate: {docs.count()} -> {kept.count()} docs")

# 2. exact dedup (hash-groupBy, deterministic keeper)
deduped = dedup.exact_dedup_keep(kept)
print(f"exact dedup: -> {deduped.count()} docs")

# 3. near-dup: LSH candidates, then exact Jaccard verification in-bucket
cand = dedup.minhash_lsh_candidates(deduped)
verified = dedup.jaccard_pairs(deduped, candidates=cand, threshold=0.5)
n_near = verified.count()
print(f"near-dup: {cand.count()} candidates -> {n_near} verified pairs (jaccard>=0.5)")
drop_ids = [r.id_b for r in verified.select("id_b").distinct().collect()]
final = deduped.filter(~F.col("doc_id").isin(drop_ids)) if drop_ids else deduped
print(f"final corpus: {final.count()} docs")

# 4. language mix of the final corpus
final_langs = textstats.lang_id(final).groupBy("lang", "lang_pred").count()
final_langs.orderBy("lang").show(10, False)

# 5. similarity search: top-5 neighbors of vec_id=0, brute force vs IVF
q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
exact = similarity.cosine_topk(emb, q, k=5, exclude_id=0).collect()
model, cells = similarity.ivf_index(emb.filter(F.col("vec_id") != 0), n_cells=8)
approx = similarity.ivf_topk(cells, model, q, k=5, n_probe=2).collect()
print("exact top-5:", [(r.vec_id, round(r.cos_sim, 4)) for r in exact])
print("ivf   top-5:", [(r.vec_id, round(r.cos_sim, 4)) for r in approx])

# 5a. IVF-PQ: the compressed serving stack — codebooks fit on a bounded
# sample, the index is m-byte codes (+norm) instead of raw floats, a
# probe ADC-scans only the nearest cells, exact rerank touches R rows
cb = similarity.pq_train(emb, m_subspaces=8, n_codes=16, id_col="vec_id")
codes = similarity.pq_encode(cells, cb, keep_cols=("ivf_cell",))
pq = similarity.ivfpq_topk(
    codes, model, cb, q, k=5, n_probe=4, rerank=20,
    corpus=emb.filter(F.col("vec_id") != 0),
).collect()
print("ivfpq top-5:", [(r.vec_id, round(r.cos_sim, 4)) for r in pq])

# 5b. batched serving: many queries, ONE corpus scan (numpy matmul per
# Arrow batch — 21.8x faster than a per-query loop at 100 queries)
queries = [
    (int(r.vec_id), [float(x) for x in r.embedding])
    for r in emb.filter(F.col("vec_id") < 4).collect()
]
batched = similarity.cosine_topk_batch(emb, queries, k=3).collect()
print("batched top-3 per query:",
      {qid: [r.vec_id for r in batched if r.qid == qid] for qid, _ in queries})

# 5c. hard-negative mining: per anchor, the most-similar DIFFERENT-label
# vectors — the contrastive-training negatives a retrieval trainer pairs
# with each anchor (similar but wrong beats random negatives)
negs = similarity.hard_negative_topk(emb, n_queries=4, k=2).collect()
print("hard negatives per anchor:",
      {qid: [(r.vec_id, r.label) for r in negs if r.qid == qid]
       for qid in sorted({r.qid for r in negs})})

# 6. learned corpus filter: distill the lang-ID-confidence teacher into
# a linear student, then score the corpus as a pure projection
from waddleml_spark.llmops import quality_model

labeled = quality_model.langid_teacher_labels(final)
feats = quality_model.feature_frame(final)
scorer = quality_model.train_quality_scorer(feats, labeled)
probs = quality_model.score_quality(feats, scorer)
print("learned filter: mean P(keep) =",
      round(probs.agg(F.avg("quality_prob")).first()[0], 3))

# 7. domain mix: semantic clusters with alpha-smoothed sampling rates,
# and the source-grain temperature rebalance (same shared mixing math)
similarity.domain_mix_report(emb, n_domains=4).show(truncate=False)

from waddleml_spark.llmops.mixing import smoothed_shares
from waddleml_spark.llmops import textstats

per_src = final.groupBy("source").agg(
    F.sum(textstats.word_count(F.col("text"))).alias("total_tokens"))
smoothed_shares(per_src, "total_tokens", alpha=0.7).show(truncate=False)

# 7b. redundancy attribution: which sources contribute vs re-crawl
textstats.shingle_novelty_report(final).show(truncate=False)

# 8. tokenizer training: learn 8 BPE merges from the final corpus
from waddleml_spark.llmops import bpe

freqs = bpe.word_freqs(final).localCheckpoint()
merges = bpe.train_bpe(freqs, n_merges=8)
print("bpe merges:", ["".join(m) for m in merges])
counts = bpe.apply_bpe(final, merges)
print("tokens/doc:",
      round(counts.agg(F.avg("n_tokens")).first()[0], 1))

spark.stop()
