"""Dedup operator units: exact_dedup_keep, jaccard thresholding, simhash
banding, candidate↔verifier integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from waddleml_spark.llmops import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "THE  quick   Brown fox jumps over the lazy dog"),       # normalized dup of 0
        (3, "the quick brown fox leaps over the lazy dog"),          # near dup
        (4, "completely different text about spark engines"),
        (5, "spark engines process completely different text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_groups(spark, docs):
    out = {r.keeper_id: r.n_dups for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 3  # docs 0,1,2 share a normalized fingerprint
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_exact_dedup_keep_lowest_id(spark, docs):
    kept = sorted(r.doc_id for r in dedup.exact_dedup_keep(docs).collect())
    assert kept == [0, 3, 4, 5]


def test_jaccard_threshold_and_candidates(spark, docs):
    cand = dedup.minhash_lsh_candidates(docs)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    # the three exact/normalized dups must be candidates of each other
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    verified = dedup.jaccard_pairs(docs, candidates=cand, threshold=0.8)
    vp = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    assert vp[(0, 1)] == 1.0
    # near-dup 3: one middle word differs → k=3 shingling flips 3 of 7
    # shingles (inter 4 / union 10 = 0.4) — still well above unrelated docs
    all_j = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(docs).collect()}
    assert all_j[(0, 3)] == pytest.approx(0.4)
    assert all_j[(4, 5)] < 0.999  # same words, different order → shingles differ


def test_simhash_similar_docs_close(spark, docs):
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming(sigs[0], sigs[1]) == 0            # identical text
    assert hamming(sigs[0], sigs[3]) <= 16           # near dup: close
    assert hamming(sigs[0], sigs[4]) > hamming(sigs[0], sigs[3])


def test_simhash_buckets_shape(spark, docs):
    sigs = dedup.simhash_signatures(docs)
    banded = dedup.simhash_buckets(sigs, band_bits=16).collect()
    # 64/16 = 4 bands per doc
    assert len(banded) == 6 * 4
    # identical docs share every band bucket
    b0 = sorted((r.band, r.bucket) for r in banded if r.doc_id == 0)
    b1 = sorted((r.band, r.bucket) for r in banded if r.doc_id == 1)
    assert b0 == b1
