"""Distributed BPE training: determinism, merge correctness, vocab-scale
iteration shape, tokenizer application (llmops/bpe.py)."""

from __future__ import annotations

from waddleml_spark.llmops import bpe
from tests.conftest import SF_SMOKE


def _toy_freqs(spark):
    # classic BPE toy corpus: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    return spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, freq long",
    )


def test_toy_corpus_learns_canonical_merges(spark):
    merges = bpe.train_bpe(_toy_freqs(spark), n_merges=4)
    # e+s appears in newest(6)+widest(3)=9 — the classic first merge;
    # then es+t (9); l+o (7, low+lower)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert ("l", "o") in merges
    # deterministic: same corpus, same merges
    assert bpe.train_bpe(_toy_freqs(spark), n_merges=4) == merges


def test_all_training_paths_agree(spark):
    """In-memory (1 job), batched-distributed, and one-pair-at-a-time
    distributed training must produce the SAME merge sequence — on a
    tie-heavy corpus (the dangerous case: a merge-created pair tying a
    batch member's count and winning the lexicographic tie-break)."""
    freqs = spark.createDataFrame(
        [("column", 3), ("custom", 3), ("colombo", 2), ("moon", 3),
         ("noon", 2), ("cucumber", 3), ("stone", 4), ("notes", 4)],
        "word string, freq long",
    )
    inmem = bpe.train_bpe(freqs, n_merges=24)
    batched = bpe.train_bpe(freqs, n_merges=24, driver_vocab_rows=0)
    sequential = bpe.train_bpe(
        freqs, n_merges=24, topk=1, driver_vocab_rows=0
    )
    assert inmem == sequential
    assert batched == sequential


def test_tokenize_words_applies_merges_in_order(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    toks = {
        r.word: list(r.tokens)
        for r in bpe.tokenize_words(_toy_freqs(spark), merges).collect()
    }
    assert toks["newest"] == ["n", "e", "w", "est"]
    assert toks["low"] == ["lo", "w"]
    assert toks["widest"] == ["w", "i", "d", "est"]


def test_apply_bpe_counts_words_and_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "low low newest"), (2, "widest lower")], "doc_id long, text string"
    )
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    got = {r.id: r for r in bpe.apply_bpe(docs, merges).collect()}
    # doc1: low(2 toks) x2 + newest(4 toks) = 3 words, 8 tokens
    assert (got[1].n_words, got[1].n_tokens) == (3, 8)
    # doc2: widest(4) + lower(4: lo w e r) = 2 words, 8 tokens
    assert (got[2].n_words, got[2].n_tokens) == (2, 8)


def test_corpus_report_compresses_and_is_deterministic(spark):
    df = bpe.bpe_train_report(spark, SF_SMOKE, n_merges=6)
    rows = df.orderBy("rank").collect()
    assert len(rows) == 6
    assert all(r.merged == r.pair.replace("+", "") for r in rows)
    # merges must compress: fewer tokens than characters per word
    assert rows[0].tokens_per_word < rows[0].chars_per_word
    again = bpe.bpe_train_report(spark, SF_SMOKE, n_merges=6).orderBy("rank").collect()
    assert [r.pair for r in again] == [r.pair for r in rows]


def test_apply_bpe_keeps_zero_token_docs(spark):
    # round-6 review find: docs with no [a-z0-9] tokens vanished from
    # the output; they must surface as (id, 0, 0)
    from waddleml_spark.llmops import bpe

    d = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "!!! ...")], "doc_id long, text string"
    )
    freqs = bpe.word_freqs(d)
    merges = bpe.train_bpe(freqs, n_merges=2)
    got = {r.id: (r.n_words, r.n_tokens) for r in bpe.apply_bpe(d, merges).collect()}
    assert set(got) == {1, 2}
    assert got[2] == (0, 0)
    assert got[1][0] == 3
