"""Degenerate-corpus differential edge: 200 identical documents.

Boilerplate floods are the classic dedup stress (the same cookie banner
or license header crawled thousands of times): every signature lands in
ONE bucket and any pair expansion goes quadratic unless the mega-bucket
star guard drops it.  The guard (cap 64) is mirrored in the oracle SQL,
but the sf fixtures only trip it at scales the parity suite doesn't
run — this corpus makes BOTH branches deterministic:

- a 200-copy flood: bucket size 200 > 64 → the guard must drop it on
  both engines (zero pairs from the flood, by design — honest recall
  loss, not a quadratic blow-up);
- a 3-member near-dup family (one-word edits): buckets under the cap →
  real candidate pairs that must verify identically;
- singleton documents: no pairs, still counted at doc grain.

All ASCII (the pinned charset soundness boundary), all short (the
levenshtein pairing filters n_chars < 220 on both sides).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from waddleml_spark import catalog
from waddleml_spark.testing import DRIVER_TABLES, duckdb_conn

PAIR_QUERIES = (
    "simhash32_docs",
    "simhash32_band_pairs",
    "minhash32_docs",
    "minhash32_band_pairs",
    "jaccard_verify_lsh",
    "levenshtein_verify_lsh",
    "exact_dedup_docs",
    "trigram_novelty_by_source",
    # round-6: the minhash-block-candidate demos (flood + family are
    # labeled src0 below so their source filter sees the corpus; the
    # oracle HAVING guard is exercised against Spark's 64-cap here)
    "jaccard_word_pairs_src0",
    "levenshtein_pairs_src0",
    # round-8: the exact-count pairings, whose df cap (not a star
    # guard) must drop the flood's grams on both engines
    "ngram_overlap_pairs",
    "doc_containment_pairs",
    "winnowing32_overlap_pairs",
    # round-10: the flood concentrates every boilerplate gram at df=200
    # — the histogram's high-df tail must agree cross-engine
    "gram_df_histogram",
    # round-11: the rewrite stage — 200 identical docs must collapse to
    # ONE keeper holding the text and 199 emptied twins, agreed
    # cross-engine down to the rebuilt-text md5
    "span_removal_report",
    # round-11: CDC — the flood concentrates every content-defined
    # chunk 200-fold; the cross-doc window counts must agree
    "cdc_dedup_report",
    # round-11: the flood's boilerplate chunks ARE the top phrases —
    # rank order and 200-doc counts must agree cross-engine
    "boilerplate_phrases_report",
    # round-11: with the flood+family labeled src0 (the bench side),
    # the rewrite must excise identically across engines
    "decontamination_rewrite_report",
)


@pytest.fixture(scope="session")
def flood_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("sf_flood"))
    boiler = (
        "this site uses cookies to improve your experience "
        "please accept the policy to continue reading"
    )
    family = [
        "the quick brown fox jumps over the lazy dog near the river",
        "the quick brown fox jumps over the lazy cat near the river",
        "the quick brown fox jumps over the lazy dog near the ocean",
    ]
    singles = [
        "completely unrelated text about sparkling distributed engines",
        "another satellite document covering benchmark methodology notes",
    ]
    texts = [boiler] * 200 + family + singles
    for n in DRIVER_TABLES:
        sch = pq.read_schema(os.path.join(SF_SMOKE, f"{n}.parquet"))
        if n == "documents":
            tbl = pa.table(
                {
                    "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                    # flood + family carry source='src0' so the
                    # *_pairs_src0 demos (filter source='src0') run over
                    # the degenerate corpus too; trigram_novelty still
                    # sees two source groups via the singles
                    "source": pa.array(
                        ["src0"] * 203 + ["single"] * 2
                    ),
                    "n_chars": pa.array(
                        [len(t) for t in texts], type=pa.int64()
                    ),
                },
            ).cast(sch)
            pq.write_table(tbl, os.path.join(d, f"{n}.parquet"))
        else:
            pq.write_table(
                pa.table(
                    {c: pa.array([], type=t) for c, t in zip(sch.names, sch.types)},
                    schema=sch,
                ),
                os.path.join(d, f"{n}.parquet"),
            )
    return d


@pytest.fixture(scope="session")
def duck_flood(flood_dir):
    con = duckdb_conn(flood_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", PAIR_QUERIES)
def test_pairing_agrees_on_boilerplate_flood(spark, flood_dir, duck_flood, name):
    from waddleml_spark.testing import compare

    df = catalog.QUERIES[name](spark, flood_dir)
    ok, msg = compare(df, duck_flood, catalog.ORACLE[name], name=name)
    assert ok, msg


def test_star_guard_drops_the_flood_bucket(spark, flood_dir):
    # the 200-copy flood exceeds the 64 cap: no pair may touch two flood
    # docs (ids 1..200), while the 3-member family must produce pairs
    rows = catalog.QUERIES["simhash32_band_pairs"](spark, flood_dir).collect()
    flood_pairs = [r for r in rows if r.id_a <= 200 and r.id_b <= 200]
    family_pairs = [r for r in rows if 200 < r.id_a and 200 < r.id_b]
    assert not flood_pairs, "mega-bucket guard failed to drop the flood"
    assert family_pairs, "in-cap near-dup family produced no candidates"


def test_block_guard_drops_the_flood_in_demo_pairings(spark, flood_dir):
    # deterministic for minhash_block_candidates: 200 identical word
    # sets share ONE min-word-hash bucket of size 200 > 64 -> dropped
    # entirely, on BOTH engines (the parity test above covers the
    # oracle's HAVING mirror; this pins the structural drop)
    for name in ("jaccard_word_pairs_src0", "levenshtein_pairs_src0"):
        rows = catalog.QUERIES[name](spark, flood_dir).collect()
        flood_pairs = [r for r in rows if r.id_a <= 200 and r.id_b <= 200]
        assert not flood_pairs, f"{name}: block guard failed on the flood"
