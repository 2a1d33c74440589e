"""Extreme-row-width differential edge: one 1 MB document.

Web crawls carry pathological rows (a minified JS bundle, a base64
blob, a concatenated log) whose TEXT is megabytes while the median doc
is kilobytes.  Row-width skew stresses a different axis than row-count
scale: per-row regex state, shingle explode fan-out from a single row,
and tokenizer arrays far past the usual sizes.  This suite runs the
text-grain oracle pairings on a 3-doc corpus whose middle row is ~1 MB
and requires bit-exact agreement with DuckDB — the same exactness bar
as the sf fixtures, at a row shape they never exercise.

The corpus is ASCII-only by constraint: the levenshtein / word-boundary
/ lower() pairing families are ASCII-only sound (canary-pinned in
test_properties.py), and this edge probes WIDTH, not charset.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from waddleml_spark import catalog
from waddleml_spark.testing import DRIVER_TABLES, duckdb_conn

# text-grain pairings a wide row actually flows through (documents-only
# inputs; pair-grain queries excluded — one giant doc has no candidate
# partner and their cost is candidate-bounded by construction)
WIDE_ROW_QUERIES = (
    "contamination_by_source",
    "gopher_quality_report",
    "fingerprint_docs",
    "trigram_novelty_by_source",
    "passage_dedup_report",
    "token_totals_by_source",
    "type_token_ratio_by_lang",
    "corpus_mix_report",
    "minhash32_docs",
    "simhash32_docs",
    "sha256_docs",
    # round-8: the regexp_extract_all('[a-z0-9]+') tokenizer family was
    # previously un-gated at this width
    "salient_terms_by_source",
    "top_words_by_lang",
    # round-8: doc-grain chunk pairing (the fixture plants within-doc
    # repeated phrases; its pair-grain siblings stay excluded)
    "self_repetition_report",
    # round-9: the new tokenizing operators — DSIR rides the bigram
    # tokenizer at occurrence grain; the overlap matrix rides the
    # _word_pos_sql chunk grain (its cross-source pair term is
    # source-bounded, so the giant doc only stresses the linear chunk
    # SQL, which is exactly what this gate exists to pin)
    "dsir_importance_by_source",
    "source_overlap_matrix",
    # round-10: the df histogram rides the clamped trigram SQL at gram
    # grain — the giant doc is one more linear-shingle stress
    "gram_df_histogram",
    # round-11: the rewrite stage — the giant doc stresses the ordered
    # listagg/string_agg rebuild and the chunk-grain window at width
    "span_removal_report",
    # round-11: CDC — the giant doc stresses the doc-grain running-sum
    # window and the per-chunk ordered rebuild
    "cdc_dedup_report",
    # round-11: phrase mining rides the same chunk SQL; the giant doc
    # plants repeated phrases that must rank identically
    "boilerplate_phrases_report",
    # round-11: the decontamination rewrite runs the clamped-trigram
    # AND chunk grains over the giant doc in one query
    "decontamination_rewrite_report",
)


@pytest.fixture(scope="session")
def wide_dir(tmp_path_factory):
    """Three documents — one ~1 MB — plus empty twins of every other
    driver table (schemas from the real testdata, drift-proof)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("sf_wide"))
    for n in DRIVER_TABLES:
        sch = pq.read_schema(os.path.join(SF_SMOKE, f"{n}.parquet"))
        if n == "documents":
            # deterministic pseudo-text: varied words, punctuation,
            # digits, repeated phrases (so passage dedup has duplicate
            # chunks WITHIN the wide doc's own grain across docs)
            unit = (
                "the quick brown fox jumps over the lazy dog 42 times; "
                "Sphinx of black quartz, judge my vow! "
            )
            big = unit * (1_000_000 // len(unit))
            # doc 4 has NULL text: the other row-shape edge a crawler
            # emits (a fetch that produced metadata but no body)
            texts = [
                ("a small document. " + unit, "en", "src_small"),
                (big, "en", "src_wide"),
                (unit * 3, "de", "src_small"),
                (None, "en", "src_null"),
            ]
            tbl = pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "text": pa.array([t for t, _, _ in texts]),
                    "lang": pa.array([l for _, l, _ in texts]),
                    "source": pa.array([s for _, _, s in texts]),
                    "n_chars": pa.array(
                        [len(t) if t is not None else 0 for t, _, _ in texts],
                        type=pa.int64(),
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
def duck_wide(wide_dir):
    con = duckdb_conn(wide_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WIDE_ROW_QUERIES)
def test_text_pairing_agrees_on_megabyte_row(spark, wide_dir, duck_wide, name):
    from waddleml_spark.testing import compare

    df = catalog.QUERIES[name](spark, wide_dir)
    ok, msg = compare(df, duck_wide, catalog.ORACLE[name], name=name)
    assert ok, msg
