"""Distributed BPE tokenizer training — learn merges FROM the corpus.

The public byte-pair-encoding algorithm (Sennrich et al. 2016, the
HuggingFace/GPT-2 trainer shape): repeatedly merge the most frequent
adjacent symbol pair.  The Spark-first insight is the same one the
reference trainers use: BPE statistics live on the WORD-FREQUENCY
table, not the corpus — so the only corpus-scale job is one
``groupBy(word).count()`` (map-side partial, shuffles vocabulary-sized
rows), and every merge iteration runs on the vocab table (10⁴-10⁷ rows
at 100 TB — still cluster-cheap, never corpus-scale):

  1. pair counts: explode each word's adjacent symbol pairs weighted by
     word frequency → groupBy sum (vocab-scale shuffle);
  2. argmax pair → ONE row to the driver (ties broken by pair text, so
     training is deterministic for a fixed corpus);
  3. apply the merge to every word's symbol array — an Arrow-batched
     pandas UDF over the vocab table (the one place imperative logic is
     genuinely needed; it touches vocab rows, not documents).

``localCheckpoint`` every few merges cuts the growing lineage — the
classic iterative-algorithm discipline on Spark.

Applying the learned tokenizer (``apply_bpe``) is again vocab-first:
distinct words join (broadcast) against the trained word→tokens map;
unseen words replay the merge list in the same pandas kernel.

No counterpart in the reference; this is the tokenizer-training stage
of the data pipeline the §2.12 operators feed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): THE corpus-scale pass — everything after runs on
    this aggregated table."""
    words = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
    ).alias("word")
    return docs.select(words).groupBy("word").agg(F.count("*").alias("freq"))


def _merge_kernel(merges: list[tuple[str, str]]):
    """Pandas UDF applying an ordered merge list to symbol arrays."""

    def apply_merges(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            syms = list(syms)
            for a, b in merges:
                i, merged = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                syms = merged
            out.append(syms)
        return pd.Series(out)

    return F.pandas_udf(apply_merges, T.ArrayType(T.StringType()))


def train_bpe(
    freqs: DataFrame,
    n_merges: int = 50,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Deterministic: the winning pair maximizes summed frequency with
    lexicographic tie-break.  Each iteration is vocab-scale; the driver
    sees exactly one row per merge.  Lineage is cut with
    localCheckpoint every ``checkpoint_every`` merges (without it the
    plan doubles per iteration and analysis time explodes).
    """
    vocab = freqs.select(
        "word", "freq", F.split(F.col("word"), "").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        n = F.size(F.col("syms"))
        pairs = vocab.filter(n >= 2).select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("syms"), 1, n - 1).alias("a"),
                    F.slice(F.col("syms"), 2, n - 1).alias("b"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_kernel([(a, b)])(F.col("syms")))
        if (step + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges


def tokenize_words(
    freqs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, freq, tokens): the trained word→tokens map, built by
    replaying the merge list once over the vocab table."""
    return freqs.select(
        "word",
        "freq",
        _merge_kernel(merges)(F.split(F.col("word"), "")).alias("tokens"),
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_tokens): tokenize documents with the learned
    merges — vocab-first: the doc side explodes to (id, word), the
    token counts come from a BROADCAST join against the word→tokens map
    built from the docs' own distinct words (any corpus's distinct-word
    table is small relative to the corpus; at true web scale swap the
    broadcast for a shuffle join, same plan otherwise)."""
    # lazy checkpoint: the exploded (id, word) frame feeds BOTH the
    # mapping aggregate and the join probe side — materialize on first
    # use so the corpus-scale regexp explode runs once, not twice
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
            )
        ).alias("word"),
    ).localCheckpoint(eager=False)
    mapping = tokenize_words(
        words.groupBy("word").agg(F.count("*").alias("freq")), merges
    ).select("word", F.size("tokens").alias("n_tok"))
    return (
        words.join(F.broadcast(mapping), "word")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def bpe_train_report(
    spark: SparkSession, sf_dir: str, n_merges: int = 30
) -> DataFrame:
    """One row per learned merge: (rank, pair, merged) plus compression
    evidence — corpus tokens-per-word before (= chars) and after."""
    from waddleml_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    # materialize the vocab once: training, tokenization, and the stats
    # agg all read this — without the checkpoint each re-runs the
    # corpus-scale explode+groupBy ("ONE corpus-scale pass" contract)
    freqs = word_freqs(docs).localCheckpoint()
    merges = train_bpe(freqs, n_merges=n_merges)
    toks = tokenize_words(freqs, merges)
    stats = toks.agg(
        (
            F.sum(F.length("word") * F.col("freq")) / F.sum("freq")
        ).alias("chars_per_word"),
        (F.sum(F.size("tokens") * F.col("freq")) / F.sum("freq")).alias(
            "tokens_per_word"
        ),
    ).first()
    rows = [
        (
            i + 1,
            f"{a}+{b}",
            a + b,
            float(round(stats.chars_per_word, 3)),
            float(round(stats.tokens_per_word, 3)),
        )
        for i, (a, b) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "rank int, pair string, merged string, "
        "chars_per_word double, tokens_per_word double",
    )
