"""LLM-data-pipeline operators (SURVEY.md §2.12; BASELINE.json north star).

Not in the reference — these are the operations a large-scale training-data
pipeline needs, designed Spark-first for 100 TB:

    dedup        exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard
    similarity   brute-force cosine top-k; random-hyperplane LSH ANN
    textstats    language-ID, quality scoring, token counts, fingerprinting
    multimodal   binary payload columns + mapInPandas decode plumbing
"""

from __future__ import annotations


def rotate_persist(slot: str, df):
    """persist() ``df`` and unpersist the frame the SAME slot cached on
    the previous invocation.

    For operators whose cached frame is consumed lazily by the caller
    (so they cannot unpersist before returning): without this, every
    invocation in a long-lived session leaves blocks behind until the
    ContextCleaner happens to GC them (round-4 advice).  One live cache
    per slot; the prior frame is released blocking=False so the swap
    never stalls the hot path."""
    prev = _PERSIST_SLOTS.get(slot)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:  # session torn down between invocations
            pass
    df = df.persist()
    _PERSIST_SLOTS[slot] = df
    return df


_PERSIST_SLOTS: dict = {}
