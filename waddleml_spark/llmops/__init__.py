"""LLM-data-pipeline operators (SURVEY.md §2.12; BASELINE.json north star).

Not in the reference — these are the operations a large-scale training-data
pipeline needs, designed Spark-first for 100 TB:

    dedup        exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard
    similarity   brute-force cosine top-k; random-hyperplane LSH ANN
    textstats    language-ID, quality scoring, token counts, fingerprinting
    multimodal   binary payload columns + mapInPandas decode plumbing
"""
