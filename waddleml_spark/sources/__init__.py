"""Source connectors (SURVEY.md §2.1 S6-S8).

    binary.py   bulk artifact ingest via the binaryFile source (S6)
    sampler.py  rate-source-driven system-metrics stream (S8)
    readers.py  schema-pinned batch readers (parquet/csv/json/jdbc)
"""
