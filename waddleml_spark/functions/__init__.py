"""Scalar expression helpers (SURVEY.md §2.8 F1-F11) — reusable Column
builders, all JVM-side built-ins (no UDFs, stay inside codegen).
"""

from waddleml_spark.functions.scalars import (  # noqa: F401
    canonical_json,
    epoch_seconds,
    humanize_bytes,
    humanize_duration,
    id8,
    search_haystack,
    sha256_hex,
    tolerant_json_field,
)
