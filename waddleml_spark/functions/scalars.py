"""Column builders for the reference's scalar repertoire (§2.8).

Each cites the reference behavior it reproduces; every one is a built-in
composition (predicate-pushdown- and codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_json(*cols: Column | str, names: list[str] | None = None) -> Column:
    """F1 — canonical sorted-key JSON (ref: waddle/_run.py:46-47 uses
    json.dumps(sort_keys=True)).  Pass fields in sorted-name order (struct
    field order IS the serialization order).

    ignoreNullFields=false is load-bearing (round-6 review find):
    json.dumps KEEPS null fields while Spark's to_json drops them by
    default, so a record with a null field would serialize — and hash —
    differently from the reference's canonical form."""
    fields = [F.col(c) if isinstance(c, str) else c for c in cols]
    if names:
        if len(names) != len(fields):
            # zip would silently TRUNCATE, dropping trailing fields from
            # the "canonical" serialization (round-6 review find)
            raise ValueError(
                f"names has {len(names)} entries for {len(fields)} columns"
            )
        fields = [f.alias(n) for f, n in zip(fields, names)]
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})


def tolerant_json_field(col: Column | str, path: str) -> Column:
    """F2 — tolerant JSON extraction (ref parse-on-read with fallback,
    waddle/_dashboard_api.py:86-108): get_json_object returns NULL on
    malformed input instead of raising."""
    return F.get_json_object(col, path)


def sha256_hex(col: Column | str) -> Column:
    """F3 — sha256 hex digest (ref: waddle/_run.py:177)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def epoch_seconds(col: Column | str) -> Column:
    """F5/F11 — timestamp → epoch-seconds double (bit-identical to DuckDB
    epoch()); inverse of timestamp_seconds."""
    return (F.col(col) if isinstance(col, str) else col).cast("double")


def humanize_duration(seconds: Column) -> Column:
    """F6 — `<60 → 'X.Ys'` else `'X.Ym'` (ref: cli.py:63-68)."""
    return F.when(
        seconds < 60, F.format_string("%.1fs", seconds)
    ).otherwise(F.format_string("%.1fm", seconds / 60))


def id8(col: Column | str) -> Column:
    """F7 — 8-char id/commit truncation (ref: cli.py:58,71-72)."""
    return F.substring(F.col(col) if isinstance(col, str) else col, 1, 8)


def search_haystack(*cols: Column | str) -> Column:
    """F8/P7 — lowercase space-joined haystack for substring search
    (ref: waddle/static/index.html:189)."""
    return F.lower(F.concat_ws(" ", *[F.col(c) if isinstance(c, str) else c for c in cols]))


def humanize_bytes(n: Column) -> Column:
    """F10 — B/KB/MB/GB humanize (ref: waddle/static/index.html:492-497)."""
    kb, mb, gb = 1024.0, 1024.0**2, 1024.0**3
    return (
        F.when(n < kb, F.concat(n.cast("long").cast("string"), F.lit(" B")))
        .when(n < mb, F.format_string("%.1f KB", n / kb))
        .when(n < gb, F.format_string("%.1f MB", n / mb))
        .otherwise(F.format_string("%.1f GB", n / gb))
    )


def hash_positions(value: Column | str, n: int, k: int, seed: int) -> Column:
    """k bucket positions in [0, n) for ``value``: pmod(xxhash64(v, seed+i), n).

    The ONE definition shared by every build/probe sketch pair
    (llmops.bloom bitsets, operators.sketches count-min): both sides of
    a sketch must hash identically or membership/estimates silently
    break, so the expression lives here and is imported, never copied.
    """
    col = F.col(value) if isinstance(value, str) else value
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(n)).cast("long")
            for i in range(k)
        ]
    )
