"""Lakehouse table-format connectors.

Delta/Iceberg/Hudi need their runtime jars on the Spark classpath; this
container ships none (environment policy: no installs).  The functions
probe for the format and raise an actionable error otherwise, so callers
can feature-detect with try/except.  On a cluster with the jars present
they work as-is.

When none of the external formats resolve, ``sources/snaptable.py`` is
the built-in, fully-functional fallback: versioned snapshot commits over
plain parquet + JSON manifests with time travel, manifest-level min/max
file pruning, history, and vacuum — no jars required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_HINTS = {
    "delta": "install delta-spark / add io.delta:delta-spark jars and set "
    "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension",
    "iceberg": "add org.apache.iceberg:iceberg-spark-runtime jars and a "
    "spark.sql.catalog.<name> configuration",
    "hudi": "add org.apache.hudi:hudi-spark-bundle jars",
}


def _read_format(spark: SparkSession, fmt: str, path_or_table: str) -> DataFrame:
    try:
        if fmt == "iceberg":
            return spark.read.format(fmt).load(path_or_table)
        return spark.read.format(fmt).load(path_or_table)
    except Exception as e:  # jar missing → ClassNotFound / data source not found
        raise NotImplementedError(
            f"{fmt} support is not available in this environment "
            f"({type(e).__name__}); {_HINTS[fmt]}"
        ) from e


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    return _read_format(spark, "delta", path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    return _read_format(spark, "iceberg", table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    return _read_format(spark, "hudi", path)


def lakehouse_available(spark: SparkSession, fmt: str) -> bool:
    """Feature probe: True when the format's data source resolves."""
    try:
        spark.read.format(fmt).load("/nonexistent-probe-path")
    except Exception as e:
        name = type(e).__name__
        msg = str(e)
        # path errors mean the SOURCE resolved; class/source errors mean not
        return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg or name == "AnalysisException" and "DATA_SOURCE" not in msg
    return True
