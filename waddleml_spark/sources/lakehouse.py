"""Lakehouse table-format connectors.

``read_delta`` is fully functional with NO jars: it prefers the real
``delta`` data source when its runtime is on the Spark classpath (so a
cluster deployment gets deletion vectors / column mapping for free) and
otherwise falls back to ``sources/deltalog.py`` — a pure-Python
implementation of the public Delta transaction-log protocol (JSON
commits + parquet checkpoints) that hands Spark the exact live file
set.  ``write_delta`` / ``delta_history`` / ``delta_vacuum`` re-export
the native-log implementations.

Iceberg and Hudi genuinely need their runtime jars (Iceberg's manifests
are avro; Hudi's timeline is runtime-managed); those readers probe and
raise an actionable error so callers can feature-detect with
try/except.  ``sources/snaptable.py`` remains the package-native
snapshot format with manifest-level min/max pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import deltalog
from .deltalog import (  # noqa: F401  (public re-exports)
    create_checkpoint as delta_checkpoint,
    history as delta_history,
    vacuum as delta_vacuum,
    write_delta,
)

_HINTS = {
    "iceberg": "add org.apache.iceberg:iceberg-spark-runtime jars and a "
    "spark.sql.catalog.<name> configuration",
    "hudi": "add org.apache.hudi:hudi-spark-bundle jars",
}


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table: native data source when available, else the
    pure-Python log replay (deltalog.read_delta).  ``version=`` time-
    travels in either path."""
    if lakehouse_available(spark, "delta"):
        r = spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", version)
        return r.load(path)
    return deltalog.read_delta(spark, path, version=version)


def _read_format(spark: SparkSession, fmt: str, path_or_table: str) -> DataFrame:
    try:
        return spark.read.format(fmt).load(path_or_table)
    except Exception as e:  # jar missing → ClassNotFound / data source not found
        raise NotImplementedError(
            f"{fmt} support is not available in this environment "
            f"({type(e).__name__}); {_HINTS[fmt]}"
        ) from e


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
