"""SnapTable as a first-class Spark data source (Python Data Source API).

PySpark 4's Python Data Source API (SPARK-44076, public) lets a pure-
Python format participate in Spark's planner: after
``pyds.register(spark)`` the SnapTable format works through the normal
surface —

    spark.read.format("snaptable").option("version", 3).load(table)
    df.write.format("snaptable").mode("append").save(table)
    spark.readStream.format("snaptable").load(table)   # commit changefeed

with the engine-grade behaviors wired into the right planner hooks:

* **Parallel scan**: one ``InputPartition`` per manifest data file —
  Spark schedules file reads across executors; each task streams Arrow
  record batches straight out of parquet (never row-at-a-time Python).
* **Manifest-level file skipping**: ``pushFilters`` receives Catalyst's
  pushed predicates (EqualTo / ranges / In / IsNull on top-level
  columns) and drops files whose footer [min, max] can't match BEFORE
  partitions are planned — the same skip ``snaptable.read(prune=...)``
  does manually, now automatic for any filter.  All filters are
  returned as un-applied, so Spark re-evaluates them row-level:
  pruning stays a pure optimization and can never change results.
* **Distributed write with a single atomic commit**: each task writes
  its batches to one parquet file in a fresh commit directory and
  reports the file in its ``WriterCommitMessage``; the driver-side
  ``commit`` publishes ONE new manifest version over all task files
  (append or overwrite) — task retries/speculation can only leak
  orphan files that ``snaptable.vacuum`` collects, never torn tables.
* **Streaming changefeed**: the stream reader's offset IS the snapshot
  version; each microbatch delivers the rows of files added between two
  committed versions (append-only CDC over commits).  Deterministic
  replay (``readBetweenOffsets``) falls out of manifest immutability —
  don't vacuum versions a running stream still needs.

Executor-side code (file reads, batch writes) deliberately touches only
pyarrow + stdlib; the manifest bookkeeping stays on the driver in
``sources/snaptable.py``.  ``register`` ships the package zip to
workers (session.ensure_shipped) so the pickled reader classes import.

No counterpart in the reference (embedded single-file DuckDB store,
waddle/_db.py); this is how the engine's snapshot format rides Spark's
own scheduling/pushdown machinery instead of a side API.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from datetime import date, datetime
from typing import Any, Iterator, Sequence

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import snaptable as st


def _norm(v: Any) -> Any:
    """Mirror snaptable's stats normalization (temporals → naive-UTC ISO;
    tz-aware values fold to UTC so a pushed naive bound and a tz-aware
    footer stat land in the same total order)."""
    return st._canon_temporal(v)


def _file_bounds(
    filters: Sequence[Filter],
) -> tuple[dict[str, tuple[Any, Any]], set[str]]:
    """Fold supported pushed filters into per-column [lo, hi] bounds
    (strict comparisons widen to non-strict — keeping an extra file is
    always safe).  Unsupported shapes contribute nothing.  Also returns
    the set of columns whose bound came from a TEMPORAL value, so the
    caller can re-canonicalize possibly-tz-aware manifest stats for
    exactly those columns (and never rewrite a string column's stats)."""
    bounds: dict[str, tuple[Any, Any]] = {}
    temporal: set[str] = set()

    def tighten(col: str, lo: Any, hi: Any) -> None:
        cur = bounds.get(col, (None, None))
        nlo = cur[0] if lo is None else (lo if cur[0] is None else max(cur[0], lo))
        nhi = cur[1] if hi is None else (hi if cur[1] is None else min(cur[1], hi))
        bounds[col] = (nlo, nhi)

    for f in filters:
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:  # nested columns carry no stats
            continue
        col = attr[0]
        if isinstance(
            f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        ) and isinstance(f.value, (datetime, date)):
            temporal.add(col)
        if isinstance(f, EqualTo):
            tighten(col, _norm(f.value), _norm(f.value))
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            tighten(col, _norm(f.value), None)
        elif isinstance(f, (LessThan, LessThanOrEqual)):
            tighten(col, None, _norm(f.value))
        elif isinstance(f, In) and f.value:
            if any(isinstance(v, (datetime, date)) for v in f.value):
                temporal.add(col)
            vs = [_norm(v) for v in f.value]
            try:
                tighten(col, min(vs), max(vs))
            except TypeError:
                continue
    return bounds, temporal


@dataclass(frozen=True)
class _FilePartition(InputPartition):
    path: str  # absolute parquet path


class SnapTableReader(DataSourceReader):
    def __init__(self, table: str, version: int | None):
        self._table = table
        self._version = st.current_version(table) if version is None else version
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        self._filters = list(filters)
        return iter(filters)  # all un-applied → Spark re-filters rows

    def partitions(self) -> Sequence[InputPartition]:
        files = st.file_list(self._table, self._version)
        bounds, temporal_cols = _file_bounds(self._filters)
        null_only = {
            f.attribute[0]
            for f in self._filters
            if isinstance(f, IsNull) and len(f.attribute) == 1
        }
        kept = []
        for fe in files:
            ok = True
            for col, (lo, hi) in bounds.items():
                if col in null_only:
                    continue  # stats ignore nulls; can't skip on them
                stats = fe["stats"].get(col)
                if stats is None:
                    continue
                mn, mx = stats
                if col in temporal_cols:
                    # mixed date/datetime operands share one total order:
                    # date-only strings lift to the day's first/last
                    # instant (snaptable._inflate_date)
                    mn = st._inflate_date(st._canon_stat(mn))
                    mx = st._inflate_date(st._canon_stat(mx), end=True)
                    lo = st._inflate_date(lo)
                    hi = st._inflate_date(hi)
                if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    ok = False
                    break
            if ok:
                kept.append(fe)
        return [
            _FilePartition(os.path.join(self._table, fe["path"])) for fe in kept
        ] or [_FilePartition("")]  # one empty partition keeps the scan valid

    def read(self, partition: _FilePartition) -> Iterator[pa.RecordBatch]:
        if not partition.path:
            return
        yield from pq.ParquetFile(partition.path).iter_batches()


@dataclass
class _WroteFiles(WriterCommitMessage):
    rel_paths: list[str] = field(default_factory=list)


class SnapTableWriter(DataSourceArrowWriter):
    """Executor side: one parquet file per non-empty task, under a
    commit-unique directory chosen on the driver."""

    def __init__(self, table: str, commit_dir: str, overwrite: bool):
        self._table = table
        self._commit_dir = commit_dir
        self._overwrite = overwrite

    def write(self, iterator: Iterator[pa.RecordBatch]) -> _WroteFiles:
        writer = None
        rel = os.path.join(self._commit_dir, f"part-{uuid.uuid4().hex}.parquet")
        full = os.path.join(self._table, rel)
        for batch in iterator:
            if writer is None:
                os.makedirs(os.path.dirname(full), exist_ok=True)
                writer = pq.ParquetWriter(full, batch.schema)
            writer.write_batch(batch)
        if writer is None:
            return _WroteFiles([])
        writer.close()
        return _WroteFiles([rel])

    def commit(self, messages) -> None:
        # only THIS commit's files go to _commit — it hydrates the tip's
        # file list and re-validates the append schema itself, atomically
        # with the version claim (a stale pre-merge here would resurrect
        # files a concurrent overwrite removed)
        entries = []
        for m in messages:
            for rel in m.rel_paths if m else []:
                entries.append(st._footer_stats(self._table, rel))
        st._commit(
            self._table,
            entries,
            self._schema,
            "overwrite" if self._overwrite else "append",
            st.current_version(self._table),
        )

    def abort(self, messages) -> None:
        for m in messages:
            for rel in m.rel_paths if m else []:
                try:
                    os.unlink(os.path.join(self._table, rel))
                except OSError:
                    pass


class SnapTableStreamReader(SimpleDataSourceStreamReader):
    """Commit changefeed: offset = snapshot version; a batch is the rows
    of files present at the end version but not at the start version."""

    def __init__(self, table: str, schema: StructType):
        self._table = table
        self._cols = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"version": 0}  # deliver the whole table first

    def _added_rows(self, start_v: int, end_v: int) -> Iterator[tuple]:
        if end_v <= start_v:
            return
        old = (
            {f["path"] for f in st.file_list(self._table, start_v)}
            if start_v > 0
            else set()
        )
        for fe in st.file_list(self._table, end_v):
            if fe["path"] in old:
                continue
            t = pq.read_table(os.path.join(self._table, fe["path"]))
            for row in t.to_pylist():
                yield tuple(row.get(c) for c in self._cols)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # the returned rows are pickled by the runner for replay, so they
        # must be a concrete sequence, not a generator.  A batch is one
        # commit delta — bounded by what a writer committed, and the
        # simple-reader API prefetches driver-side by design; a source
        # with unbounded commits would use DataSourceStreamReader with
        # real executor-side partitions instead.
        end_v = st.current_version(self._table)
        start_v = int(start["version"])
        if end_v <= start_v:
            return iter(()), start
        return list(self._added_rows(start_v, end_v)), {"version": end_v}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._added_rows(int(start["version"]), int(end["version"])))

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to clean per-offset


class SnapTableDataSource(DataSource):
    """format("snaptable") — options: ``path`` (table root, or pass to
    ``load``/``save``), ``version`` (int, batch-read time travel)."""

    @classmethod
    def name(cls) -> str:
        return "snaptable"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snaptable requires a path (load(path) or .option('path', ...))")
        return path

    def _version(self) -> int | None:
        v = self.options.get("version")
        return None if v is None else int(v)

    def schema(self) -> StructType:
        table = self._table()
        v = self._version()
        man = st._load_manifest(table, st.current_version(table) if v is None else v)
        return StructType.fromJson(man["schema"])

    def reader(self, schema: StructType) -> SnapTableReader:
        return SnapTableReader(self._table(), self._version())

    def writer(self, schema: StructType, overwrite: bool) -> SnapTableWriter:
        table = self._table()
        w = SnapTableWriter(
            table, os.path.join(st._DATA_DIR, uuid.uuid4().hex), overwrite
        )
        w._schema = schema
        return w

    def simpleStreamReader(self, schema: StructType) -> SnapTableStreamReader:
        return SnapTableStreamReader(self._table(), schema)


def register(spark) -> None:
    """Register format("snaptable") on this session (idempotent) and ship
    the package zip so executor-side pickles import."""
    from waddleml_spark.session import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(SnapTableDataSource)
