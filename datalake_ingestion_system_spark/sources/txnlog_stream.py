"""Structured Streaming (and batch) source over the TxnLogFormat commit
log — the Delta streaming-source shape, built on Spark 4's Python Data
Source API (``pyspark.sql.datasource``).

``spark.readStream.format("txnlog").load(path)`` turns each committed
APPEND into a micro-batch: offsets are commit VERSIONS (dense, totally
ordered — the same serialization the table's readers replay), so restart
from a checkpoint resumes exactly after the last processed commit and a
given (start, end] range always plans the same files — the determinism
Structured Streaming's exactly-once contract needs from a source.

Scope (same as Delta's default streaming source): APPEND-ONLY. A commit
that rewrites or removes data (``replace_all``/``overwrite``/
``dv_update``/``add_dv``/``rewrite_files``/``restore``) is a data CHANGE;
the stream fails on it unless ``option("ignoreChanges", "true")`` is set,
in which case such commits are skipped (their data is NOT re-emitted —
Delta's ignoreChanges caveat applies verbatim: downstream must tolerate
not seeing updates).

Scale shape: offset planning reads only the commit records in the
(start, end] window (O(new commits), driver-side, file-metadata scale);
each staged parquet FILE becomes one InputPartition, read executor-side
with pyarrow and handed to Spark as Arrow record batches (zero
row-by-row Python).  Reference parity: the reference's streaming story
is file-arrival polling (LANDING_CHECK S3 listing, README.md:24); this
is that contract made transactional — arrivals are commits, not
filesystem races.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str):
        self.abs_path = abs_path


def _log_dir(path: str) -> str:
    return os.path.join(path, "_txn_log")


def _commit_versions(path: str) -> list[int]:
    try:
        return sorted(int(n.split(".")[0])
                      for n in os.listdir(_log_dir(path))
                      if n.endswith(".json"))
    except FileNotFoundError:
        return []


def _load_commit(path: str, version: int) -> dict:
    with open(os.path.join(_log_dir(path), f"{version:012d}.json")) as f:
        return json.load(f)


def _data_files(path: str, rel: str) -> list[str]:
    out = []
    for dp, _dns, fns in os.walk(os.path.join(path, rel)):
        out.extend(os.path.join(dp, fn) for fn in sorted(fns)
                   if fn.endswith(".parquet"))
    return out


def _read_arrow_batches(abs_path: str, field_names: list[str]):
    """Executor-side file read: Arrow batches aligned to the source
    schema's field order (staged files are written from the recorded
    schema, so this is a column select, not a cast)."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(abs_path)
    missing = [n for n in field_names if n not in tbl.column_names]
    if missing:
        raise ValueError(
            f"staged file {abs_path} lacks columns {missing} of the "
            "table schema (schema-drift append — read the table with "
            "TxnLogFormat.read, which unions by name)")
    yield from tbl.select(field_names).to_batches()


class TxnLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        self.ignore_changes = str(
            options.get("ignorechanges", "false")).lower() == "true"

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        versions = _commit_versions(self.path)
        return {"version": versions[-1] if versions else -1}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            c = _load_commit(self.path, v)
            if c["action"] == "append":
                parts.extend(_FilePartition(ap) for ap
                             in _data_files(self.path, c["dir"]))
            elif c["action"] == "alter":
                # metadata-only: no data to emit.  The stream's schema is
                # pinned at start — appends after an ADD still read (the
                # new column is simply not selected); appends after a
                # RENAME/DROP fail the missing-column check honestly
                # (restart the stream to pick up the new schema).
                continue
            elif not self.ignore_changes:
                raise ValueError(
                    f"commit {v} is a data change ({c['action']}); the "
                    "txnlog stream is append-only — set "
                    "option('ignoreChanges', 'true') to skip changes "
                    "(their data will not be re-emitted)")
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_arrow_batches(partition.abs_path, self.fields)

    def commit(self, end: dict) -> None:
        pass  # the table's own log is the source of truth; nothing to ack


class TxnLogBatchReader(DataSourceReader):
    """Batch counterpart: the current LIVE file set as one parallel scan.
    Refuses tables with live deletion vectors or partition-overwrite
    subtractions — those need the anti-join/value-filter replay only
    ``TxnLogFormat.read`` performs (a bare file scan would resurrect
    deleted rows)."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        from ..sinks import TxnLogFormat
        fmt = TxnLogFormat()
        commits = fmt._commits(self.path)
        if not commits:
            raise FileNotFoundError(f"no committed table at {self.path}")
        if fmt._resolve_dvs(commits):
            raise ValueError(
                "table has live deletion vectors — use TxnLogFormat."
                "read (the txnlog batch source is a plain file scan)")
        live = fmt._resolve_live(commits)
        if any(e["removed"] for e in live):
            raise ValueError(
                "table has partition-overwrite subtractions — use "
                "TxnLogFormat.read")
        removed = fmt._resolve_removed_files(commits)
        parts = []
        for e in live:
            for ap in _data_files(self.path, e["dir"]):
                import re
                m = re.search(r"_txn_data/.*$", ap)
                if m and m.group(0) in removed:
                    continue
                parts.append(_FilePartition(ap))
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_arrow_batches(partition.abs_path, self.fields)


class TxnLogDataSource(DataSource):
    """``spark.dataSource.register(TxnLogDataSource)`` then
    ``spark.readStream.format("txnlog").load(path)`` (streaming) or
    ``spark.read.format("txnlog").load(path)`` (batch, DV-free tables)."""

    @classmethod
    def name(cls) -> str:
        return "txnlog"

    def schema(self):
        path = self.options["path"]
        for v in reversed(_commit_versions(path)):
            sj = _load_commit(path, v).get("schema")
            if sj:
                return StructType.fromJson(json.loads(sj))
        raise ValueError(
            f"no schema-bearing commit at {path} (empty or pre-schema "
            "log) — pass an explicit .schema(...)")

    def streamReader(self, schema: StructType) -> TxnLogStreamReader:
        return TxnLogStreamReader(schema, self.options)

    def reader(self, schema: StructType) -> TxnLogBatchReader:
        return TxnLogBatchReader(schema, self.options)
