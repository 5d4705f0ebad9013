"""Reference-native ``key\\tvalue`` text format as a REGISTERED Spark
data source (Spark 4 Python DataSource API).

``read_kv_text_dir`` (sources/tables.py) expresses the reference's
scan as a plain ``spark.read.text`` + split projection; this module
lifts the same contract into a first-class format so a reference user
can write ``spark.read.format("kvtext").load(dir)`` — the engine's
name for the only storage format the reference has (scan:
``worker/WorkerServlet.java:510-530``, parse:
``worker/MapThread.java:50-51``), with exactly
``read_kv_text_dir``'s two-field contract: split at the FIRST tab,
key before it, value everything after.

Scale posture: one ``InputPartition`` PER FILE, so a directory of N
files scans N-wide exactly like the reference assigned one mapper per
file — and like Spark's own text source splits by file. Rows stream
through Arrow batches (the Python DataSource runtime batches
``read``'s tuple iterator); no file is ever materialized whole, the
reader yields line by line. The write side (``KvTextWriter``) makes
the format read/write complete: ``df.write.format("kvtext")`` with
task-temp files renamed on success — next to the engine's original
``write_kv_text_dir`` sink.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class KvTextDataSource(DataSource):
    """``format("kvtext")``: directory of text files of
    ``key\\tvalue`` lines <-> (key string, value string)."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> "KvTextReader":
        return KvTextReader(self.options)

    def writer(self, schema, overwrite: bool) -> "KvTextWriter":
        return KvTextWriter(self.options, overwrite)

    def streamReader(self, schema) -> "KvTextStreamReader":
        return KvTextStreamReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KvTextReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .load(<dir>)")
        self._dir = path

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per data file — the reference's mapper-per-file
        # assignment and Spark text's per-file split, driver lists the
        # directory only (no data read here)
        return [
            _FilePartition(os.path.join(self._dir, f))
            for f in _list_kv_files(self._dir)
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # same two-field contract as read_kv_text_dir's limit-2
        # split: value is everything after the FIRST tab; a tabless
        # line yields a null value
        yield from _read_kv_file(partition.path)


def _list_kv_files(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if not f.startswith(("_", "."))
    )


def _read_kv_file(path: str) -> Iterator[tuple]:
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            key, sep, rest = line.partition("\t")
            yield key, rest if sep else None


class KvTextStreamReader(DataSourceStreamReader):
    """``readStream.format("kvtext")``: the same directory contract as
    the batch reader, consumed incrementally — each microbatch picks
    up files that appeared since the last committed offset (the
    grow-only directory the reference's workers appended into). The
    PARTITION-based stream API, not the Simple one: file parsing runs
    on executors, one partition per new file, so a burst of arrivals
    scans burst-wide; the driver only lists the directory. The offset
    is the sorted processed-file list (JSON), making replay of an
    uncommitted batch deterministic."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .load(<dir>)")
        self._dir = path

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": _list_kv_files(self._dir)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        done = set(start.get("files", []))
        return [
            _FilePartition(os.path.join(self._dir, f))
            for f in end.get("files", [])
            if f not in done
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield from _read_kv_file(partition.path)

    def commit(self, end: dict) -> None:
        pass


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class KvTextWriter(DataSourceWriter):
    """Reference-sink semantics through the format API: raw
    ``key\\tvalue`` lines, NO quoting/escaping (the reference writes
    raw strings, ``job/WordCountContext.java:162``); a null value
    writes the bare key, matching ``write_kv_text_dir``'s
    ``concat_ws`` behavior. One file per task, unique temp names
    renamed on task success and _SUCCESS stamped at commit, so a
    failed/speculative task never leaves a visible partial file.
    Paths are plain filesystem paths (local or a mounted DFS) — the
    same shared-directory assumption as the reference's per-worker
    appends."""

    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext requires a path: .save(<dir>)")
        self._dir = path
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):  # driver-side wipe-before-run
                fp = os.path.join(path, f)
                if os.path.isfile(fp):
                    os.remove(fp)
        os.makedirs(path, exist_ok=True)

    def write(self, iterator) -> _FileCommit:
        tmp = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                key = "" if row[0] is None else str(row[0])
                if row[1] is None:
                    fh.write(f"{key}\n")
                else:
                    fh.write(f"{key}\t{row[1]}\n")
        final = os.path.join(self._dir, f"part-{uuid.uuid4().hex[:12]}.txt")
        os.rename(tmp, final)
        return _FileCommit(final)

    def commit(self, messages) -> None:
        with open(os.path.join(self._dir, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register_kvtext(spark) -> None:
    """Idempotent format registration (latest registration wins, so
    re-registering is safe)."""
    spark.dataSource.register(KvTextDataSource)
