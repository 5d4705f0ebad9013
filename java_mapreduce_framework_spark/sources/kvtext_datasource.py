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
reader yields line by line. Writes stay on the engine's
``write_kv_text_dir`` sink (executor-side ``foreachPartition``), so
the format is read/write complete.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class KvTextDataSource(DataSource):
    """``format("kvtext")``: directory of text files of
    ``key\\tvalue`` lines -> (key string, value string)."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> "KvTextReader":
        return KvTextReader(self.options)


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
        files = sorted(
            os.path.join(self._dir, f)
            for f in os.listdir(self._dir)
            if not f.startswith(("_", "."))
        )
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                key, sep, rest = line.partition("\t")
                # same two-field contract as read_kv_text_dir's
                # limit-2 split: value is everything after the FIRST
                # tab; a tabless line yields a null value
                yield key, rest if sep else None


def register_kvtext(spark) -> None:
    """Idempotent format registration (latest registration wins, so
    re-registering is safe)."""
    spark.dataSource.register(KvTextDataSource)
