"""Table sinks.

The reference's single sink is a per-worker append of ``key\\tvalue``
lines into ``<outputdir>/output``, with the directory wiped before the
reduce phase (sink write at ``job/WordCountContext.java:115-127``,
wipe-before-run at ``worker/WorkerServlet.java:654-669``) -- i.e.
overwrite-semantics tab-separated text. ``write_kv_text_dir`` mirrors
those semantics (content, not byte layout: Spark writes one file per
partition plus ``_SUCCESS``, the reference writes one file per
worker).

``write_table`` is the engine's canonical columnar sink: parquet (or
csv/json for interchange), overwrite mode, optional hive-style
``partitionBy`` so downstream scans prune partitions -- the 100 TB
posture where the reference's flat text directory would not survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMATS = ("parquet", "csv", "json", "orc")


def write_kv_text_dir(df: DataFrame, path: str, key: str = "key", value: str = "value") -> None:
    """Reference-native sink: ``key\\tvalue`` text lines, overwrite.

    Uses the text writer on a pre-concatenated column (not the csv
    writer) so no quoting/escaping is introduced -- the reference
    writes raw strings with no escaping whatsoever
    (``job/WordCountContext.java:162``).
    """
    out = df.select(F.concat_ws("\t", F.col(key), F.col(value)).alias("value"))
    out.write.mode("overwrite").text(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar/interchange sink with overwrite semantics and optional
    disk partitioning. At scale, pick ``partition_by`` columns with
    bounded cardinality (date, region) so the file count stays sane
    and downstream filters prune directories."""
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)


def compact_parquet_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> "DataFrame":
    """Small-files compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files (the scan-efficiency knob at scale --
    a 100 TB table fragmented into KB-size files spends more time on
    footer/open overhead and scheduler round-trips than on IO; the
    rule of thumb is files ~= one HDFS/object-store block).

    File count is derived from the SOURCE's on-disk bytes (driver-side
    filesystem metadata, no data pass); the rewrite itself is one
    round-robin repartition -- no shuffle key, so rows redistribute
    evenly regardless of source skew. Returns the compacted-dir
    DataFrame for content verification."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
