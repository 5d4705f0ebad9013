"""Table sources.

Two source families, mirroring the reference's single source plus the
engine's canonical fixture format:

1. ``read_kv_text_dir`` -- the reference's native source: a directory
   of plain-text files, one ``key\\tvalue`` record per line
   (scan at ``worker/WorkerServlet.java:510-530``, parse at
   ``worker/MapThread.java:50-51``). Kept for Job-API fidelity tests.
2. ``load_table`` -- parquet fixture tables (TESTDATA.md). Columnar,
   predicate-pushdown- and column-pruning-friendly; this is the 100 TB
   path (a directory of parquet files partitioned on disk behaves
   identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain ``spark.read.parquet`` so Catalyst
    retains pushdown/pruning; no caching here (operators decide).

    ``events.ts`` has shipped under two physical parquet types across
    fixture generations: TIMESTAMP(NANOS) (which Spark cannot
    represent -- read nanos as long, floor-divide to microseconds) and
    plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark
    reads as TIMESTAMP_NTZ -- cast to the session-zone TIMESTAMP,
    identical instants under the engine's pinned UTC session). Both
    normalize to the same microsecond instants the DuckDB oracle sees
    via ``CAST(ts AS TIMESTAMP)``, so the choice is detected from the
    loaded schema, not assumed.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":  # TIMESTAMP(NANOS) read as raw nanos
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type == "timestamp_ntz":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def source_fingerprint(sf_dir: str, *names: str) -> str:
    """Cheap content key for staged-artifact invalidation: size and
    mtime of each source parquet file. Staging sites record this in
    their ``_STAGED`` marker and re-stage when it changes, so a
    regenerated fixture can never be silently shadowed by a stale
    staged copy (the failure mode: queries read the stage, the DuckDB
    oracle reads the fresh parquet)."""
    import pathlib

    parts = []
    for name in names:
        st = pathlib.Path(f"{sf_dir}/{name}.parquet").stat()
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def spread_scan(df: DataFrame, *key_cols: str) -> DataFrame:
    """Input-skew guard for operators with heavy PRE-SHUFFLE work
    (optimization guide §2.5: "one huge unsplittable file ...
    repartition immediately after the read").

    The fixture tables are single-file single-ROW-GROUP parquet, so a
    scan is ONE task regardless of cores or ``maxPartitionBytes`` --
    and every expensive map-side chain above it (explode+hash streams,
    wide md5 fan-outs, Arrow kernels) serializes on one core while the
    other N-1 idle. Measured on stats_permutation_test at sf0.1 /
    local[32]: 4.4 s -> 1.4 s from this guard alone.

    The guard is CONDITIONAL on the scan's actual split count, so at
    production scale (splits >= cores -- any healthy 100 TB layout) it
    returns the input unchanged and adds NO exchange. When it fires,
    it hash-repartitions on ``key_cols`` (deterministic under task
    retry, and no sort-before-repartition cost -- round-robin
    ``repartition(n)`` pays a per-partition sort, measured +50% on a
    600k-row spread) to ``default_parallelism()`` partitions. Pass a
    high-cardinality key (the table's id column); callers should
    project to the needed columns FIRST so the exchange carries only
    those bytes.
    """
    from ..session import default_parallelism

    n = default_parallelism()
    # INPUT CONTRACT (ADVICE r12): the split probe below uses .rdd,
    # which under AQE finalizes the adaptive plan -- on a plan that
    # contains exchanges that means EXECUTING the upstream shuffle
    # stages as real jobs during what looks like plan inspection. So
    # the probe only runs on LEAF SCANS (projections/filters over a
    # file source, where .rdd just builds the physical RDD chain,
    # ~50 ms, no job); any input that already has an exchange-bearing
    # operator above the scan established its own parallelism there
    # and passes through unchanged -- the same no-op contract as a
    # production multi-split layout.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if any(k in plan for k in ("Join", "Aggregate", "Repartition", "Window")):
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *[F.col(c) for c in key_cols])


def read_csv(
    spark: SparkSession, path: str, schema: str | None = None, header: bool = True
) -> DataFrame:
    """CSV interchange source. Pass an explicit DDL ``schema`` in
    production -- schema inference is a full extra pass over the data
    and type-drifts between runs; at 100 TB both are unacceptable."""
    r = spark.read.option("header", str(header).lower())
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines interchange source; same explicit-schema guidance as
    CSV. Corrupt records land in ``_corrupt_record`` (PERMISSIVE mode)
    instead of failing the scan -- filter them, don't crash a 100 TB
    read on one bad line."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar source — same pushdown/pruning posture as parquet;
    completes the read side of the ``write_table`` format matrix."""
    return spark.read.orc(path)


def read_kv_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Reference-native source: directory of text files of
    ``key\\tvalue`` lines -> DataFrame(key string, value string).

    Mirrors the semantics of the reference scan: every line is one
    record, split at the first tab (``worker/MapThread.java:50-51``
    uses ``split("\\t")`` and takes fields 0 and 1, so content after a
    second tab is dropped -- we reproduce the two-field contract by
    limiting the split).
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 2)
    # F.get, not getItem: a tabless line has no second field, and
    # under ANSI semantics getItem(1) would fail the whole scan on
    # one malformed line — get() degrades it to a null value instead
    return lines.select(
        F.get(parts, 0).alias("key"),
        F.get(parts, 1).alias("value"),
    )
