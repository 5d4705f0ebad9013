"""Arbitrary-state streaming v2 (``transformWithStateInPandas``) --
EXPERIMENTAL: the v2 Python runner serializes state schemas through
``google.protobuf``, which this execution container does not ship
(and installs are not permitted), so the operator below raises
``NotImplementedError`` here. The wiring is the real v2 surface and
runs unchanged where protobuf exists; the DECLARED arbitrary-state
query remains ``stream_dedup_state`` on the v1
``applyInPandasWithState`` API (streaming/jobs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.jobs import _drain_to_memory, _stage_stream_dir


def stream_user_stats_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator on the arbitrary-state v2 surface
    (``transformWithStateInPandas`` + ``StatefulProcessor``, the
    successor of ``applyInPandasWithState`` used by
    ``stream_dedup_state``): per-user running (event count, value
    total) kept in a typed ValueState.

    v2 requires the RocksDB state store -- the production-scale store
    (incremental checkpointing, state larger than memory), set here
    per-session. Counts and totals are monotone (values are positive),
    so the bounded drain's latest update per key equals the batch
    aggregate; the max() fold makes that explicit even if the drain
    slices into several microbatches.

    CAPABILITY-GATED, not a declared query: the v2 runner needs a
    working ``google.protobuf`` in the Python workers, absent in this
    execution container (raises NotImplementedError here; the
    declared arbitrary-state surface is ``stream_dedup_state`` on the
    v1 ``applyInPandasWithState`` API). The operator body below is the
    real v2 wiring and runs unchanged where protobuf exists.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python workers; not available in this container"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "cnt BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            cnt, total = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((cnt, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    path = _stage_stream_dir(spark, sf_dir, "events")
    schema = spark.read.parquet(path).schema
    events = spark.readStream.schema(schema).parquet(path)
    out = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType="user_id bigint, n_events bigint, total_value double",
        outputMode="Update",
        timeMode="None",
    )
    # the RocksDB provider is required by state v2 but is a SESSION
    # conf: scope it to this drain so later streaming queries in the
    # same session keep their provider (same save/restore pattern as
    # stream_stream_join's shuffle partitions)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        drained = _drain_to_memory(out, mode="update")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    return drained.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )


