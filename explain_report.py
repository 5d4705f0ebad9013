#!/usr/bin/env python
"""Physical-plan census over every registered batch query: renders
each plan with explain("formatted") and counts the node classes that
decide 100 TB viability -- scans, exchanges (shuffles), join
strategies, generators, windows, whole-stage-codegen spans -- plus
read-schema width. Writes PLANS.json next to this script.

This is the quantitative backing for SCALE.md's shuffle-minimal
claims and a regression radar: a new SortMergeJoin or an extra
Exchange in a previously lean query shows up as a diff in the
artifact. (Per-operator assertions live in tests/test_plan_shape.py /
test_plan_audit.py; this report records the full census.)

Run: python explain_report.py [sf_dir]   (default /root/testdata/sf0.001)

Iterative/driver-coordinated queries (k-means, boosting, PageRank,
IVF) execute their model-sized driver loops while the final plan is
built -- that is their declared shape; the census records the plan of
the RETURNED frame.
"""

from __future__ import annotations

import json
import os
import re
import sys

NODES = [
    "Scan parquet",
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Window",
    "Generate",
    "Sort",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
]


def _census(plan: str) -> dict:
    out = {}
    for node in NODES:
        n = len(re.findall(rf"^\(\d+\) {re.escape(node)}\b", plan, re.M))
        if n:
            out[node] = n
    out["WholeStageCodegen"] = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        out["read_columns"] = sorted(
            {c.split(":")[0] for s in schemas for c in s.split(",") if c}
        )
    return out


def _shuffle_totals(ui_url: str, app_id: str) -> tuple[int, int]:
    """Sum of shuffle WRITE bytes/records over all completed stages,
    via the UI REST API (the only place local mode exposes stage
    metrics). Per-query deltas of this running total attribute every
    job a query triggers -- including eager localCheckpoints and
    staged index builds during plan construction -- to that query."""
    import json as _json
    import urllib.request

    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=COMPLETE"
    ) as r:
        stages = _json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def main(sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        # the shuffle census reads completed-stage metrics over REST;
        # keep every stage of the sweep retained so running-total
        # deltas can never go stale mid-census
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "100000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from java_mapreduce_framework_spark.plans import registry

    ui_url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    out: dict[str, dict] = {}
    for name, spec in sorted(registry.registry().items()):
        if name.startswith("stream_"):
            continue  # streaming plans drain in test_streaming
        try:
            b0, r0 = _shuffle_totals(ui_url, app_id)
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out[name] = _census(plan)
            # run to a noop sink: full execution, nothing collected
            df.write.format("noop").mode("overwrite").save()
            b1, r1 = _shuffle_totals(ui_url, app_id)
            out[name]["shuffle_write_bytes"] = b1 - b0
            out[name]["shuffle_write_records"] = r1 - r0
        except Exception as e:  # noqa: BLE001 - census must be total
            out[name] = {"error": str(e)[:200]}
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    census = main(sf)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.json")
    totals = {
        "queries": len(census),
        "with_sort_merge_join": sum(1 for c in census.values() if c.get("SortMergeJoin")),
        "with_cartesian": sum(1 for c in census.values() if c.get("CartesianProduct")),
        "with_nested_loop": sum(
            1 for c in census.values() if c.get("BroadcastNestedLoopJoin")
        ),
        "errors": sum(1 for c in census.values() if "error" in c),
        "shuffle_write_bytes": sum(
            c.get("shuffle_write_bytes", 0) for c in census.values()
        ),
        "heaviest_shuffles": sorted(
            (
                (c.get("shuffle_write_bytes", 0), n)
                for n, c in census.items()
            ),
            reverse=True,
        )[:10],
    }
    with open(path, "w") as f:
        json.dump({"sf_dir": sf, "totals": totals, "plans": census}, f, indent=1)
    print(json.dumps(totals))
    sys.exit(1 if totals["errors"] else 0)
