#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<round>/
as <query>_<suffix>.txt -- the before/after plan evidence for the
optimization rounds.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query ...]

Iterative operators execute their localCheckpoint jobs while the
returned frame is built; the dump records the plan of the RETURNED
frame (the explain_report.py convention).
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = pathlib.Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from java_mapreduce_framework_spark.plans import registry
    from java_mapreduce_framework_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.registry()
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(f"-- {name} ({suffix}) sf_dir={sf_dir}\n{plan}")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
