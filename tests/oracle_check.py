"""Local replica of the driver's DuckDB-oracle comparison: runs a
registered query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, compares row count, column names, and an
order-insensitive value hash. Used by tests and runnable standalone:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from java_mapreduce_framework_spark.sources.tables import TABLES  # noqa: E402

_FLOAT_TOL_DIGITS = 9


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, _FLOAT_TOL_DIGITS):.9f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        "|".join(_canon_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def compare(name: str, spark, sf_dir: str) -> tuple[bool, str]:
    from java_mapreduce_framework_spark.plans import registry

    spec = registry.registry()[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return True, f"rows-only: {len(sdf)} rows"
    # Driver-canon compatibility guard: the driver canonicalizes by
    # pandas sort_values over the RAW columns (CORRECTNESS_r07 shows
    # its exact traceback), so an array/map/struct-valued result
    # column crashes it with "unhashable type: numpy.ndarray" even
    # when the math is right. Reproduce that sort here so the local
    # replica fails the same way the driver would, BEFORE our
    # stringify-then-sort hash can mask the incompatibility.
    try:
        sdf.sort_values(by=sorted(sdf.columns))
    except TypeError as e:
        return False, (
            f"driver-canon incompatible (raw sort_values raised "
            f"{type(e).__name__}: {e}); emit scalar columns only"
        )
    odf = duckdb_run(spec.oracle, sf_dir)
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    s_rows, o_rows = canonical_rows(sdf), canonical_rows(odf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"match: {len(sdf)} rows"


def main():
    from java_mapreduce_framework_spark.plans import registry
    from java_mapreduce_framework_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(registry.registry())
    spark = get_spark("oracle-check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for name in names:
        try:
            ok, msg = compare(name, spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
