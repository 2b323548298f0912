"""Local stand-in for the driver's correctness gate.

Runs every query in the catalog on Spark AND its DuckDB oracle at the given
SF, then compares row count, (sorted) column names, dtypes, and exact values
after sorting columns by name and rows by all columns. Exact float equality
is intentional — the catalog's determinism contract promises bit-exact
doubles; any mismatch here would also fail the driver's value-hash.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_lightgbm_spark.queries import all_oracles, all_queries  # noqa: E402
from dask_lightgbm_spark.session import get_spark  # noqa: E402
from dask_lightgbm_spark.sources.readers import TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c]
            if getattr(dt.dtype, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"cols spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            problems.append(f"dtype[{c}] spark={av.dtype} duck={bv.dtype}")
        if av.dtype == np.float64:
            ok = (av.fillna(-1.23e300) == bv.fillna(-1.23e300)).all()
            if not ok:
                diff = (av - bv).abs().max()
                problems.append(f"values[{c}] maxdiff={diff!r}")
        else:
            an, bn = av.isna(), bv.isna()
            a_vals = av[~an].reset_index(drop=True)
            b_vals = bv[~bn].reset_index(drop=True)
            if not ((an == bn).all() and (a_vals == b_vals).all()):
                problems.append(f"values[{c}] mismatch (non-float)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    # fixture-drift canary: print each table's raw parquet schema types so a
    # silent fixture regeneration (e.g. ts nanos → NTZ-µs in r4) is visible
    # in the artifact instead of surfacing as a cryptic query failure.
    try:
        import pyarrow.parquet as pq

        for t in TABLES:
            s = pq.read_schema(f"{sf_dir}/{t}.parquet")
            cols = ", ".join(f"{f.name}:{f.type}" for f in s)
            print(f"# fixture {t}: {cols}")
    except Exception as exc:  # noqa: BLE001 — the pretty-print never gates
        print(f"# fixture schema print failed: {exc}")
    # hard diff against the committed golden schema: unanticipated drift (a
    # fourth ts encoding, renamed/extra column) fails HERE, loudly, before
    # any query runs — not as a cryptic mid-gate query error. Deliberately
    # OUTSIDE any try/except: a broken gate (missing golden file, unreadable
    # parquet) must also fail loudly, not silently disable itself
    # (r6 review finding).
    from dask_lightgbm_spark.sources.schema_canary import diff_against_golden

    drift = diff_against_golden(sf_dir)
    for d in drift:
        print(f"# FIXTURE DRIFT: {d}")
    if drift:
        print(f"FAIL fixture_schema: {len(drift)} drift finding(s) vs golden")
        sys.exit(3)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = all_queries(), all_oracles()
    unknown = only - set(qs)
    if unknown:
        # a typo'd subset must fail loudly — silently skipping it turns
        # "verify these queries" into "verify whatever happened to match"
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"PASS {name} (rows-only: {len(spark_pdf)} rows, {t1-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows, spark {t1-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
