"""Fixture-drift canary against a committed golden schema.

The r4 incident (docs/NOTES_r5.md): the driver regenerated the fixture and
``events.ts`` silently changed parquet encoding, breaking six queries at the
gate instead of in a unit test. ``normalize_event_time`` now absorbs the
three encodings observed so far — but a FOURTH encoding, a renamed column,
or a type change on any other table would again surface as cryptic query
failures. This module diffs the live fixture's raw parquet schema against
``tests/golden/testdata_schema.json`` (which lists the accepted type
variants per column) so any unanticipated drift fails one obvious test
before a single query runs.
"""

from __future__ import annotations

import json
import os

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "golden",
    "testdata_schema.json",
)


def snapshot(sf_dir: str) -> dict[str, dict[str, str]]:
    """table -> {column: pyarrow type string} for every fixture table."""
    import pyarrow.parquet as pq

    from .readers import TABLES

    out: dict[str, dict[str, str]] = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        schema = pq.read_schema(path)
        out[t] = {f.name: str(f.type) for f in schema}
    return out


def diff_against_golden(sf_dir: str, golden_path: str = GOLDEN_PATH) -> list[str]:
    """Return a list of human-readable drift findings (empty == clean).

    A finding is: a missing table/column, an unexpected extra column, or a
    column whose live type is outside its golden accepted-variants list.
    """
    with open(golden_path) as fh:
        golden = json.load(fh)["tables"]
    live = snapshot(sf_dir)
    findings: list[str] = []
    for table, cols in golden.items():
        if table not in live:
            findings.append(f"{table}: table missing from fixture")
            continue
        live_cols = live[table]
        for col, accepted in cols.items():
            if col not in live_cols:
                findings.append(f"{table}.{col}: column missing")
            elif live_cols[col] not in accepted:
                findings.append(
                    f"{table}.{col}: type {live_cols[col]!r} not in accepted "
                    f"variants {accepted}"
                )
        for col in live_cols:
            if col not in cols:
                findings.append(f"{table}.{col}: unexpected extra column ({live_cols[col]})")
    return findings
