"""Regenerate docs/CATALOG.md from the live query registry.

Usage: python tools/gen_catalog.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_lightgbm_spark.queries import all_oracles, all_queries  # noqa: E402

HEADER = """# Query catalog (generated)

Every entry is registered in `__spark_entry__.queries()`; oracle=yes
means the driver hash-compares it against DuckDB at sf0.01 (also
validated locally at sf0.001 and sf0.1). Rows-only entries are
genuinely non-SQL-expressible (training, engine-specific sketches).

| query | oracle | summary |
|---|---|---|
"""


def summary(fn) -> str:
    doc = (fn.__doc__ or "").strip().splitlines()
    if doc:
        return doc[0].strip()
    return fn.__name__.split("_", 1)[-1].replace("_", " ")


def main():
    qs = all_queries()
    ors = all_oracles()
    out = HEADER
    for name in sorted(qs):
        o = "yes" if name in ors else "rows-only"
        out += f"| {name} | {o} | {summary(qs[name])} |\n"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "docs", "CATALOG.md")
    with open(path, "w") as f:
        f.write(out)
    n_oracle = sum(1 for n in qs if n in ors)
    print(f"wrote {path}: {len(qs)} queries, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
