"""Per-query timing census over the FULL catalog (r10 verdict task 5).

Only ~25 of the 188 queries are wall-timed by bench.py's spot sets; the
other 163 run only inside the driver simulation's total. This tool turns
the per-query times the sim already measures (``SPARK_GRAFT_CENSUS=out.json
python tools/driver_sim.py``) into a family-relative outlier report, so a
pathological plan outside the benched set can't hide in the aggregate.

Families are the catalog's name prefixes (q=relational, t=text/corpus,
s=similarity, x=streaming, ml=ML). A query is flagged when it costs more
than OUTLIER_X times its family median — family-relative because the
families' baseline costs differ by an order of magnitude by design
(a streaming drain pays per-batch fixed costs a projection doesn't).

Usage: python tools/census.py <census.json> [--md docs/CENSUS_rN.md]
"""

from __future__ import annotations

import json
import re
import statistics
import sys

OUTLIER_X = 3.0


def family_of(name: str) -> str:
    m = re.match(r"([a-z]+)\d", name)
    return m.group(1) if m else name.split("_")[0]


def census(timings: dict[str, float]) -> dict:
    fams: dict[str, dict[str, float]] = {}
    for name, dt in timings.items():
        fams.setdefault(family_of(name), {})[name] = dt
    rows = []
    for fam, members in sorted(fams.items()):
        med = statistics.median(members.values())
        for name, dt in members.items():
            rows.append(
                {
                    "name": name,
                    "family": fam,
                    "sec": dt,
                    "family_median": round(med, 3),
                    "x_median": round(dt / med, 2) if med else None,
                }
            )
    rows.sort(key=lambda r: -r["sec"])
    outliers = [
        r for r in rows if r["x_median"] is not None and r["x_median"] > OUTLIER_X
    ]
    return {
        "n": len(rows),
        "total_sec": round(sum(r["sec"] for r in rows), 1),
        "families": {
            fam: {
                "n": len(members),
                "median_sec": round(statistics.median(members.values()), 3),
                "total_sec": round(sum(members.values()), 1),
            }
            for fam, members in sorted(fams.items())
        },
        "outliers": outliers,
        "slowest": rows[:15],
    }


def to_markdown(rep: dict, meta: dict) -> str:
    lines = [
        "# Full-catalog per-query timing census",
        "",
        f"Source: driver simulation at `{meta.get('sf_dir')}` on "
        f"`{meta.get('master')}` — one sequential pass, wall time per query "
        f"(Spark side only). {rep['n']} queries, {rep['total_sec']} s total. "
        f"Outlier = > {OUTLIER_X}x its family median.",
        "",
        "| family | n | median (s) | total (s) |",
        "|---|---|---|---|",
    ]
    for fam, f in rep["families"].items():
        lines.append(f"| {fam} | {f['n']} | {f['median_sec']} | {f['total_sec']} |")
    lines += ["", "## Slowest 15", "", "| query | s | x family median |", "|---|---|---|"]
    for r in rep["slowest"]:
        lines.append(f"| {r['name']} | {r['sec']} | {r['x_median']} |")
    lines += ["", f"## Outliers (> {OUTLIER_X}x family median)", ""]
    if rep["outliers"]:
        lines += ["| query | s | x family median |", "|---|---|---|"]
        for r in rep["outliers"]:
            lines.append(f"| {r['name']} | {r['sec']} | {r['x_median']} |")
    else:
        lines.append("none")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    with open(sys.argv[1]) as fh:
        data = json.load(fh)
    rep = census(data["timings"])
    if "--md" in sys.argv:
        path = sys.argv[sys.argv.index("--md") + 1]
        with open(path, "w") as fh:
            fh.write(to_markdown(rep, data))
        print(f"wrote {path}")
    print(json.dumps({k: rep[k] for k in ("n", "total_sec", "families")}, indent=1))
    for r in rep["outliers"]:
        print(f"OUTLIER {r['name']}: {r['sec']}s = {r['x_median']}x family median")


if __name__ == "__main__":
    main()
