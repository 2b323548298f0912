"""Attribute the PROCESS-level fast/slow measurement regime.

docs/SCALE.md (r13) records identical t39 sf100 plans measuring 46-351 s
across adjacent runs in otherwise-quiet windows, with GC (~3 s) and raw
disk (295 MB/s direct) both ruled out. The regime sticks to a process:
within one JVM, repeats are stable; across JVMs, the wall swings up to
~5x. r14's first artifact draw hit it again (t39 sf100 263.7 s vs 33.4 s
on the redraw), so this tool exists to find a measurable discriminator.

Method: N fresh child processes, each running the same warmed query
twice (min kept) at a chosen SF dir, recording per-child:

  - wall (min-of-2, after one untimed prime)
  - rusage deltas across the timed window: utime, stime, majflt, minflt,
    nvcsw (voluntary ctx switches), nivcsw (involuntary)
  - JVM process CPU time (utime+stime from /proc/<jvmpid>/stat) over the
    same window — separates "python driver slow" from "executors slow"
  - /proc/stat steal time delta (virtualized host: a noisy-neighbor
    hypervisor shows up here and NOWHERE inside the guest's own rusage)

A slow draw with proportional utime growth = the work itself ran slower
(frequency/steal); slow wall with FLAT utime = waiting (I/O, scheduler);
high nivcsw = preemption; steal delta = hypervisor contention.

Usage: python tools/profile_regime.py [n_children] [query] [sf_dir]
(defaults: 8, t39_chunk_dedup, the bench sf10 fixture)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = """
import json, os, resource, sys, time
sys.path.insert(0, %(repo)r)
from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark.queries import all_queries

def jvm_cpu_s():
    # the single local-mode JVM is our child's only java child process
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                f = fh.read().rsplit(")", 1)[1].split()
            with open(f"/proc/{pid}/cmdline") as fh:
                if b"java" not in fh.buffer.read(200):
                    continue
            if int(f[1]) != os.getpid() and int(f[1]) != os.getppid():
                # ppid field (index 1 after comm) must be us
                continue
            return (int(f[11]) + int(f[12])) / os.sysconf("SC_CLK_TCK")
        except Exception:
            continue
    return None

def steal_s():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK") if len(parts) > 8 else 0.0

spark = get_spark("regime-probe", cpus=32, shuffle_partitions=32)
qs = all_queries()
name, sf_dir = %(query)r, %(sf_dir)r
qs[name](spark, sf_dir).toPandas()  # prime
r0 = resource.getrusage(resource.RUSAGE_SELF)
c0 = resource.getrusage(resource.RUSAGE_CHILDREN)
j0, s0 = jvm_cpu_s(), steal_s()
walls = []
for _ in range(2):
    t0 = time.time()
    qs[name](spark, sf_dir).toPandas()
    walls.append(round(time.time() - t0, 3))
r1 = resource.getrusage(resource.RUSAGE_SELF)
c1 = resource.getrusage(resource.RUSAGE_CHILDREN)
j1, s1 = jvm_cpu_s(), steal_s()
print("REGIME_JSON:" + json.dumps({
    "walls": walls, "wall_min": min(walls),
    "py_utime": round(r1.ru_utime - r0.ru_utime, 2),
    "py_stime": round(r1.ru_stime - r0.ru_stime, 2),
    "child_utime": round(c1.ru_utime - c0.ru_utime, 2),
    "child_stime": round(c1.ru_stime - c0.ru_stime, 2),
    "jvm_cpu": round((j1 - j0), 2) if j0 is not None and j1 is not None else None,
    "majflt": r1.ru_majflt - r0.ru_majflt,
    "nvcsw": r1.ru_nvcsw - r0.ru_nvcsw,
    "nivcsw": r1.ru_nivcsw - r0.ru_nivcsw,
    "steal": round(s1 - s0, 2),
}))
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    query = sys.argv[2] if len(sys.argv) > 2 else "t39_chunk_dedup"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dls_bench_sf10"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    rows = []
    for i in range(n):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO, "query": query, "sf_dir": sf_dir}],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        total = round(time.time() - t0, 1)
        rec = None
        for line in proc.stdout.splitlines():
            if line.startswith("REGIME_JSON:"):
                rec = json.loads(line[len("REGIME_JSON:"):])
        if rec is None:
            print(f"child {i}: FAILED rc={proc.returncode}\n{proc.stderr[-500:]}")
            continue
        rec["child_total_s"] = total
        rows.append(rec)
        print(
            f"child {i}: wall_min {rec['wall_min']:6.2f}s walls {rec['walls']} "
            f"jvm_cpu {rec['jvm_cpu']} child_cpu {rec['child_utime']}+{rec['child_stime']} "
            f"steal {rec['steal']} nivcsw {rec['nivcsw']} majflt {rec['majflt']}"
        )
    if len(rows) >= 3:
        walls = sorted(r["wall_min"] for r in rows)
        med = walls[len(walls) // 2]
        slow = [r for r in rows if r["wall_min"] > 1.5 * med]
        fast = [r for r in rows if r["wall_min"] <= 1.5 * med]
        def avg(rs, k):
            vs = [r[k] for r in rs if r.get(k) is not None]
            return round(sum(vs) / len(vs), 2) if vs else None
        print(f"\nmedian wall {med}s; {len(slow)} slow / {len(fast)} fast draws")
        for k in ("wall_min", "jvm_cpu", "child_utime", "child_stime", "steal", "nivcsw", "majflt"):
            print(f"  {k:12s} fast {avg(fast, k)} slow {avg(slow, k)}")


if __name__ == "__main__":
    main()
