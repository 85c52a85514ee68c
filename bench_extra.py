"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file holds the extra instrumentation the optimization round needs):

  python bench_extra.py plans [out_dir] [query ...]
      .explain("formatted") for every headline query (or the named
      ones) -> out_dir/<query>.txt   (default plans/r07/work)

  python bench_extra.py time [reps] [query ...]
      per-query wall times, same methodology as bench.run_suite
      (df.count(), one fresh session at local[$SPARK_GRAFT_CPUS],
      warm-up query first), min-of-reps per query, printed as JSON.

  python bench_extra.py noop [query ...]
      noop-sink isolation (guide §1.4): every column of every row is
      computed and discarded, so kernel output cannot be pruned the way
      a bare count sometimes allows.

Each run prints ONE JSON line {query: sec, ...} plus a canary reading so
cross-window comparisons can be sanity-checked (CLAUDE.md trap 12).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from pydoxtools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    entrymod.q_html_main_content(spark, SF_DIR).limit(10).count()
    return spark


def dump_plans(out_dir: str, names: list[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = _session()
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "->", os.path.join(out_dir, f"{name}.txt"))
    spark.stop()


def time_queries(names: list[str], reps: int = 1, sink: str = "count") -> None:
    spark = _session()
    qs = entrymod.queries()
    canary = bench.drift_canary(spark, SF_DIR, reps=1)
    py_canary = bench.py_drift_canary(spark, reps=1)
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    canary2 = bench.drift_canary(spark, SF_DIR, reps=1)
    spark.stop()
    print(json.dumps({
        "sink": sink,
        "canary": [canary, canary2],
        "py_canary": py_canary,
        "min": {n: min(v) for n, v in times.items()},
        "all": times,
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if mode == "plans":
        out = rest[0] if rest else "plans/r07/work"
        names = rest[1:] or bench.HEADLINE
        dump_plans(out, names)
    elif mode == "noop":
        names = rest or bench.HEADLINE
        time_queries(names, reps=1, sink="noop")
    else:
        reps = int(rest[0]) if rest and rest[0].isdigit() else 1
        names = rest[1:] if rest and rest[0].isdigit() else rest
        time_queries(names or bench.HEADLINE, reps=reps)
