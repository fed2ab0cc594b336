"""Per-query profiler: wall seconds, Spark job count, and the
formatted plan for named queries — the round-15 optimization
measurement harness (guide §1: measure first, label jobs).

Usage: python tools/profile_query.py [--plans DIR] [--reps N] [--sf SF_DIR] q_name ...

For each query: runs `reps` noop-sink executions (same methodology as
bench.py), reports median/min wall seconds and the number of Spark
jobs the LAST rep launched (job-count = scheduling overhead at toy
scale, lineage-round count for iterative ops). With --plans the
explain("formatted") output is written to DIR/<name>.txt.

Iterative/driver-coordinated queries execute jobs while BUILDING the
DataFrame, so build time is included in the timed region (it is in
bench.py too: qs[name](spark, sf_dir) happens inside the timer).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timestream_travel_spark import get_spark


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warm the JVM + parquet footers (bench.py does the same)
    qs["q_partition_counts"](spark, sf_dir).count()

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    print(f"{'query':40s} {'median':>8s} {'min':>8s} {'jobs':>5s}")
    for name in names:
        samples = []
        njobs = None
        plan_txt = None
        try:
            for r in range(reps):
                sc.setJobGroup(f"prof_{name}_{r}", name)
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
                ids = sc.statusTracker().getJobIdsForGroup(f"prof_{name}_{r}")
                njobs = len(ids)
                if r == 0 and plans_dir:
                    plan_txt = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:40s} ERROR {type(exc).__name__}: {exc}"[:200])
            continue
        finally:
            sc.setJobGroup(None, None)
        samples.sort()
        med = samples[len(samples) // 2]
        print(f"{name:40s} {med:8.3f} {samples[0]:8.3f} {njobs!s:>5s}")
        if plans_dir and plan_txt is not None:
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan_txt)


if __name__ == "__main__":
    main()
